"""Training-throughput benchmark (BASELINE metric 2: "train frames/sec",
target: within 10% of the A100 PyTorch reference).

Flagship config: 2-tier GRU dim-1024, batch 128, TBPTT seq_len 1024,
bf16 matmuls. Prints one JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache (fast warm starts on the dev box)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)



def main():
    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn
    from samplernn_pase_tpu.train.trainer import make_train_step
    from samplernn_pase_tpu.train.optim import make_optimizer

    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024, embed_dim=256,
                          rnn_type="gru", compute_dtype="bfloat16")
    b, t = 128, 1024
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3, 1.0)
    opt = tx.init(params)
    hid = samplernn.initial_state(params, cfg, b)
    step = make_train_step(cfg, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (b, cfg.lookback + t), np.int32))
    y = x[:, cfg.lookback:]
    r = jnp.zeros((b,), jnp.float32)

    params, opt, hid, nll = step(params, opt, hid, x, y, r)
    float(nll)
    # steady-state: enqueue N steps back-to-back, one blocking sync at
    # the end (the dev box's TPU tunnel adds ~31 ms per blocking call)
    n_rep = 8
    t0 = time.perf_counter()
    for _ in range(n_rep):
        params, opt, hid, nll = step(params, opt, hid, x, y, r)
    float(nll)
    dt = (time.perf_counter() - t0) / n_rep
    frames_per_sec = b * t / cfg.frame_sizes[0] / dt
    print(json.dumps({
        "metric": "train_bottom_frames_per_sec_b128_seq1024",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec",
        "samples_per_sec": round(b * t / dt, 1),
        "step_ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
