"""C8-C11 PASE encoder tests: sinc filter bank properties, conv-block
parity vs torch oracle, decimation bookkeeping, extraction tool."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from samplernn_pase_tpu.config import PASEConfig
from samplernn_pase_tpu.models import pase as P

TINY = PASEConfig(
    sinc_filters=8, sinc_kernel=65,
    blocks=((8, 10, 4), (16, 5, 2), (16, 5, 2)),
    emb_dim=12, compute_dtype="float32")


def test_decimation():
    assert TINY.decimation == 16
    assert PASEConfig().decimation == 160


def test_sinc_filters_are_bandpass():
    params = P.init_sinc(jax.random.PRNGKey(0), TINY)
    filt = np.asarray(P.sinc_filters(params, TINY))
    assert filt.shape == (8, 65)
    low = TINY.min_low_hz + np.abs(np.asarray(params["low_hz"]))
    high = np.clip(low + TINY.min_band_hz
                   + np.abs(np.asarray(params["band_hz"])),
                   TINY.min_low_hz, TINY.sample_rate / 2)
    freqs = np.fft.rfftfreq(1024, 1 / TINY.sample_rate)
    peaks = []
    for i, f in enumerate(filt):
        mag = np.abs(np.fft.rfft(f, 1024))
        pk = freqs[np.argmax(mag)]
        peaks.append(pk)
        # peak response inside (a windowing-widened) passband
        assert 0.4 * low[i] <= pk <= 1.3 * high[i], (i, pk, low[i], high[i])
    # mel-ordered: peak frequencies increase with filter index
    assert all(b >= a for a, b in zip(peaks, peaks[1:])), peaks
    # high filters resolve well at kernel=65: strong DC rejection there
    dc = np.abs(filt.sum(axis=1))
    mx = np.array([np.abs(np.fft.rfft(f, 1024)).max() for f in filt])
    assert np.all(dc[4:] / mx[4:] < 0.05), dc / mx


def test_sinc_conv_shapes():
    params = P.init_sinc(jax.random.PRNGKey(0), TINY)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 256)),
                      jnp.float32)
    out = P.sinc_conv(params, wav, TINY)
    assert out.shape == (2, 8, 256)


def test_conv_block_matches_torch():
    """Conv + BatchNorm(eval) + PReLU vs torch oracle."""
    c_in, c_out, k, stride, t = 4, 6, 5, 2, 32
    rng = np.random.default_rng(0)
    w = rng.normal(size=(c_out, c_in, k)).astype(np.float32) * 0.2
    b = rng.normal(size=(c_out,)).astype(np.float32)
    alpha = np.full((c_out,), 0.25, np.float32)
    scale = rng.uniform(0.5, 1.5, c_out).astype(np.float32)
    bias = rng.normal(size=(c_out,)).astype(np.float32)
    mean = rng.normal(size=(c_out,)).astype(np.float32) * 0.1
    var = rng.uniform(0.5, 2.0, c_out).astype(np.float32)
    x = rng.normal(size=(3, c_in, t)).astype(np.float32)

    # our blocks carry no conv bias; the torch oracle's bias is folded
    # into the running mean (the load_torch_pase import convention) —
    # this asserts the fold is exact in eval mode
    params = {"w": jnp.asarray(w),
              "alpha": jnp.asarray(alpha), "bn_scale": jnp.asarray(scale),
              "bn_bias": jnp.asarray(bias)}
    st = {"mean": jnp.asarray(mean - b), "var": jnp.asarray(var),
          "count": jnp.zeros(())}
    got, _ = P.conv_block_apply(params, st, jnp.asarray(x), stride,
                                train=False, compute_dtype=jnp.float32)

    # replicate XLA SAME padding explicitly (stride-2 SAME pads (1, 2)
    # for k=5, unlike torch's symmetric padding=k//2)
    out_t = -(-t // stride)
    pad_total = max((out_t - 1) * stride + k - t, 0)
    lo, hi = pad_total // 2, pad_total - pad_total // 2
    xt = torch.nn.functional.pad(torch.from_numpy(x), (lo, hi))
    conv = torch.nn.Conv1d(c_in, c_out, k, stride=stride, padding=0,
                           bias=True)
    conv.weight.data = torch.from_numpy(w)
    conv.bias.data = torch.from_numpy(b)
    bn = torch.nn.BatchNorm1d(c_out).eval()
    bn.weight.data = torch.from_numpy(scale)
    bn.bias.data = torch.from_numpy(bias)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    act = torch.nn.PReLU(c_out)
    act.weight.data = torch.from_numpy(alpha)
    with torch.no_grad():
        want = act(bn(conv(xt))).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_pase_apply_shapes_and_rate():
    params, bn_state = P.init_pase(jax.random.PRNGKey(0), TINY)
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(2, 512)) * 0.1,
                      jnp.float32)
    emb, st = P.pase_apply(params, bn_state, wav, TINY, train=False)
    assert emb.shape == (2, 512 // 16, 12)
    # train mode updates running stats
    emb2, st2 = P.pase_apply(params, bn_state, wav, TINY, train=True)
    assert float(st2["blocks"][0]["count"]) == 1.0
    assert not np.allclose(np.asarray(st2["blocks"][0]["mean"]),
                           np.asarray(bn_state["blocks"][0]["mean"]))


def test_extract_embeddings_variable_lengths():
    from samplernn_pase_tpu.extract import extract_embeddings
    params, bn_state = P.init_pase(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(2)
    wavs = [rng.normal(size=n).astype(np.float32) * 0.1
            for n in (300, 512, 1000, 64)]
    embs = extract_embeddings(params, bn_state, TINY, wavs, batch_size=2)
    assert len(embs) == 4
    for w, e in zip(wavs, embs):
        assert e.shape[0] == max(len(w) // TINY.decimation, 1)
        assert e.shape[1] == TINY.emb_dim
    # padding must not change a clip's own frames (first clip rerun alone)
    solo = extract_embeddings(params, bn_state, TINY, [wavs[0]],
                              batch_size=1)[0]
    np.testing.assert_allclose(solo, embs[0], atol=1e-4)


def test_extract_to_dir_roundtrip(tmp_path):
    from samplernn_pase_tpu.extract import extract_to_dir
    from samplernn_pase_tpu.ops.audio_io import write_wav
    rng = np.random.default_rng(3)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i in range(3):
        write_wav(wav_dir / f"u{i}.wav",
                  rng.uniform(-0.5, 0.5, 400 + 100 * i), 16_000)
    params, bn_state = P.init_pase(jax.random.PRNGKey(0), TINY)
    paths = extract_to_dir(params, bn_state, TINY, wav_dir,
                           tmp_path / "emb", batch_size=2)
    assert len(paths) == 3
    e0 = np.load(paths[0])
    assert e0.shape == (400 // 16, 12)


def test_absorb_legacy_bias_preserves_function_and_export_has_bias_keys():
    """Round-4 migration: a pre-round-4 checkpoint pair (conv bias b,
    running mean tracked on conv+b) must produce the SAME eval output
    after absorb_legacy_bias folds b away — constructed here as the
    legacy-equivalent pair (b=d, mean=mean+d) of a clean tree, which
    represents the identical function. Also: export emits explicit zero
    conv.bias keys so upstream torch strict load finds every key."""
    import jax
    from samplernn_pase_tpu.config import PASEConfig
    from samplernn_pase_tpu.models import pase as P

    cfg = PASEConfig(sinc_filters=4, sinc_kernel=33,
                     blocks=((4, 5, 2), (6, 5, 2)), emb_dim=8,
                     compute_dtype="float32")
    params, bn = P.init_pase(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    # perturb stats so the fold is not a no-op on zeros
    for st in bn["blocks"]:
        st["mean"] = jnp.asarray(
            rng.normal(size=st["mean"].shape), jnp.float32)
    wav = jnp.asarray(rng.normal(size=(2, 3200)), jnp.float32)
    want = np.asarray(P.pase_apply(params, bn, wav, cfg,
                                   train=False)[0])

    legacy_p = dict(params)
    legacy_p["blocks"] = [
        dict(blk, b=jnp.full((blk["w"].shape[0],), 0.5))
        for blk in params["blocks"]]
    legacy_p["proj"] = dict(params["proj"],
                            b=jnp.full((params["proj"]["w"].shape[0],),
                                       0.25))
    legacy_bn = dict(bn)
    legacy_bn["blocks"] = [dict(st, mean=st["mean"] + 0.5)
                           for st in bn["blocks"]]
    legacy_bn["proj"] = dict(bn["proj"], mean=bn["proj"]["mean"] + 0.25)

    fp, fbn, changed = P.absorb_legacy_bias(legacy_p, legacy_bn)
    assert changed
    assert all(np.all(np.asarray(blk["b"]) == 0) for blk in fp["blocks"])
    got = np.asarray(P.pase_apply(fp, fbn, wav, cfg,
                                  train=False)[0])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # idempotent on migrated/current trees
    _, _, changed2 = P.absorb_legacy_bias(
        {k: v for k, v in params.items()}, bn)
    assert not changed2

    sd = P.export_torch_pase(params, bn)
    assert "blocks.1.conv.bias" in sd and "proj.conv.bias" in sd
    assert float(sd["blocks.1.conv.bias"].abs().sum()) == 0.0
