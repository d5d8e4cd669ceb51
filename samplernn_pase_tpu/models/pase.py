"""PASE waveform encoder (SURVEY.md §2 C8 SincConv front-end, C9 conv
trunk, C10 pretrained-ckpt import).

TPU-first shape: the SincNet band-pass filter bank is *built in-graph*
from the learnable (low, band) cutoff parameters each forward pass — a
[filters, kernel] elementwise construction that XLA fuses — then the whole
encoder is a chain of strided ``lax.conv_general_dilated`` calls (MXU) with
BatchNorm+PReLU fused around them.  All convs use SAME padding so the
total decimation is exactly ``prod(strides)`` (160 by default: 16 kHz ->
100 Hz embeddings, SURVEY.md §2 C9).

Layout: waveforms are [B, T]; internally NCW ([B, C, T]) which maps well
onto TPU convolution tiling with C as the lane dimension.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from samplernn_pase_tpu.config import PASEConfig
from samplernn_pase_tpu.ops import init as winit


# ---------------------------------------------------------------- SincConv

def _mel(hz):
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _inv_mel(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def init_sinc(key, cfg: PASEConfig):
    """Mel-spaced initial cutoffs (SincNet init)."""
    n = cfg.sinc_filters
    low_hz = cfg.min_low_hz
    high_hz = cfg.sample_rate / 2.0 - (cfg.min_low_hz + cfg.min_band_hz)
    mel_pts = np.linspace(_mel(low_hz), _mel(high_hz), n + 1)
    hz = _inv_mel(mel_pts)
    return {
        "low_hz": jnp.asarray(hz[:-1], jnp.float32),
        "band_hz": jnp.asarray(np.diff(hz), jnp.float32),
    }


def sinc_filters(params, cfg: PASEConfig):
    """Build the [filters, kernel] band-pass bank from cutoff params."""
    k = cfg.sinc_kernel
    half = (k - 1) // 2
    sr = cfg.sample_rate
    low = cfg.min_low_hz + jnp.abs(params["low_hz"])
    high = jnp.clip(low + cfg.min_band_hz + jnp.abs(params["band_hz"]),
                    cfg.min_low_hz, sr / 2.0)
    # time axis (centered), avoid divide-by-zero at n=0
    n = (jnp.arange(1, half + 1, dtype=jnp.float32)) / sr  # [half]
    window = 0.54 - 0.46 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(k, dtype=jnp.float32) / (k - 1))
    # band-pass = high-lp - low-lp; right half via sin differences
    f_times_t = 2.0 * jnp.pi * n[None, :]                  # [1, half]
    right = ((jnp.sin(high[:, None] * f_times_t)
              - jnp.sin(low[:, None] * f_times_t))
             / (jnp.pi * n[None, :]))                      # [F, half]
    center = 2.0 * (high - low)[:, None]                   # [F, 1]
    filt = jnp.concatenate(
        [jnp.flip(right, axis=1), center, right], axis=1)  # [F, k]
    filt = filt * window[None, :]
    # per-filter peak normalization (keeps activations scale-free)
    filt = filt / (2.0 * (high - low))[:, None]
    return filt


def sinc_conv(params, x, cfg: PASEConfig):
    """x [B, T] -> [B, filters, T] (stride 1, SAME)."""
    filt = sinc_filters(params, cfg).astype(jnp.dtype(cfg.compute_dtype))
    lhs = x[:, None, :].astype(jnp.dtype(cfg.compute_dtype))  # [B, 1, T]
    rhs = filt[:, None, :]                                    # [F, 1, k]
    # same-dtype in/out keeps the conv transpose (backward) rule happy;
    # TPU convs accumulate in f32 internally regardless.
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out.astype(jnp.float32)


# ------------------------------------------------------------- conv trunk

def init_conv_block(key, c_in: int, c_out: int, kernel: int):
    """No conv bias: the block's BatchNorm immediately re-centers the
    conv output, so a bias is exactly degenerate — zero gradient in
    train mode (batch stats absorb it) and redundant with BN beta in
    eval mode. Imported torch checkpoints fold theirs into the running
    mean (load_torch_pase)."""
    k1, _ = jax.random.split(key)
    fan_in = c_in * kernel
    return {
        "w": winit.lecun_uniform(k1, (c_out, c_in, kernel), fan_in=fan_in),
        "alpha": jnp.full((c_out,), 0.25),   # PReLU slope
        "bn_scale": jnp.ones((c_out,)),
        "bn_bias": jnp.zeros((c_out,)),
    }


def init_bn_state(c_out: int):
    return {"mean": jnp.zeros((c_out,)), "var": jnp.ones((c_out,)),
            "count": jnp.zeros(())}


def conv_block_apply(params, bn_state, x, stride: int, *, train: bool,
                     compute_dtype, momentum: float = 0.1,
                     eps: float = 1e-5):
    """x [B, C_in, T] -> ([B, C_out, T/stride], new_bn_state)."""
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), params["w"].astype(compute_dtype),
        window_strides=(stride,), padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"))
    out = out.astype(jnp.float32)
    if train:
        mean = jnp.mean(out, axis=(0, 2))
        var = jnp.var(out, axis=(0, 2))
        new_state = {
            "mean": (1 - momentum) * bn_state["mean"] + momentum * mean,
            "var": (1 - momentum) * bn_state["var"] + momentum * var,
            "count": bn_state["count"] + 1,
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    out = ((out - mean[None, :, None])
           * jax.lax.rsqrt(var[None, :, None] + eps))
    out = out * params["bn_scale"][None, :, None] \
        + params["bn_bias"][None, :, None]
    # PReLU
    alpha = params["alpha"][None, :, None]
    out = jnp.where(out >= 0, out, alpha * out)
    return out, new_state


# ------------------------------------------------------------------ WaveFe

def init_pase(key, cfg: PASEConfig):
    """Returns (params, bn_state) for the full encoder."""
    keys = jax.random.split(key, len(cfg.blocks) + 2)
    params = {"sinc": init_sinc(keys[0], cfg), "blocks": [], "bn_sinc": {
        "alpha": jnp.full((cfg.sinc_filters,), 0.25),
        "bn_scale": jnp.ones((cfg.sinc_filters,)),
        "bn_bias": jnp.zeros((cfg.sinc_filters,)),
    }}
    bn_state = {"sinc": init_bn_state(cfg.sinc_filters), "blocks": []}
    c_in = cfg.sinc_filters
    for i, (c_out, kernel, _stride) in enumerate(cfg.blocks):
        params["blocks"].append(
            init_conv_block(keys[i + 1], c_in, c_out, kernel))
        bn_state["blocks"].append(init_bn_state(c_out))
        c_in = c_out
    params["proj"] = init_conv_block(keys[-1], c_in, cfg.emb_dim, 1)
    bn_state["proj"] = init_bn_state(cfg.emb_dim)
    return params, bn_state


def _bn_prelu(params, bn_state, x, *, train: bool, momentum=0.1, eps=1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))
        new_state = {
            "mean": (1 - momentum) * bn_state["mean"] + momentum * mean,
            "var": (1 - momentum) * bn_state["var"] + momentum * var,
            "count": bn_state["count"] + 1,
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    x = (x - mean[None, :, None]) * jax.lax.rsqrt(var[None, :, None] + eps)
    x = x * params["bn_scale"][None, :, None] + params["bn_bias"][None, :, None]
    alpha = params["alpha"][None, :, None]
    return jnp.where(x >= 0, x, alpha * x), new_state


def pase_apply(params, bn_state, wav, cfg: PASEConfig, *, train: bool = False):
    """wav [B, T] float in [-1,1] -> (emb [B, T//decimation, emb_dim],
    new_bn_state)."""
    dt = jnp.dtype(cfg.compute_dtype)
    x = sinc_conv(params["sinc"], wav, cfg)
    x = jnp.abs(x)  # rectified band energies (SincNet front-end practice)
    x, bn_sinc = _bn_prelu(params["bn_sinc"], bn_state["sinc"], x,
                           train=train)
    new_blocks = []
    for blk, st, (c_out, kernel, stride) in zip(
            params["blocks"], bn_state["blocks"], cfg.blocks):
        x, st2 = conv_block_apply(blk, st, x, stride, train=train,
                                  compute_dtype=dt)
        new_blocks.append(st2)
    x, bn_proj = conv_block_apply(params["proj"], bn_state["proj"], x, 1,
                                  train=train, compute_dtype=dt)
    new_state = {"sinc": bn_sinc, "blocks": new_blocks, "proj": bn_proj}
    return jnp.moveaxis(x, 1, 2), new_state  # [B, frames, emb_dim]


# --------------------------------------------------- torch ckpt import (C10)

def load_torch_pase(path, cfg: PASEConfig, strict: bool = True):
    """Import upstream PASE encoder weights from a torch checkpoint.

    Maps a torch state_dict with SincNet-style keys (low_hz_, band_hz_,
    per-block conv/bn weights) onto our pytree.  Unknown keys are listed in
    the returned report; offline environments without a ckpt use random
    init (SURVEY.md §7 M4).

    ``strict`` (default): raise if the checkpoint yields ZERO tensors or
    is missing any conv block's weight — a key-layout mismatch must be a
    hard error, not a silently random-init encoder.  The error message
    carries the skipped-key report so the actual layout is visible.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    sd = {k: v for k, v in sd.items() if hasattr(v, "numpy")}
    params, bn_state = init_pase(jax.random.PRNGKey(0), cfg)
    used = set()

    def grab(*names):
        for n in names:
            if n in sd:
                used.add(n)
                return jnp.asarray(sd[n].detach().numpy())
        return None

    def check_shape(name, v, want):
        if v is not None and tuple(v.shape) != tuple(want):
            raise ValueError(
                f"PASE import: {name} has shape {tuple(v.shape)}, "
                f"config expects {tuple(want)} — checkpoint does not "
                f"match PASEConfig (cfg.blocks={cfg.blocks})")

    low = grab("sinc.low_hz_", "blocks.0.conv.low_hz_")
    band = grab("sinc.band_hz_", "blocks.0.conv.band_hz_")
    if low is not None:
        low = low.reshape(-1)
        check_shape("sinc low_hz", low, (cfg.sinc_filters,))
        params["sinc"]["low_hz"] = low
    if band is not None:
        band = band.reshape(-1)
        check_shape("sinc band_hz", band, (cfg.sinc_filters,))
        params["sinc"]["band_hz"] = band
    # sinc block's own norm/act (upstream blocks.0.norm / blocks.0.act)
    for ours, theirs in (("bn_scale", "norm.weight"),
                         ("bn_bias", "norm.bias"),
                         ("alpha", "act.weight")):
        v = grab(f"blocks.0.{theirs}")
        if v is not None:
            params["bn_sinc"][ours] = v
    for ours, theirs in (("mean", "norm.running_mean"),
                         ("var", "norm.running_var")):
        v = grab(f"blocks.0.{theirs}")
        if v is not None:
            bn_state["sinc"][ours] = v
    missing_blocks = []
    for i in range(len(cfg.blocks)):
        w = grab(f"blocks.{i + 1}.conv.weight")
        if w is None:
            missing_blocks.append(i)
            continue
        blk = params["blocks"][i]
        check_shape(f"blocks.{i + 1}.conv.weight", w, blk["w"].shape)
        blk["w"] = w
        for ours, theirs in (("bn_scale", "norm.weight"),
                             ("bn_bias", "norm.bias")):
            v = grab(f"blocks.{i + 1}.{theirs}")
            if v is not None:
                blk[ours] = v
        for ours, theirs in (("mean", "norm.running_mean"),
                             ("var", "norm.running_var")):
            v = grab(f"blocks.{i + 1}.{theirs}")
            if v is not None:
                bn_state["blocks"][i][ours] = v
        b = grab(f"blocks.{i + 1}.conv.bias")
        if b is not None:
            # our blocks carry no conv bias (BN re-centers): fold the
            # upstream bias into the running mean — eval-mode output
            # (conv + b - mean) == (conv - (mean - b)) exactly; in train
            # mode the batch stats cancel any bias anyway
            bn_state["blocks"][i]["mean"] = \
                bn_state["blocks"][i]["mean"] - b
        a = grab(f"blocks.{i + 1}.act.weight")
        if a is not None:
            blk["alpha"] = a
    # final emb projection (upstream WaveFe's output conv `W`; our
    # exporter writes the namespaced form)
    w = grab("W.weight", "proj.conv.weight")
    if w is not None:
        check_shape("proj.conv.weight", w, params["proj"]["w"].shape)
        params["proj"]["w"] = w
        for ours, theirs in (("bn_scale", "proj.norm.weight"),
                             ("bn_bias", "proj.norm.bias"),
                             ("alpha", "proj.act.weight")):
            v = grab(theirs)
            if v is not None:
                params["proj"][ours] = v
        for ours, theirs in (("mean", "proj.norm.running_mean"),
                             ("var", "proj.norm.running_var")):
            v = grab(theirs)
            if v is not None:
                bn_state["proj"][ours] = v
        b = grab("W.bias", "proj.conv.bias")
        if b is not None:   # fold into the running mean (see blocks)
            bn_state["proj"]["mean"] = bn_state["proj"]["mean"] - b
    report = {"loaded": sorted(used),
              "skipped": sorted(set(sd) - used),
              "missing_blocks": missing_blocks}
    if strict and (not used or missing_blocks):
        what = ("loaded ZERO tensors" if not used else
                f"conv blocks {missing_blocks} have no "
                f"blocks.{{i+1}}.conv.weight key")
        raise ValueError(
            f"PASE import from {path}: {what} — the checkpoint's key "
            f"layout does not match the expected SincNet/WaveFe scheme. "
            f"Loaded {len(report['loaded'])} keys; skipped keys present "
            f"in the file: {report['skipped'][:20]}"
            f"{'...' if len(report['skipped']) > 20 else ''}. "
            "Pass strict=False to proceed with a partially (or fully) "
            "random-init encoder.")
    return params, bn_state, report


def absorb_legacy_bias(params, bn_state):
    """Migrate a pre-round-4 checkpoint tree whose conv blocks still
    carry a bias ``b``: fold it into the BN running mean (eval output
    ``conv + b`` normalized by ``mean`` equals ``conv`` normalized by
    ``mean - b`` exactly) and ZERO the leaf rather than deleting it, so
    a resumed optimizer state keeps a matching tree while the
    (bias-free) forward never reads it. No-op on current trees."""
    params = dict(params)
    bn_state = dict(bn_state)
    changed = False
    if any("b" in blk for blk in params.get("blocks", []))             or "b" in params.get("proj", {}):
        blocks, bstates = [], []
        for blk, st in zip(params["blocks"], bn_state["blocks"]):
            if "b" in blk:
                st = dict(st, mean=st["mean"] - blk["b"])
                blk = dict(blk, b=jnp.zeros_like(blk["b"]))
                changed = True
            blocks.append(blk)
            bstates.append(st)
        params["blocks"] = blocks
        bn_state["blocks"] = bstates
        if "b" in params["proj"]:
            bn_state["proj"] = dict(bn_state["proj"],
                                    mean=bn_state["proj"]["mean"]
                                    - params["proj"]["b"])
            params["proj"] = dict(params["proj"],
                                  b=jnp.zeros_like(params["proj"]["b"]))
            changed = True
    return params, bn_state, changed


def export_torch_pase(params, bn_state, path=None):
    """Export our encoder pytree as an upstream-style torch state_dict
    (the inverse key mapping of :func:`load_torch_pase`) — used by the
    round-trip import test and for handing adapted encoders back to
    torch-side tooling.  Returns the state_dict; writes it with
    ``torch.save`` when ``path`` is given."""
    import numpy as np
    import torch

    # a legacy (pre-round-4) tree still carries a nonzero conv bias the
    # bias-free forward ignores but the running mean compensates for —
    # fold it first so the exported (bias=0, mean) pair is the function
    # the checkpoint actually computes
    params, bn_state, _ = absorb_legacy_bias(params, bn_state)

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    sd = {
        # upstream SincConv_fast stores cutoffs as [F, 1]
        "blocks.0.conv.low_hz_": t(params["sinc"]["low_hz"]).reshape(-1, 1),
        "blocks.0.conv.band_hz_": t(params["sinc"]["band_hz"]).reshape(-1, 1),
        "blocks.0.norm.weight": t(params["bn_sinc"]["bn_scale"]),
        "blocks.0.norm.bias": t(params["bn_sinc"]["bn_bias"]),
        "blocks.0.norm.running_mean": t(bn_state["sinc"]["mean"]),
        "blocks.0.norm.running_var": t(bn_state["sinc"]["var"]),
        "blocks.0.act.weight": t(params["bn_sinc"]["alpha"]),
    }
    for i, (blk, st) in enumerate(zip(params["blocks"],
                                      bn_state["blocks"])):
        p = f"blocks.{i + 1}"
        sd[f"{p}.conv.weight"] = t(blk["w"])
        # upstream convs carry a bias parameter our blocks do not
        # (BN-degenerate, folded into running_mean on import); export an
        # explicit zero so torch's default strict load_state_dict finds
        # every key -- importing the export back folds the zero into the
        # mean, a no-op, keeping the round-trip exact
        sd[f"{p}.conv.bias"] = t(np.zeros(blk["w"].shape[0]))
        sd[f"{p}.norm.weight"] = t(blk["bn_scale"])
        sd[f"{p}.norm.bias"] = t(blk["bn_bias"])
        sd[f"{p}.norm.running_mean"] = t(st["mean"])
        sd[f"{p}.norm.running_var"] = t(st["var"])
        sd[f"{p}.act.weight"] = t(blk["alpha"])
    proj, pst = params["proj"], bn_state["proj"]
    sd["proj.conv.weight"] = t(proj["w"])
    sd["proj.conv.bias"] = t(np.zeros(proj["w"].shape[0]))
    sd["proj.norm.weight"] = t(proj["bn_scale"])
    sd["proj.norm.bias"] = t(proj["bn_bias"])
    sd["proj.norm.running_mean"] = t(pst["mean"])
    sd["proj.norm.running_var"] = t(pst["var"])
    sd["proj.act.weight"] = t(proj["alpha"])
    if path is not None:
        torch.save(sd, path)
    return sd
