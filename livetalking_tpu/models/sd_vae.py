"""AutoencoderKL (sd-vae-ft-mse) in functional JAX — MuseTalk's image codec.

Architecture per diffusers' AutoencoderKL as instantiated by the reference
(reference avatars/musetalk/models/vae.py:24 ``AutoencoderKL.from_pretrained
("./models/sd-vae-ft-mse")``): block_out_channels (128, 256, 512, 512),
2 resnets per encoder block / 3 per decoder block, single-head mid
attention, 4 latent channels, scaling factor 0.18215.

Runtime contract (reference vae.py:76-122): ``encode`` maps RGB in [-1, 1]
(256 px) to latents * 0.18215 (deterministic mode of the posterior — the
reference calls ``.sample()``; we use the mean, which is the variance-free
choice for a fixed avatar cache); ``decode`` maps latents back to RGB in
[0, 1].
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models.diffusion_blocks import (
    Params,
    conv,
    conv_asym,
    group_norm,
    resnet_block,
    silu,
    spatial_attention,
    t_conv,
    t_norm,
    t_resnet,
    t_spatial_attn,
    upsample_nearest2x,
)

SCALING_FACTOR = 0.18215
BLOCK_CH: Tuple[int, ...] = (128, 256, 512, 512)
LATENT_CH = 4


def encode(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 256, 256, 3) in [-1, 1] -> (B, 32, 32, 4) scaled latents (mean)."""
    h = conv(params["enc_conv_in"], x)
    for i, blk in enumerate(params["enc_down"]):
        for rp in blk["resnets"]:
            h = resnet_block(rp, h)
        if "down" in blk:
            h = conv_asym(blk["down"], h, 2, ((0, 1), (0, 1)))
    h = resnet_block(params["enc_mid"]["r0"], h)
    h = spatial_attention(params["enc_mid"]["attn"], h)
    h = resnet_block(params["enc_mid"]["r1"], h)
    h = conv(params["enc_conv_out"], silu(group_norm(params["enc_norm_out"], h)))
    moments = conv(params["quant_conv"], h, padding=0)  # (B, 32, 32, 8)
    mean = moments[..., :LATENT_CH]
    return mean * SCALING_FACTOR


def decode(params: Params, z: jnp.ndarray, *,
           dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, 32, 32, 4) scaled latents -> (B, 256, 256, 3) RGB in [0, 1].

    bf16 activations by default (see ``decode_int8`` for why); pass
    ``dtype=jnp.float32`` for full-precision runs (converter parity
    tests).  The final clip returns f32 either way."""
    z = (z / SCALING_FACTOR).astype(dtype)
    h = conv(params["post_quant_conv"], z, padding=0)
    h = conv(params["dec_conv_in"], h)
    h = resnet_block(params["dec_mid"]["r0"], h)
    h = spatial_attention(params["dec_mid"]["attn"], h)
    h = resnet_block(params["dec_mid"]["r1"], h)
    for blk in params["dec_up"]:
        for rp in blk["resnets"]:
            h = resnet_block(rp, h)
        if "up" in blk:
            h = conv(blk["up"], upsample_nearest2x(h))
    h = conv(params["dec_conv_out"], silu(group_norm(params["dec_norm_out"], h)))
    return jnp.clip(h.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
# int8 decoder (W8A8 dynamic) — the VAE decode is the MuseTalk hot spot
# (~70% of step time, compute-bound at ~1 TFLOP/image); int8 MXU runs
# 2.8x faster than bf16 on v5e (measured 3x3/256ch/128px conv probe)
# ---------------------------------------------------------------------------


# int8 primitives live in diffusion_blocks (shared with the U-Net path)
from livetalking_tpu.models.diffusion_blocks import (  # noqa: E402
    conv_q as _conv_q,
    conv_q_up as _conv_q_up,
    quantize_conv as _quantize_conv,
    quantize_conv_up as _quantize_conv_up,
)


def _up_conv_q(pq: Params, h: jnp.ndarray) -> jnp.ndarray:
    """XLA upsampler conv. Default routing is shape-aware, from the
    B=16 v5e A/B (tools/bench_upsampler.py, r3): the lhs-dilated
    folded-kernel form (conv_q_up — the 2x tensor never materializes,
    the quantize pass reads the quarter-size input) wins at the two big
    decoder shapes (64->128px 512ch: 4.16 vs 4.73 ms; 128->256px 256ch:
    5.79 vs 6.46 ms) and loses at 32->64px 512ch (1.43 vs 1.25 ms), so
    inputs >= 64px dilate and smaller ones upsample-then-conv (XLA
    fuses the quantize into the upsample write). LT_DILATED_UP=0/1
    forces one path everywhere (A/B hook)."""
    mode = os.environ.get("LT_DILATED_UP", "auto")
    if mode == "1" or (mode == "auto" and h.shape[1] >= 64
                       and "wq4" in pq):
        return _conv_q_up(pq, h)
    return _conv_q(pq, upsample_nearest2x(h))


def _resnet_block_q(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    h = _conv_q(p["conv1"], silu(group_norm(p["norm1"], x, eps=eps)))
    a = silu(group_norm(p["norm2"], h, eps=eps))
    if "conv_shortcut" in p:
        cs = p["conv_shortcut"]
        # r5 default: the 1x1 skip is BANDWIDTH-bound, not MXU-bound —
        # the bf16 conv beats the int8 path outright because the
        # quantize pass costs a full extra read (v5e B=16 256px
        # 256->128: bf16 2.0 ms vs int8 3.1, VAE_EPILOGUE_r05.json)
        x = (_conv_q(cs, x, padding=0) if "wq" in cs
             else conv(cs, x, padding=0))
    return _conv_q(p["conv2"], a, residual=x)


def quantize_decoder(params: Params, mid_int8: bool = True,
                     bf16_epilogue: Optional[bool] = None) -> Params:
    """One-time conversion of the decoder convs to int8 (norms, attention,
    and the tiny latent-side convs stay bf16/f32). ``mid_int8``
    additionally quantizes the two mid-block resnets (4x conv3x3
    512->512 @ 32px — measured 39.5 -> 38.6 ms B=16 decode on v5e,
    tools/bench_vae_mid.py); the mid ATTENTION and dec_conv_in (cin=4,
    MXU-hostile) stay bf16 either way.

    ``bf16_epilogue`` (default $LT_BF16_EPILOGUE, on): keep the
    bandwidth-bound sites — the 1x1 resnet shortcuts and the final
    128->3 conv — in bf16. Their int8 versions run far below the
    bandwidth roofline (11-26%, VAE_MFU_r04.json) because the dynamic
    quantize pass re-reads the activation; measured standalone on v5e
    B=16 (tools/bench_vae_epilogue.py, VAE_EPILOGUE_r05.json): 256px
    256->128 skip 1.998 ms bf16 vs 3.102 int8; final 128->3 conv
    1.78 bf16 vs 2.561 int8. Quantizing them also costs quality for
    NEGATIVE speed."""
    if bf16_epilogue is None:
        bf16_epilogue = os.environ.get("LT_BF16_EPILOGUE", "1") == "1"

    def q_resnet(rp):
        out = {"norm1": rp["norm1"], "norm2": rp["norm2"],
               "conv1": _quantize_conv(rp["conv1"]),
               "conv2": _quantize_conv(rp["conv2"])}
        if "conv_shortcut" in rp:
            out["conv_shortcut"] = (dict(rp["conv_shortcut"])
                                    if bf16_epilogue
                                    else _quantize_conv(rp["conv_shortcut"]))
        return out

    mid = params["dec_mid"]
    if mid_int8:
        mid = {"r0": q_resnet(mid["r0"]), "attn": mid["attn"],
               "r1": q_resnet(mid["r1"])}
    q: Params = {
        "post_quant_conv": params["post_quant_conv"],
        "dec_conv_in": params["dec_conv_in"],
        "dec_mid": mid,
        "dec_norm_out": params["dec_norm_out"],
        "dec_conv_out": (dict(params["dec_conv_out"]) if bf16_epilogue
                         else _quantize_conv(params["dec_conv_out"])),
        "dec_up": [],
    }
    for blk in params["dec_up"]:
        qblk: Params = {"resnets": [q_resnet(rp) for rp in blk["resnets"]]}
        if "up" in blk:
            qblk["up"] = _quantize_conv_up(blk["up"])
        q["dec_up"].append(qblk)
    return q


def _decode_scale_walk(params: Params, z: jnp.ndarray, headroom: float,
                       mid_int8: bool = False):
    """Full-precision decode traversal that emits one activation-scale
    scalar per quantized conv site (mid resnets first when ``mid_int8``;
    then resnet order conv1, conv2, shortcut; the block upsampler;
    dec_conv_out last). Pure graph — jitted by calibrate_decoder so the
    whole calibration is ONE compiled program and ONE host fetch instead
    of a blocking device sync per site."""
    rec = []

    def sof(x):
        rec.append(jnp.max(jnp.abs(x.astype(jnp.float32))) * headroom / 127.0
                   + 1e-8)

    def cal_resnet(rp, x, eps=1e-6):
        a1 = silu(group_norm(rp["norm1"], x, eps=eps))
        sof(a1)
        h = conv(rp["conv1"], a1)
        a2 = silu(group_norm(rp["norm2"], h, eps=eps))
        sof(a2)
        h = conv(rp["conv2"], a2)
        if "conv_shortcut" in rp:
            sof(x)
            x = conv(rp["conv_shortcut"], x, padding=0)
        return x + h

    mid_resnet = cal_resnet if mid_int8 else resnet_block
    zz = z / SCALING_FACTOR
    h = conv(params["post_quant_conv"], zz, padding=0)
    h = conv(params["dec_conv_in"], h)
    h = mid_resnet(params["dec_mid"]["r0"], h)
    h = spatial_attention(params["dec_mid"]["attn"], h)
    h = mid_resnet(params["dec_mid"]["r1"], h)
    for blk in params["dec_up"]:
        for rp in blk["resnets"]:
            h = cal_resnet(rp, h)
        if "up" in blk:
            up = upsample_nearest2x(h)
            sof(up)
            h = conv(blk["up"], up)
    a_out = silu(group_norm(params["dec_norm_out"], h))
    sof(a_out)
    return rec


def calibrate_decoder(params: Params, params_q: Params, z: jnp.ndarray,
                      headroom: float = 1.25) -> Params:
    """One-time activation-scale calibration: run the full-precision
    decoder on representative latents and store per-site static scales
    (abs-max * headroom / 127) into the quantized tree. One jitted
    program + one fetch (the per-site-blocking eager walk took minutes
    behind a high-RTT device link and seconds of session-startup time
    on direct-attached chips)."""
    mid_int8 = "wq" in params_q["dec_mid"]["r0"]["conv1"]
    walk = jax.jit(_decode_scale_walk, static_argnums=(2, 3))
    scales = iter(jax.device_get(walk(params, z, headroom, mid_int8)))

    def nxt():
        return jnp.asarray(float(next(scales)), jnp.float32)

    # assignment mirrors _decode_scale_walk's traversal order exactly;
    # bf16-epilogue sites (no "wq") consume their walk slot but store
    # nothing — they run full precision
    def maybe(site):
        s = nxt()
        if "wq" in site:
            site["as"] = s

    if mid_int8:
        for rq in (params_q["dec_mid"]["r0"], params_q["dec_mid"]["r1"]):
            rq["conv1"]["as"] = nxt()
            rq["conv2"]["as"] = nxt()
            if "conv_shortcut" in rq:
                maybe(rq["conv_shortcut"])
    for blk in params_q["dec_up"]:
        for rq in blk["resnets"]:
            rq["conv1"]["as"] = nxt()
            rq["conv2"]["as"] = nxt()
            if "conv_shortcut" in rq:
                maybe(rq["conv_shortcut"])
        if "up" in blk:
            blk["up"]["as"] = nxt()
    maybe(params_q["dec_conv_out"])
    leftover = sum(1 for _ in scales)
    assert leftover == 0, f"scale walk/assign mismatch: {leftover} extra"
    return params_q


def _gn_scale_shift(gn_p: Params, s1: jnp.ndarray, s2: jnp.ndarray,
                    hw: int, groups: int = 32, eps: float = 1e-6):
    """GroupNorm per-(batch, channel) affine scale/shift from per-channel
    spatial moments (s1 = sum_hw x, s2 = sum_hw x^2, both (B, C) f32) —
    the same exact group combination ``group_norm`` performs, minus the
    stats pass over the tensor (the fused conv kernel's epilogue already
    accumulated the moments)."""
    B, C = s1.shape
    n = hw * (C // groups)
    g1 = s1.reshape(B, groups, C // groups).sum(-1)
    g2 = s2.reshape(B, groups, C // groups).sum(-1)
    mu = g1 / n
    var = jnp.maximum(g2 / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.repeat(mu, C // groups, axis=-1)
    inv_c = jnp.repeat(inv, C // groups, axis=-1)
    scale = inv_c * gn_p["g"].astype(jnp.float32)[None]
    shift = gn_p["b"].astype(jnp.float32)[None] - mu_c * scale
    return scale, shift


def _fused_resnet_q(rp: Params, h: jnp.ndarray, s1: jnp.ndarray,
                    s2: jnp.ndarray, interpret: bool = False):
    """Quantized resnet block as two fused pallas convs: each kernel
    consumes the GN affine derived from the PREVIOUS kernel's moment
    epilogue and emits its own moments. The residual (identity or the
    XLA 1x1 int8 shortcut) rides the second conv's epilogue."""
    from livetalking_tpu.ops.pallas_conv import conv3x3_gnq

    B, H, W, C = h.shape
    sc1, sh1 = _gn_scale_shift(rp["norm1"], s1, s2, H * W)
    c1 = rp["conv1"]
    h1, t1, t2 = conv3x3_gnq(h, sc1, sh1, c1["as"], c1["wq"],
                             c1["as"] * c1["ws"], c1["b"],
                             interpret=interpret)
    sc2, sh2 = _gn_scale_shift(rp["norm2"], t1, t2, H * W)
    res = h
    if "conv_shortcut" in rp:
        cs = rp["conv_shortcut"]
        res = (_conv_q(cs, h, padding=0) if "wq" in cs
               else conv(cs, h, padding=0))
    c2 = rp["conv2"]
    return conv3x3_gnq(h1, sc2, sh2, c2["as"], c2["wq"],
                       c2["as"] * c2["ws"], c2["b"], residual=res,
                       interpret=interpret)


def _fused_chain_fits(params_q: Params, h_px: int, min_h: int = 64) -> bool:
    """True when EVERY conv in the up-block chain after the first
    upsample maps onto the fused kernel (the moment chain cannot mix
    kernel and XLA GroupNorms mid-stream without reintroducing stats
    passes)."""
    from livetalking_tpu.ops.pallas_conv import conv3x3_gnq_fits

    blocks = params_q["dec_up"]
    if not all("as" in blk["resnets"][0]["conv1"] for blk in blocks):
        return False  # uncalibrated tree (quantize-only benches)
    px = h_px
    cin = blocks[0]["resnets"][-1]["conv2"]["wq"].shape[-1]
    for bi, blk in enumerate(blocks):
        if bi == 0:
            if "up" not in blk:
                return False
            px *= 2
            if not conv3x3_gnq_fits(px, px, cin, cin, min_h, upsample=True):
                return False
            continue
        for rp in blk["resnets"]:
            cout = rp["conv1"]["wq"].shape[-1]
            if not (conv3x3_gnq_fits(px, px, cin, cout, min_h)
                    and conv3x3_gnq_fits(px, px, cout, cout, min_h)):
                return False
            cin = cout
        if "up" in blk:
            px *= 2
            if not conv3x3_gnq_fits(px, px, cin, cin, min_h, upsample=True):
                return False
    return True


def _block_resnets_fit(blk: Params, h_shape, min_h: int = 64) -> bool:
    """True when every resnet conv in this up-block maps onto the fused
    kernel at ``h``'s resolution — the per-block guard for the restart
    path (the default chain start already skips block-0 resnets because
    they run below the kernel's minimum resolution; a restart must not
    route them back in unvalidated)."""
    from livetalking_tpu.ops.pallas_conv import conv3x3_gnq_fits

    _, H, W, cin = h_shape
    for rp in blk["resnets"]:
        cout = rp["conv1"]["wq"].shape[-1]
        if not (conv3x3_gnq_fits(H, W, cin, cout, min_h)
                and conv3x3_gnq_fits(H, W, cout, cout, min_h)):
            return False
        cin = cout
    return True


def _out_conv(co: Params, a: jnp.ndarray) -> jnp.ndarray:
    """Final 128->3 conv: bf16 under the r5 epilogue default (the int8
    version ran at 11% of roofline — the 3-channel output relayout
    dominates and the quantize pass only adds a read;
    tools/bench_vae_epilogue.py: 1.78 ms bf16 vs 2.561 int8 B=16)."""
    return _conv_q(co, a) if "wq" in co else conv(co, a)


def _decode_int8_fused(params_q: Params, h: jnp.ndarray,
                      interpret: bool = False,
                      from_block: Optional[int] = None,
                      skip_up: Optional[set] = None,
                      restart_block: Optional[int] = None,
                      min_h: int = 64) -> jnp.ndarray:
    """Up-block chain on the fused pallas kernel. ``h`` is the mid-block
    output; see ``decode_int8`` for the gate.

    Routing knobs (mixed pallas/XLA placement — the per-conv A/B showed
    the fused RESNETS beat XLA while the big upsampler convs lose, so
    the profitable placement is a sub-chain, not all-or-nothing):

    - ``from_block`` ($LT_FUSED_VAE_FROM, default 0): up-blocks with
      index < from_block keep their UPSAMPLER conv on XLA,
      unconditionally — hitting one drops the chain exactly like
      ``skip_up`` (so from_block composes with ``restart_block``; a
      restarted chain does NOT override it).
    - ``skip_up`` ($LT_FUSED_VAE_SKIP_UP, comma list): block indices
      whose upsampler conv stays on XLA. Hitting one DROPS the chain
      (the trailing moments are discarded — they were free epilogue
      output, so stopping costs nothing).
    - ``restart_block`` ($LT_FUSED_VAE_RESTART, default off): when the
      chain is inactive at the start of block >= this index AND the
      block's resnet convs all pass ``conv3x3_gnq_fits`` at the current
      resolution, restart it with ONE explicit XLA stats pass over
      ``h`` (a single read) so the block's resnets run fused; unfit
      blocks fall through to the XLA ``_resnet_block_q`` path."""
    from livetalking_tpu.ops.pallas_conv import conv3x3_gnq

    if from_block is None:
        from_block = int(os.environ.get("LT_FUSED_VAE_FROM", "0"))
    if skip_up is None:
        raw = os.environ.get("LT_FUSED_VAE_SKIP_UP", "")
        skip_up = {int(t) for t in raw.split(",") if t.strip()}
    if restart_block is None:
        raw = os.environ.get("LT_FUSED_VAE_RESTART", "")
        restart_block = int(raw) if raw.strip() else None
    blocks = params_q["dec_up"]
    s1 = s2 = None
    for bi, blk in enumerate(blocks):
        if (s1 is None and restart_block is not None
                and bi >= restart_block
                and _block_resnets_fit(blk, h.shape, min_h=min_h)):
            hf = h.astype(jnp.float32)
            s1 = hf.sum(axis=(1, 2))
            s2 = (hf * hf).sum(axis=(1, 2))
        if s1 is None:                      # XLA until the chain starts
            for rp in blk["resnets"]:
                h = _resnet_block_q(rp, h)
        else:
            for rp in blk["resnets"]:
                h, s1, s2 = _fused_resnet_q(rp, h, s1, s2,
                                            interpret=interpret)
        if "up" in blk:
            if bi in skip_up or bi < from_block:
                h = _up_conv_q(blk["up"], h)
                s1 = s2 = None              # chain drops (free)
                continue
            up = blk["up"]
            # nearest-2x rides the kernel prologue: DMA the small tensor
            h, s1, s2 = conv3x3_gnq(h, None, None,
                                    up["as"], up["wq"], up["as"] * up["ws"],
                                    up["b"], upsample=True,
                                    interpret=interpret)
    if s1 is None:
        h = _out_conv(params_q["dec_conv_out"],
                      silu(group_norm(params_q["dec_norm_out"], h)))
        return jnp.clip(h.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    sc, sh = _gn_scale_shift(params_q["dec_norm_out"], s1, s2,
                             h.shape[1] * h.shape[2])
    a = h.astype(jnp.float32) * sc[:, None, None, :] + sh[:, None, None, :]
    a = (a * jax.nn.sigmoid(a)).astype(h.dtype)
    h = _out_conv(params_q["dec_conv_out"], a)
    return jnp.clip(h.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


def decode_int8(params_q: Params, z: jnp.ndarray) -> jnp.ndarray:
    """int8 twin of ``decode``; same contract, quantized up-blocks.

    Activations run bf16 between ops regardless of the latent dtype
    (f32 would double the HBM traffic of every between-op pass; the
    serving path already feeds bf16 U-Net outputs).

    LT_FUSED_VAE=1 (TPU, calibrated tree) routes the up-block chain
    onto the fused GroupNorm+SiLU+quantize+conv pallas kernel
    (ops/pallas_conv ``conv3x3_gnq``): one kernel per conv, GroupNorm
    statistics ride the previous kernel's epilogue, so the between-conv
    elementwise / quantize / stats HBM passes disappear. OPT-IN for
    now: measured B=16 v5e the fused chain ran 50.2 ms vs 40.5 pure
    XLA — the fused RESNETS are at or slightly better than XLA parity
    (256px 128ch: 2.96 vs 3.18 ms marginal), but the UPSAMPLER convs
    lose big (256px 256ch: 12.7 vs 7.1 ms; the kernel re-read the 4x
    upsampled bf16 tensor with halo amplification while XLA folds the
    int8 quantize into the upsample write). The in-VMEM nearest-2x
    prologue (DMA the quarter-size pre-upsample tensor, duplicate rows/
    lanes in VMEM) recovered part of that — full fused decode 46.6 ms —
    still short of pure XLA, so the gate stays opt-in."""
    z = (z / SCALING_FACTOR).astype(jnp.bfloat16)
    h = conv(params_q["post_quant_conv"], z, padding=0)
    h = conv(params_q["dec_conv_in"], h)
    mid = params_q["dec_mid"]
    mid_resnet = (_resnet_block_q if "wq" in mid["r0"]["conv1"]
                  else resnet_block)
    h = mid_resnet(mid["r0"], h)
    h = spatial_attention(mid["attn"], h)
    h = mid_resnet(mid["r1"], h)
    if (jax.default_backend() == "tpu"
            and os.environ.get("LT_FUSED_VAE", "0") == "1"
            and _fused_chain_fits(params_q, h.shape[1])):
        return _decode_int8_fused(params_q, h)
    for blk in params_q["dec_up"]:
        for rp in blk["resnets"]:
            h = _resnet_block_q(rp, h)
        if "up" in blk:
            h = _up_conv_q(blk["up"], h)
    h = _out_conv(params_q["dec_conv_out"],
                  silu(group_norm(params_q["dec_norm_out"], h)))
    return jnp.clip(h.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
# init (random, for tests/benches without weights)
# ---------------------------------------------------------------------------

def _rand_conv(key, kh, kw, cin, cout, dtype):
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * (0.3 / np.sqrt(kh * kw * cin))
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def _rand_norm(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _rand_resnet(keys, cin, cout, dtype):
    p = {
        "norm1": _rand_norm(cin, dtype),
        "conv1": _rand_conv(next(keys), 3, 3, cin, cout, dtype),
        "norm2": _rand_norm(cout, dtype),
        "conv2": _rand_conv(next(keys), 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _rand_conv(next(keys), 1, 1, cin, cout, dtype)
    return p


def _rand_lin(key, i, o, dtype):
    return {"w": (jax.random.normal(key, (i, o), jnp.float32) * (0.3 / np.sqrt(i))).astype(dtype),
            "b": jnp.zeros((o,), dtype)}


def _rand_attn(keys, c, dtype):
    return {
        "group_norm": _rand_norm(c, dtype),
        "q": _rand_lin(next(keys), c, c, dtype),
        "k": _rand_lin(next(keys), c, c, dtype),
        "v": _rand_lin(next(keys), c, c, dtype),
        "o": _rand_lin(next(keys), c, c, dtype),
    }


def init_params(key: jax.Array, dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, 256))
    C = BLOCK_CH

    enc_down: List[Dict] = []
    cin = C[0]
    for i, cout in enumerate(C):
        blk = {"resnets": [_rand_resnet(keys, cin if j == 0 else cout, cout, dtype) for j in range(2)]}
        if i < len(C) - 1:
            blk["down"] = _rand_conv(next(keys), 3, 3, cout, cout, dtype)
        enc_down.append(blk)
        cin = cout

    dec_up: List[Dict] = []
    rev = list(reversed(C))  # (512, 512, 256, 128)
    cin = rev[0]
    for i, cout in enumerate(rev):
        blk = {"resnets": [_rand_resnet(keys, cin if j == 0 else cout, cout, dtype) for j in range(3)]}
        if i < len(rev) - 1:
            blk["up"] = _rand_conv(next(keys), 3, 3, cout, cout, dtype)
        dec_up.append(blk)
        cin = cout

    mid_c = C[-1]
    return {
        "enc_conv_in": _rand_conv(next(keys), 3, 3, 3, C[0], dtype),
        "enc_down": enc_down,
        "enc_mid": {"r0": _rand_resnet(keys, mid_c, mid_c, dtype),
                    "attn": _rand_attn(keys, mid_c, dtype),
                    "r1": _rand_resnet(keys, mid_c, mid_c, dtype)},
        "enc_norm_out": _rand_norm(mid_c, dtype),
        "enc_conv_out": _rand_conv(next(keys), 3, 3, mid_c, 2 * LATENT_CH, dtype),
        "quant_conv": _rand_conv(next(keys), 1, 1, 2 * LATENT_CH, 2 * LATENT_CH, dtype),
        "post_quant_conv": _rand_conv(next(keys), 1, 1, LATENT_CH, LATENT_CH, dtype),
        "dec_conv_in": _rand_conv(next(keys), 3, 3, LATENT_CH, mid_c, dtype),
        "dec_mid": {"r0": _rand_resnet(keys, mid_c, mid_c, dtype),
                    "attn": _rand_attn(keys, mid_c, dtype),
                    "r1": _rand_resnet(keys, mid_c, mid_c, dtype)},
        "dec_up": dec_up,
        "dec_norm_out": _rand_norm(C[0], dtype),
        "dec_conv_out": _rand_conv(next(keys), 3, 3, C[0], 3, dtype),
    }


# ---------------------------------------------------------------------------
# diffusers checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd: Dict[str, Any], dtype=jnp.bfloat16) -> Params:
    enc_down = []
    for i in range(len(BLOCK_CH)):
        blk = {"resnets": [t_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", dtype) for j in range(2)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["down"] = t_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype)
        enc_down.append(blk)

    dec_up = []
    for i in range(len(BLOCK_CH)):
        blk = {"resnets": [t_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", dtype) for j in range(3)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["up"] = t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", dtype)
        dec_up.append(blk)

    def mid(prefix):
        return {"r0": t_resnet(sd, f"{prefix}.resnets.0", dtype),
                "attn": t_spatial_attn(sd, f"{prefix}.attentions.0", dtype),
                "r1": t_resnet(sd, f"{prefix}.resnets.1", dtype)}

    return {
        "enc_conv_in": t_conv(sd, "encoder.conv_in", dtype),
        "enc_down": enc_down,
        "enc_mid": mid("encoder.mid_block"),
        "enc_norm_out": t_norm(sd, "encoder.conv_norm_out", dtype),
        "enc_conv_out": t_conv(sd, "encoder.conv_out", dtype),
        "quant_conv": t_conv(sd, "quant_conv", dtype),
        "post_quant_conv": t_conv(sd, "post_quant_conv", dtype),
        "dec_conv_in": t_conv(sd, "decoder.conv_in", dtype),
        "dec_mid": mid("decoder.mid_block"),
        "dec_up": dec_up,
        "dec_norm_out": t_norm(sd, "decoder.conv_norm_out", dtype),
        "dec_conv_out": t_conv(sd, "decoder.conv_out", dtype),
    }
