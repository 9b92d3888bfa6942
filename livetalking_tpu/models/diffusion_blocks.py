"""Shared functional blocks for the Stable-Diffusion-family models that
MuseTalk uses (AutoencoderKL + UNet2DConditionModel, reference
avatars/musetalk/models/{vae.py,unet.py} which wrap diffusers).

Everything is NHWC / HWIO, model-dtype activations with f32 accumulation;
GroupNorm and softmax in f32. Param layout mirrors the diffusers
state_dict structure so conversion is mechanical.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return (x.astype(jnp.float32) * jax.nn.sigmoid(x.astype(jnp.float32))).astype(x.dtype)


def group_norm(p: Params, x: jnp.ndarray, groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """x (B, H, W, C); normalize per group over (H, W, C/groups).

    Stats are computed as per-CHANNEL spatial moments first and then
    combined exactly into group moments (sum and sum-of-squares are
    additive). The naive reshape-to-(B,H,W,G,C/G)-and-reduce form makes
    XLA materialize an f32 copy and run a strided 3-axis reduction; the
    channel-moment form lowers to a plain fused spatial reduce plus a
    (B, C)-sized epilogue — measured 74.7 -> 42.6 ms on the int8 MuseTalk
    VAE decode at B=16 on one v5e chip (GN stats were 45% of the step).
    """
    B, H, W, C = x.shape
    n = H * W * (C // groups)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))               # (B, C)
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2))   # (B, C)
    g1 = s1.reshape(B, groups, C // groups).sum(-1)
    g2 = s2.reshape(B, groups, C // groups).sum(-1)
    mu = g1 / n
    # one-pass E[x^2] - E[x]^2 can go slightly negative from f32
    # cancellation when |mean| >> std; clamp before rsqrt
    var = jnp.maximum(g2 / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.repeat(mu, C // groups, axis=-1)      # (B, C)
    inv_c = jnp.repeat(inv, C // groups, axis=-1)
    scale = inv_c * p["g"].astype(jnp.float32)[None]
    shift = p["b"].astype(jnp.float32)[None] - mu_c * scale
    y = xf * scale[:, None, None, :] + shift[:, None, None, :]
    return y.astype(x.dtype)


def conv(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 1) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def conv_asym(p: Params, x: jnp.ndarray, stride: int, pad) -> jnp.ndarray:
    """Conv with explicit per-side padding ((top,bottom),(left,right)) —
    the VAE downsampler pads (0,1,0,1)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if p.get("b") is not None:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def resnet_block(p: Params, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 eps: float = 1e-6) -> jnp.ndarray:
    """diffusers ResnetBlock2D: GN-silu-conv (+temb) GN-silu-conv + shortcut."""
    h = conv(p["conv1"], silu(group_norm(p["norm1"], x, eps=eps)))
    if temb is not None and "time_emb_proj" in p:
        t = linear(p["time_emb_proj"], silu(temb))  # (B, C)
        h = h + t[:, None, None, :].astype(h.dtype)
    h = conv(p["conv2"], silu(group_norm(p["norm2"], h, eps=eps)))
    if "conv_shortcut" in p:
        x = conv(p["conv_shortcut"], x, padding=0)
    return x + h


def spatial_attention(p: Params, x: jnp.ndarray, heads: int = 1, eps: float = 1e-6) -> jnp.ndarray:
    """VAE mid-block attention: GN -> single-head attention over H*W -> +res.
    Self-attention over <=1024 tokens takes the single-tile VMEM kernel on
    TPU (ops/pallas_attention) — XLA's einsum path is HBM-bound on the
    (B, heads, T, T) f32 score tensor."""
    from livetalking_tpu.ops.pallas_attention import vmem_attention

    B, H, W, C = x.shape
    h = group_norm(p["group_norm"], x, eps=eps).reshape(B, H * W, C)
    q, k, v = linear(p["q"], h), linear(p["k"], h), linear(p["v"], h)
    hd = C // heads

    def split(t):
        return t.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)

    o = vmem_attention(split(q), split(k), split(v), hd ** -0.5)
    o = o.transpose(0, 2, 1, 3).reshape(B, H * W, C)
    return x + linear(p["o"], o).reshape(B, H, W, C)


def _lin(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Per-site linear dispatch: int8 W8A8 when the tree holds quantized
    weights (see quantize_transformer), model-dtype otherwise. Trace-time
    branch — zero runtime cost, one program either way."""
    return linear_q(p, x) if "wq" in p else linear(p, x)


def attention(p: Params, x: jnp.ndarray, ctx: Optional[jnp.ndarray], heads: int) -> jnp.ndarray:
    """BasicTransformerBlock attention (to_q/k/v without bias, to_out with).
    x (B, T, C); ctx (B, S, D) for cross-attention, else self. Self-
    attention uses the single-tile VMEM kernel on TPU; cross-attention's
    score tensor is tiny (kv = 50 whisper tokens) so einsum stays."""
    from livetalking_tpu.ops.pallas_attention import attention_xla, vmem_attention

    B, T, C = x.shape
    kv_src = x if ctx is None else ctx
    q = _lin(p["q"], x)
    k = _lin(p["k"], kv_src)
    v = _lin(p["v"], kv_src)
    hd = C // heads

    def split(t):
        return t.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)

    core = vmem_attention if ctx is None else attention_xla
    o = core(split(q), split(k), split(v), hd ** -0.5)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, C)
    return _lin(p["o"], o)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def geglu_ff(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """diffusers FeedForward with GEGLU: proj to 2*inner, x * gelu(gate)."""
    h = _lin(p["proj"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(a.dtype)
    return _lin(p["out"], h)


def transformer_2d(p: Params, x: jnp.ndarray, ctx: jnp.ndarray, heads: int) -> jnp.ndarray:
    """diffusers Transformer2DModel with one BasicTransformerBlock and conv
    projections (SD1.x use_linear_projection=False)."""
    B, H, W, C = x.shape
    res = x

    h = group_norm(p["norm"], x, eps=1e-6)
    # quantize_transformer stores the 1x1 proj convs as int8 LINEARS
    # (identical GEMM, and the 2-D wq keeps them on dynamic activation
    # scales like every other linear site)
    if "wq" in p["proj_in"]:
        h = linear_q(p["proj_in"], h.reshape(B, H * W, C))
    else:
        h = conv(p["proj_in"], h, padding=0).reshape(B, H * W, C)

    tb = p["block"]
    h = h + attention(tb["attn1"], layer_norm(tb["norm1"], h), None, heads)
    h = h + attention(tb["attn2"], layer_norm(tb["norm2"], h), ctx, heads)
    h = h + geglu_ff(tb["ff"], layer_norm(tb["norm3"], h))

    if "wq" in p["proj_out"]:
        h = linear_q(p["proj_out"], h).reshape(B, H, W, C)
    else:
        h = conv(p["proj_out"], h.reshape(B, H, W, C), padding=0)
    return h + res


# ---------------------------------------------------------------------------
# W8A8 int8 conv path (shared by the VAE decoder and the latent U-Net;
# int8 MXU measured 372 vs 177 TFLOPs bf16 on v5e for the 3x3/512ch probe)
# ---------------------------------------------------------------------------

def quantize_conv(p: Params) -> Params:
    """Per-output-channel symmetric int8 weight quantization.

    Pure jnp (device-native): quantizing device-resident params never
    round-trips them to the host (the old host-numpy version pulled the
    full bf16 weight tree D2H, minutes behind a remote device link).
    Call whole-tree quantizes (sd_unet.quantize_unet /
    sd_vae.quantize_decoder) EAGERLY: per-conv ops hit cached kernels,
    whereas ``jax.jit`` of the whole tree builds one huge program that
    can hang a remote compiler (see CLAUDE.md)."""
    w = jnp.asarray(p["w"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale[None, None, None, :]),
                  -127, 127).astype(jnp.int8)
    return {"wq": wq, "ws": scale, "b": jnp.asarray(p["b"], jnp.float32)}


def conv_q(pq: Params, x: jnp.ndarray, stride: int = 1, padding: int = 1,
           residual: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """int8 conv; activation scale is a calibrated static scalar when
    present (``as`` — lets XLA fuse the quantize into the preceding
    elementwise ops), else computed dynamically (extra full pass).
    Accumulate int32 on the MXU, dequantize + bias in f32.

    The standalone Pallas implicit-GEMM kernel (ops/pallas_conv
    ``conv3x3_q``) is deliberately NOT routed here: although its GEMM
    alone beats XLA's conv lowering (~59% vs ~47% of the int8 MXU peak
    at the VAE-decoder 256px shapes, chained-loop A/B), inserting it
    into the decode graph LOSES end to end (57.3 vs 40.5 ms B=16
    decode) because the pallas call is a fusion barrier — XLA can no
    longer fold the GN/silu/quantize producers and dequant/residual
    consumers into the surrounding passes, and the extra HBM
    materializations outweigh the faster GEMM. The win needs the whole
    producer chain inside the kernel: see ``conv3x3_gnq`` and
    sd_vae's fused decoder path."""
    if "as" in pq:
        sx = pq["as"]
    else:
        sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, pq["wq"], (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * pq["ws"]) + pq["b"]
    y = y.astype(x.dtype)
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return y


def quantize_linear(p: Params) -> Params:
    """Per-output-channel symmetric int8 weight quantization for a linear
    site. The 2-D ``wq`` distinguishes linear from conv sites so the
    dummy-scale warm-up helper leaves linears on dynamic activation
    scales (matching the calibrated tree's program shape)."""
    w = jnp.asarray(p["w"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"wq": wq, "ws": scale,
            "b": None if p.get("b") is None
            else jnp.asarray(p["b"], jnp.float32)}


def linear_q(pq: Params, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 linear; int32 MXU accumulate, f32 dequant + bias. Activation
    scale is dynamic per-tensor (one abs-max reduce that XLA fuses with
    the producing layernorm pass) unless a calibrated static ``as`` is
    present — dynamic needs no calibration sites and is never less
    accurate than a static scale."""
    sx = pq.get("as")
    if sx is None:
        sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jnp.dot(xq, pq["wq"], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * pq["ws"])
    if pq.get("b") is not None:
        y = y + pq["b"]
    return y.astype(x.dtype)


def quantize_transformer(p: Params) -> Params:
    """int8 weights for the softmax-SAFE transformer matmuls: the
    proj_in/proj_out 1x1 convs, self-attention v/o, cross-attention o,
    and the GEGLU feed-forward pair. q/k stay model-dtype so attention
    SCORES are exact, and cross-attention's k/v stay model-dtype (their
    kv source is the 50-token whisper context — negligible FLOPs, and
    its statistics differ from the image stream). Measured on v5e B=16
    (tools/bench_unet_attn.py): C=320 T=1024 1.04x, C=640 T=256 1.91x,
    C=1280 T=64 1.38x per transformer block."""
    def q_proj(cp):  # 1x1 conv -> int8 linear (same GEMM, 2-D wq)
        return quantize_linear({"w": jnp.asarray(cp["w"])[0, 0],
                                "b": cp.get("b")})

    tb = p["block"]
    return {
        "norm": p["norm"],
        "proj_in": q_proj(p["proj_in"]),
        "proj_out": q_proj(p["proj_out"]),
        "block": {
            "norm1": tb["norm1"],
            "attn1": {"q": tb["attn1"]["q"], "k": tb["attn1"]["k"],
                      "v": quantize_linear(tb["attn1"]["v"]),
                      "o": quantize_linear(tb["attn1"]["o"])},
            "norm2": tb["norm2"],
            "attn2": {"q": tb["attn2"]["q"], "k": tb["attn2"]["k"],
                      "v": tb["attn2"]["v"],
                      "o": quantize_linear(tb["attn2"]["o"])},
            "norm3": tb["norm3"],
            "ff": {"proj": quantize_linear(tb["ff"]["proj"]),
                   "out": quantize_linear(tb["ff"]["out"])},
        },
    }


def upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def fold_up_kernel(w3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, I, O) -> (4, 4, I, O): conv3x3(nearest2x(x)) equals ONE
    lhs-dilated conv with this kernel (nearest duplication = zero-insert
    then a 2x2-ones depthwise conv; convolving that into the 3x3 gives
    the 1D fold [w0, w0+w1, w1+w2, w2] along each spatial axis, applied
    with lhs_dilation=2 and padding (2,2)). The 2x-upsampled tensor then
    never exists — the conv reads the quarter-size input directly."""
    import functools

    def fold(w, axis):
        take = functools.partial(jax.lax.index_in_dim, w, axis=axis,
                                 keepdims=True)
        return jnp.concatenate(
            [take(0), take(0) + take(1), take(1) + take(2), take(2)],
            axis=axis)
    return fold(fold(w3, 0), 1)


def quantize_conv_up(p: Params) -> Params:
    """quantize_conv for a 2x-upsampler conv: additionally stores the
    folded 4x4 kernel (int8, per-output-channel scales) for the
    lhs-dilated path ``conv_q_up``."""
    q = quantize_conv(p)
    k4 = fold_up_kernel(jnp.asarray(p["w"], jnp.float32))
    s4 = jnp.maximum(jnp.max(jnp.abs(k4), axis=(0, 1, 2)), 1e-8) / 127.0
    q["wq4"] = jnp.clip(jnp.round(k4 / s4[None, None, None, :]),
                        -127, 127).astype(jnp.int8)
    q["ws4"] = s4
    return q


def conv_q_up(pq: Params, x: jnp.ndarray) -> jnp.ndarray:
    """int8 2x-upsampler conv — drop-in for
    ``conv_q(pq, upsample_nearest2x(x))`` when the folded kernel is
    present (see quantize_conv_up): the int8 quantize pass reads/writes
    the QUARTER-size tensor and one lhs-dilated conv produces the
    (2H, 2W) output directly."""
    if "wq4" not in pq:
        return conv_q(pq, upsample_nearest2x(x))
    if "as" in pq:
        sx = pq["as"]
    else:
        sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, pq["wq4"], (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * pq["ws4"]) + pq["b"]
    return y.astype(x.dtype)


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """diffusers get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0 (SD1.x): [cos | sin]."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


# -- converter helpers ------------------------------------------------------

from livetalking_tpu.models.layers import to_numpy as _np  # noqa: E402


def t_conv(sd, prefix, dtype):
    return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0).astype(np.float32), dtype),
            "b": jnp.asarray(_np(sd[f"{prefix}.bias"]).astype(np.float32), dtype)}


def t_lin(sd, prefix, dtype, bias=True):
    p = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T.astype(np.float32), dtype)}
    p["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]).astype(np.float32), dtype) if bias and f"{prefix}.bias" in sd else None
    return p


def t_norm(sd, prefix, dtype):
    return {"g": jnp.asarray(_np(sd[f"{prefix}.weight"]).astype(np.float32), dtype),
            "b": jnp.asarray(_np(sd[f"{prefix}.bias"]).astype(np.float32), dtype)}


def t_resnet(sd, prefix, dtype, with_time=False):
    p = {
        "norm1": t_norm(sd, f"{prefix}.norm1", dtype),
        "conv1": t_conv(sd, f"{prefix}.conv1", dtype),
        "norm2": t_norm(sd, f"{prefix}.norm2", dtype),
        "conv2": t_conv(sd, f"{prefix}.conv2", dtype),
    }
    if with_time and f"{prefix}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = t_lin(sd, f"{prefix}.time_emb_proj", dtype)
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = t_conv(sd, f"{prefix}.conv_shortcut", dtype)
    return p


def t_spatial_attn(sd, prefix, dtype):
    """VAE mid attention; supports both modern (to_q/...) and legacy
    (query/key/value/proj_attn) diffusers layouts."""
    modern = f"{prefix}.to_q.weight" in sd
    names = ("to_q", "to_k", "to_v", "to_out.0") if modern else ("query", "key", "value", "proj_attn")
    return {
        "group_norm": t_norm(sd, f"{prefix}.group_norm", dtype),
        "q": t_lin(sd, f"{prefix}.{names[0]}", dtype),
        "k": t_lin(sd, f"{prefix}.{names[1]}", dtype),
        "v": t_lin(sd, f"{prefix}.{names[2]}", dtype),
        "o": t_lin(sd, f"{prefix}.{names[3]}", dtype),
    }


def t_transformer(sd, prefix, dtype):
    tb = f"{prefix}.transformer_blocks.0"
    return {
        "norm": t_norm(sd, f"{prefix}.norm", dtype),
        "proj_in": t_conv(sd, f"{prefix}.proj_in", dtype),
        "proj_out": t_conv(sd, f"{prefix}.proj_out", dtype),
        "block": {
            "norm1": t_norm(sd, f"{tb}.norm1", dtype),
            "attn1": {
                "q": t_lin(sd, f"{tb}.attn1.to_q", dtype, bias=False),
                "k": t_lin(sd, f"{tb}.attn1.to_k", dtype, bias=False),
                "v": t_lin(sd, f"{tb}.attn1.to_v", dtype, bias=False),
                "o": t_lin(sd, f"{tb}.attn1.to_out.0", dtype),
            },
            "norm2": t_norm(sd, f"{tb}.norm2", dtype),
            "attn2": {
                "q": t_lin(sd, f"{tb}.attn2.to_q", dtype, bias=False),
                "k": t_lin(sd, f"{tb}.attn2.to_k", dtype, bias=False),
                "v": t_lin(sd, f"{tb}.attn2.to_v", dtype, bias=False),
                "o": t_lin(sd, f"{tb}.attn2.to_out.0", dtype),
            },
            "norm3": t_norm(sd, f"{tb}.norm3", dtype),
            "ff": {
                "proj": t_lin(sd, f"{tb}.ff.net.0.proj", dtype),
                "out": t_lin(sd, f"{tb}.ff.net.2", dtype),
            },
        },
    }
