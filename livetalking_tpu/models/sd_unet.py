"""UNet2DConditionModel (SD1.x layout) in functional JAX — MuseTalk's
latent lip-sync network.

Architecture per the reference's diffusers instantiation
(reference avatars/musetalk/models/unet.py:30-47 with
models/musetalkV15/musetalk.json): in_channels 8 (masked||reference
latents), out_channels 4, block_out_channels (320, 640, 1280, 1280),
2 layers per block, cross_attention_dim 384 (whisper features), 8
attention heads, conv Transformer2D projections. MuseTalk runs a SINGLE
denoise step at t=0 (reference avatars/musetalk_avatar.py:146-149), so the
time embedding is a constant folded into the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models.diffusion_blocks import (
    Params,
    conv,
    group_norm,
    linear,
    resnet_block,
    silu,
    t_conv,
    t_lin,
    t_norm,
    t_resnet,
    t_transformer,
    timestep_embedding,
    transformer_2d,
    upsample_nearest2x,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_dim: int = 384
    heads: int = 8
    norm_eps: float = 1e-5

    @property
    def time_dim(self) -> int:
        return self.block_out[0] * 4


MUSETALK = UNetConfig()


def apply(params: Params, cfg: UNetConfig, x: jnp.ndarray, t: jnp.ndarray, ctx: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, in_ch) latents; t (B,) timesteps; ctx (B, S, cross_dim)
    -> (B, H, W, out_ch) predicted sample."""
    temb = timestep_embedding(t, cfg.block_out[0])
    temb = linear(params["time2"], silu(linear(params["time1"], temb.astype(x.dtype))))

    n_down = len(cfg.block_out)
    h = conv(params["conv_in"], x)
    skips: List[jnp.ndarray] = [h]
    for i, blk in enumerate(params["down"]):
        for j, rp in enumerate(blk["resnets"]):
            h = resnet_block(rp, h, temb, eps=cfg.norm_eps)
            if "attentions" in blk:
                h = transformer_2d(blk["attentions"][j], h, ctx, cfg.heads)
            skips.append(h)
        if "down" in blk:
            h = conv(blk["down"], h, stride=2)
            skips.append(h)

    mid = params["mid"]
    h = resnet_block(mid["r0"], h, temb, eps=cfg.norm_eps)
    h = transformer_2d(mid["attn"], h, ctx, cfg.heads)
    h = resnet_block(mid["r1"], h, temb, eps=cfg.norm_eps)

    for blk in params["up"]:
        for j, rp in enumerate(blk["resnets"]):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = resnet_block(rp, h, temb, eps=cfg.norm_eps)
            if "attentions" in blk:
                h = transformer_2d(blk["attentions"][j], h, ctx, cfg.heads)
        if "up" in blk:
            h = conv(blk["up"], upsample_nearest2x(h))

    h = silu(group_norm(params["norm_out"], h, eps=cfg.norm_eps))
    return conv(params["conv_out"], h).astype(jnp.float32)


# ---------------------------------------------------------------------------
# W8A8 int8 twin (convs quantized; attention/linears stay bf16 — the
# transformer blocks are a small share of the U-Net's FLOPs at 32x32
# latents and are accuracy-sensitive through softmax)
# ---------------------------------------------------------------------------

from livetalking_tpu.models.diffusion_blocks import (  # noqa: E402
    conv_q,
    quantize_conv,
    quantize_transformer,
)


def _q_resnet(rp: Params) -> Params:
    out = {"norm1": rp["norm1"], "norm2": rp["norm2"],
           "conv1": quantize_conv(rp["conv1"]),
           "conv2": quantize_conv(rp["conv2"])}
    if "time_emb_proj" in rp:
        out["time_emb_proj"] = rp["time_emb_proj"]
    if "conv_shortcut" in rp:
        out["conv_shortcut"] = quantize_conv(rp["conv_shortcut"])
    return out


def _q_block(blk: Params, attn_int8: bool) -> Params:
    b: Params = {"resnets": [_q_resnet(rp) for rp in blk["resnets"]]}
    if "attentions" in blk:
        b["attentions"] = ([quantize_transformer(a) for a in blk["attentions"]]
                           if attn_int8 else blk["attentions"])
    if "down" in blk:
        b["down"] = quantize_conv(blk["down"])
    if "up" in blk:
        b["up"] = quantize_conv(blk["up"])
    return b


def quantize_unet(params: Params, attn_int8: bool = True) -> Params:
    """One-time conversion of the U-Net convs to int8 (norms and time
    embedding stay model-dtype). ``attn_int8`` additionally quantizes
    the softmax-safe transformer matmuls (diffusion_blocks
    ``quantize_transformer`` — q/k and cross-attn k/v stay model-dtype;
    linear activation scales are dynamic, so calibrate_unet needs no new
    sites). Per-layer wins on v5e B=16 reach 1.91x (C=640 blocks,
    tools/bench_unet_attn.py); at the FULL fused step the win is
    ~1.5 ms together with mid_int8 (60.2 -> 58.7 ms,
    tools/bench_int8_step_ab.py)."""
    return {
        "conv_in": quantize_conv(params["conv_in"]),
        "time1": params["time1"], "time2": params["time2"],
        "down": [_q_block(b, attn_int8) for b in params["down"]],
        "mid": {"r0": _q_resnet(params["mid"]["r0"]),
                "attn": (quantize_transformer(params["mid"]["attn"])
                         if attn_int8 else params["mid"]["attn"]),
                "r1": _q_resnet(params["mid"]["r1"])},
        "up": [_q_block(b, attn_int8) for b in params["up"]],
        "norm_out": params["norm_out"],
        "conv_out": quantize_conv(params["conv_out"]),
    }


def _walk_int8(pq: Params, cfg: UNetConfig, x, t, ctx, full=None, rec=None):
    """Shared graph for apply_int8 (full=None) and calibrate_unet.

    Calibration mode (``full`` = the full-precision tree, ``rec`` = an
    output list) runs the exact full-precision graph while appending each
    conv site's activation-scale scalar to ``rec`` in traversal order
    (pure graph — jittable; see calibrate_unet)."""
    cal = full is not None
    pf = full if cal else pq

    def cq(site_q, site_f, xx, stride=1, padding=1):
        if cal:
            rec.append(jnp.max(jnp.abs(xx.astype(jnp.float32))) * 1.25
                       / 127.0 + 1e-8)
            return conv(site_f, xx, stride=stride, padding=padding)
        return conv_q(site_q, xx, stride=stride, padding=padding)

    def resnet(rq, rf, h_in):
        h = cq(rq["conv1"], rf["conv1"],
               silu(group_norm(rf["norm1"], h_in, eps=cfg.norm_eps)))
        if "time_emb_proj" in rf:
            tproj = linear(rf["time_emb_proj"], silu(temb))
            h = h + tproj[:, None, None, :].astype(h.dtype)
        h = cq(rq["conv2"], rf["conv2"],
               silu(group_norm(rf["norm2"], h, eps=cfg.norm_eps)))
        sc = h_in
        if "conv_shortcut" in rf:
            sc = cq(rq["conv_shortcut"], rf["conv_shortcut"], h_in, padding=0)
        return sc + h

    temb = timestep_embedding(t, cfg.block_out[0])
    temb = linear(pf["time2"], silu(linear(pf["time1"], temb.astype(x.dtype))))

    h = cq(pq["conv_in"], pf["conv_in"], x)
    skips: List[jnp.ndarray] = [h]
    for bq, bf in zip(pq["down"], pf["down"]):
        for j, (rq, rf) in enumerate(zip(bq["resnets"], bf["resnets"])):
            h = resnet(rq, rf, h)
            if "attentions" in bf:
                h = transformer_2d(bf["attentions"][j], h, ctx, cfg.heads)
            skips.append(h)
        if "down" in bf:
            h = cq(bq["down"], bf["down"], h, stride=2)
            skips.append(h)

    h = resnet(pq["mid"]["r0"], pf["mid"]["r0"], h)
    h = transformer_2d(pf["mid"]["attn"], h, ctx, cfg.heads)
    h = resnet(pq["mid"]["r1"], pf["mid"]["r1"], h)

    for bq, bf in zip(pq["up"], pf["up"]):
        for j, (rq, rf) in enumerate(zip(bq["resnets"], bf["resnets"])):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = resnet(rq, rf, h)
            if "attentions" in bf:
                h = transformer_2d(bf["attentions"][j], h, ctx, cfg.heads)
        if "up" in bf:
            h = cq(bq["up"], bf["up"], upsample_nearest2x(h))

    a_out = silu(group_norm(pf["norm_out"], h, eps=cfg.norm_eps))
    return cq(pq["conv_out"], pf["conv_out"], a_out).astype(jnp.float32)


def apply_int8(params_q: Params, cfg: UNetConfig, x: jnp.ndarray,
               t: jnp.ndarray, ctx: jnp.ndarray) -> jnp.ndarray:
    """int8 twin of ``apply``; params from quantize_unet (+ calibrate)."""
    return _walk_int8(params_q, cfg, x, t, ctx)


def calibrate_unet(params: Params, params_q: Params, cfg: UNetConfig,
                   x: jnp.ndarray, t: jnp.ndarray, ctx: jnp.ndarray) -> Params:
    """One-time static activation-scale calibration on representative
    inputs: one jitted full-precision walk emitting every site's abs-max
    scale, one host fetch, then a structural assignment pass (mirrors
    sd_vae.calibrate_decoder; a per-site-blocking eager walk costs a
    device round-trip per conv)."""
    def walk(pf, xx, tt, cc):
        rec: List[jnp.ndarray] = []
        _walk_int8(params_q, cfg, xx, tt, cc, full=pf, rec=rec)
        return rec

    scales = iter(jax.device_get(jax.jit(walk)(params, x, t, ctx)))

    def nxt():
        return jnp.asarray(float(next(scales)), jnp.float32)

    def assign_resnet(rq):
        rq["conv1"]["as"] = nxt()
        rq["conv2"]["as"] = nxt()
        if "conv_shortcut" in rq:
            rq["conv_shortcut"]["as"] = nxt()

    # mirrors _walk_int8's cq call order exactly
    params_q["conv_in"]["as"] = nxt()
    for bq in params_q["down"]:
        for rq in bq["resnets"]:
            assign_resnet(rq)
        if "down" in bq:
            bq["down"]["as"] = nxt()
    assign_resnet(params_q["mid"]["r0"])
    assign_resnet(params_q["mid"]["r1"])
    for bq in params_q["up"]:
        for rq in bq["resnets"]:
            assign_resnet(rq)
        if "up" in bq:
            bq["up"]["as"] = nxt()
    params_q["conv_out"]["as"] = nxt()
    leftover = sum(1 for _ in scales)
    assert leftover == 0, f"scale walk/assign mismatch: {leftover} extra"
    return params_q


# ---------------------------------------------------------------------------
# channel bookkeeping shared by init and conversion
# ---------------------------------------------------------------------------

def _down_plan(cfg: UNetConfig):
    """Per down block: (in_ch of each resnet, out_ch, has_attn, has_down)."""
    plan = []
    cin = cfg.block_out[0]
    for i, cout in enumerate(cfg.block_out):
        res_ins = [cin if j == 0 else cout for j in range(cfg.layers_per_block)]
        plan.append({
            "res_ins": res_ins, "out": cout,
            "attn": i < len(cfg.block_out) - 1,
            "down": i < len(cfg.block_out) - 1,
        })
        cin = cout
    return plan


def _skip_channels(cfg: UNetConfig):
    skips = [cfg.block_out[0]]
    for blk in _down_plan(cfg):
        skips += [blk["out"]] * cfg.layers_per_block
        if blk["down"]:
            skips.append(blk["out"])
    return skips


def _up_plan(cfg: UNetConfig):
    skips = _skip_channels(cfg)
    rev = list(reversed(cfg.block_out))
    plan = []
    prev = rev[0]
    for i, cout in enumerate(rev):
        res_ins = []
        for _ in range(cfg.layers_per_block + 1):
            res_ins.append(prev + skips.pop())
            prev = cout
        plan.append({
            "res_ins": res_ins, "out": cout,
            "attn": i > 0,
            "up": i < len(rev) - 1,
        })
    return plan


# ---------------------------------------------------------------------------
# random init
# ---------------------------------------------------------------------------

def _rc(key, kh, kw, ci, co, dtype, scale=0.3):
    w = jax.random.normal(key, (kh, kw, ci, co), jnp.float32) * (scale / np.sqrt(kh * kw * ci))
    return {"w": w.astype(dtype), "b": jnp.zeros((co,), dtype)}


def _rl(key, i, o, dtype, bias=True, scale=0.3):
    p = {"w": (jax.random.normal(key, (i, o), jnp.float32) * (scale / np.sqrt(i))).astype(dtype)}
    p["b"] = jnp.zeros((o,), dtype) if bias else None
    return p


def _rn(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _r_resnet(keys, ci, co, tdim, dtype):
    p = {"norm1": _rn(ci, dtype), "conv1": _rc(next(keys), 3, 3, ci, co, dtype),
         "time_emb_proj": _rl(next(keys), tdim, co, dtype),
         "norm2": _rn(co, dtype), "conv2": _rc(next(keys), 3, 3, co, co, dtype)}
    if ci != co:
        p["conv_shortcut"] = _rc(next(keys), 1, 1, ci, co, dtype)
    return p


def _r_transformer(keys, c, cross, dtype):
    inner = 4 * c

    def attn(kv_dim):
        return {"q": _rl(next(keys), c, c, dtype, bias=False),
                "k": _rl(next(keys), kv_dim, c, dtype, bias=False),
                "v": _rl(next(keys), kv_dim, c, dtype, bias=False),
                "o": _rl(next(keys), c, c, dtype)}

    return {
        "norm": _rn(c, dtype),
        "proj_in": _rc(next(keys), 1, 1, c, c, dtype),
        "proj_out": _rc(next(keys), 1, 1, c, c, dtype),
        "block": {
            "norm1": _rn(c, dtype), "attn1": attn(c),
            "norm2": _rn(c, dtype), "attn2": attn(cross),
            "norm3": _rn(c, dtype),
            "ff": {"proj": _rl(next(keys), c, 2 * inner, dtype),
                   "out": _rl(next(keys), inner, c, dtype)},
        },
    }


def init_params(key: jax.Array, cfg: UNetConfig = MUSETALK, dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, 2048))
    tdim = cfg.time_dim

    down = []
    for blk in _down_plan(cfg):
        b = {"resnets": [_r_resnet(keys, ci, blk["out"], tdim, dtype) for ci in blk["res_ins"]]}
        if blk["attn"]:
            b["attentions"] = [_r_transformer(keys, blk["out"], cfg.cross_dim, dtype)
                               for _ in blk["res_ins"]]
        if blk["down"]:
            b["down"] = _rc(next(keys), 3, 3, blk["out"], blk["out"], dtype)
        down.append(b)

    up = []
    for blk in _up_plan(cfg):
        b = {"resnets": [_r_resnet(keys, ci, blk["out"], tdim, dtype) for ci in blk["res_ins"]]}
        if blk["attn"]:
            b["attentions"] = [_r_transformer(keys, blk["out"], cfg.cross_dim, dtype)
                               for _ in blk["res_ins"]]
        if blk["up"]:
            b["up"] = _rc(next(keys), 3, 3, blk["out"], blk["out"], dtype)
        up.append(b)

    mc = cfg.block_out[-1]
    return {
        "conv_in": _rc(next(keys), 3, 3, cfg.in_channels, cfg.block_out[0], dtype),
        "time1": _rl(next(keys), cfg.block_out[0], tdim, dtype),
        "time2": _rl(next(keys), tdim, tdim, dtype),
        "down": down,
        "mid": {"r0": _r_resnet(keys, mc, mc, tdim, dtype),
                "attn": _r_transformer(keys, mc, cfg.cross_dim, dtype),
                "r1": _r_resnet(keys, mc, mc, tdim, dtype)},
        "up": up,
        "norm_out": _rn(cfg.block_out[0], dtype),
        "conv_out": _rc(next(keys), 3, 3, cfg.block_out[0], cfg.out_channels, dtype),
    }


# ---------------------------------------------------------------------------
# diffusers checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd: Dict[str, Any], cfg: UNetConfig = MUSETALK, dtype=jnp.bfloat16) -> Params:
    down = []
    for i, blk in enumerate(_down_plan(cfg)):
        p = f"down_blocks.{i}"
        b = {"resnets": [t_resnet(sd, f"{p}.resnets.{j}", dtype, with_time=True)
                         for j in range(cfg.layers_per_block)]}
        if blk["attn"]:
            b["attentions"] = [t_transformer(sd, f"{p}.attentions.{j}", dtype)
                               for j in range(cfg.layers_per_block)]
        if blk["down"]:
            b["down"] = t_conv(sd, f"{p}.downsamplers.0.conv", dtype)
        down.append(b)

    up = []
    for i, blk in enumerate(_up_plan(cfg)):
        p = f"up_blocks.{i}"
        b = {"resnets": [t_resnet(sd, f"{p}.resnets.{j}", dtype, with_time=True)
                         for j in range(cfg.layers_per_block + 1)]}
        if blk["attn"]:
            b["attentions"] = [t_transformer(sd, f"{p}.attentions.{j}", dtype)
                               for j in range(cfg.layers_per_block + 1)]
        if blk["up"]:
            b["up"] = t_conv(sd, f"{p}.upsamplers.0.conv", dtype)
        up.append(b)

    return {
        "conv_in": t_conv(sd, "conv_in", dtype),
        "time1": t_lin(sd, "time_embedding.linear_1", dtype),
        "time2": t_lin(sd, "time_embedding.linear_2", dtype),
        "down": down,
        "mid": {"r0": t_resnet(sd, "mid_block.resnets.0", dtype, with_time=True),
                "attn": t_transformer(sd, "mid_block.attentions.0", dtype),
                "r1": t_resnet(sd, "mid_block.resnets.1", dtype, with_time=True)},
        "up": up,
        "norm_out": t_norm(sd, "conv_norm_out", dtype),
        "conv_out": t_conv(sd, "conv_out", dtype),
    }


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params) if x is not None)
