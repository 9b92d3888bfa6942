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
