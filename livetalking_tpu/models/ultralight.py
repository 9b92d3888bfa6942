"""Ultralight digital-human U-Net (160 px, MobileNetV2-style), TPU-native.

Architecture parity with the reference per-avatar network
(reference avatars/ultralight/unet.py:168-215 ``Model(6, 'hubert')``):
inverted-residual encoder 6ch->512ch over 160->10 px, a HuBERT audio branch
(16ch 32x32 -> 512ch 10x10), concat + fuse at the bottleneck, bilinear
align-corners up path with skip concats, 1x1 sigmoid head.

TPU-first: NHWC/HWIO, BatchNorm folded at load, bfloat16 on the MXU,
bilinear upsampling expressed as interpolation matmuls
(models/layers.py ``upsample2x_align_corners``), and the whole batch step
(crop-cycle gather, interior-rectangle mask, forward, uint8) fused into
one jitted function.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models.layers import (
    ConvSpec,
    apply_conv_layer,
    fold_bn,
    init_conv_params,
    torch_conv_to_hwio,
    upsample2x_align_corners,
)

C = ConvSpec
CH = (32, 64, 128, 256, 512)
IMG_SIZE = 160


def _ir_specs(inp: int, oup: int, stride: int, expand: int = 2) -> List[ConvSpec]:
    """InvertedResidual: pw-expand -> dw 3x3 -> pw-project (all BN-folded;
    reference avatars/ultralight/unet.py:7-36)."""
    hidden = inp * expand
    return [
        C(inp, hidden, 1, 1, 0, act="relu"),
        C(hidden, hidden, 3, stride, 1, act="relu", groups=hidden),
        C(hidden, oup, 1, 1, 0, act=None),
    ]


# (name, kind, args) — kind: 'ir' (specs, residual) or 'conv' (spec)
def _double(inp: int, oup: int, stride: int) -> List[Tuple[str, List[ConvSpec], bool]]:
    return [("ir0", _ir_specs(inp, oup, stride), False), ("ir1", _ir_specs(oup, oup, 1), True)]


ARCH: Dict[str, Any] = {
    "inc": [("ir0", _ir_specs(6, CH[0], 1), False)],
    "down1": _double(CH[0], CH[1], 2),
    "down2": _double(CH[1], CH[2], 2),
    "down3": _double(CH[2], CH[3], 2),
    "down4": _double(CH[3], CH[4], 2),
    # audio branch (AudioConvHubert, reference unet.py:132-166)
    "a_conv1": [("ir0", _ir_specs(16, CH[1], 1), False)],
    "a_conv2": [("ir0", _ir_specs(CH[1], CH[2], 1), False)],
    "a_conv3": [("c", C(CH[2], CH[3], 3, 2, 1, act="relu"), None)],
    "a_conv4": [("ir0", _ir_specs(CH[3], CH[3], 1), True)],
    "a_conv5": [("c", C(CH[3], CH[4], 3, 2, 3, act="relu"), None)],
    "a_conv6": [("ir0", _ir_specs(CH[4], CH[4], 1), True)],
    "a_conv7": [("ir0", _ir_specs(CH[4], CH[4], 1), True)],
    "fuse0": _double(CH[4] * 2, CH[4], 1),
    "fuse1": _double(CH[4], CH[3], 1),
    "up1": _double(CH[4], CH[3] // 2, 1),
    "up2": _double(CH[3], CH[2] // 2, 1),
    "up3": _double(CH[2], CH[1] // 2, 1),
    "up4": _double(CH[1], CH[0], 1),
    "outc": [("c", C(CH[0], 3, 1, 1, 0, bn=False, act=None), None)],
}

Params = Dict[str, Any]


def init_params(key: jax.Array, dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, 256))
    params: Params = {}
    for name, units in ARCH.items():
        blocks = []
        for kind, specs, _res in units:
            if kind == "c":
                blocks.append([init_conv_params(next(keys), specs, dtype)])
            else:
                blocks.append([init_conv_params(next(keys), s, dtype) for s in specs])
        params[name] = blocks
    return params


def _apply_unit(params: List, units, x: jnp.ndarray) -> jnp.ndarray:
    for p_block, (kind, specs, res) in zip(params, units):
        if kind == "c":
            x = apply_conv_layer(p_block[0], specs, x)
        else:
            y = x
            for p, s in zip(p_block, specs):
                y = apply_conv_layer(p, s, y)
            x = (x + y) if res else y
    return x


def apply(params: Params, face: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
    """face (B, 160, 160, 6) in [0,1]; audio (B, 32, 32, 16) ->
    (B, 160, 160, 3) in [0,1] (float32)."""

    def run(name, x):
        return _apply_unit(params[name], ARCH[name], x)

    x1 = run("inc", face)      # 160, 32
    x2 = run("down1", x1)      # 80, 64
    x3 = run("down2", x2)      # 40, 128
    x4 = run("down3", x3)      # 20, 256
    x5 = run("down4", x4)      # 10, 512

    a = audio
    for name in ("a_conv1", "a_conv2", "a_conv3", "a_conv4", "a_conv5", "a_conv6", "a_conv7"):
        a = run(name, a)       # (B, 10, 10, 512)

    x5 = jnp.concatenate([x5, a], axis=-1)
    x5 = run("fuse1", run("fuse0", x5))  # (B, 10, 10, 256)

    def up(name, lo, skip):
        u = upsample2x_align_corners(lo)
        return run(name, jnp.concatenate([u, skip], axis=-1))

    x = up("up1", x5, x4)      # 20, 128
    x = up("up2", x, x3)       # 40, 64
    x = up("up3", x, x2)       # 80, 32
    x = up("up4", x, x1)       # 160, 32
    out = run("outc", x)
    return jax.nn.sigmoid(out.astype(jnp.float32))


# ---------------------------------------------------------------------------
# torch checkpoint conversion (reference per-avatar ultralight.pth)
# ---------------------------------------------------------------------------

from livetalking_tpu.models.layers import to_numpy as _np  # noqa: E402


def _conv_bn(sd, conv_key: str, bn_key: str, dtype, has_bias: bool = False):
    w = torch_conv_to_hwio(_np(sd[f"{conv_key}.weight"]).astype(np.float32))
    b = _np(sd[f"{conv_key}.bias"]).astype(np.float32) if has_bias and f"{conv_key}.bias" in sd else None
    w, b = fold_bn(
        w, b,
        _np(sd[f"{bn_key}.weight"]).astype(np.float32),
        _np(sd[f"{bn_key}.bias"]).astype(np.float32),
        _np(sd[f"{bn_key}.running_mean"]).astype(np.float32),
        _np(sd[f"{bn_key}.running_var"]).astype(np.float32),
    )
    return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}


def _convert_ir(sd, prefix: str, dtype) -> List[Dict]:
    """IR module: .conv Sequential indices 0/1 (pw+bn), 3/4 (dw+bn), 6/7 (pw+bn)."""
    return [
        _conv_bn(sd, f"{prefix}.conv.0", f"{prefix}.conv.1", dtype),
        _conv_bn(sd, f"{prefix}.conv.3", f"{prefix}.conv.4", dtype),
        _conv_bn(sd, f"{prefix}.conv.6", f"{prefix}.conv.7", dtype),
    ]


# ARCH name -> reference state_dict prefix(es)
_PREFIXES = {
    "inc": ["inc.inconv.0"],
    "down1": ["down1.maxpool_conv.0.double_conv.0", "down1.maxpool_conv.0.double_conv.1"],
    "down2": ["down2.maxpool_conv.0.double_conv.0", "down2.maxpool_conv.0.double_conv.1"],
    "down3": ["down3.maxpool_conv.0.double_conv.0", "down3.maxpool_conv.0.double_conv.1"],
    "down4": ["down4.maxpool_conv.0.double_conv.0", "down4.maxpool_conv.0.double_conv.1"],
    "a_conv1": ["audio_model.conv1"],
    "a_conv2": ["audio_model.conv2"],
    "a_conv4": ["audio_model.conv4"],
    "a_conv6": ["audio_model.conv6"],
    "a_conv7": ["audio_model.conv7"],
    "fuse0": ["fuse_conv.0.double_conv.0", "fuse_conv.0.double_conv.1"],
    "fuse1": ["fuse_conv.1.double_conv.0", "fuse_conv.1.double_conv.1"],
    "up1": ["up1.conv.double_conv.0", "up1.conv.double_conv.1"],
    "up2": ["up2.conv.double_conv.0", "up2.conv.double_conv.1"],
    "up3": ["up3.conv.double_conv.0", "up3.conv.double_conv.1"],
    "up4": ["up4.conv.double_conv.0", "up4.conv.double_conv.1"],
}


def convert_torch_state_dict(sd: Dict[str, Any], dtype=jnp.bfloat16) -> Params:
    sd = {k: _np(v) for k, v in sd.items()}
    params: Params = {}
    for name, prefixes in _PREFIXES.items():
        params[name] = [_convert_ir(sd, p, dtype) for p in prefixes]
    # plain conv+bn audio layers (bias=True on the conv)
    params["a_conv3"] = [[_conv_bn(sd, "audio_model.conv3", "audio_model.bn3", dtype, has_bias=True)]]
    params["a_conv5"] = [[_conv_bn(sd, "audio_model.conv5", "audio_model.bn5", dtype, has_bias=True)]]
    params["outc"] = [[{
        "w": jnp.asarray(torch_conv_to_hwio(sd["outc.conv.weight"].astype(np.float32)), dtype),
        "b": jnp.asarray(sd["outc.conv.bias"].astype(np.float32), dtype),
    }]]
    return params


def load_torch_checkpoint(path: str, dtype=jnp.bfloat16) -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_state_dict(sd, dtype)


# ---------------------------------------------------------------------------
# fused per-batch step
# ---------------------------------------------------------------------------

def make_infer_fn(batch_size: int, dtype=jnp.bfloat16):
    """(params, crop_cycle_u8 (N, 168, 168, 3), idxs (B,), audio (B,16,32,32))
    -> (B, 160, 160, 3) uint8.

    Fuses the reference host-side prep (avatars/ultralight_avatar.py:143-171):
    crop [4:164, 4:164] of the 168 px face crop, black interior rectangle
    (5,5)-(155,150) on the masked copy, concat(real, masked), /255.
    """
    S = IMG_SIZE

    @jax.jit
    def step(params: Params, crop_cycle: jnp.ndarray, idxs: jnp.ndarray, audio: jnp.ndarray):
        crops = jnp.take(crop_cycle, idxs, axis=0)  # (B, 168, 168, 3) uint8
        real = crops[:, 4 : 4 + S, 4 : 4 + S, :].astype(dtype) / jnp.asarray(255.0, dtype)
        # cv2.rectangle((5,5,150,145), filled) hits the Rect (x,y,w,h)
        # overload: fills x in [5,154], y in [5,149] (verified vs cv2)
        ys = jnp.arange(S)[None, :, None, None]
        xs = jnp.arange(S)[None, None, :, None]
        inside = (ys >= 5) & (ys < 150) & (xs >= 5) & (xs < 155)
        masked = jnp.where(inside, jnp.asarray(0.0, dtype), real)
        x = jnp.concatenate([real, masked], axis=-1)  # (B, 160, 160, 6)
        a = jnp.transpose(audio, (0, 2, 3, 1)).astype(dtype)  # (B, 32, 32, 16)
        out = apply(params, x, a)
        return jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

    return step


def make_grouped_infer_fn(n_sessions: int, batch_size: int,
                          dtype=jnp.bfloat16):
    """Cross-session super-batch step for PER-AVATAR weights.

    Unlike wav2lip/musetalk (one shared net), the reference keeps one
    U-Net per avatar (reference avatars/ultralight_avatar.py:58-81), so a
    naive shared scheduler can't coalesce ultralight sessions. Here the
    registered avatars' parameter trees are STACKED on a leading axis and
    each session-block of the super-batch selects its avatar's weights by
    slot id; ``vmap`` over the session axis turns the whole thing into
    one device program (XLA lowers the vmapped convs to grouped convs —
    smaller per-group MXU tiles than the shared-weight families, but one
    launch for all sessions instead of k scheduler round-trips).

        (stacked_params [A-leading pytree], crop_cycle (N, 168, 168, 3) u8,
         idxs (n*B,) i32 global frame indices, slots (n,) i32 avatar slot
         per session-block, audio (n*B, 16, 32, 32) f32)
            -> (n*B, 160, 160, 3) uint8
    """
    S = IMG_SIZE
    n, B = n_sessions, batch_size

    @jax.jit
    def step(stacked: Params, crop_cycle: jnp.ndarray, idxs: jnp.ndarray,
             slots: jnp.ndarray, audio: jnp.ndarray):
        crops = jnp.take(crop_cycle, idxs, axis=0)  # (n*B, 168, 168, 3)
        real = crops[:, 4 : 4 + S, 4 : 4 + S, :].astype(dtype) / jnp.asarray(255.0, dtype)
        ys = jnp.arange(S)[None, :, None, None]
        xs = jnp.arange(S)[None, None, :, None]
        inside = (ys >= 5) & (ys < 150) & (xs >= 5) & (xs < 155)
        masked = jnp.where(inside, jnp.asarray(0.0, dtype), real)
        x = jnp.concatenate([real, masked], axis=-1)  # (n*B, 160, 160, 6)
        a = jnp.transpose(audio, (0, 2, 3, 1)).astype(dtype)
        psel = jax.tree.map(lambda p: jnp.take(p, slots, axis=0), stacked)
        out = jax.vmap(apply)(psel, x.reshape(n, B, S, S, 6),
                              a.reshape(n, B, 32, 32, 16))
        out = out.reshape(n * B, S, S, 3)
        return jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

    return step


def stack_params(trees: List[Params]) -> Params:
    """Stack per-avatar parameter trees on a new leading axis (device)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def append_stacked(stacked: Params, tree: Params) -> Params:
    """Append one avatar's tree to an existing stacked pytree."""
    return jax.tree.map(
        lambda s, x: jnp.concatenate([s, x[None]], axis=0), stacked, tree)


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
