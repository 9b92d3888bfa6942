"""PFLD-GhostOne landmark regressor in functional JAX — the ultralight
genavatar's 110-point landmark stage (reference
avatars/ultralight/face_detect_utils/pfld_mobileone.py:12-134 and
get_landmark.py:70-114).

The torch reference is a MobileOne/GhostOne re-parameterizable network:
at train time every conv is a multi-branch (N kxk conv+BN branches +
1x1 scale branch + BN skip) block. The shipped checkpoint
(``checkpoint_epoch_335.pth.tar``, key ``pfld_backbone``) stores the
train-time branches; :func:`convert_torch_state_dict` folds them into
single convs at load (RepVGG-style: fold each conv+BN, pad the 1x1
scale kernel, add an identity kernel for the skip BN, sum), so the JAX
graph is the plain inference-mode network — conv + bias + ReLU all the
way, MXU-friendly, one jitted program.

Output = 220 offsets + the training mean face (user-supplied
``mean_face.txt`` next to the checkpoint, reference get_landmark.py:74),
scaled by the crop size — landmark indices 1/31/52 drive the ultralight
crop box (reference genavatar.py:76-82).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

WIDTH = 0.5
INPUT_SIZE = 192
N_LANDMARKS = 110
N_BRANCHES = 6  # reference pfld_mobileone.py:17 num_conv_branches


def _c(x: int) -> int:
    return int(x * WIDTH)


# (name, kind, args) in forward order; ghost bottleneck args =
# (cin, hidden, cout, stride)
_GHOSTS = [
    ("conv3_1", _c(64), _c(96), _c(80), 2),
    ("conv3_2", _c(80), _c(120), _c(80), 1),
    ("conv3_3", _c(80), _c(120), _c(80), 1),
    ("conv4_1", _c(80), _c(200), _c(96), 2),
    ("conv4_2", _c(96), _c(240), _c(96), 1),
    ("conv4_3", _c(96), _c(240), _c(96), 1),
    ("conv5_1", _c(96), _c(336), _c(144), 2),
    ("conv5_2", _c(144), _c(504), _c(144), 1),
    ("conv5_3", _c(144), _c(504), _c(144), 1),
    ("conv5_4", _c(144), _c(504), _c(144), 1),
    ("conv6", _c(144), _c(216), _c(16), 1),
]


def _conv(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0,
          groups: int = 1, relu: bool = False) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    y = (y + p["b"].astype(jnp.float32)).astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _ghost_module(p: Params, x: jnp.ndarray, relu: bool) -> jnp.ndarray:
    """GhostOneModule: 1x1 primary + depthwise 3x3 cheap, concat
    (reference base_module.py:88-120)."""
    x1 = _conv(p["primary"], x, relu=relu)
    x2 = _conv(p["cheap"], x1, padding=1, groups=x1.shape[-1], relu=relu)
    return jnp.concatenate([x1, x2], axis=-1)


def _ghost_bottleneck(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """GhostOneBottleneck: ghost(relu) -> [dw s2 linear] -> ghost(linear),
    NO residual (reference base_module.py:123-152)."""
    h = _ghost_module(p["ghost1"], x, relu=True)
    if stride == 2:
        h = _conv(p["dw"], h, stride=2, padding=1, groups=h.shape[-1])
    return _ghost_module(p["ghost2"], h, relu=False)


def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, 192, 192, 3) BGR in [0,1] -> (B, 220) landmark offsets
    (reference pfld_mobileone.py:99-134 forward; multi-scale global-pool
    concat -> 1x1 conv head)."""
    h = _conv(params["conv1"], x, stride=2, padding=1, relu=True)
    h = _conv(params["conv2"], h, padding=1, groups=h.shape[-1], relu=True)
    x1 = jnp.mean(h, axis=(1, 2), keepdims=True)  # AvgPool2d(size//2)

    for name, cin, hid, cout, stride in _GHOSTS[:3]:
        h = _ghost_bottleneck(params[name], h, stride)
    x2 = jnp.mean(h, axis=(1, 2), keepdims=True)

    for name, cin, hid, cout, stride in _GHOSTS[3:6]:
        h = _ghost_bottleneck(params[name], h, stride)
    x3 = jnp.mean(h, axis=(1, 2), keepdims=True)

    for name, cin, hid, cout, stride in _GHOSTS[6:10]:
        h = _ghost_bottleneck(params[name], h, stride)
    x4 = jnp.mean(h, axis=(1, 2), keepdims=True)

    h = _ghost_bottleneck(params["conv6"], h, 1)
    h = _conv(params["conv7"], h, padding=1, relu=True)
    x5 = _conv(params["conv8"], h, relu=True)  # 12x12 VALID conv -> 1x1

    ms = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)  # (B,1,1,256)
    out = _conv(params["conv_out"], ms)  # (B,1,1,220)
    return out.reshape(out.shape[0], -1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# conversion: fold the MobileOne train-time branches into plain convs
# ---------------------------------------------------------------------------


def _np_(v):
    from livetalking_tpu.models.layers import to_numpy

    return to_numpy(v).astype(np.float32)


def _fold_conv_bn(w, bn_g, bn_b, bn_m, bn_v, eps=1e-5):
    """(out, in/g, kh, kw) torch conv + BN stats -> folded (w, b)."""
    s = bn_g / np.sqrt(bn_v + eps)
    return w * s[:, None, None, None], bn_b - bn_m * s


def _pad_center(w, k):
    """Pad a (out, in/g, 1, 1) kernel to kxk at the center."""
    if w.shape[-1] == k:
        return w
    out = np.zeros(w.shape[:2] + (k, k), np.float32)
    out[:, :, k // 2, k // 2] = w[:, :, 0, 0]
    return out


def _identity_kernel(cin, cout, groups, k):
    """Identity conv kernel for the skip-BN branch (cin == cout)."""
    w = np.zeros((cout, cin // groups, k, k), np.float32)
    per = cin // groups
    for i in range(cout):
        w[i, i % per, k // 2, k // 2] = 1.0
    return w


def _fold_mobileone(sd, prefix, cin, cout, k, groups, dtype):
    """Fold a train-mode MobileOneBlock (reference base_module.py:193-298:
    num_conv_branches conv+BN branches + optional 1x1 scale branch +
    optional skip BN) into one conv.

    The reference's ``_conv_bn`` uses NAMED children (keys
    ``rbr_conv.{i}.conv.weight`` / ``rbr_conv.{i}.bn.*``,
    ``rbr_scale.conv/.bn`` — base_module.py:402-419); the indexed
    ``.0/.1`` Sequential layout some PFLD forks ship is accepted too.
    (r3: the named layout was initially missed — every branch lookup
    silently failed and the fold degenerated to the skip BN alone, 16 dB
    vs the reference net. Caught by tools/validate_weights.py; missing
    branches now raise.)"""
    W = np.zeros((cout, cin // groups, k, k), np.float32)
    B = np.zeros((cout,), np.float32)

    def bn(p):
        return (_np_(sd[f"{p}.weight"]), _np_(sd[f"{p}.bias"]),
                _np_(sd[f"{p}.running_mean"]), _np_(sd[f"{p}.running_var"]))

    def conv_bn_keys(b):
        if f"{b}.conv.weight" in sd:        # reference named layout
            return f"{b}.conv.weight", f"{b}.bn"
        if f"{b}.0.weight" in sd:           # indexed Sequential layout
            return f"{b}.0.weight", f"{b}.1"
        return None

    folded = 0
    for i in range(N_BRANCHES):
        kk = conv_bn_keys(f"{prefix}.rbr_conv.{i}")
        if kk is None:
            break
        w, bias = _fold_conv_bn(_np_(sd[kk[0]]), *bn(kk[1]))
        W += w
        B += bias
        folded += 1
    kk = conv_bn_keys(f"{prefix}.rbr_scale")
    if kk is not None:  # 1x1 scale branch (k > 1)
        w, bias = _fold_conv_bn(_np_(sd[kk[0]]), *bn(kk[1]))
        W += _pad_center(w, k)
        B += bias
    if f"{prefix}.rbr_skip.weight" in sd:  # skip BN (cin == cout, s == 1)
        w, bias = _fold_conv_bn(_identity_kernel(cin, cout, groups, k),
                                *bn(f"{prefix}.rbr_skip"))
        W += w
        B += bias
    if f"{prefix}.reparam_conv.weight" in sd:  # inference-mode checkpoint
        W = _np_(sd[f"{prefix}.reparam_conv.weight"])
        B = _np_(sd[f"{prefix}.reparam_conv.bias"])
    elif folded == 0:
        raise KeyError(
            f"{prefix}: no rbr_conv branches or reparam_conv in state "
            "dict (unrecognized MobileOne key layout)")
    return {"w": jnp.asarray(W.transpose(2, 3, 1, 0), dtype),
            "b": jnp.asarray(B, dtype)}


def _fold_conv_block(sd, prefix, dtype, has_bn=True):
    """Conv_Block = conv(no bias) + optional BN (base_module.py:12-17)."""
    w = _np_(sd[f"{prefix}.0.weight"])
    if has_bn:
        w, b = _fold_conv_bn(
            w, _np_(sd[f"{prefix}.1.weight"]), _np_(sd[f"{prefix}.1.bias"]),
            _np_(sd[f"{prefix}.1.running_mean"]),
            _np_(sd[f"{prefix}.1.running_var"]))
    else:
        b = np.zeros((w.shape[0],), np.float32)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
            "b": jnp.asarray(b, dtype)}


def _ghost_params(sd, prefix, cin, hid, cout, stride, dtype):
    half_h, half_o = math.ceil(hid / 2), math.ceil(cout / 2)
    g1 = f"{prefix}.ghost_conv.0"
    g2 = f"{prefix}.ghost_conv.2"
    p = {
        "ghost1": {
            "primary": _fold_mobileone(sd, f"{g1}.primary_conv",
                                       cin, half_h, 1, 1, dtype),
            "cheap": _fold_mobileone(sd, f"{g1}.cheap_operation",
                                     half_h, half_h, 3, half_h, dtype),
        },
        "ghost2": {
            "primary": _fold_mobileone(sd, f"{g2}.primary_conv",
                                       2 * half_h, half_o, 1, 1, dtype),
            "cheap": _fold_mobileone(sd, f"{g2}.cheap_operation",
                                     half_o, half_o, 3, half_o, dtype),
        },
    }
    if stride == 2:
        p["dw"] = _fold_mobileone(sd, f"{prefix}.ghost_conv.1",
                                  2 * half_h, 2 * half_h, 3, 2 * half_h, dtype)
    return p


def convert_torch_state_dict(sd: Dict[str, Any], dtype=jnp.float32) -> Params:
    """``checkpoint_epoch_335.pth.tar``-style state dict (optionally under
    a ``pfld_backbone`` key, reference get_landmark.py:79-80). The unused
    ``localization`` STN head is ignored."""
    if "pfld_backbone" in sd and isinstance(sd["pfld_backbone"], dict):
        sd = sd["pfld_backbone"]
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    p: Params = {
        "conv1": _fold_mobileone(sd, "conv1", 3, _c(64), 3, 1, dtype),
        "conv2": _fold_mobileone(sd, "conv2", _c(64), _c(64), 3, _c(64), dtype),
    }
    for name, cin, hid, cout, stride in _GHOSTS:
        p[name] = _ghost_params(sd, name, cin, hid, cout, stride, dtype)
    p["conv7"] = _fold_mobileone(sd, "conv7", _c(16), _c(32), 3, 1, dtype)
    p["conv8"] = _fold_conv_block(sd, "conv8", dtype, has_bn=False)
    p["conv_out"] = {
        "w": jnp.asarray(_np_(sd["conv_out.weight"]).transpose(2, 3, 1, 0),
                         dtype),
        "b": jnp.asarray(_np_(sd["conv_out.bias"]), dtype),
    }
    return p


# ---------------------------------------------------------------------------
# random init (zero-checkpoint convention)
# ---------------------------------------------------------------------------


def _r_conv(key, k, cin, cout, groups, dtype):
    w = jax.random.normal(key, (k, k, cin // groups, cout), jnp.float32)
    return {"w": (w * (0.4 / np.sqrt(k * k * cin // groups))).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def init_params(key: jax.Array, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 128))
    p: Params = {
        "conv1": _r_conv(next(keys), 3, 3, _c(64), 1, dtype),
        "conv2": _r_conv(next(keys), 3, _c(64), _c(64), _c(64), dtype),
    }
    for name, cin, hid, cout, stride in _GHOSTS:
        hh, ho = math.ceil(hid / 2), math.ceil(cout / 2)
        blk = {
            "ghost1": {"primary": _r_conv(next(keys), 1, cin, hh, 1, dtype),
                       "cheap": _r_conv(next(keys), 3, hh, hh, hh, dtype)},
            "ghost2": {"primary": _r_conv(next(keys), 1, 2 * hh, ho, 1, dtype),
                       "cheap": _r_conv(next(keys), 3, ho, ho, ho, dtype)},
        }
        if stride == 2:
            blk["dw"] = _r_conv(next(keys), 3, 2 * hh, 2 * hh, 2 * hh, dtype)
        p[name] = blk
    p["conv7"] = _r_conv(next(keys), 3, _c(16), _c(32), 1, dtype)
    p["conv8"] = _r_conv(next(keys), INPUT_SIZE // 16, _c(32), _c(128), 1, dtype)
    p["conv_out"] = _r_conv(next(keys), 1, _c(512), 2 * N_LANDMARKS, 1, dtype)
    return p


# ---------------------------------------------------------------------------
# Landmark front end (reference get_landmark.py Landmark.detect contract)
# ---------------------------------------------------------------------------


class PFLDLandmarker:
    """Crop-and-regress landmarker: square 1.05x face crop -> 192px ->
    PFLD -> offsets + mean_face, scaled back to crop pixels (reference
    get_landmark.py:83-114)."""

    def __init__(self, params: Params, mean_face: np.ndarray):
        self.params = params
        assert mean_face.shape == (2 * N_LANDMARKS,), mean_face.shape
        self.mean_face = mean_face.astype(np.float32)
        self._fn = jax.jit(apply)

    def landmarks(self, frame_bgr: np.ndarray,
                  box: Tuple[int, int, int, int]) -> np.ndarray:
        """(110, 2) int32 landmark pixels in FRAME coordinates."""
        import cv2

        H, W = frame_bgr.shape[:2]
        x1, y1, x2, y2 = box
        cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
        size = int(max(x2 - x1, y2 - y1) * 1.05)
        sx, sy = cx - size // 2, cy - size // 2
        ex, ey = sx + size, sy + size
        dx, dy = max(0, -sx), max(0, -sy)
        edx, edy = max(0, ex - W), max(0, ey - H)
        crop = frame_bgr[max(0, sy):min(H, ey), max(0, sx):min(W, ex)]
        if dx or dy or edx or edy:
            crop = cv2.copyMakeBorder(crop, dy, edy, dx, edx,
                                      cv2.BORDER_CONSTANT, 0)
        ch, cw = crop.shape[:2]
        inp = cv2.resize(crop, (INPUT_SIZE, INPUT_SIZE)).astype(np.float32) / 255.0
        off = np.asarray(self._fn(self.params, jnp.asarray(inp[None])))[0]
        lm = (off + self.mean_face).reshape(-1, 2)
        lm[:, 0] *= cw
        lm[:, 1] *= ch
        lm[:, 0] += max(0, sx) - dx
        lm[:, 1] += max(0, sy) - dy
        return lm.astype(np.int32)


def load_mean_face(path: str) -> np.ndarray:
    with open(path) as f:
        return np.asarray(f.read().split(), np.float32)
