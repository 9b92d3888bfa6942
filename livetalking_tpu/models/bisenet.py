"""BiSeNet face parsing (19 classes), functional JAX.

TPU-native equivalent of the reference's face-parse net (reference
avatars/musetalk/utils/face_parsing/model.py ~283 LoC + resnet.py:
BiSeNet with a ResNet18 context path, attention-refinement modules,
feature fusion, 19-class head), used offline to build the feathered
mouth-region masks (reference avatars/musetalk/utils/blending.py:112-136).

Design: NHWC, BN folded into convs at load (layers.fold_bn), bilinear
upsampling as align-corners matmuls (layers.upsample2x_align_corners),
the whole forward one jittable function. Accepts the standard
face-parsing checkpoint layout via ``convert_torch_state_dict``; random
init otherwise (geometry tests / demo).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models.layers import (
    ConvSpec,
    apply_conv_layer,
    init_conv_params,
)

Params = Dict[str, Any]

N_CLASSES = 19
# face-parsing class ids (reference face_parsing/__init__.py usage):
# 1 skin, 10 nose, 11 mouth-interior, 12 upper lip, 13 lower lip
MOUTH_CLASSES = (10, 11, 12, 13)
JAW_CLASSES = (1, 10, 11, 12, 13)


def _resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize via jax.image (dense, static shapes)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, out_hw[0], out_hw[1], C), "bilinear")


# --- architecture table ----------------------------------------------------


def _resnet18_specs() -> Dict[str, List[ConvSpec]]:
    """conv1 + 4 stages x 2 basic blocks (3x3+3x3, stride on first block
    of stages 2-4; 1x1 downsample shortcuts)."""
    specs: Dict[str, List[ConvSpec]] = {
        "stem": [ConvSpec(3, 64, kernel=7, stride=2, padding=3)],
    }
    chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
    for si, (cin, cout, stride) in enumerate(chans):
        blocks: List[ConvSpec] = []
        for bi in range(2):
            s = stride if bi == 0 else 1
            first_in = cin if bi == 0 else cout
            blocks += [
                ConvSpec(first_in, cout, kernel=3, stride=s, padding=1),
                ConvSpec(cout, cout, kernel=3, stride=1, padding=1, act=None),
            ]
            if bi == 0 and (s != 1 or cin != cout):
                blocks.append(ConvSpec(cin, cout, kernel=1, stride=s,
                                       padding=0, act=None))  # shortcut
        specs[f"layer{si + 1}"] = blocks
    return specs


def _head_specs() -> Dict[str, List[ConvSpec]]:
    return {
        # attention refinement: 3x3 conv then channel attention (1x1, no act)
        "arm16": [ConvSpec(256, 128, kernel=3, stride=1, padding=1),
                  ConvSpec(128, 128, kernel=1, stride=1, padding=0, act=None)],
        "arm32": [ConvSpec(512, 128, kernel=3, stride=1, padding=1),
                  ConvSpec(128, 128, kernel=1, stride=1, padding=0, act=None)],
        "conv_avg": [ConvSpec(512, 128, kernel=1, stride=1, padding=0)],
        "head32": [ConvSpec(128, 128, kernel=3, stride=1, padding=1)],
        "head16": [ConvSpec(128, 128, kernel=3, stride=1, padding=1)],
        # feature fusion: 1x1 fuse + channel attention bottleneck
        "ffm": [ConvSpec(256, 256, kernel=1, stride=1, padding=0)],
        "ffm_att1": [ConvSpec(256, 64, kernel=1, stride=1, padding=0)],
        "ffm_att2": [ConvSpec(64, 256, kernel=1, stride=1, padding=0, act=None)],
        "out1": [ConvSpec(256, 256, kernel=3, stride=1, padding=1)],
        "out2": [ConvSpec(256, N_CLASSES, kernel=1, stride=1, padding=0,
                          act=None, bn=False)],
    }


def init_params(key, dtype=jnp.float32) -> Params:
    all_specs = {**_resnet18_specs(), **_head_specs()}
    n = sum(len(v) for v in all_specs.values())
    keys = iter(jax.random.split(key, n))
    return {
        name: [init_conv_params(next(keys), s, dtype) for s in spec]
        for name, spec in all_specs.items()
    }


# --- forward ---------------------------------------------------------------


def _basic_stage(params: List[Dict], specs: List[ConvSpec], x: jnp.ndarray) -> jnp.ndarray:
    """Two ResNet basic blocks from the flat spec list built above."""
    i = 0
    for bi in range(2):
        c1, c2 = specs[i], specs[i + 1]
        y = apply_conv_layer(params[i], c1, x)
        y = apply_conv_layer(params[i + 1], c2, y)
        if i + 2 < len(specs) and specs[i + 2].kernel == 1 and bi == 0 and (
                specs[i].stride != 1 or specs[i].cin != specs[i].cout):
            sc = apply_conv_layer(params[i + 2], specs[i + 2], x)
            i += 3
        else:
            sc = x
            i += 2
        x = jax.nn.relu(y + sc)
    return x


def _run(params: List[Dict], specs: List[ConvSpec], x: jnp.ndarray) -> jnp.ndarray:
    for p, s in zip(params, specs):
        x = apply_conv_layer(p, s, x)
    return x


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "SAME")


def _arm(params: List[Dict], specs: List[ConvSpec], x: jnp.ndarray) -> jnp.ndarray:
    feat = apply_conv_layer(params[0], specs[0], x)
    att = jnp.mean(feat, axis=(1, 2), keepdims=True)
    att = jax.nn.sigmoid(apply_conv_layer(params[1], specs[1], att))
    return feat * att


def apply(params: Params, img: jnp.ndarray) -> jnp.ndarray:
    """img: (B, H, W, 3) float32, ImageNet-normalized RGB.
    Returns (B, H, W, 19) class logits."""
    r18 = _resnet18_specs()
    hd = _head_specs()
    B, H, W, _ = img.shape

    x = _run(params["stem"], r18["stem"], img)
    x = _maxpool2(x)
    x = _basic_stage(params["layer1"], r18["layer1"], x)
    feat8 = _basic_stage(params["layer2"], r18["layer2"], x)      # /8, 128
    feat16 = _basic_stage(params["layer3"], r18["layer3"], feat8)  # /16, 256
    feat32 = _basic_stage(params["layer4"], r18["layer4"], feat16)  # /32, 512

    avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
    avg = _run(params["conv_avg"], hd["conv_avg"], avg)
    a32 = _arm(params["arm32"], hd["arm32"], feat32) + avg
    a32 = _resize_bilinear(a32, feat16.shape[1:3])
    a32 = _run(params["head32"], hd["head32"], a32)

    a16 = _arm(params["arm16"], hd["arm16"], feat16) + a32
    a16 = _resize_bilinear(a16, feat8.shape[1:3])
    a16 = _run(params["head16"], hd["head16"], a16)

    fused = _run(params["ffm"], hd["ffm"],
                 jnp.concatenate([feat8, a16], axis=-1))
    att = jnp.mean(fused, axis=(1, 2), keepdims=True)
    att = _run(params["ffm_att1"], hd["ffm_att1"], att)
    att = jax.nn.sigmoid(_run(params["ffm_att2"], hd["ffm_att2"], att))
    fused = fused * att + fused

    out = _run(params["out1"], hd["out1"], fused)
    out = _run(params["out2"], hd["out2"], out)
    return _resize_bilinear(out, (H, W))


def make_parse_fn(size: int = 512, dtype=jnp.float32):
    """Jitted: (params, faces_bgr_u8 (B, size, size, 3)) -> (B, size, size)
    int32 class map (the reference FaceParsing.__call__ contract)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype)

    @jax.jit
    def parse(params, faces_bgr):
        rgb = faces_bgr[..., ::-1].astype(dtype) / 255.0
        x = (rgb - mean) / std
        logits = apply(params, x)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return parse


def mouth_mask(class_map: np.ndarray, mode: str = "raw") -> np.ndarray:
    """Class map -> uint8 mouth-region mask (255 inside), the blending
    contract of reference blending.py:112-136 (``raw`` keeps mouth+lips,
    ``jaw`` adds skin for chin-wide blending)."""
    classes = JAW_CLASSES if mode == "jaw" else MOUTH_CLASSES
    m = np.isin(class_map, classes)
    return (m * 255).astype(np.uint8)


# --- torch checkpoint conversion -------------------------------------------


def convert_torch_state_dict(sd: Dict[str, Any], dtype=jnp.float32) -> Params:
    """Convert the standard face-parsing BiSeNet checkpoint (ResNet18
    context path naming: ``cp.resnet.*``, ``cp.arm16/32.*``,
    ``cp.conv_avg.*``, ``cp.conv_head16/32.*``, ``ffm.*``,
    ``conv_out.*``) with BN folding."""
    import numpy as _np

    def t(x):
        return _np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    def fold(conv_prefix, bn_prefix):
        from livetalking_tpu.models.layers import fold_bn, torch_conv_to_hwio

        w = torch_conv_to_hwio(t(sd[conv_prefix + ".weight"]))
        b = t(sd[conv_prefix + ".bias"]) if conv_prefix + ".bias" in sd else None
        if bn_prefix and bn_prefix + ".weight" in sd:
            w, b = fold_bn(w, b, t(sd[bn_prefix + ".weight"]),
                           t(sd[bn_prefix + ".bias"]),
                           t(sd[bn_prefix + ".running_mean"]),
                           t(sd[bn_prefix + ".running_var"]))
        return {"w": jnp.asarray(w, dtype),
                "b": jnp.asarray(b if b is not None else
                                 _np.zeros(w.shape[-1]), dtype)}

    p: Params = {}
    rn = "cp.resnet"
    p["stem"] = [fold(f"{rn}.conv1", f"{rn}.bn1")]
    for li in range(1, 5):
        blocks = []
        for bi in range(2):
            pref = f"{rn}.layer{li}.{bi}"
            blocks.append(fold(f"{pref}.conv1", f"{pref}.bn1"))
            blocks.append(fold(f"{pref}.conv2", f"{pref}.bn2"))
            if f"{pref}.downsample.0.weight" in sd:
                blocks.append(fold(f"{pref}.downsample.0", f"{pref}.downsample.1"))
        p[f"layer{li}"] = blocks
    for arm, pref in (("arm16", "cp.arm16"), ("arm32", "cp.arm32")):
        p[arm] = [fold(f"{pref}.conv.conv", f"{pref}.conv.bn"),
                  fold(f"{pref}.conv_atten", f"{pref}.bn_atten")]
    p["conv_avg"] = [fold("cp.conv_avg.conv", "cp.conv_avg.bn")]
    p["head32"] = [fold("cp.conv_head32.conv", "cp.conv_head32.bn")]
    p["head16"] = [fold("cp.conv_head16.conv", "cp.conv_head16.bn")]
    p["ffm"] = [fold("ffm.convblk.conv", "ffm.convblk.bn")]
    p["ffm_att1"] = [fold("ffm.conv1", "")]
    p["ffm_att2"] = [fold("ffm.conv2", "")]
    p["out1"] = [fold("conv_out.conv.conv", "conv_out.conv.bn")]
    p["out2"] = [fold("conv_out.conv_out", "")]
    return p
