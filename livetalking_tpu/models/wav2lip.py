"""Wav2Lip-256 lip-sync U-Net, TPU-native.

Architecture parity with the reference runtime network
(reference avatars/wav2lip/models/wav2lip_v2.py:8-163, conv blocks
avatars/wav2lip/models/conv.py): a face encoder of 8 stride-2 conv stacks
(6ch 256px -> 512ch 1px), an audio encoder collapsing a (80, 16) mel window
to a 512-vector, and a transposed-conv decoder with skip concatenation,
ending in an 80->32->3 sigmoid head.

TPU-first differences from the reference implementation:
  - NHWC activations / HWIO weights (TPU-native layout; torch uses NCHW);
  - BatchNorm folded into conv weights at load time (inference graph is
    conv+bias+relu only);
  - bfloat16 weights/activations with float32 accumulation on the MXU;
  - the whole per-batch step — face-cycle gather, lower-half masking,
    normalization, forward pass, uint8 quantization — is one jitted
    function (``make_infer_fn``), so a batch costs one host->device index
    upload and one device->host frame download
    (vs reference avatars/wav2lip_avatar.py:116-139 which does the mask /
    concat / transpose on host numpy every batch).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models.layers import (
    ConvSpec,
    apply_conv_layer,
    fold_bn,
    init_conv_params,
    torch_conv_to_hwio,
    torch_tconv_to_hwio,
)

C = ConvSpec


def _res(ch: int, n: int) -> List[ConvSpec]:
    return [C(ch, ch, 3, 1, 1, residual=True) for _ in range(n)]


# Face encoder: 8 blocks, input (B, 256, 256, 6) [masked||reference on channels]
FACE_ENCODER: List[List[ConvSpec]] = [
    [C(6, 16, 7, 1, 3)],
    [C(16, 32, 3, 2, 1)] + _res(32, 2),
    [C(32, 64, 3, 2, 1)] + _res(64, 3),
    [C(64, 128, 3, 2, 1)] + _res(128, 2),
    [C(128, 256, 3, 2, 1)] + _res(256, 2),
    [C(256, 512, 3, 2, 1)] + _res(512, 1),
    [C(512, 512, 3, 2, 1)] + _res(512, 1),
    [C(512, 512, 4, 1, 0), C(512, 512, 1, 1, 0)],
]

# Audio encoder: input (B, 80, 16, 1) mel window -> (B, 1, 1, 512)
AUDIO_ENCODER: List[ConvSpec] = [
    C(1, 32, 3, 1, 1), *_res(32, 2),
    C(32, 64, 3, (3, 1), 1), *_res(64, 2),
    C(64, 128, 3, 3, 1), *_res(128, 2),
    C(128, 256, 3, (3, 2), 1), *_res(256, 1),
    C(256, 512, 3, 1, 0),
    C(512, 512, 1, 1, 0),
]

# Decoder: transposed-conv upsampling with encoder skip concat after each block
FACE_DECODER: List[List[ConvSpec]] = [
    [C(512, 512, 1, 1, 0)],
    [C(1024, 512, 4, 1, 0, transpose=True), *_res(512, 1)],
    [C(1024, 512, 3, 2, 1, transpose=True, output_padding=1), *_res(512, 1)],
    [C(1024, 512, 3, 2, 1, transpose=True, output_padding=1), *_res(512, 2)],
    [C(768, 384, 3, 2, 1, transpose=True, output_padding=1), *_res(384, 2)],
    [C(512, 256, 3, 2, 1, transpose=True, output_padding=1), *_res(256, 2)],
    [C(320, 128, 3, 2, 1, transpose=True, output_padding=1), *_res(128, 2)],
    [C(160, 64, 3, 2, 1, transpose=True, output_padding=1), *_res(64, 2)],
]

OUTPUT_BLOCK: List[ConvSpec] = [
    C(80, 32, 3, 1, 1),
    C(32, 3, 1, 1, 0, bn=False, act="sigmoid"),
]

Params = Dict[str, Any]


def init_params(key: jax.Array, dtype=jnp.bfloat16) -> Params:
    """Random (he-normal) parameters; BN identity at init."""
    keys = iter(jax.random.split(key, 256))

    def blk(specs: List[ConvSpec]):
        return [init_conv_params(next(keys), s, dtype) for s in specs]

    return {
        "face_enc": [blk(b) for b in FACE_ENCODER],
        "audio_enc": blk(AUDIO_ENCODER),
        "face_dec": [blk(b) for b in FACE_DECODER],
        "out": blk(OUTPUT_BLOCK),
    }


def _run_block(params: List[Dict], specs: List[ConvSpec], x: jnp.ndarray) -> jnp.ndarray:
    for p, s in zip(params, specs):
        x = apply_conv_layer(p, s, x)
    return x


def encode_audio(params: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """(B, 80, 16, 1) mel window -> (B, 1, 1, 512) audio embedding."""
    return _run_block(params["audio_enc"], AUDIO_ENCODER, mel)


def apply(params: Params, mel: jnp.ndarray, face: jnp.ndarray) -> jnp.ndarray:
    """Forward pass.

    Args:
      mel:  (B, 80, 16, 1) normalized mel window.
      face: (B, 256, 256, 6) in [0, 1] — channels = [masked face, reference].
    Returns:
      (B, 256, 256, 3) RGB in [0, 1] (float32).
    """
    skips = []
    x = face
    for p, specs in zip(params["face_enc"], FACE_ENCODER):
        x = _run_block(p, specs, x)
        skips.append(x)

    x = encode_audio(params, mel)
    for p, specs in zip(params["face_dec"], FACE_DECODER):
        x = _run_block(p, specs, x)
        x = jnp.concatenate([x, skips.pop()], axis=-1)

    x = _run_block(params["out"], OUTPUT_BLOCK, x)
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _convert_layer(sd: Dict[str, np.ndarray], prefix: str, spec: ConvSpec, dtype) -> Dict[str, jnp.ndarray]:
    """Convert one reference layer (conv_block.0 conv [+ conv_block.1 BN])."""
    if spec.bn:
        w_t = np.asarray(sd[f"{prefix}.conv_block.0.weight"], np.float32)
        b_t = sd.get(f"{prefix}.conv_block.0.bias")
        b_t = None if b_t is None else np.asarray(b_t, np.float32)
        w = torch_tconv_to_hwio(w_t) if spec.transpose else torch_conv_to_hwio(w_t)
        w, b = fold_bn(
            w, b_t,
            np.asarray(sd[f"{prefix}.conv_block.1.weight"], np.float32),
            np.asarray(sd[f"{prefix}.conv_block.1.bias"], np.float32),
            np.asarray(sd[f"{prefix}.conv_block.1.running_mean"], np.float32),
            np.asarray(sd[f"{prefix}.conv_block.1.running_var"], np.float32),
        )
    else:  # plain nn.Conv2d (final output layer)
        w = torch_conv_to_hwio(np.asarray(sd[f"{prefix}.weight"], np.float32))
        b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}


def convert_torch_state_dict(sd: Dict[str, np.ndarray], dtype=jnp.bfloat16) -> Params:
    """Reference ``wav2lip.pth`` state_dict -> folded NHWC params.

    Accepts the raw ``checkpoint["state_dict"]`` with optional ``module.``
    prefixes (reference avatars/wav2lip_avatar.py:59-70 strips them the
    same way). Tensors may be torch tensors or numpy arrays.
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: _np(v) for k, v in sd.items()}

    def blk(prefix: str, specs: List[ConvSpec]):
        return [_convert_layer(sd, f"{prefix}.{j}", s, dtype) for j, s in enumerate(specs)]

    out_params = [
        _convert_layer(sd, "output_block.0", OUTPUT_BLOCK[0], dtype),
        _convert_layer(sd, "output_block.1", OUTPUT_BLOCK[1], dtype),
    ]
    return {
        "face_enc": [blk(f"face_encoder_blocks.{i}", b) for i, b in enumerate(FACE_ENCODER)],
        "audio_enc": blk("audio_encoder", AUDIO_ENCODER),
        "face_dec": [blk(f"face_decoder_blocks.{i}", b) for i, b in enumerate(FACE_DECODER)],
        "out": out_params,
    }


from livetalking_tpu.models.layers import to_numpy as _np  # noqa: E402


def load_torch_checkpoint(path: str, dtype=jnp.bfloat16) -> Params:
    """Load the reference ``wav2lip.pth`` via torch (host, CPU) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_torch_state_dict(sd, dtype)


# ---------------------------------------------------------------------------
# the fused per-batch inference step
# ---------------------------------------------------------------------------

def make_infer_fn(batch_size: int, img_size: int = 256, dtype=jnp.bfloat16):
    """Build the jitted device step:

        (params, face_cycle_u8 (N, S, S, 3), idxs (B,), mel (B, 80, 16))
            -> frames_u8 (B, S, S, 3)

    Fuses the reference host-side batch prep (avatars/wav2lip_avatar.py:
    116-139: gather, lower-half mask, concat, /255, NCHW transpose) into
    the compiled graph. ``face_cycle_u8`` stays resident in HBM; only the
    B int32 indices go up and B uint8 frames come down per step.
    """
    half = img_size // 2

    @jax.jit
    def step(params: Params, face_cycle: jnp.ndarray, idxs: jnp.ndarray, mel: jnp.ndarray) -> jnp.ndarray:
        faces = jnp.take(face_cycle, idxs, axis=0)  # (B, S, S, 3) uint8
        f = faces.astype(dtype) / jnp.asarray(255.0, dtype)
        row = jnp.arange(img_size)[None, :, None, None]
        masked = jnp.where(row < half, f, jnp.asarray(0.0, dtype))
        x = jnp.concatenate([masked, f], axis=-1)  # (B, S, S, 6)
        a = mel.astype(dtype)[..., None]  # (B, 80, 16, 1)
        out = apply(params, a, x)  # (B, S, S, 3) [0,1] f32
        return jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

    return step


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
