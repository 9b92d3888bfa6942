"""SyncNet: audio/visual lip-sync discriminator (training-time).

Functional JAX port of the reference's training-only sync scorers
(reference avatars/wav2lip/models/syncnet.py:7-66 ``SyncNet_color`` and
avatars/musetalk/models/syncnet.py:18-240): a face encoder over a
5-frame window of lower-half faces and an audio encoder over the
matching mel window, each producing an L2-normalized 512-d embedding
whose cosine similarity scores sync, trained with BCE on positive /
negative (offset-audio) pairs.

TPU notes: NHWC layout, strided convs sized so every stage keeps the
channel dim lane-friendly; both encoders are plain conv stacks the MXU
eats whole. Used by train/syncnet_train.py and as the optional expert
sync loss in wav2lip training.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from livetalking_tpu.models.layers import ConvSpec, apply_conv_layer, init_conv_params

EMBED = 512
FRAMES = 5  # temporal window, reference color_syncnet convention


def _face_specs(img_size: int) -> List[ConvSpec]:
    """Encoder over (img_size//2, img_size) lower-half crops, 3*FRAMES ch.
    Stride schedule reaches 1x1 spatial at 512 channels for 96..256 px."""
    c = 3 * FRAMES
    specs = [ConvSpec(c, 32, kernel=7, stride=1, padding=3)]
    chans = [(32, 64), (64, 128), (128, 256), (256, 512)]
    for cin, cout in chans:
        specs.append(ConvSpec(cin, cout, kernel=5, stride=2, padding=2))
        specs.append(ConvSpec(cout, cout, kernel=3, stride=1, padding=1,
                              residual=True))
    # collapse whatever spatial extent remains with stride-2 convs
    extent = max(img_size // 2, img_size) // (2 ** len(chans))
    while extent > 1:
        specs.append(ConvSpec(512, 512, kernel=3, stride=2, padding=1))
        extent //= 2
    specs.append(ConvSpec(512, EMBED, kernel=1, stride=1, padding=0, act=None))
    return specs


def _audio_specs() -> List[ConvSpec]:
    """Encoder over (80, 16, 1) mel windows -> 512 (reference
    syncnet.py:34-52 stride plan)."""
    return [
        ConvSpec(1, 32, kernel=3, stride=1, padding=1),
        ConvSpec(32, 64, kernel=3, stride=(3, 1), padding=1),
        ConvSpec(64, 64, kernel=3, stride=1, padding=1, residual=True),
        ConvSpec(64, 128, kernel=3, stride=3, padding=1),
        ConvSpec(128, 128, kernel=3, stride=1, padding=1, residual=True),
        ConvSpec(128, 256, kernel=3, stride=(3, 2), padding=1),
        ConvSpec(256, 512, kernel=3, stride=1, padding=0),
        ConvSpec(512, EMBED, kernel=1, stride=1, padding=0, act=None),
    ]


def init_params(key, img_size: int = 256, dtype=jnp.float32) -> Dict[str, Any]:
    fs = _face_specs(img_size)
    aus = _audio_specs()
    keys = jax.random.split(key, len(fs) + len(aus))
    # img_size is re-derived from the input shape in apply() so the pytree
    # stays all-float (grad-able)
    return {
        "face": [init_conv_params(k, s, dtype) for k, s in zip(keys[: len(fs)], fs)],
        "audio": [init_conv_params(k, s, dtype)
                  for k, s in zip(keys[len(fs):], aus)],
    }


def _run(stack, specs, x):
    for p, s in zip(stack, specs):
        x = apply_conv_layer(p, s, x)
    return x


def apply(params, faces: jnp.ndarray, mels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """faces: (B, img//2, img, 3*FRAMES) lower-half window in [0,1];
    mels: (B, 80, 16, 1). Returns L2-normalized (B, 512) embeddings."""
    img = faces.shape[2]
    v = _run(params["face"], _face_specs(img), faces)
    a = _run(params["audio"], _audio_specs(), mels)
    v = v.reshape(v.shape[0], -1)[:, :EMBED]
    a = a.reshape(a.shape[0], -1)[:, :EMBED]
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    return v, a


def cosine_bce_loss(v_emb, a_emb, labels) -> jnp.ndarray:
    """BCE on (cos+1)/2 vs sync labels (1 = in-sync), the reference
    cosine_loss (wav2lip color_syncnet training)."""
    cos = jnp.sum(v_emb * a_emb, axis=-1)
    p = jnp.clip((cos + 1.0) * 0.5, 1e-6, 1.0 - 1e-6)
    return -jnp.mean(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))


def sync_probability(params, faces, mels) -> jnp.ndarray:
    """(B,) probability-like sync score in [0, 1]."""
    v, a = apply(params, faces, mels)
    return (jnp.sum(v * a, axis=-1) + 1.0) * 0.5
