"""Wav2Lip visual-quality discriminator (training-only).

Functional JAX port of the reference's GAN discriminator
(reference avatars/wav2lip/models/wav2lip_v2.py:166-223
``Wav2Lip_disc_qual``): a conv stack over the lower half of generated
faces producing a real/fake probability, trained with BCE and used as
the perceptual-quality term of the full wav2lip recipe
(L1 + sync expert + GAN).

NHWC, no BN in the torch original's disc blocks (plain conv + leaky
ReLU), binary head on the pooled feature.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from livetalking_tpu.models.layers import ConvSpec, apply_conv_layer, init_conv_params


def _specs(img_size: int = 256) -> List[ConvSpec]:
    """Encoder over (img//2, img, 3) lower halves down to 1x1x512."""
    specs = [ConvSpec(3, 32, kernel=7, stride=1, padding=3, bn=False, act="leaky")]
    chans = [(32, 64), (64, 128), (128, 256), (256, 512)]
    for cin, cout in chans:
        specs.append(ConvSpec(cin, cout, kernel=5, stride=2, padding=2,
                              bn=False, act="leaky"))
        specs.append(ConvSpec(cout, cout, kernel=3, stride=1, padding=1,
                              bn=False, act="leaky"))
    extent = img_size // 2 // (2 ** len(chans))
    while extent > 1:
        specs.append(ConvSpec(512, 512, kernel=3, stride=2, padding=1,
                              bn=False, act="leaky"))
        extent //= 2
    specs.append(ConvSpec(512, 1, kernel=1, stride=1, padding=0,
                          bn=False, act=None))  # logit head
    return specs


def init_params(key, img_size: int = 256, dtype=jnp.float32) -> Dict[str, Any]:
    specs = _specs(img_size)
    keys = jax.random.split(key, len(specs))
    return {"blocks": [init_conv_params(k, s, dtype) for k, s in zip(keys, specs)]}


def apply(params, faces: jnp.ndarray) -> jnp.ndarray:
    """faces: (B, H, W, 3) full faces in [0, 1]; the disc judges the lower
    half (reference forward slices H/2:). Returns (B,) real logits."""
    x = faces[:, faces.shape[1] // 2:, :, :]
    for p, s in zip(params["blocks"], _specs(faces.shape[2])):
        x = apply_conv_layer(p, s, x)
    return jnp.mean(x, axis=(1, 2, 3))


def bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Binary cross-entropy on logits vs a constant target (1=real)."""
    t = jnp.full_like(logits, target)
    return jnp.mean(jnp.maximum(logits, 0) - logits * t
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))
