"""Multi-scale patch discriminator (MuseTalk training-only).

Plays the role of the reference's ``MultiScaleDiscriminator`` /
``DiscriminatorFullModel`` pair (reference
avatars/musetalk/utils/training_utils.py:201-250: a full-face GAN
discriminator plus a mouth-region one, each multi-scale, AdamW + cosine
annealing): a Pix2PixHD-style patch discriminator run on an image
pyramid, returning per-scale patch logits. Trained with BCE; the
generator term is BCE-vs-real on the fake patches.

TPU notes: NHWC, plain conv + leaky ReLU (no norm — BN in a
discriminator mixes real/fake batch statistics), stride-2 stack so each
scale is a handful of MXU-friendly convs; pyramid downsampling is an
average pool XLA fuses with the first conv. The params pytree is pure
arrays (a list of conv stacks, one per scale) so it drops straight into
optax; architecture hyperparams are static call args.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp

from livetalking_tpu.models.layers import ConvSpec, apply_conv_layer, init_conv_params

SCALES = (1.0, 0.5)


def _specs(in_ch: int = 3, base: int = 64, n_layers: int = 4) -> List[ConvSpec]:
    """conv4x4-stride2 chain in_ch -> base * 2^k, patch-logit head."""
    specs: List[ConvSpec] = []
    cin = in_ch
    for i in range(n_layers):
        cout = min(base * (2 ** i), 512)
        specs.append(ConvSpec(cin, cout, kernel=4, stride=2, padding=1,
                              bn=False, act="leaky"))
        cin = cout
    specs.append(ConvSpec(cin, 1, kernel=3, stride=1, padding=1,
                          bn=False, act=None))
    return specs


def init_params(key, scales: Sequence[float] = SCALES, in_ch: int = 3,
                base: int = 64, n_layers: int = 4,
                dtype=jnp.float32) -> List[Any]:
    """One independent conv stack per pyramid scale; returns a pure-array
    pytree (list of stacks)."""
    stacks = []
    for i, _ in enumerate(scales):
        specs = _specs(in_ch, base, n_layers)
        keys = jax.random.split(jax.random.fold_in(key, i), len(specs))
        stacks.append(
            [init_conv_params(k, s, dtype) for k, s in zip(keys, specs)])
    return stacks


def _downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    if factor == 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, factor, factor, 1), (1, factor, factor, 1),
        "VALID") / float(factor * factor)


def apply(params, img: jnp.ndarray, scales: Sequence[float] = SCALES,
          base: int = 64, n_layers: int = 4) -> List[jnp.ndarray]:
    """img: (B, H, W, C) in [0, 1]. Returns per-scale patch-logit maps
    (B, h_s, w_s, 1)."""
    specs = _specs(img.shape[-1], base, n_layers)
    outs = []
    for stack, s in zip(params, scales):
        x = _downsample(img, int(round(1.0 / s)))
        for p, sp in zip(stack, specs):
            x = apply_conv_layer(p, sp, x)
        outs.append(x)
    return outs


def _bce(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    t = jnp.full_like(logits, target)
    return jnp.mean(jnp.maximum(logits, 0) - logits * t
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def gen_loss(params, fake: jnp.ndarray, **kw) -> jnp.ndarray:
    """Generator GAN term: fake patches judged real, averaged over scales."""
    logits = apply(params, fake, **kw)
    return sum(_bce(l, 1.0) for l in logits) / len(logits)


def disc_loss(params, real: jnp.ndarray, fake: jnp.ndarray, **kw) -> jnp.ndarray:
    """Discriminator BCE: real->1, fake->0, averaged over scales."""
    rl = apply(params, real, **kw)
    fl = apply(params, fake, **kw)
    return (sum(_bce(l, 1.0) for l in rl) + sum(_bce(l, 0.0) for l in fl)) / (
        2 * len(rl))
