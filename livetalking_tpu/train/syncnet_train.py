"""SyncNet training step (the reference trains its sync expert separately
before GAN-finetuning wav2lip; reference avatars/wav2lip/models/syncnet.py
+ color_syncnet training convention).

Batch layout:
  faces:  (B, img//2, img, 15)  5-frame lower-half window in [0, 1]
  mels:   (B, 80, 16, 1)        matching (or offset, for negatives) mel
  labels: (B,)                  1.0 in-sync / 0.0 off-sync

Parallelism: pure data-parallel — shard the batch over ``dp`` with
parallel/mesh.py placements; XLA inserts the gradient psums.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from livetalking_tpu.models import syncnet


def make_train_step(learning_rate: float = 1e-4):
    tx = optax.adam(learning_rate)

    def loss_fn(params, faces, mels, labels):
        v, a = syncnet.apply(params, faces, mels)
        return syncnet.cosine_bce_loss(v, a, labels)

    @jax.jit
    def train_step(params, opt_state, faces, mels, labels) -> Tuple[Any, Any, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(params, faces, mels, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return tx, train_step
