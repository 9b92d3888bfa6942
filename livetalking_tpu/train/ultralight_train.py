"""Ultralight per-avatar U-Net training, TPU-native.

The reference ships only pre-trained per-avatar weights
(``data/avatars/<id>/ultralight.pth`` copied by
reference avatars/ultralight/genavatar.py:88-93); the upstream training
recipe the weights come from is L1 reconstruction of the 160 px mouth
crop plus an expert lip-sync term. This module provides that recipe so
an avatar's net can be (re)trained in-framework: the same fused jitted
step pattern as train/wav2lip_train.py, batch over ``dp`` on a mesh via
input placements (parallel/mesh.py), HuBERT features precomputed by the
frozen front-end (audio_features/hubert_features.py).

Batch layout (ultralight inference contract,
reference avatars/ultralight_avatar.py:143-171):
  face:   (B, 160, 160, 6) cat(real, interior-masked) in [0, 1]
  audio:  (B, 32, 32, 16)  HuBERT window planes
  target: (B, 160, 160, 3) ground-truth crop in [0, 1]
  sync_mel (full recipe): (B//5, 80, 16, 1) mel windows per 5-frame clip
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from livetalking_tpu.models import ultralight


def l1_loss(params: Any, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    pred = ultralight.apply(params, batch["face"], batch["audio"])
    return jnp.mean(jnp.abs(pred - batch["target"]))


def make_train_step(learning_rate: float = 1e-4):
    """Returns (tx, jitted step): plain L1 recipe (upstream stage 1)."""
    tx = optax.adam(learning_rate)

    @jax.jit
    def train_step(params, opt_state, batch) -> Tuple[Any, Any, jnp.ndarray]:
        loss, grads = jax.value_and_grad(l1_loss)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, train_step


def make_full_train_step(lr: float = 1e-4, sync_wt: float = 0.3, T: int = 5):
    """L1 + frozen sync expert (upstream stage 2: a SyncNet trained at
    160 px scores T-frame lower-half clips against the mel window).

    step(params, sync_params, opt_state, batch) -> (params, opt_state,
    metrics); B must be a multiple of T when sync_wt > 0.
    """
    from livetalking_tpu.models import syncnet

    tx = optax.adam(lr)

    def loss_fn(params, sync_params, batch):
        pred = ultralight.apply(params, batch["face"], batch["audio"])
        l1 = jnp.mean(jnp.abs(pred - batch["target"]))
        n = pred.shape[0] // T
        S = pred.shape[1]
        clips = pred[: n * T].reshape(n, T, S, S, 3)[:, :, S // 2:, :, :]
        windows = jnp.concatenate([clips[:, i] for i in range(T)], axis=-1)
        v, a = syncnet.apply(jax.lax.stop_gradient(sync_params), windows,
                             batch["sync_mel"])
        sync = syncnet.cosine_bce_loss(v, a, jnp.ones((n,), jnp.float32))
        loss = (1.0 - sync_wt) * l1 + sync_wt * sync
        return loss, {"loss": loss, "l1": l1, "sync": sync}

    @jax.jit
    def step(params, sync_params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, sync_params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return tx, step
