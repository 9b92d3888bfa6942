"""Wav2Lip training step: L1 reconstruction over a sharded device mesh.

Batch layout (matches the inference contract, reference training pipeline
avatars/wav2lip/models/wav2lip_v2.py forward):
  mel:    (B, 80, 16, 1)   normalized mel windows
  face:   (B, 256, 256, 6) masked||reference input in [0, 1]
  target: (B, 256, 256, 3) ground-truth face in [0, 1]

Parallelism: batch over ``dp``, channel-sharded conv weights over ``tp``
(parallel/mesh.py). The step is a plain jitted function — placements on
the inputs drive XLA's SPMD partitioner, which inserts the gradient psums
over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from livetalking_tpu.models import wav2lip as w2l


def l1_loss(params: Any, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    pred = w2l.apply(params, batch["mel"], batch["face"])
    return jnp.mean(jnp.abs(pred - batch["target"]))


def make_train_step(learning_rate: float = 1e-4):
    """Returns (tx, jitted train_step). State sharding follows the inputs."""
    tx = optax.adam(learning_rate)

    @jax.jit
    def train_step(params, opt_state, batch) -> Tuple[Any, Any, jnp.ndarray]:
        loss, grads = jax.value_and_grad(l1_loss)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, train_step
