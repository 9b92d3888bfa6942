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


def make_full_train_step(gen_lr: float = 1e-4, disc_lr: float = 1e-4,
                         sync_wt: float = 0.03, disc_wt: float = 0.07,
                         T: int = 5, gen_apply=None):
    """The reference's full GAN recipe (hq training: L1 + frozen sync
    expert + quality discriminator; weights per the published defaults).

    Batch layout extends the L1 step with clip structure: B = nclips * T
    consecutive frames; ``sync_mel`` (nclips, 80, 16, 1) is the clip-level
    mel window for the sync expert.

    Returns (tx_gen, tx_disc, step) with
    ``step(gen_p, disc_p, sync_p, gen_opt, disc_opt, batch) ->
    (gen_p, disc_p, gen_opt, disc_opt, metrics)``; ``sync_p`` stays frozen.
    """
    from livetalking_tpu.models import syncnet, wav2lip_disc

    tx_gen = optax.adam(gen_lr)
    tx_disc = optax.adam(disc_lr)
    apply_fn = gen_apply or w2l.apply  # injectable for recipe tests

    def _sync_loss(sync_p, frames, sync_mel):
        n = frames.shape[0] // T
        h, w = frames.shape[1], frames.shape[2]
        clips = frames.reshape(n, T, h, w, 3)[:, :, h // 2:, :, :]
        windows = jnp.concatenate([clips[:, i] for i in range(T)], axis=-1)
        v, a = syncnet.apply(sync_p, windows, sync_mel)
        return syncnet.cosine_bce_loss(v, a, jnp.ones((n,), frames.dtype))

    def gen_loss_fn(gen_p, disc_p, sync_p, batch):
        pred = apply_fn(gen_p, batch["mel"], batch["face"])
        l1 = jnp.mean(jnp.abs(pred - batch["target"]))
        sync = _sync_loss(sync_p, pred, batch["sync_mel"])
        percep = wav2lip_disc.bce_logits(wav2lip_disc.apply(disc_p, pred), 1.0)
        loss = (1.0 - sync_wt - disc_wt) * l1 + sync_wt * sync + disc_wt * percep
        return loss, (l1, sync, percep, pred)

    def disc_loss_fn(disc_p, pred, target):
        real = wav2lip_disc.bce_logits(wav2lip_disc.apply(disc_p, target), 1.0)
        fake = wav2lip_disc.bce_logits(wav2lip_disc.apply(disc_p, pred), 0.0)
        return real + fake

    @jax.jit
    def step(gen_p, disc_p, sync_p, gen_opt, disc_opt, batch):
        (g_loss, (l1, sync, percep, pred)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(gen_p, disc_p, sync_p, batch)
        g_updates, gen_opt = tx_gen.update(g_grads, gen_opt, gen_p)
        gen_p = optax.apply_updates(gen_p, g_updates)

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
            disc_p, jax.lax.stop_gradient(pred), batch["target"])
        d_updates, disc_opt = tx_disc.update(d_grads, disc_opt, disc_p)
        disc_p = optax.apply_updates(disc_p, d_updates)

        metrics = {"gen": g_loss, "l1": l1, "sync": sync,
                   "percep": percep, "disc": d_loss}
        return gen_p, disc_p, gen_opt, disc_opt, metrics

    return tx_gen, tx_disc, step
