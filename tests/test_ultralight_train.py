"""Ultralight per-avatar training recipe (train/ultralight_train.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models import syncnet, ultralight
from livetalking_tpu.train import ultralight_train as ut


def _batch(rng, B):
    return {
        "face": jnp.asarray(rng.uniform(0, 1, (B, 160, 160, 6)), jnp.float32),
        "audio": jnp.asarray(rng.normal(0, 0.3, (B, 32, 32, 16)), jnp.float32),
        "target": jnp.asarray(rng.uniform(0, 1, (B, 160, 160, 3)), jnp.float32),
    }


def test_l1_step_reduces_loss():
    rng = np.random.RandomState(0)
    params = ultralight.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    tx, step = ut.make_train_step(learning_rate=2e-3)
    opt = tx.init(params)
    batch = _batch(rng, 2)
    # learnable target (constant image) — the random-noise alternative has
    # its optimum at the sigmoid resting point, so loss wouldn't move
    batch["target"] = jnp.full((2, 160, 160, 3), 0.2, jnp.float32)
    losses = []
    for _ in range(3):
        params, opt, loss = step(params, opt, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_full_recipe_with_sync_expert():
    rng = np.random.RandomState(1)
    params = ultralight.init_params(jax.random.PRNGKey(1), dtype=jnp.float32)
    sync_p = syncnet.init_params(jax.random.PRNGKey(2), img_size=160)
    tx, step = ut.make_full_train_step(lr=1e-4, sync_wt=0.3)
    opt = tx.init(params)
    batch = _batch(rng, syncnet.FRAMES)
    batch["sync_mel"] = jnp.asarray(rng.normal(0, 1, (1, 80, 16, 1)),
                                    jnp.float32)
    params, opt, metrics = step(params, sync_p, opt, batch)
    for k in ("loss", "l1", "sync"):
        assert np.isfinite(float(metrics[k])), k
