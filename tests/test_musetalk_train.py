"""MuseTalk training recipe (train/musetalk_train.py): tiny-shape CPU
checks of the reference recipe semantics (training_utils.py:48-283) —
U-Net-only gradients, loss decrease, full GAN+sync recipe execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livetalking_tpu.models import multiscale_disc, sd_unet, sd_vae, syncnet
from livetalking_tpu.train import musetalk_train as mt

TINY = sd_unet.UNetConfig(block_out=(32, 64, 96, 96), heads=2)
S = 64  # 64 px frames -> 8x8 latents; the graphs are size-agnostic


def _batch(rng, B):
    return {
        "gt": jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "ref": jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "audio": jnp.asarray(rng.normal(0, 0.3, (B, 50, 384)), jnp.float32),
    }


def test_multiscale_disc_shapes_and_losses():
    params = multiscale_disc.init_params(jax.random.PRNGKey(0))
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    outs = multiscale_disc.apply(params, img)
    assert [o.shape for o in outs] == [(2, 2, 2, 1), (2, 1, 1, 1)]
    g = multiscale_disc.gen_loss(params, img)
    d = multiscale_disc.disc_loss(params, img, img + 0.1)
    assert np.isfinite(float(g)) and np.isfinite(float(d))


def test_train_step_reduces_l1():
    rng = np.random.RandomState(0)
    weights = mt.LossWeights(pixel=1.0, latent=1.0, perceptual=0.0)
    txs, step = mt.make_train_step(TINY, weights, lr=2e-3, warmup=1,
                                   max_steps=50)
    state = mt.init_train_state(jax.random.PRNGKey(0), TINY, txs, weights)
    assert state.face_disc is None and state.mouth_disc is None
    vae_p = sd_vae.init_params(jax.random.PRNGKey(1), dtype=jnp.float32)
    batch = _batch(rng, 2)
    losses = []
    vae_before = jax.tree_util.tree_leaves(vae_p)[0].copy()
    for _ in range(3):
        state, metrics = step(state, vae_p, None, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # frozen VAE: params object untouched by the optimizer
    assert np.array_equal(np.asarray(jax.tree_util.tree_leaves(vae_p)[0]),
                          np.asarray(vae_before))


def test_full_recipe_single_step():
    rng = np.random.RandomState(1)
    weights = mt.LossWeights(pixel=1.0, latent=1.0, perceptual=0.01,
                             sync=0.1, gan=0.05, mouth_gan=0.05)
    txs, step = mt.make_train_step(TINY, weights, lr=1e-4, remat=True)
    state = mt.init_train_state(jax.random.PRNGKey(2), TINY, txs, weights)
    vae_p = sd_vae.init_params(jax.random.PRNGKey(3), dtype=jnp.float32)
    sync_p = syncnet.init_params(jax.random.PRNGKey(4), img_size=S)
    B = syncnet.FRAMES  # one sync clip
    batch = _batch(rng, B)
    batch["sync_mel"] = jnp.asarray(rng.normal(0, 1, (1, 80, 16, 1)),
                                    jnp.float32)
    disc_before = np.asarray(state.face_disc[0][0]["w"]).copy()
    state, metrics = step(state, vae_p, sync_p, batch)
    for k in ("loss", "pixel_l1", "latent_l1", "perceptual", "sync", "gan",
              "mouth_gan", "face_disc", "mouth_disc"):
        assert np.isfinite(float(metrics[k])), k
    # both discriminators actually trained
    assert not np.array_equal(np.asarray(state.face_disc[0][0]["w"]),
                              disc_before)


def test_schedule_warmup_then_decay():
    sched = mt.make_schedule(lr=1e-4, warmup=10, max_steps=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(1e-4)
    assert float(sched(99)) < 1e-4


def test_musetalk_sync_backend_step():
    """sync_backend="musetalk": the dedicated 16-frame expert
    (models/musetalk_syncnet.py) drives the sync term; one full step runs
    and produces finite metrics including "sync"."""
    from livetalking_tpu.models import musetalk_syncnet as msn
    from livetalking_tpu.train.data import sync_mel16_windows

    rng = np.random.RandomState(0)
    # tiny towers with MATCHING embedding dims (visual 32x64 lower-half
    # window of 64px frames; audio 80x52 mel)
    sync_cfg = msn.SyncNetConfig(
        audio=msn.EncoderConfig(1, (32, 32, 64, 64, 64),
                                (2, 2, 2, 2, (5, 3)), (0, 0, 0, 0, 0)),
        visual=msn.EncoderConfig(48, (32, 32, 64, 64, 64),
                                 (2, 2, 2, 2, (2, 4)), (0, 0, 0, 0, 0)),
    )
    sync_p = msn.init_params(jax.random.PRNGKey(7), sync_cfg, jnp.float32)

    weights = mt.LossWeights(sync=0.1)
    txs, step = mt.make_train_step(TINY, weights, lr=1e-4,
                                   sync_backend="musetalk",
                                   sync_cfg=sync_cfg)
    state = mt.init_train_state(jax.random.PRNGKey(0), TINY, txs, weights)
    vae_p = sd_vae.init_params(jax.random.PRNGKey(1), dtype=jnp.float32)

    B = 16  # one 16-frame clip
    batch = _batch(rng, B)
    audio = rng.standard_normal(16000).astype(np.float32)
    batch["sync_mel16"] = jnp.asarray(
        sync_mel16_windows(audio, np.asarray([0])))
    assert batch["sync_mel16"].shape == (1, 80, 52, 1)

    state, metrics = step(state, vae_p, sync_p, batch)
    assert np.isfinite(float(metrics["sync"]))
    assert np.isfinite(float(metrics["loss"]))
