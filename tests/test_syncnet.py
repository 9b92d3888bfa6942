"""SyncNet sync discriminator (models/syncnet.py + train/syncnet_train.py):
embedding contract, loss behavior, and that a few steps separate in-sync
from off-sync pairs on a toy correlation task."""

import numpy as np

import jax
import jax.numpy as jnp

from livetalking_tpu.models import syncnet
from livetalking_tpu.train.syncnet_train import make_train_step

IMG = 64
RNG = np.random.default_rng(11)


def _params():
    return syncnet.init_params(jax.random.PRNGKey(0), img_size=IMG)


def test_embeddings_normalized_and_shaped():
    p = _params()
    faces = jnp.asarray(RNG.random((3, IMG // 2, IMG, 15)).astype(np.float32))
    mels = jnp.asarray(RNG.random((3, 80, 16, 1)).astype(np.float32))
    v, a = syncnet.apply(p, faces, mels)
    assert v.shape == (3, syncnet.EMBED) and a.shape == (3, syncnet.EMBED)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0,
                               atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0,
                               atol=1e-4)
    prob = syncnet.sync_probability(p, faces, mels)
    assert float(prob.min()) >= 0.0 and float(prob.max()) <= 1.0


def test_loss_extremes():
    v = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    a = jnp.asarray([[1.0, 0.0], [-1.0, 0.0]])
    # perfectly aligned + label 1 and anti-aligned + label 0 -> tiny loss
    good = syncnet.cosine_bce_loss(v, a, jnp.asarray([1.0, 0.0]))
    # swapped labels -> large loss
    bad = syncnet.cosine_bce_loss(v, a, jnp.asarray([0.0, 1.0]))
    assert float(good) < 1e-4
    assert float(bad) > 5.0


def test_training_separates_sync_from_offset():
    """Toy task: in-sync pairs share a planted scalar signal; off-sync
    pairs don't. A few Adam steps must push loss down and widen the
    score gap between positives and negatives."""
    p = _params()
    tx, step = make_train_step(learning_rate=2e-4)
    opt_state = tx.init(p)

    B = 8

    def make_batch(seed):
        r = np.random.default_rng(seed)
        s = r.random(B).astype(np.float32)  # shared signal per pair
        faces = np.broadcast_to(
            s[:, None, None, None], (B, IMG // 2, IMG, 15)).copy()
        faces += 0.05 * r.random(faces.shape).astype(np.float32)
        mels_sync = np.broadcast_to(
            s[:, None, None, None], (B, 80, 16, 1)).copy()
        mels_sync += 0.05 * r.random(mels_sync.shape).astype(np.float32)
        mels_off = mels_sync[::-1].copy()
        faces = np.concatenate([faces, faces])
        mels = np.concatenate([mels_sync, mels_off])
        labels = np.concatenate([np.ones(B), np.zeros(B)]).astype(np.float32)
        return (jnp.asarray(faces), jnp.asarray(mels), jnp.asarray(labels))

    losses = []
    for i in range(12):
        faces, mels, labels = make_batch(i)
        p, opt_state, loss = step(p, opt_state, faces, mels, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
