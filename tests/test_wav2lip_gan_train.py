"""Full wav2lip training recipe (L1 + frozen sync expert + GAN quality
disc, reference hq training defaults): one step runs end to end, updates
both networks, and the generator loss falls over a few steps.

The generator is injected as a tiny conv net at 64 px (the recipe is
generator-agnostic; the real wav2lip graph is covered by
tests/test_wav2lip.py) so the GAN mechanics stay testable on the
single-core CI host."""

import numpy as np

import jax
import jax.numpy as jnp

from livetalking_tpu.models import syncnet, wav2lip_disc
from livetalking_tpu.train.wav2lip_train import make_full_train_step

S, T, NCLIPS = 64, 5, 1
B = T * NCLIPS
RNG = np.random.default_rng(2)


def _tiny_gen_params():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return {
        "w1": 0.1 * jax.random.normal(k1, (3, 3, 6, 8), jnp.float32),
        "w2": 0.1 * jax.random.normal(k2, (3, 3, 8, 3), jnp.float32),
    }


def _tiny_gen_apply(params, mel, face):
    x = jax.lax.conv_general_dilated(face, params["w1"], (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.nn.relu(x + jnp.mean(mel))  # audio enters as a bias: enough for mechanics
    x = jax.lax.conv_general_dilated(x, params["w2"], (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.sigmoid(x)


def test_full_recipe_step_runs_and_learns():
    gen_p = _tiny_gen_params()
    disc_p = wav2lip_disc.init_params(jax.random.PRNGKey(1), img_size=S)
    sync_p = syncnet.init_params(jax.random.PRNGKey(2), img_size=S)

    tx_g, tx_d, step = make_full_train_step(gen_lr=3e-4, disc_lr=1e-4, T=T,
                                            gen_apply=_tiny_gen_apply)
    g_opt = tx_g.init(gen_p)
    d_opt = tx_d.init(disc_p)

    batch = {
        "mel": jnp.asarray(RNG.standard_normal((B, 80, 16, 1)).astype(np.float32)),
        "face": jnp.asarray(RNG.random((B, S, S, 6)).astype(np.float32)),
        "target": jnp.asarray(RNG.random((B, S, S, 3)).astype(np.float32)),
        "sync_mel": jnp.asarray(RNG.standard_normal((NCLIPS, 80, 16, 1)).astype(np.float32)),
    }

    w_before = np.asarray(gen_p["w1"]).copy()
    d_before = np.asarray(jax.tree.leaves(disc_p)[0]).copy()

    losses = []
    for _ in range(4):
        gen_p, disc_p, g_opt, d_opt, m = step(gen_p, disc_p, sync_p,
                                              g_opt, d_opt, batch)
        losses.append(float(m["l1"]))  # adversarial total is not monotone; reconstruction is
        for k in ("gen", "l1", "sync", "percep", "disc"):
            assert np.isfinite(float(m[k])), (k, m[k])

    assert losses[-1] < losses[0], losses
    assert not np.array_equal(w_before, np.asarray(gen_p["w1"]))
    assert not np.array_equal(d_before, np.asarray(jax.tree.leaves(disc_p)[0]))


def test_disc_logit_shape():
    p = wav2lip_disc.init_params(jax.random.PRNGKey(0), img_size=128)
    faces = jnp.asarray(RNG.random((2, 128, 128, 3)).astype(np.float32))
    logits = wav2lip_disc.apply(p, faces)
    assert logits.shape == (2,)
    assert float(wav2lip_disc.bce_logits(jnp.asarray([20.0]), 1.0)) < 1e-6
    assert float(wav2lip_disc.bce_logits(jnp.asarray([20.0]), 0.0)) > 10.0
