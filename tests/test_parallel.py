"""Mesh/sharding unit tests on the 8-device virtual CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from livetalking_tpu.parallel.mesh import (
    default_mesh_for,
    make_mesh,
    parse_mesh_spec,
    shard_batch,
    shard_params,
)


def test_parse_mesh_spec():
    assert parse_mesh_spec("dp=4,tp=2") == {"dp": 4, "tp": 2}
    assert parse_mesh_spec("dp=8") == {"dp": 8}


def test_make_mesh_validates_device_count():
    with pytest.raises(ValueError, match="devices"):
        make_mesh("dp=3,tp=5")


def test_make_mesh_shapes():
    mesh = make_mesh("dp=4,tp=2")
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    assert default_mesh_for(8).shape["tp"] == 2


def test_shard_params_rule():
    mesh = make_mesh("dp=4,tp=2")
    params = {
        "big": jnp.zeros((3, 3, 64, 256)),   # sharded on O
        "small": jnp.zeros((3, 3, 3, 16)),   # replicated (small O)
        "bias": jnp.zeros((256,)),           # sharded
        "tiny_bias": jnp.zeros((16,)),       # replicated
    }
    sharded = shard_params(params, mesh)
    assert sharded["big"].sharding.spec == P(None, None, None, "tp")
    assert sharded["small"].sharding.spec == P()
    assert sharded["bias"].sharding.spec == P("tp")
    assert sharded["tiny_bias"].sharding.spec == P()


def test_dp_batch_step_produces_correct_math():
    """A sharded computation over dp must equal the single-device result."""
    mesh = make_mesh("dp=8")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32)).astype(np.float32)
    w = rng.standard_normal((32, 8)).astype(np.float32)

    xb = shard_batch({"x": x}, mesh)["x"]
    wd = jax.device_put(w)

    @jax.jit
    def f(x, w):
        return jnp.tanh(x @ w).sum(axis=1)

    got = np.asarray(f(xb, wd))
    want = np.tanh(x @ w).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_musetalk_infer_matches_single_device():
    """Tensor+data-sharded MuseTalk step (models/musetalk.py
    make_sharded_infer_fn) on the 8-device CPU mesh produces the same
    frames as the single-device fused step."""
    import jax.numpy as jnp
    import numpy as np

    from livetalking_tpu.models import musetalk as mt
    from livetalking_tpu.models import sd_unet, sd_vae
    from livetalking_tpu.parallel.mesh import make_mesh, replicate, shard_params

    cfg = sd_unet.UNetConfig(block_out=(32, 64, 128, 128), heads=2)
    unet_params = sd_unet.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    vae_params = sd_vae.init_params(jax.random.PRNGKey(1), dtype=jnp.float32)

    B = 4
    rng = np.random.default_rng(0)
    cycle = jnp.asarray(rng.standard_normal((4, 16, 16, 8)).astype(np.float32))  # 128px decode: 4x cheaper on the 1-core CI host
    idxs = jnp.asarray(np.arange(B, dtype=np.int32) % 4)
    whisper = jnp.asarray(rng.standard_normal((B, 50, 384)).astype(np.float32))

    ref = mt.make_infer_fn(cfg, B, dtype=jnp.float32)(
        unet_params, vae_params, cycle, idxs, whisper)

    mesh = make_mesh("dp=4,tp=2")
    u_sh = shard_params(unet_params, mesh)
    v_sh = shard_params(vae_params, mesh)
    step = mt.make_sharded_infer_fn(cfg, B, mesh, dtype=jnp.float32)
    out = step(u_sh, v_sh, cycle, idxs, whisper)

    a, b = np.asarray(ref).astype(np.int32), np.asarray(out).astype(np.int32)
    # identical math, different reduction/layout order: allow 1 lsb
    assert np.abs(a - b).max() <= 1
