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


def test_batch_scheduler_with_sharded_infer_fn():
    """The coalescing BatchScheduler running the dp+tp-sharded MuseTalk
    step on the 8-device CPU mesh produces the SAME frames as the
    unsharded step — the serving path of SURVEY §2.10(b) exercised
    through the real scheduler machinery (VERDICT r1 item 6)."""
    from livetalking_tpu.engine.scheduler import AvatarStore, BatchScheduler
    from livetalking_tpu.models import musetalk as mt
    from livetalking_tpu.models import sd_unet, sd_vae

    cfg = sd_unet.UNetConfig(block_out=(32, 64, 128, 128), heads=2)
    unet_params = sd_unet.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    vae_params = sd_vae.init_params(jax.random.PRNGKey(1), dtype=jnp.float32)

    B = 4  # per-session batch; super-batch = 2 sessions -> 8 (divisible by dp)
    rng = np.random.default_rng(0)
    cyc1 = rng.standard_normal((3, 16, 16, 8)).astype(np.float32)
    cyc2 = rng.standard_normal((4, 16, 16, 8)).astype(np.float32)

    mesh = make_mesh("dp=4,tp=2")
    u_sh = shard_params(unet_params, mesh)
    v_sh = shard_params(vae_params, mesh)

    store = AvatarStore(item_shape=(16, 16, 8), dtype=np.float32)
    off1, _ = store.add("a1", cyc1)
    off2, _ = store.add("a2", cyc2)

    def step_factory(total):
        step = mt.make_sharded_infer_fn(cfg, total, mesh, dtype=jnp.float32)

        def wrapped(params, buffer, idxs, whisper):
            return step(params[0], params[1], buffer, idxs, whisper)
        return wrapped

    sched = BatchScheduler((u_sh, v_sh), store, step_factory, B,
                           buckets=(2,))
    sched.start()
    try:
        w1 = rng.standard_normal((B, 50, 384)).astype(np.float32)
        w2 = rng.standard_normal((B, 50, 384)).astype(np.float32)
        i1 = (off1 + np.arange(B) % 3).astype(np.int32)
        i2 = (off2 + np.arange(B) % 4).astype(np.int32)
        f1 = sched.submit(i1, w1)
        f2 = sched.submit(i2, w2)
        got1, got2 = f1.result(timeout=300), f2.result(timeout=300)
    finally:
        sched.stop()

    ref_step = mt.make_infer_fn(cfg, B, dtype=jnp.float32)
    want1 = np.asarray(ref_step(unet_params, vae_params,
                                jnp.asarray(cyc1),
                                jnp.asarray(np.arange(B) % 3),
                                jnp.asarray(w1)))
    want2 = np.asarray(ref_step(unet_params, vae_params,
                                jnp.asarray(cyc2),
                                jnp.asarray(np.arange(B) % 4),
                                jnp.asarray(w2)))
    # identical math, different reduction/layout order: allow 1 lsb
    assert np.abs(got1.astype(np.int32) - want1.astype(np.int32)).max() <= 1
    assert np.abs(got2.astype(np.int32) - want2.astype(np.int32)).max() <= 1


def test_sharded_wav2lip_infer_matches_single_device():
    """dp-sharded wav2lip infer round (params tp-sharded via shard_params,
    batch over dp) matches the unsharded single-device fused step to 1
    uint8 lsb — mirrors the parity assert inside
    __graft_entry__.dryrun_multichip (VERDICT r4 item 6)."""
    from jax.sharding import NamedSharding

    from livetalking_tpu.models import wav2lip as w2l
    from livetalking_tpu.parallel.mesh import DP_AXIS, make_mesh

    params = w2l.init_params(jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    B, S = 4, 256  # 8 stride-2 encoder stacks pin the spatial size to 256
    cycle = rng.integers(0, 255, (4, S, S, 3)).astype(np.uint8)
    idxs = np.arange(B, dtype=np.int32) % 4
    mel = rng.standard_normal((B, 80, 16)).astype(np.float32)

    infer = w2l.make_infer_fn(B, S, dtype=jnp.float32)
    ref = np.asarray(infer(params, jnp.asarray(cycle), jnp.asarray(idxs),
                           jnp.asarray(mel)))

    mesh = make_mesh("dp=4,tp=2")
    dpb = NamedSharding(mesh, P(DP_AXIS))
    rep = NamedSharding(mesh, P())
    out = np.asarray(infer(
        shard_params(params, mesh),
        jax.device_put(cycle, rep),
        jax.device_put(idxs, dpb),
        jax.device_put(mel, dpb)))

    assert np.abs(ref.astype(np.int32) - out.astype(np.int32)).max() <= 1
