"""Cross-session batch scheduler tests (CPU).

Verifies: store packing + global indexing, coalescing of concurrently
queued requests into one bucketed super-batch, result scatter correctness
vs direct per-session steps, padding behavior, and error propagation.
"""

import threading
import time
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livetalking_tpu.engine.scheduler import AvatarStore, BatchScheduler

B = 2
S = 16  # tiny "image" size; the scheduler is model-agnostic


def tiny_step_factory(params):
    """A stand-in fused step: gather + add a feature-derived offset."""

    def factory(total):
        @jax.jit
        def step(p, buffer, idxs, mel):
            faces = jnp.take(buffer, idxs, axis=0).astype(jnp.float32)
            bias = jnp.sum(mel, axis=(1, 2))[:, None, None, None]
            return jnp.clip(faces + p["gain"] * bias, 0, 255).astype(jnp.uint8)

        return step

    return factory


@pytest.fixture
def store():
    st = AvatarStore(img_size=S)
    rng = np.random.default_rng(0)
    st.add("a1", rng.integers(0, 200, (4, S, S, 3), dtype=np.uint8))
    st.add("a2", rng.integers(0, 200, (6, S, S, 3), dtype=np.uint8))
    return st


@pytest.fixture
def sched(store):
    params = {"gain": jnp.asarray(1.0)}
    s = BatchScheduler(params, store, tiny_step_factory(params), B, buckets=(1, 2, 4))
    s.start()
    yield s
    s.stop()


def _expected(store, params, idxs, mel):
    buf = np.asarray(store.buffer)
    faces = buf[idxs].astype(np.float64)
    bias = mel.sum(axis=(1, 2))[:, None, None, None]
    return np.clip(faces + bias, 0, 255).astype(np.uint8)


def test_store_offsets(store):
    assert store.lookup("a1") == (0, 4)
    assert store.lookup("a2") == (4, 6)
    assert store.buffer.shape == (10, S, S, 3)
    # re-adding is idempotent
    assert store.add("a1", np.zeros((4, S, S, 3), np.uint8)) == (0, 4)


def test_store_aux_planes():
    """Aux planes pack alongside the cycle with the same offsets; later
    adds must supply the same plane set with matching item shapes."""
    st = AvatarStore(img_size=S)
    rng = np.random.default_rng(2)
    cyc1 = rng.integers(0, 200, (4, S, S, 3), dtype=np.uint8)
    aux1 = {"frames": rng.integers(0, 255, (4, 32, 48, 3), dtype=np.uint8),
            "geom": np.arange(8, dtype=np.int32).reshape(4, 2)}
    st.add("a1", cyc1, aux=aux1)
    assert st.aux["frames"].shape == (4, 32, 48, 3)

    # plane-set mismatch rejected
    with pytest.raises(ValueError):
        st.add("bad1", cyc1.copy(), aux={"frames": aux1["frames"]})
    # length mismatch rejected
    with pytest.raises(ValueError):
        st.add("bad2", cyc1.copy(),
               aux={"frames": aux1["frames"][:2], "geom": aux1["geom"]})
    # item-shape mismatch rejected
    with pytest.raises(ValueError):
        st.add("bad3", cyc1.copy(),
               aux={"frames": np.zeros((4, 16, 48, 3), np.uint8),
                    "geom": aux1["geom"]})

    cyc2 = rng.integers(0, 200, (3, S, S, 3), dtype=np.uint8)
    aux2 = {"frames": rng.integers(0, 255, (3, 32, 48, 3), dtype=np.uint8),
            "geom": np.ones((3, 2), np.int32)}
    off, n = st.add("a2", cyc2, aux=aux2)
    assert (off, n) == (4, 3)
    assert st.aux["frames"].shape == (7, 32, 48, 3)
    np.testing.assert_array_equal(np.asarray(st.aux["geom"])[4:], aux2["geom"])


def test_latency_and_batchsize_recorded(sched, store):
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((B, 4, 4)).astype(np.float32)
    sched.infer(np.asarray([0, 1], np.int32), mel)
    assert len(sched.latency_s) >= 1 and sched.latency_s[-1] >= 0.0
    assert sched.batch_sizes[-1] >= 1


def test_single_request_roundtrip(sched, store):
    rng = np.random.default_rng(1)
    idxs = np.array([1, 5], np.int32)
    mel = rng.random((B, 3, 4)).astype(np.float32)
    got = sched.infer(idxs, mel)
    np.testing.assert_array_equal(got, _expected(store, None, idxs, mel))


def test_concurrent_requests_coalesce_and_scatter(store):
    """Preload the queue BEFORE the first start() so all 4 requests
    deterministically coalesce into one super-batch (submit-after-stop
    raises by contract, so the old stop/submit/start trick is illegal)."""
    params = {"gain": jnp.asarray(1.0)}
    sched = BatchScheduler(params, store, tiny_step_factory(params), B,
                           buckets=(1, 2, 4))
    rng = np.random.default_rng(2)
    n_sessions = 4
    payloads = [
        (np.array([i, i + 3], np.int32), rng.random((B, 3, 4)).astype(np.float32))
        for i in range(n_sessions)
    ]
    futs = [sched.submit(i, m) for i, m in payloads]
    sched.start()
    try:
        results = [f.result(timeout=30) for f in futs]
        assert sched.batches_run == 1, "4 queued requests should run as one batch"
        for (idxs, mel), got in zip(payloads, results):
            np.testing.assert_array_equal(got, _expected(store, None, idxs, mel))
    finally:
        sched.stop()


def test_padding_bucket(store):
    """3 requests -> bucket 4 with padding; results still correct.

    Submits BEFORE the first start() so all 3 requests deterministically
    coalesce into one padded super-batch (submit-after-stop raises by
    contract, so the old stop/submit/start trick is no longer legal)."""
    params = {"gain": jnp.asarray(1.0)}
    sched = BatchScheduler(params, store, tiny_step_factory(params), B,
                           buckets=(1, 2, 4))
    rng = np.random.default_rng(3)
    payloads = [
        (np.array([i, i + 1], np.int32), rng.random((B, 3, 4)).astype(np.float32))
        for i in range(3)
    ]
    futs = [sched.submit(i, m) for i, m in payloads]
    sched.start()
    try:
        for (idxs, mel), f in zip(payloads, futs):
            np.testing.assert_array_equal(
                f.result(timeout=30), _expected(store, None, idxs, mel))
    finally:
        sched.stop()


def test_submit_after_stop_raises_and_stop_drains(store):
    """submit() racing stop() must error immediately, and stop() must
    fail any still-queued Future — a session's inference thread must
    never block forever on a dead worker."""
    params = {"gain": jnp.asarray(1.0)}
    sched = BatchScheduler(params, store, tiny_step_factory(params), B,
                           buckets=(1,))
    # queued before any worker ever runs: stop() must resolve it
    fut = sched.submit(np.array([0, 1], np.int32),
                       np.zeros((B, 3, 4), np.float32))
    sched.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        fut.result(timeout=5)
    with pytest.raises(RuntimeError, match="stopped"):
        sched.submit(np.array([0, 1], np.int32),
                     np.zeros((B, 3, 4), np.float32))


def test_error_propagates_to_future(store):
    params = {"gain": jnp.asarray(1.0)}

    def bad_factory(n):
        def step(p, buffer, idxs, mel):
            raise RuntimeError("boom")

        return step

    s = BatchScheduler(params, store, bad_factory, B, buckets=(1,))
    s.start()
    fut = s.submit(np.array([0, 1], np.int32), np.zeros((B, 3, 4), np.float32))
    with pytest.raises(RuntimeError, match="boom"):
        fut.result(timeout=10)
    s.stop()


def test_resolve_never_clobbers_open_compile_grace(sched, store):
    """ADVICE r3 (medium): while a cold bucket compiles on the dispatch
    thread, a concurrently completing batch must NOT shrink the grace
    window (the old global-deadline scheme let _resolve clamp it to
    now+120s, timing out sessions behind a legitimate multi-minute
    compile). Grace state is owned by _dispatch alone now."""
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((B, 4, 4)).astype(np.float32)
    sched.infer(np.asarray([0, 1], np.int32), mel)  # warm bucket 1
    # simulate an in-progress cold compile of ANOTHER bucket
    sched._compiling = True
    sched._compile_started = time.monotonic()
    try:
        assert sched._in_grace(time.monotonic())
        # an unrelated warm batch completes while the compile runs
        sched.infer(np.asarray([0, 1], np.int32), mel)
        assert sched._compiling and sched._in_grace(time.monotonic()), (
            "completed batch clobbered the open compile grace")
        # a hung compile stops extending after first_contact_timeout
        sched._grace_deadline = 0.0
        sched._compile_started = (time.monotonic()
                                  - sched.first_contact_timeout - 1)
        assert not sched._in_grace(time.monotonic())
    finally:
        sched._compiling = False


def test_stop_fails_held_batches_and_stays_bounded(store):
    """ADVICE r3: stop() must not launch NEW device work for still-held
    batches (unbounded shutdown overlapping interpreter teardown) — held
    futures fail fast, in-flight ones still resolve."""
    params = {"gain": jnp.float32(0.0)}

    def slow_factory(total):
        def step(p, buffer, idxs, mel):
            time.sleep(0.5)
            return np.zeros((total, S, S, 3), np.uint8)
        return step

    sched = BatchScheduler(params, store, slow_factory, B, buckets=(1,))
    sched.start()
    mel = np.zeros((B, 4, 4), np.float32)
    futs = [sched.submit(np.array([0, 1], np.int32), mel) for _ in range(5)]
    time.sleep(0.2)  # let the worker dispatch the first two (double buffer)
    t0 = time.monotonic()
    sched.stop()
    assert time.monotonic() - t0 < 10.0
    outcomes = []
    for f in futs:
        try:
            f.result(timeout=5)
            outcomes.append("ok")
        except RuntimeError as e:
            assert "stopped" in str(e)
            outcomes.append("stopped")
    # the ones in flight at stop() resolve; the held tail fails fast
    assert "stopped" in outcomes, outcomes
    assert outcomes[0] == "ok", outcomes


def test_prewarm_compiles_every_bucket(store):
    """r4: prewarm() runs every bucket program once so first-contact
    compiles never land inside live traffic or a measurement window."""
    params = {"gain": jnp.asarray(1.0)}
    s = BatchScheduler(params, store, tiny_step_factory(params), B,
                       buckets=(1, 2, 4))
    s.prewarm((4, 4))
    assert s._warm_buckets == {1, 2, 4}
    s.start()
    try:
        mel = np.zeros((B, 4, 4), np.float32)
        out = s.infer(np.asarray([0, 1], np.int32), mel)
        assert out.shape == (B, S, S, 3)
    finally:
        s.stop()


def test_prewarm_async_warms_and_sync_call_blocks_on_it(store):
    """r4 production path: the first session kicks prewarm_async; a
    synchronous prewarm (the bench) made while it runs must block until
    every bucket is genuinely warm, not return early on the lock."""
    import threading

    params = {"gain": jnp.asarray(1.0)}
    gate = threading.Event()
    base = tiny_step_factory(params)

    def gated_factory(total):
        step = base(total)

        def wrapped(p, buffer, idxs, mel):
            gate.wait(timeout=10.0)
            return step(p, buffer, idxs, mel)
        return wrapped

    s = BatchScheduler(params, store, gated_factory, B, buckets=(1, 2, 4))
    t = s.prewarm_async((4, 4))
    assert s._warm_buckets != {1, 2, 4}  # still gated
    gate.set()
    s.prewarm((4, 4))  # must block until the async pass finishes
    assert s._warm_buckets == {1, 2, 4}
    t.join(timeout=10.0)
    assert not t.is_alive()
    s.start()
    s.stop()  # also drains _prewarm_thread bookkeeping


def test_prewarm_async_aborts_remaining_buckets_on_stop(store):
    """stop() must not leave a background prewarm issuing device work:
    buckets not yet compiled when _quit is set are skipped."""
    import threading

    params = {"gain": jnp.asarray(1.0)}
    release = threading.Event()
    base = tiny_step_factory(params)
    calls = []

    def gated_factory(total):
        step = base(total)

        def wrapped(p, buffer, idxs, mel):
            calls.append(total)
            release.wait(timeout=10.0)
            return step(p, buffer, idxs, mel)
        return wrapped

    s = BatchScheduler(params, store, gated_factory, B, buckets=(1, 2, 4))
    s.start()
    s.prewarm_async((4, 4))
    deadline = time.monotonic() + 5.0
    while not calls and time.monotonic() < deadline:
        time.sleep(0.01)
    assert calls  # bucket 1's program is mid-"compile"
    s._quit.set()
    release.set()
    s.stop()
    # bucket 1 finished (it was in progress); 2 and 4 were skipped
    assert 1 in s._warm_buckets
    assert s._warm_buckets != {1, 2, 4}


def test_warm_buckets_invalidated_by_store_growth(store):
    """A later avatar registration grows the shared cycle buffer, which
    retraces every bucket program. Warmth is keyed to the buffer shape
    so the recompile runs as a COLD dispatch (compile-grace open)
    instead of timing out waiters mid-compile, and results stay correct
    against the grown buffer."""
    params = {"gain": jnp.asarray(1.0)}
    s = BatchScheduler(params, store, tiny_step_factory(params), B,
                       buckets=(1, 2))
    s.prewarm((4, 4))
    assert s._is_warm(1, store.buffer) and s._is_warm(2, store.buffer)
    rng = np.random.default_rng(1)
    store.add("a3", rng.integers(0, 200, (3, S, S, 3), dtype=np.uint8))
    assert not s._is_warm(1, store.buffer)  # growth invalidates warmth
    s.start()
    try:
        mel = np.zeros((B, 4, 4), np.float32)
        idxs = np.asarray([10, 11], np.int32)  # rows of the NEW avatar
        out = s.infer(idxs, mel)
        np.testing.assert_array_equal(out, _expected(store, params, idxs, mel))
    finally:
        s.stop()
    assert s._is_warm(1, store.buffer)  # re-warmed at the grown shape


def test_coalesce_window_aligns_idle_device_sessions(store):
    """r4 low-latency tier: with the device IDLE (real-time-paced serving,
    not the saturated bench), staggered submissions within the alignment
    window must land on ONE super-batch instead of dispatch-on-arrival
    singles — but only once history proves other sessions exist."""
    params = {"gain": jnp.asarray(0.0)}
    sched = BatchScheduler(params, store, tiny_step_factory(params), B,
                           buckets=(1, 2, 4), coalesce_window_s=0.4)
    sched.start()
    mel = np.zeros((B, 4, 4), np.float32)
    try:
        # 1) no coalescing history -> a lone request never waits the window
        t0 = time.monotonic()
        sched.infer(np.asarray([0, 1], np.int32), mel)
        assert time.monotonic() - t0 < 0.3, "lone session waited the window"
        # 2) with history of 2-wide rounds, two staggered idle-device
        #    submissions align onto one batch
        sched._launch_sizes.append(2)
        f1 = sched.submit(np.asarray([0, 1], np.int32), mel)
        time.sleep(0.1)  # stagger well past a CPU step, inside the window
        f2 = sched.submit(np.asarray([2, 3], np.int32), mel)
        f1.result(timeout=10); f2.result(timeout=10)
        assert sched.batch_sizes[-1] == 2, list(sched.batch_sizes)
        # 3) target reached -> dispatch well before the window expires
        sched.coalesce_window_s = 30.0
        sched._launch_sizes.append(2)
        t0 = time.monotonic()
        f1 = sched.submit(np.asarray([0, 1], np.int32), mel)
        f2 = sched.submit(np.asarray([2, 3], np.int32), mel)
        f1.result(timeout=10); f2.result(timeout=10)
        assert time.monotonic() - t0 < 5.0, "held past a full target set"
    finally:
        sched.stop()


def test_hold_policy_aligns_staggered_sessions(store):
    """Free-running closed-loop sessions that submit slightly staggered
    must converge onto FULL super-batches: while a batch is in flight the
    scheduler holds partial batches (the step duration is the alignment
    window). The r3 8-session engine run measured mean batch size 2.67/8
    under dispatch-on-arrival — this pins the fix."""
    N = 4
    params = {"gain": jnp.float32(0.0)}

    def slow_factory(total):
        @jax.jit
        def step(p, buffer, idxs, mel):
            return jnp.take(buffer, idxs, axis=0).astype(jnp.uint8)

        def wrapped(p, buffer, idxs, mel):
            time.sleep(0.05)  # stand-in for a long device step
            return step(p, buffer, idxs, mel)
        return wrapped

    offs = []
    for i in range(N):
        off, _ = store.add(f"h{i}", np.zeros((6, S, S, 3), np.uint8))
        offs.append(off)
    sched = BatchScheduler(params, store, slow_factory, B, buckets=(1, 2, 4))
    sched.start()
    try:
        stop = threading.Event()

        def session(i):
            idxs = (offs[i] + np.arange(B)).astype(np.int32)
            mel = np.zeros((B, 4, 4), np.float32)
            time.sleep(0.003 * i)  # initial stagger
            while not stop.is_set():
                sched.infer(idxs, mel)

        threads = [threading.Thread(target=session, args=(i,), daemon=True)
                   for i in range(N)]
        for t in threads:
            t.start()
        time.sleep(2.0)
        stop.set()
        for t in threads:
            t.join(timeout=10)
    finally:
        sched.stop()
    sizes = list(sched.batch_sizes)
    assert len(sizes) >= 5, sizes
    steady = sizes[2:]
    # steady state must lock onto full batches (allow the odd partial
    # from thread-scheduling noise)
    full = sum(1 for s in steady if s == N)
    assert full / len(steady) >= 0.8, sizes


def test_prewarm_repasses_when_store_grows_mid_pass(store):
    """r5: an avatar registering DURING a prewarm pass grows the shared
    buffer and invalidates buckets already compiled that pass; prewarm
    must re-pass until every bucket is warm for the FINAL buffer
    (observed in the ultralight engine test: bucket 1 stayed cold for
    the 2-avatar buffer and the first live dispatch ate the compile)."""
    params = {"gain": jnp.asarray(1.0)}
    base = tiny_step_factory(params)
    grown = []

    def growing_factory(total):
        step = base(total)

        def wrapped(p, buffer, idxs, mel):
            if not grown:  # grow the store mid-pass, exactly once
                grown.append(True)
                rng = np.random.default_rng(9)
                store.add("late", rng.integers(0, 200, (3, S, S, 3),
                                               dtype=np.uint8))
            return step(p, buffer, idxs, mel)
        return wrapped

    s = BatchScheduler(params, store, growing_factory, B, buckets=(1, 2, 4))
    s.prewarm((4, 4))
    final_shape = tuple(store.buffer.shape)
    assert s._warm_shape == final_shape
    assert s._warm_buckets == {1, 2, 4}
