"""Cross-session batched feature encoding
(engine/feature_coalescer.py + whisper_features.make_batched_encode_factory):
batching/padding discipline and exact parity with the per-session
program."""

import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from livetalking_tpu.engine.feature_coalescer import FeatureCoalescer


def test_coalescer_batches_and_preserves_rows():
    calls = []

    def factory(k):
        def fn(wavs):
            calls.append((k, wavs.shape[0]))
            return wavs * 2.0  # row i result = 2 * wav i
        return fn

    fc = FeatureCoalescer(factory, window_samples=4, buckets=(1, 2, 4))
    fc.start()
    try:
        wavs = [np.full(4, i, np.float32) for i in range(3)]
        # submit 3 at once from threads so they coalesce into bucket 4
        futs = [None] * 3
        barrier = threading.Barrier(3)

        def go(i):
            barrier.wait()
            futs[i] = fc.submit(wavs[i])

        ts = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        outs = [np.asarray(futs[i].result(timeout=10)) for i in range(3)]
        for i, o in enumerate(outs):
            np.testing.assert_allclose(o, np.full(4, 2.0 * i, np.float32))
        assert fc.requests_run == 3
        # at least one batch ran; padding selected a real bucket size
        assert all(k in (1, 2, 4) for k, _ in calls)
    finally:
        fc.stop()


def test_coalescer_single_request_uses_small_bucket():
    sizes = []

    def factory(k):
        def fn(wavs):
            sizes.append(k)
            return wavs
        return fn

    fc = FeatureCoalescer(factory, window_samples=2, buckets=(1, 2, 8))
    fc.start()
    try:
        out = fc.encode(np.ones(2, np.float32))
        np.testing.assert_allclose(np.asarray(out), [1, 1])
        assert sizes == [1]
    finally:
        fc.stop()


def test_coalescer_submit_after_stop_raises():
    """A submit racing stop() must error immediately instead of
    enqueueing a Future the dead worker never resolves (the session's
    feature thread would hang forever)."""
    fc = FeatureCoalescer(lambda k: (lambda wavs: wavs),
                          window_samples=2, buckets=(1,))
    fc.start()
    fc.stop()
    import pytest

    with pytest.raises(RuntimeError):
        fc.submit(np.zeros(2, np.float32))


def test_run_step_survives_coalescer_failure():
    """A wedged/stopped coalescer (encode raises — e.g. bounded-wait
    timeout behind a dead TPU tunnel) must NOT kill the session render
    loop: run_step degrades to silence features for the tick (reference
    degradation model) instead of propagating."""
    from types import SimpleNamespace

    from livetalking_tpu.audio_features.whisper_features import WhisperFeatures
    from livetalking_tpu.models import whisper_encoder as we

    class WedgedCoalescer:
        def encode(self, wav):
            raise RuntimeError("worker wedged")

    cfg = we.WhisperConfig(num_layers=1, d_model=64, num_heads=2, ffn=128)
    params = we.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, l, r = 4, 2, 2
    opt = SimpleNamespace(fps=25, batch_size=B, l=l, r=r)
    wf = WhisperFeatures(opt, None, whisper_params=params, whisper_cfg=cfg,
                         coalescer=WedgedCoalescer())
    wf.warm_up()
    for _ in range(2 * B):
        wf.put_audio_frame(np.ones(wf.chunk, np.float32) * 0.1)
    wf.run_step()  # must not raise
    feats = np.asarray(wf.get_next_feat(timeout=1))
    assert feats.shape[0] == B
    np.testing.assert_array_equal(feats, np.zeros_like(feats))


def test_batched_whisper_factory_fps_matches_extractor():
    """The coalescer window length must track --fps: a session built at
    a non-default fps pads to chunk = 16000/(fps*2) samples per frame,
    and a factory hardcoded to 25 fps would assert on every submit."""
    from types import SimpleNamespace

    from livetalking_tpu.audio_features.whisper_features import (
        WhisperFeatures,
        make_batched_encode_factory,
    )
    from livetalking_tpu.models import whisper_encoder as we

    cfg = we.WhisperConfig(num_layers=1, d_model=64, num_heads=2, ffn=128)
    params = we.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, l, r, fps = 4, 10, 10, 50
    opt = SimpleNamespace(fps=fps, batch_size=B, l=l, r=r)
    wf = WhisperFeatures(opt, None, whisper_params=params, whisper_cfg=cfg)
    _factory, n_samples = make_batched_encode_factory(
        params, cfg, batch_size=B, l=l, r=r, fps=fps)
    assert n_samples == wf._n_samples


def test_batched_whisper_factory_matches_solo(rng):
    """Rows of the batched encode equal the per-session program output —
    sessions see identical features whether or not they coalesce."""
    from types import SimpleNamespace

    from livetalking_tpu.audio_features.whisper_features import (
        WhisperFeatures,
        make_batched_encode_factory,
    )
    from livetalking_tpu.models import whisper_encoder as we

    cfg = we.WhisperConfig(num_layers=1, d_model=64, num_heads=2, ffn=128)
    params = we.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    B, l, r = 4, 10, 10
    opt = SimpleNamespace(fps=25, batch_size=B, l=l, r=r)
    wf = WhisperFeatures(opt, None, whisper_params=params, whisper_cfg=cfg)

    factory, n_samples = make_batched_encode_factory(
        params, cfg, batch_size=B, l=l, r=r)
    assert n_samples == wf._n_samples

    wavs = rng.standard_normal((2, n_samples)).astype(np.float32) * 0.1
    batched = factory(2)(wavs)
    for i in range(2):
        solo = np.asarray(wf._fn(jnp.asarray(wavs[i])))
        np.testing.assert_allclose(np.asarray(batched[i]), solo,
                                   atol=2e-4, rtol=2e-4)


def test_coalescer_window_aligns_staggered_sessions():
    """r4: paced sessions request encodes staggered across the period;
    with an alignment window and coalescing history, staggered requests
    land on ONE batched encode — and a lone session never waits."""
    calls = []

    def factory(k):
        def fn(wavs):
            calls.append((k, wavs.shape[0]))
            return wavs * 2.0
        return fn

    fc = FeatureCoalescer(factory, window_samples=4, buckets=(1, 2, 4),
                          coalesce_window_s=0.4)
    fc.start()
    try:
        # no history: a lone request returns without waiting the window
        t0 = time.monotonic()
        fc.encode(np.zeros(4, np.float32))
        assert time.monotonic() - t0 < 0.3, "lone session waited the window"
        # with 2-wide history, two staggered requests share one batch
        fc._launch_sizes.append(2)
        f1 = fc.submit(np.full(4, 1, np.float32))
        time.sleep(0.1)
        f2 = fc.submit(np.full(4, 2, np.float32))
        o1 = np.asarray(f1.result(timeout=10))
        o2 = np.asarray(f2.result(timeout=10))
        np.testing.assert_allclose(o1, np.full(4, 2.0, np.float32))
        np.testing.assert_allclose(o2, np.full(4, 4.0, np.float32))
        assert calls[-1][0] == 2, calls  # one bucket-2 round, not two singles
    finally:
        fc.stop()
