"""Cross-session batched feature encoding.

The measured failure mode of per-session feature extraction under
--coalesce (SERVING_r02.json "per_session_feats_naive"): each session
serializes its own whisper encode before submitting to the
BatchScheduler, so submissions stagger, super-batches coalesce poorly
(<3 of 8 sessions) and bucket padding wastes the rest of the device —
9.6 fps/session vs 27.2 with coalesced features.

This worker fixes it in the pipeline itself: sessions submit their
rolling audio windows; one device worker drains whatever is queued and
runs ONE batched encode per tick (bucketed padding, same discipline as
engine/scheduler.py). Results resolve to device-resident rows of the
batched output (no host round-trip) and the per-session feature threads
then hit the BatchScheduler nearly simultaneously.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeout
from queue import Empty, Queue
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from livetalking_tpu.utils.logger import logger


class FeatureCoalescer:
    """One device worker batching fixed-size feature-encode requests.

    ``batched_fn_factory(k)`` must return a device fn
    ``(k, window_samples) float32 -> (k, ...)`` (e.g. a jitted batched
    whisper encode). ``buckets`` are the batch sizes compiled; padding
    absorbs request counts in between.
    """

    def __init__(self, batched_fn_factory: Callable[[int], Callable],
                 window_samples: int,
                 buckets: Sequence[int] = (1, 2, 4, 8),
                 coalesce_window_s: float = 0.0):
        self.window_samples = int(window_samples)
        self.buckets = sorted(buckets)
        # session-alignment window (same contract as
        # BatchScheduler.coalesce_window_s): real-time-paced sessions
        # request encodes staggered across the period, and
        # dispatch-on-arrival then runs tiny encode batches (measured
        # 2.1/8 mean at batch_size=4 — dozens of extra device programs
        # per second). Hold the first request up to this window for the
        # other active sessions; the adaptive target means a lone
        # session never waits.
        self.coalesce_window_s = float(coalesce_window_s)
        self._launch_sizes: "deque[int]" = deque(maxlen=16)
        self._factory = batched_fn_factory
        self._fns: Dict[int, Callable] = {}  # lazy per-bucket compile
        self._queue: "Queue[Tuple[np.ndarray, Future]]" = Queue()
        self._quit = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.batches_run = 0
        self.requests_run = 0
        # compile grace (same contract as BatchScheduler): first-contact
        # bucket compiles — and waiting behind ANOTHER worker's compile
        # on the shared device — can take minutes; encode() must not
        # misread that as a wedged device. Scoped like the scheduler's
        # (r4): an in-progress flag bounded by first_contact_timeout plus
        # a short post-compile collection window; completions of other
        # batches never shrink an open compile window.
        self.first_contact_timeout = 900.0
        self.post_compile_grace = 120.0
        self._warm: set = set()
        self._compiling = False
        self._compile_started = 0.0
        self._grace_deadline = 0.0

    def _in_grace(self, now: float) -> bool:
        if self._compiling and (now - self._compile_started
                                < self.first_contact_timeout):
            return True
        return now < self._grace_deadline

    def submit(self, wav: np.ndarray) -> Future:
        assert wav.shape == (self.window_samples,), wav.shape
        if self._quit.is_set():
            # a submit racing stop() would enqueue a Future no worker
            # ever resolves (the stop-side drain runs only once)
            raise RuntimeError("feature coalescer stopped")
        fut: Future = Future()
        self._queue.put((np.asarray(wav, np.float32), fut))
        return fut

    def encode(self, wav: np.ndarray, timeout: float = 120.0):
        """Bounded wait: a wedged device must surface as an error in the
        session's feature thread, not a silent permanent hang — but a
        legitimate first-contact bucket compile extends the bound (see
        BatchScheduler.infer)."""
        fut = self.submit(wav)
        deadline = time.monotonic() + timeout
        while True:
            try:
                return fut.result(timeout=2.0)
            except FutureTimeout:
                now = time.monotonic()
                if now < deadline or self._in_grace(now):
                    continue
                raise

    def start(self) -> None:
        if self._thread is not None:
            return
        from livetalking_tpu.utils.lifecycle import register
        register(self)  # stop before interpreter teardown (XLA exit crash)
        self._quit.clear()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="feature-coalescer")
        self._thread.start()

    def stop(self) -> None:
        self._quit.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        # fail any request still queued so no session blocks forever on
        # a Future the dead worker will never resolve
        while True:
            try:
                _w, f = self._queue.get_nowait()
            except Empty:
                break
            if not f.done():
                f.set_exception(RuntimeError("feature coalescer stopped"))

    def prewarm(self) -> threading.Thread:
        """Compile every bucket's batched program in the background (a
        first-contact compile inside the worker would stall all sessions'
        feature encodes while the remote compiler runs)."""

        def warm():
            for b in self.buckets:
                try:
                    if b not in self._fns:
                        self._fns[b] = self._factory(b)
                    self._fns[b](np.zeros((b, self.window_samples),
                                          np.float32))
                    self._warm.add(b)
                except Exception:
                    logger.exception("feature coalescer prewarm(%d) failed", b)

        t = threading.Thread(target=warm, daemon=True,
                             name="feature-coalescer-warm")
        t.start()
        return t

    def _run(self) -> None:
        logger.info("feature coalescer start (buckets=%s)", self.buckets)
        while not self._quit.is_set():
            try:
                first = self._queue.get(timeout=0.5)
            except Empty:
                continue
            reqs = [first]
            maxb = self.buckets[-1]
            # alignment hold: wait up to the window for the other active
            # sessions' requests — but only as long as recent rounds
            # prove they exist (adaptive target), so a lone session
            # never waits
            target = min(max(self._launch_sizes, default=1), maxb)
            deadline = time.monotonic() + self.coalesce_window_s
            while len(reqs) < maxb and not self._quit.is_set():
                try:
                    reqs.append(self._queue.get_nowait())
                    continue
                except Empty:
                    pass
                if len(reqs) >= target:
                    break
                wait = deadline - time.monotonic()
                if wait <= 0:
                    break
                try:
                    reqs.append(self._queue.get(timeout=min(wait, 0.01)))
                except Empty:
                    pass
            self._launch_sizes.append(len(reqs))
            bucket = next(b for b in self.buckets if b >= len(reqs))
            cold = bucket not in self._warm
            if cold:
                self._compile_started = time.monotonic()
                self._compiling = True
            if bucket not in self._fns:
                self._fns[bucket] = self._factory(bucket)
            wavs = np.zeros((bucket, self.window_samples), np.float32)
            for i, (w, _f) in enumerate(reqs):
                wavs[i] = w
            try:
                out = self._fns[bucket](wavs)
                self._warm.add(bucket)
                for i, (_w, f) in enumerate(reqs):
                    if not f.done():
                        f.set_result(out[i])  # device-resident row
            except Exception as e:
                logger.exception("feature coalescer encode failed")
                for _w, f in reqs:
                    if not f.done():
                        f.set_exception(e)
            finally:
                if cold:
                    self._grace_deadline = (time.monotonic()
                                            + self.post_compile_grace)
                    self._compiling = False
            self.batches_run += 1
            self.requests_run += len(reqs)
        logger.info("feature coalescer stop (batches=%d requests=%d)",
                    self.batches_run, self.requests_run)
