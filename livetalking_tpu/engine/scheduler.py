"""Cross-session device batching.

The reference runs one GPU inference stream per session (SURVEY §2.10);
concurrency = N independent thread pipelines competing for the device.
Here all sessions of a model family share ONE device worker:

  - ``AvatarStore`` packs every loaded avatar's face-crop cycle into a
    single device-resident uint8 buffer; a session's frame index becomes
    ``store offset + mirror index`` so any mix of sessions/avatars is one
    gather;
  - ``BatchScheduler`` drains all currently-queued per-session requests,
    concatenates their indices and feature windows, pads to a bucketed
    super-batch size (static shapes — no recompiles as session count
    fluctuates), runs ONE fused device step, and scatters the resulting
    frames back to per-session futures.

Per tick the device sees one large MXU-friendly batch instead of N small
ones, and the host pays one D2H frame transfer instead of N.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeout
from queue import Empty, Queue
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from livetalking_tpu.utils.logger import logger


class SchedulerConfigError(ValueError):
    """A session requested scheduler flags conflicting with the running
    process-wide scheduler (per-session overrides under --coalesce)."""


class AvatarStore:
    """Packs per-avatar cycle data into one device-resident buffer.

    Item shape/dtype is fixed by the first registration: wav2lip packs
    (S, S, 3) uint8 face crops, musetalk packs (32, 32, 8) float32 U-Net
    input latents — any per-frame cycle works."""

    def __init__(self, img_size: int = 256, item_shape=None, dtype=None):
        # img_size kept for the original wav2lip call signature
        self.item_shape = tuple(item_shape) if item_shape else (img_size, img_size, 3)
        self.dtype = np.dtype(dtype) if dtype else np.uint8
        self._cycles: Dict[str, Tuple[int, int]] = {}  # id -> (offset, length)
        self._host_parts: List[np.ndarray] = []
        self._total = 0
        self._device_buffer = None
        # auxiliary per-item device planes, indexed by the SAME global
        # index as the main cycle (e.g. the device paste-back's full
        # frames / origins / scalars / masks)
        self._aux_parts: Dict[str, List[np.ndarray]] = {}
        self._aux_dev: Dict[str, object] = {}
        self._lock = threading.Lock()

    def add(self, avatar_id: str, cycle: np.ndarray,
            aux: Optional[Dict[str, np.ndarray]] = None) -> Tuple[int, int]:
        """Register an (N, *item_shape) cycle; returns (offset, length).

        ``aux`` maps plane name -> (N, ...) array packed alongside the
        cycle (same offsets, so one global index gathers all planes).
        Every add after the first must supply the same plane set with the
        same trailing shapes."""
        import jax.numpy as jnp

        with self._lock:
            if avatar_id in self._cycles:
                return self._cycles[avatar_id]
            assert cycle.dtype == self.dtype and cycle.shape[1:] == self.item_shape, (
                cycle.dtype, cycle.shape, self.dtype, self.item_shape)
            aux = aux or {}
            if self._host_parts and set(aux) != set(self._aux_parts):
                raise ValueError(
                    f"store aux planes {sorted(aux)} do not match the "
                    f"registered set {sorted(self._aux_parts)}")
            for k, v in aux.items():
                v = np.asarray(v)
                if v.shape[0] != cycle.shape[0]:
                    raise ValueError(
                        f"aux plane {k!r} length {v.shape[0]} != cycle "
                        f"length {cycle.shape[0]}")
                prev = self._aux_parts.get(k)
                if prev and prev[0].shape[1:] != v.shape[1:]:
                    raise ValueError(
                        f"aux plane {k!r} item shape {v.shape[1:]} != "
                        f"registered {prev[0].shape[1:]}")
            offset = self._total
            self._host_parts.append(cycle)
            self._total += cycle.shape[0]
            self._cycles[avatar_id] = (offset, cycle.shape[0])
            self._device_buffer = jnp.asarray(np.concatenate(self._host_parts, axis=0))
            for k, v in aux.items():
                self._aux_parts.setdefault(k, []).append(np.asarray(v))
                self._aux_dev[k] = jnp.asarray(
                    np.concatenate(self._aux_parts[k], axis=0))
            return offset, cycle.shape[0]

    def lookup(self, avatar_id: str) -> Tuple[int, int]:
        return self._cycles[avatar_id]

    @property
    def buffer(self):
        return self._device_buffer

    @property
    def aux(self) -> Dict[str, object]:
        """Device-resident aux planes (same global indexing as buffer)."""
        return self._aux_dev


class _Request:
    __slots__ = ("idxs", "mel", "future", "t_submit")

    def __init__(self, idxs: np.ndarray, mel, future: Future):
        self.idxs = idxs
        self.mel = mel
        self.future = future
        self.t_submit = time.monotonic()


class BatchScheduler:
    """One device worker coalescing per-session inference requests.

    ``step_factory(total_batch)`` must return a jitted
    ``(params, buffer, idxs(total,), mel(total, ...)) -> frames(total, ...)``
    function (e.g. models/wav2lip.py ``make_infer_fn``). ``buckets`` are the
    session-count bucket sizes compiled (padding, not recompilation, absorbs
    fluctuating session counts).
    """

    def __init__(
        self,
        params,
        store: AvatarStore,
        step_factory: Callable[[int], Callable],
        batch_size: int,
        buckets: Sequence[int] = (1, 2, 4, 8),
        coalesce_window_s: float = 0.0,
    ):
        self.params = params
        self.store = store
        self.batch_size = batch_size
        self.buckets = sorted(buckets)
        # idle-device alignment window (seconds): while the device is
        # IDLE and the held set is partial, wait up to this long after
        # the oldest held request for more sessions to land on the same
        # super-batch. The hold-while-busy policy below only aligns
        # sessions when the device is saturated (the in-flight step is
        # the window); a real-time-paced deployment idles between rounds
        # and would regress to dispatch-on-arrival staggering without
        # this. 0 = dispatch immediately when idle (saturated-workload
        # behavior, identical to round 3)
        self.coalesce_window_s = float(coalesce_window_s)
        # adaptive alignment target: rolling max of recently launched
        # coalesced sizes — a lone session never waits out the window,
        # because nothing in its history says a second session exists
        self._launch_sizes: "deque[int]" = deque(maxlen=16)
        self._steps = {k: step_factory(k * batch_size) for k in self.buckets}
        self._queue: "Queue[_Request]" = Queue()
        self._quit = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # observability counters
        self.requests_run = 0
        self.batches_run = 0
        self.frames_run = 0
        # per-request submit->resolve wall time and per-batch coalesced
        # size, bounded rolling windows (admin metrics + serving bench
        # latency percentiles)
        self.latency_s: "deque[float]" = deque(maxlen=4096)
        self.batch_sizes: "deque[int]" = deque(maxlen=4096)
        # first-contact compiles of a bucket's super-batch program can
        # take minutes (remote compiler); sessions must not misread that
        # as a wedged device. Grace is scoped to the compile actually in
        # progress: the dispatch thread raises ``_compiling`` around the
        # cold step call (bounded by ``first_contact_timeout``), and a
        # short post-compile window lets waiters whose own deadline
        # lapsed during the compile still collect their result. Nothing
        # else (in particular ``_resolve`` of an unrelated in-flight
        # batch) touches the grace state, so a concurrent small-batch
        # completion can no longer clobber an open compile window.
        self.first_contact_timeout = 900.0
        self.post_compile_grace = 120.0
        self._warm_buckets: set = set()
        self._warm_shape: Optional[tuple] = None
        # guards _warm_shape/_warm_buckets: mutated from the worker
        # thread (_dispatch -> _mark_warm) AND the prewarm thread
        self._warm_lock = threading.Lock()
        self._prewarm_lock = threading.Lock()
        self._spawn_lock = threading.Lock()  # guards _prewarm_threads only
        self._prewarm_threads: List[threading.Thread] = []
        self._compiling = False
        self._compile_started = 0.0
        self._grace_deadline = 0.0

    # -- session API ------------------------------------------------------
    def submit(self, global_idxs: np.ndarray, mel) -> Future:
        """Queue one session batch (B indices into the store + features);
        returns a Future resolving to (B, S, S, 3) uint8 frames."""
        if self._quit.is_set():
            # a submit racing stop() would enqueue a Future no worker
            # ever resolves (the stop-side drain runs only once)
            raise RuntimeError("batch scheduler stopped")
        fut: Future = Future()
        self._queue.put(_Request(np.asarray(global_idxs, np.int32), mel, fut))
        return fut

    def _in_grace(self, now: float) -> bool:
        """True while waits should extend past their own deadline: a cold
        bucket compile is genuinely in progress (capped at
        ``first_contact_timeout`` so a hung remote compiler still
        surfaces), or one just finished (``post_compile_grace`` window so
        requests that queued behind it collect their results)."""
        if self._compiling and (now - self._compile_started
                                < self.first_contact_timeout):
            return True
        return now < self._grace_deadline

    def wait(self, fut: Future, timeout: float = 120.0) -> np.ndarray:
        """Bounded wait on a submitted request: a wedged device (dead
        tunnel, hung remote compile) must surface as an error in the
        session's inference thread, not a silent permanent hang — but a
        legitimate first-contact compile of a cold bucket (minutes) must
        NOT trip the bound, so the wait extends while one is actually in
        progress (see ``_in_grace``)."""
        deadline = time.monotonic() + timeout
        while True:
            try:
                return fut.result(timeout=2.0)
            except FutureTimeout:
                now = time.monotonic()
                if now < deadline or self._in_grace(now):
                    continue
                raise

    def infer(self, global_idxs: np.ndarray, mel,
              timeout: float = 120.0) -> np.ndarray:
        """submit + grace-aware wait (synchronous convenience)."""
        return self.wait(self.submit(global_idxs, mel), timeout)

    def _is_warm(self, bucket: int, buffer) -> bool:
        """A bucket's program is warm only for the CURRENT store buffer
        shape: a later avatar registration grows the shared cycle buffer,
        which retraces every bucket program. Treating those dispatches as
        cold re-opens the compile-grace window for the recompile —
        otherwise waiters would FutureTimeout at their normal bound in
        the middle of a legitimate multi-minute remote compile."""
        with self._warm_lock:
            return (self._warm_shape == tuple(buffer.shape)
                    and bucket in self._warm_buckets)

    def _mark_warm(self, bucket: int, buffer) -> None:
        """Record a bucket as compiled for ``buffer``'s shape. A worker
        may reach here with a buffer captured BEFORE a concurrent
        ``store.add`` grew the shared cycle buffer; marking that stale
        shape would wipe warm entries a prewarm just recorded at the
        grown shape, so stale shapes are ignored."""
        shape = tuple(buffer.shape)
        current = self.store.buffer
        if current is not None and shape != tuple(current.shape):
            return  # stale capture: the store grew under this dispatch
        with self._warm_lock:
            if self._warm_shape != shape:
                self._warm_buckets.clear()
                self._warm_shape = shape
            self._warm_buckets.add(bucket)

    def prewarm(self, feature_shape: Tuple[int, ...],
                dtype=np.float32) -> None:
        """Compile + execute every bucket's super-batch program on zero
        inputs (``feature_shape`` = one request's per-frame feature
        trailing shape, e.g. (50, 384) for musetalk whisper context or
        (80, 16) for wav2lip mel). Benches and servers call this before
        opening traffic so no first-contact compile ever lands inside a
        measurement window or a live session's first utterance
        (measured cost of skipping it: B=8 paced read p90 13.8 s —
        pure compile wait). Lock-serialized so a synchronous call made
        while ``prewarm_async`` is still compiling blocks until every
        bucket is genuinely warm rather than returning early."""
        import jax.numpy as jnp

        B = self.batch_size
        with self._prewarm_lock:
            # re-pass until every bucket is warm for the FINAL buffer: an
            # avatar registering mid-pass grows the store and invalidates
            # buckets already compiled this pass (observed: bucket 1
            # warmed for a 1-avatar buffer, then session 2 registered and
            # the first live dispatch of bucket 1 hit a cold multi-minute
            # compile with no prewarm coverage)
            for _pass in range(16):
                if self._quit.is_set():
                    break
                buffer = self.store.buffer
                todo = [b for b in self.buckets
                        if not self._is_warm(b, buffer)]
                if not todo:
                    break
                for b in todo:
                    if self._quit.is_set():
                        break
                    buffer = self.store.buffer  # re-read: may grow mid-pass
                    idxs = jnp.zeros((b * B,), jnp.int32)
                    feats = jnp.zeros((b * B,) + tuple(feature_shape), dtype)
                    out = self._steps[b](self.params, buffer, idxs, feats)
                    # block until compile + one execution are done WITHOUT
                    # pulling the full super-batch output over the ~3 MB/s
                    # tunnel (bucket 8 of composed frames = tens of MB
                    # competing with live session egress): fetch a single
                    # element of one leaf instead
                    import jax
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    np.asarray(leaf.ravel()[:1])
                    self._mark_warm(b, buffer)
                    logger.info("scheduler prewarm: bucket %d ready", b)

    def prewarm_async(self, feature_shape: Tuple[int, ...],
                      dtype=np.float32) -> threading.Thread:
        """Background ``prewarm`` for the production server path: kicked
        by the first session right after its avatar registers in the
        store, so later sessions (and this one's later buckets) find
        their programs compiled instead of paying first-contact grace
        inside a live utterance. The bulk of the cost is the remote
        compile; each bucket still pays one device execution + a
        one-element fetch, which briefly shares the device with
        in-flight traffic. An avatar registered AFTER the prewarm grows
        the device-resident store buffer (and aux planes), invalidating
        every bucket's warmth — ``_is_warm``'s shape keying detects
        that and the recompile runs under the normal grace window; only
        re-registration of an existing avatar_id is a no-op."""
        with self._spawn_lock:
            # drop finished threads; skip spawning when one is already
            # compiling (prewarm is idempotent and lock-serialized, a
            # second concurrent thread would only queue behind it)
            self._prewarm_threads = [
                t for t in self._prewarm_threads if t.is_alive()]
            if self._prewarm_threads:
                return self._prewarm_threads[-1]
            t = threading.Thread(target=self._prewarm_quiet,
                                 args=(tuple(feature_shape), dtype),
                                 daemon=True, name="scheduler-prewarm")
            self._prewarm_threads.append(t)
        t.start()
        return t

    def _prewarm_quiet(self, feature_shape, dtype) -> None:
        try:
            self.prewarm(feature_shape, dtype)
        except Exception:
            # best-effort: a failed background prewarm just means the
            # bucket compiles lazily under the normal grace window
            logger.exception("scheduler prewarm failed")

    # -- worker -----------------------------------------------------------
    def start(self) -> None:
        if self._thread is not None:
            return
        from livetalking_tpu.utils.lifecycle import register
        register(self)  # stop before interpreter teardown (XLA exit crash)
        self._quit.clear()
        self._thread = threading.Thread(target=self._run, daemon=True, name="batch-scheduler")
        self._thread.start()

    def stop(self) -> None:
        self._quit.set()
        with self._spawn_lock:
            pthreads, self._prewarm_threads = self._prewarm_threads, []
        for t in pthreads:
            # a background prewarm skips its remaining buckets on quit;
            # best-effort bounded drain of the bucket it may be mid-step
            # on (a first-contact remote compile can exceed this bound —
            # the daemon thread then dies with the interpreter)
            t.join(timeout=130)
        if self._thread is not None:
            # the worker's shutdown path fails still-held batches (it
            # never launches new device work on quit) and then drains the
            # fetch thread of the <=2 in-flight batches; cover that drain
            # so stop() — the registered pre-teardown XLA-exit guard —
            # returns only once no thread still touches the device
            self._thread.join(timeout=130)
            self._thread = None
        # fail any request still queued so no session blocks forever on
        # a Future the dead worker will never resolve
        while True:
            try:
                r = self._queue.get_nowait()
            except Empty:
                break
            if not r.future.done():
                r.future.set_exception(RuntimeError("batch scheduler stopped"))

    def _drain(self, timeout: float = 0.5) -> List[_Request]:
        """Block for the first request, then greedily take whatever else is
        already queued (coalescing window = device step duration: requests
        that arrive while the previous step runs batch together)."""
        try:
            first = self._queue.get(timeout=timeout)
        except Empty:
            return []
        reqs = [first]
        max_sessions = self.buckets[-1]
        while len(reqs) < max_sessions:
            try:
                reqs.append(self._queue.get_nowait())
            except Empty:
                break
        return reqs

    def _dispatch(self, reqs: List[_Request]):
        """Launch one padded super-batch on the device WITHOUT blocking
        (JAX dispatch is async); returns the device result handle."""
        import jax.numpy as jnp

        k = len(reqs)
        bucket = next(b for b in self.buckets if b >= k)
        B = self.batch_size
        buffer = self.store.buffer
        cold = not self._is_warm(bucket, buffer)
        if cold:
            # cold bucket: the step call below blocks this thread for the
            # trace+compile; raise the in-progress flag so waiting
            # sessions extend their bounds exactly as long as it runs
            self._compile_started = time.monotonic()
            self._compiling = True

        idxs = np.zeros(bucket * B, np.int32)
        mels = []
        for i, r in enumerate(reqs):
            idxs[i * B : (i + 1) * B] = r.idxs
            mels.append(jnp.asarray(r.mel))  # stays on device if already there
        pad = bucket - k
        if pad:
            mels.append(jnp.zeros((pad * B,) + mels[0].shape[1:], jnp.float32))
        mel = jnp.concatenate(mels, axis=0).astype(jnp.float32)
        try:
            out = self._steps[bucket](self.params, buffer,
                                      jnp.asarray(idxs), mel)
        finally:
            if cold:
                # compile over (or failed): requests that queued behind it
                # get a short fresh window to collect their results
                self._grace_deadline = (time.monotonic()
                                        + self.post_compile_grace)
                self._compiling = False
        self._mark_warm(bucket, buffer)  # returned => compile done
        return out

    def _resolve(self, dev_frames, reqs: List[_Request]) -> None:
        """Block on D2H and scatter frames to per-session futures."""
        B = self.batch_size
        frames = np.asarray(dev_frames)
        now = time.monotonic()
        for i, r in enumerate(reqs):
            r.future.set_result(frames[i * B : (i + 1) * B])
            self.latency_s.append(now - r.t_submit)
        self.batch_sizes.append(len(reqs))
        self.requests_run += len(reqs)
        self.batches_run += 1
        self.frames_run += len(reqs) * B
        # NOTE: grace state is owned by _dispatch alone. A completed
        # small batch proves nothing about a cold-bucket compile still in
        # progress on the dispatch thread (double-buffer path), so
        # shrinking the grace window here would time out sessions waiting
        # on that legitimate multi-minute compile.

    def _try_dispatch(self, reqs: List[_Request]):
        try:
            return (self._dispatch(reqs), reqs)
        except Exception as e:
            logger.exception("batch scheduler dispatch failed")
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)
            return None

    def _try_resolve(self, dev, preqs: List[_Request]) -> None:
        try:
            self._resolve(dev, preqs)
        except Exception as e:
            logger.exception("batch scheduler resolve failed")
            for r in preqs:
                if not r.future.done():
                    r.future.set_exception(e)

    def _run(self) -> None:
        """Pipelined loop with coalescing hold (SURVEY §2.10(a,c)).

        A dedicated fetch thread performs the D2H + future scatter (the
        only completion signal this backend answers reliably), so the
        dispatch thread never blocks on a transfer; the fetch of batch N
        overlaps the device compute of batch N+1.

        While any super-batch is in flight, newly arriving requests are
        HELD unless they already fill the largest bucket: the in-flight
        step's duration is the natural cross-session alignment window.
        Dispatch-on-arrival (the old policy) locked free-running engine
        sessions into small staggered super-batches — measured 8-session
        egress run: mean coalesced size 2.67 of 8, 22 fps/session vs the
        >=25 bar — because a request missing one bus by 2 ms spawned its
        own sub-batch and the groups never re-merged. A full bucket still
        dispatches immediately, two deep (double buffering)."""
        logger.info("batch scheduler start (buckets=%s, B=%d)", self.buckets, self.batch_size)
        maxb = self.buckets[-1]
        held: List[_Request] = []
        state = {"in_flight": 0}
        lock = threading.Lock()
        fetchq: "Queue[Optional[Tuple[object, List[_Request]]]]" = Queue()

        def fetcher() -> None:
            while True:
                item = fetchq.get()
                if item is None:
                    return
                self._try_resolve(*item)
                with lock:
                    state["in_flight"] -= 1

        fthread = threading.Thread(target=fetcher, daemon=True,
                                   name="batch-scheduler-fetch")
        fthread.start()

        def launch(batch: List[_Request]) -> None:
            self._launch_sizes.append(len(batch))
            out = self._try_dispatch(batch)
            if out is not None:
                with lock:
                    state["in_flight"] += 1
                fetchq.put(out)

        while not self._quit.is_set():
            held.extend(self._drain(
                timeout=0.002 if (held or state["in_flight"]) else 0.5))
            if not held:
                continue
            with lock:
                busy = state["in_flight"]
            if len(held) >= maxb and busy < 2:
                batch, held = held[:maxb], held[maxb:]
                launch(batch)
            elif busy == 0:
                # idle device, partial bucket: hold up to the alignment
                # window for the other active sessions — but dispatch as
                # soon as the held set matches what recent rounds prove
                # is actually out there (a lone session never waits)
                target = max(self._launch_sizes, default=1)
                if (len(held) >= min(target, maxb)
                        or (time.monotonic() - held[0].t_submit
                            >= self.coalesce_window_s)):
                    batch, held = held[:maxb], held[maxb:]
                    launch(batch)
        # shutdown: never launch NEW device work on quit (an unbounded
        # compile/step would outlive stop()'s join and overlap interpreter
        # teardown) — fail held requests instead; sessions degrade those
        # batches to idle frames
        for r in held:
            if not r.future.done():
                r.future.set_exception(RuntimeError("batch scheduler stopped"))
        fetchq.put(None)
        fthread.join(timeout=120)
        logger.info("batch scheduler stop (batches=%d requests=%d frames=%d)",
                    self.batches_run, self.requests_run, self.frames_run)


def parse_buckets(opt) -> tuple:
    """--coalesce_buckets spec ('1,2,4,8') -> sorted int tuple; shared by
    every avatar family wiring the BatchScheduler."""
    spec = str(getattr(opt, "coalesce_buckets", "") or "1,2,4,8")
    return tuple(int(v) for v in spec.split(",") if v.strip())


def resolve_coalesce_window(opt, batch_size: int) -> float:
    """--coalesce_window_ms -> seconds. Auto (-1) = one request period
    (batch_size / fps): the longest any paced session can lag the others
    within a round, so one window always gathers every active session
    while bounding the added latency to at most one request period."""
    ms = float(getattr(opt, "coalesce_window_ms", -1.0))
    if ms < 0:
        return batch_size / float(getattr(opt, "fps", 25) or 25)
    return ms / 1000.0
