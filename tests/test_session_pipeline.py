"""Unit tests for the pipelined per-session inference loop.

base_avatar.inference keeps --session_inflight submitted batches in
flight (submit_batch/resolve_batch) so the session's emission period
tracks the device step rate instead of the request round-trip latency
(SERVING_r03_engine8.json measured the synchronous loop latency-bound
at 18.9 fps/session vs the >=25 bar). These tests pin the contract:

  - results are emitted strictly in SUBMISSION order even when a later
    batch resolves first;
  - every frame is paired with its own batch's audio frames (A/V sync);
  - silence batches flow through the same ordered queue;
  - submission of batch k+1 overlaps the wait on batch k (depth 2);
  - depth 1 restores the synchronous reference behavior;
  - a failed resolve degrades that batch to idle frames, later batches
    still emit.
"""

import queue
import time
from concurrent.futures import Future
from threading import Event, Thread
from types import SimpleNamespace

import numpy as np

from livetalking_tpu.avatars.base_avatar import AudioFrameData, BaseAvatar
from livetalking_tpu.utils.image import mirror_index

B = 2  # frames per batch
LENGTH = 4  # avatar cycle length


class _PipelinedFake(BaseAvatar):
    """BaseAvatar.inference()'s collaborators only — no real init."""

    def __init__(self, inflight=2):
        # deliberately skip BaseAvatar.__init__
        self.batch_size = B
        self.custom_index = {}
        self.res_frame_queue = queue.Queue()
        self.asr = SimpleNamespace(feat_queue=queue.Queue(),
                                   output_queue=queue.Queue())
        self.opt = SimpleNamespace(session_inflight=inflight)
        self.events = []  # (what, batch_id, t)
        self.futures = {}

    def get_avatar_length(self):
        return LENGTH

    def submit_batch(self, index, audiofeat_batch):
        bid = int(audiofeat_batch)
        self.events.append(("submit", bid, time.monotonic()))
        fut = Future()
        self.futures[bid] = fut
        return fut

    def resolve_batch(self, handle):
        out = handle.result(timeout=10)
        self.events.append(("resolve", int(out[0, 0]), time.monotonic()))
        return out


def _feed(av, batch_id, speech=True):
    """Queue one feature batch + its 2*B audio frames tagged by batch."""
    av.asr.feat_queue.put(batch_id)
    for j in range(2 * B):
        av.asr.output_queue.put(AudioFrameData(
            data=np.full(320, batch_id * 10 + j, np.float32),
            type=0 if speech else 1, userdata=None))


def _run(av, n_feeds, resolver, timeout=10.0):
    quit_event = Event()
    t = Thread(target=av.inference, args=(quit_event,), daemon=True)
    t.start()
    resolver(av)
    deadline = time.monotonic() + timeout
    while (av.res_frame_queue.qsize() < n_feeds * B
           and time.monotonic() < deadline):
        time.sleep(0.01)
    quit_event.set()
    t.join(timeout=10)
    out = []
    while not av.res_frame_queue.empty():
        out.append(av.res_frame_queue.get_nowait())
    return out


def _frames(batch_id):
    return np.full((B, 1), batch_id, np.float32)


def test_emission_order_and_av_pairing_out_of_order_resolve():
    av = _PipelinedFake(inflight=2)
    for bid in (1, 2, 3):
        _feed(av, bid)

    def resolver(av):
        # wait for both submits, then resolve 2 BEFORE 1
        deadline = time.monotonic() + 5
        while len(av.futures) < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        av.futures[2].set_result(_frames(2))
        time.sleep(0.05)
        av.futures[1].set_result(_frames(1))
        deadline = time.monotonic() + 5
        while 3 not in av.futures and time.monotonic() < deadline:
            time.sleep(0.01)
        av.futures[3].set_result(_frames(3))

    out = _run(av, 3, resolver)
    assert len(out) == 3 * B
    for n, (frame, afr, idx) in enumerate(out):
        bid = n // B + 1
        i = n % B
        assert frame[0] == bid  # emission follows SUBMISSION order
        # audio frames are the ones ingested WITH this batch
        assert [int(a.data[0]) for a in afr] == [bid * 10 + 2 * i,
                                                 bid * 10 + 2 * i + 1]
        assert idx == mirror_index(LENGTH, (bid - 1) * B + i)


def test_pipeline_overlaps_submit_with_wait():
    av = _PipelinedFake(inflight=2)
    for bid in (1, 2):
        _feed(av, bid)

    def resolver(av):
        deadline = time.monotonic() + 5
        while len(av.futures) < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        # batch 2 was submitted while batch 1 was still unresolved
        assert len(av.futures) == 2
        av.futures[1].set_result(_frames(1))
        av.futures[2].set_result(_frames(2))

    out = _run(av, 2, resolver)
    assert len(out) == 2 * B
    submits = [e for e in av.events if e[0] == "submit"]
    resolves = [e for e in av.events if e[0] == "resolve"]
    assert submits[1][2] < resolves[0][2]  # submit#2 before resolve#1


def test_depth_one_is_synchronous():
    av = _PipelinedFake(inflight=1)
    _feed(av, 1)
    _feed(av, 2)

    def resolver(av):
        deadline = time.monotonic() + 5
        while 1 not in av.futures and time.monotonic() < deadline:
            time.sleep(0.01)
        # depth 1: batch 2 must NOT be submitted while 1 is in flight
        time.sleep(0.1)
        assert 2 not in av.futures
        av.futures[1].set_result(_frames(1))
        deadline = time.monotonic() + 5
        while 2 not in av.futures and time.monotonic() < deadline:
            time.sleep(0.01)
        av.futures[2].set_result(_frames(2))

    out = _run(av, 2, resolver)
    assert [int(f[0]) for f, _, _ in out] == [1, 1, 2, 2]


def test_silence_batches_keep_order():
    av = _PipelinedFake(inflight=2)
    _feed(av, 1, speech=True)
    _feed(av, 2, speech=False)  # silence: no submit, rides the queue
    _feed(av, 3, speech=True)

    def resolver(av):
        for bid in (1, 3):  # 3 only submits after 1 emits (depth 2)
            deadline = time.monotonic() + 5
            while bid not in av.futures and time.monotonic() < deadline:
                time.sleep(0.01)
            av.futures[bid].set_result(_frames(bid))

    out = _run(av, 3, resolver)
    assert len(out) == 3 * B
    kinds = [None if f is None else int(f[0]) for f, _, _ in out]
    assert kinds == [1, 1, None, None, 3, 3]
    # the silence batch still carries its OWN audio frames
    silence_audio = [int(a.data[0]) for _, afr, _ in out[2:4] for a in afr]
    assert silence_audio == [20, 21, 22, 23]


def test_failed_resolve_degrades_to_idle_frames():
    av = _PipelinedFake(inflight=2)
    _feed(av, 1)
    _feed(av, 2)

    def resolver(av):
        deadline = time.monotonic() + 5
        while len(av.futures) < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        av.futures[1].set_exception(RuntimeError("wedged device"))
        av.futures[2].set_result(_frames(2))

    out = _run(av, 2, resolver)
    assert len(out) == 2 * B
    kinds = [None if f is None else int(f[0]) for f, _, _ in out]
    assert kinds == [None, None, 2, 2]  # batch 1 idle, batch 2 intact
