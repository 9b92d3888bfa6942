"""Multi-session coalescing end-to-end: two concurrent wav2lip sessions
sharing one device worker (--coalesce), both speaking simultaneously,
frames flowing to both queue outputs (SURVEY §2.10 TPU-native equivalent
(a): cross-session device batching)."""

import queue
import time
from threading import Event, Thread

import pytest

from livetalking_tpu import registry
from livetalking_tpu.avatars import wav2lip_avatar as plugin
from livetalking_tpu.config import default_opt
from livetalking_tpu.utils.synthetic import make_synthetic_avatar

B = 2


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    make_synthetic_avatar(str(data_dir / "avatars" / "co1"), n_frames=4)
    make_synthetic_avatar(str(data_dir / "avatars" / "co2"), n_frames=5, seed=7)
    opt = default_opt(dtype="float32")
    model = plugin.load_model("", opt)
    a1 = plugin.load_avatar("co1", str(data_dir))
    a2 = plugin.load_avatar("co2", str(data_dir))
    return model, a1, a2


def _mk_session(model, avatar, sid):
    opt = default_opt(
        transport="queue", tts="dummy", batch_size=B, dtype="float32",
        coalesce=True, sessionid=sid,
    )
    return registry.create("avatar", "wav2lip", opt=opt, model=model, avatar=avatar)


def test_two_sessions_share_scheduler_and_both_stream(stack):
    model, a1, a2 = stack
    s1 = _mk_session(model, a1, "c1")
    s2 = _mk_session(model, a2, "c2")
    assert s1._scheduler is s2._scheduler, "sessions must share the device worker"
    assert s1._store_offset != s2._store_offset

    sched = s1._scheduler
    q1, q2 = Event(), Event()
    t1 = Thread(target=s1.render, args=(q1,), daemon=True)
    t2 = Thread(target=s2.render, args=(q2,), daemon=True)
    t1.start()
    t2.start()
    try:
        s1.put_msg_txt("session one speaking now for a while")
        s2.put_msg_txt("session two speaking now for a while")

        deadline = time.time() + 120
        f1 = f2 = 0
        while time.time() < deadline and (f1 < 6 or f2 < 6):
            try:
                s1.output.video_queue.get(timeout=0.1)
                f1 += 1
            except queue.Empty:
                pass
            try:
                s2.output.video_queue.get(timeout=0.1)
                f2 += 1
            except queue.Empty:
                pass
        assert f1 >= 6 and f2 >= 6, (f1, f2)
        assert sched.requests_run >= 2
        assert sched.frames_run >= sched.batches_run * B
    finally:
        q1.set()
        q2.set()
        t1.join(timeout=15)
        t2.join(timeout=15)


def test_musetalk_sessions_coalesce(tmp_path, monkeypatch):
    """Two concurrent MuseTalk sessions share one device worker (the
    BASELINE 8-sessions-per-chip configuration scaled down for CI).

    The real VAE decode is covered by test_musetalk_engine /
    test_diffusion_blocks; here it is stubbed with a cheap upsample so
    the scheduler wiring (store offsets, buckets, futures) tests fast on
    the 1-core host."""
    import os

    import jax
    import jax.numpy as jnp

    from livetalking_tpu.avatars import musetalk_avatar as mtp
    from livetalking_tpu.models import sd_vae
    from livetalking_tpu.utils.synthetic import make_synthetic_musetalk_avatar

    def cheap_decode(params, z, **kw):  # same signature incl. dtype=
        img = jnp.repeat(jnp.repeat(z[..., :3], 8, axis=1), 8, axis=2)
        return jnp.clip(img.astype(jnp.float32) + 0.5, 0.0, 1.0)

    monkeypatch.setattr(sd_vae, "decode", cheap_decode)
    vae_params = sd_vae.init_params(jax.random.PRNGKey(0))
    make_synthetic_musetalk_avatar(
        os.path.join(str(tmp_path), "avatars", "mco1"), vae_params, n_frames=3)
    make_synthetic_musetalk_avatar(
        os.path.join(str(tmp_path), "avatars", "mco2"), vae_params, n_frames=4)

    opt0 = default_opt(dtype="float32", musetalk_size="tiny", whisper_size="tiny")
    model = mtp.load_model(opt0)
    a1 = mtp.load_avatar("mco1", str(tmp_path))
    a2 = mtp.load_avatar("mco2", str(tmp_path))

    def mk(avatar, sid):
        opt = default_opt(transport="queue", tts="dummy", batch_size=B,
                          dtype="float32", coalesce=True, sessionid=sid,
                          coalesce_buckets="2",
                          musetalk_size="tiny", whisper_size="tiny")
        return registry.create("avatar", "musetalk", opt=opt, model=model,
                               avatar=avatar)

    s1, s2 = mk(a1, "m1"), mk(a2, "m2")
    assert s1._scheduler is s2._scheduler
    assert s1._store_offset != s2._store_offset

    q1, q2 = Event(), Event()
    t1 = Thread(target=s1.render, args=(q1,), daemon=True)
    t2 = Thread(target=s2.render, args=(q2,), daemon=True)
    t1.start(); t2.start()
    try:
        s1.put_msg_txt("muse session one speaking")
        s2.put_msg_txt("muse session two speaking")
        # wait for the shared worker to run its first coalesced batch
        # (includes the one-time bucket compile on this 1-core host)
        deadline = time.time() + 300
        while time.time() < deadline and s1._scheduler.batches_run == 0:
            time.sleep(0.25)
        assert s1._scheduler.batches_run > 0, "no coalesced batch ran"
        deadline = time.time() + 60
        f1 = f2 = 0
        while time.time() < deadline and (f1 < 4 or f2 < 4):
            try:
                s1.output.video_queue.get_nowait(); f1 += 1
            except queue.Empty:
                pass
            try:
                s2.output.video_queue.get_nowait(); f2 += 1
            except queue.Empty:
                pass
            time.sleep(0.01)
        assert f1 >= 4 and f2 >= 4, (f1, f2)
    finally:
        q1.set(); q2.set()
        t1.join(timeout=10); t2.join(timeout=10)


def test_wav2lip_coalesced_device_paste(stack):
    """r4 (VERDICT item 7 prep): --coalesce + --device_paste_back composed
    for wav2lip — the shared scheduler's super-batch step runs the fused
    rect resize+paste (reference avatars/wav2lip_avatar.py:141-147
    semantics) and sessions stream finished FULL frames; the host
    compose stage is identity."""
    import numpy as np

    from livetalking_tpu.avatars.wav2lip_avatar import (
        _shared,
        reset_shared_scheduler,
    )

    model, a1, a2 = stack
    reset_shared_scheduler()

    def mk(sid, av):
        o = default_opt(
            transport="queue", tts="dummy", batch_size=B, dtype="float32",
            coalesce=True, device_paste_back=True, sessionid=sid,
        )
        return registry.create("avatar", "wav2lip", opt=o, model=model,
                               avatar=av)

    s1, s2 = mk("wdp_a", a1), mk("wdp_b", a2)
    try:
        assert s1._scheduler is s2._scheduler is not None
        assert s1._scheduler_composes and s2._scheduler_composes
        assert "pb_frames" in _shared["store"].aux
        assert "pb_boxes" in _shared["store"].aux
        probe = np.zeros((480, 640, 3), "uint8")
        assert s1.paste_back_frame(probe, 0) is probe  # identity compose

        q1, q2 = Event(), Event()
        t1 = Thread(target=s1.render, args=(q1,), daemon=True)
        t2 = Thread(target=s2.render, args=(q2,), daemon=True)
        t1.start(); t2.start()
        try:
            s1.put_msg_txt("wav2lip device paste under coalesce one")
            s2.put_msg_txt("wav2lip device paste under coalesce two")
            deadline = time.time() + 240
            f1, f2 = [], []
            # wait until a SPEECH super-batch actually resolved (silence
            # frames replay the idle cycle and never touch the scheduler)
            while time.time() < deadline and (
                    len(f1) < 4 or len(f2) < 4
                    or s1._scheduler.batches_run == 0):
                for sess, acc in ((s1, f1), (s2, f2)):
                    try:
                        acc.append(sess.output.video_queue.get(timeout=0.2))
                    except queue.Empty:
                        pass
            assert len(f1) >= 4 and len(f2) >= 4
            assert f1[0].shape == (480, 640, 3)  # full frames egress
            assert s1._scheduler.batches_run > 0
        finally:
            q1.set(); q2.set()
            t1.join(timeout=15); t2.join(timeout=15)
    finally:
        reset_shared_scheduler()
