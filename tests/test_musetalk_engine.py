"""End-to-end MuseTalk pipeline (tiny U-Net, random weights, CPU):
dummy TTS -> whisper features -> single-step latent U-Net -> VAE decode ->
feathered blend paste-back -> queue output."""

import queue
import time
from threading import Event, Thread

import pytest

from livetalking_tpu import registry
from livetalking_tpu.avatars import musetalk_avatar as plugin
from livetalking_tpu.config import default_opt
from livetalking_tpu.utils.synthetic import make_synthetic_musetalk_avatar

B = 2


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    opt = default_opt(
        transport="queue", tts="dummy", batch_size=B, dtype="float32",
        musetalk_size="tiny", model="musetalk", sessionid="mt",
    )
    model = plugin.load_model(opt)
    make_synthetic_musetalk_avatar(
        str(data_dir / "avatars" / "mt1"), model["vae_params"], n_frames=4
    )
    avatar = plugin.load_avatar("mt1", str(data_dir))
    return opt, model, avatar


def test_avatar_assets_shapes(stack):
    _opt, _model, avatar = stack
    assert avatar["latent_cycle_device"].shape == (4, 32, 32, 8)
    assert len(avatar["mask_list_cycle"]) == 4
    assert len(avatar["mask_coords_list_cycle"]) == 4


def test_musetalk_speaks_and_streams(stack):
    opt, model, avatar = stack
    sess = registry.create("avatar", "musetalk", opt=opt, model=model, avatar=avatar)
    quit_event = Event()
    t = Thread(target=sess.render, args=(quit_event,), daemon=True)
    t.start()
    try:
        sess.put_msg_txt("musetalk end to end pipeline check")
        deadline = time.time() + 180
        frames = []
        spoke = False
        while time.time() < deadline and len(frames) < 6:
            if sess.is_speaking():
                spoke = True
            try:
                frames.append(sess.output.video_queue.get(timeout=0.5))
            except queue.Empty:
                pass
        assert len(frames) >= 6
        assert frames[0].shape == (480, 640, 3)
        assert spoke
    finally:
        quit_event.set()
        t.join(timeout=20)


def test_musetalk_coalesced_device_paste(stack, tmp_path_factory):
    """--coalesce + --device_paste_back composed: the shared scheduler's
    super-batch step pastes on device and sessions stream finished FULL
    frames with the host compose stage reduced to identity (round-2
    verdict: the two features must work together, not in isolation)."""
    from livetalking_tpu.avatars.musetalk_avatar import (
        _shared,
        reset_shared_scheduler,
    )

    _opt, model, avatar = stack
    data_dir = tmp_path_factory.mktemp("data_dp")
    make_synthetic_musetalk_avatar(
        str(data_dir / "avatars" / "mt_dp"), model["vae_params"], n_frames=5)
    avatar2 = plugin.load_avatar("mt_dp", str(data_dir))

    reset_shared_scheduler()

    def mk(sid, av):
        o = default_opt(
            transport="queue", tts="dummy", batch_size=B, dtype="float32",
            musetalk_size="tiny", model="musetalk", sessionid=sid,
            coalesce=True, device_paste_back=True,
        )
        return registry.create("avatar", "musetalk", opt=o, model=model,
                               avatar=av)

    s1, s2 = mk("dp_a", avatar), mk("dp_b", avatar2)
    try:
        assert s1._scheduler is s2._scheduler is not None
        assert s1._scheduler_composes and s2._scheduler_composes
        assert "pb_frames" in _shared["store"].aux
        # r4: the first session kicked the production background prewarm
        assert s1._scheduler._prewarm_threads  # spawned (r5: tracked list)
        # compose inside the super-batch: paste_back_frame is identity
        probe = __import__("numpy").zeros((480, 640, 3), "uint8")
        assert s1.paste_back_frame(probe, 0) is probe

        q1, q2 = Event(), Event()
        t1 = Thread(target=s1.render, args=(q1,), daemon=True)
        t2 = Thread(target=s2.render, args=(q2,), daemon=True)
        t1.start(); t2.start()
        try:
            s1.put_msg_txt("device paste under coalesce session one")
            s2.put_msg_txt("device paste under coalesce session two")
            deadline = time.time() + 240
            f1, f2 = [], []
            while time.time() < deadline and (len(f1) < 4 or len(f2) < 4):
                for sess, acc in ((s1, f1), (s2, f2)):
                    try:
                        acc.append(sess.output.video_queue.get(timeout=0.2))
                    except queue.Empty:
                        pass
            assert len(f1) >= 4 and len(f2) >= 4
            assert f1[0].shape == (480, 640, 3)  # full frames egress
        finally:
            q1.set(); q2.set()
            t1.join(timeout=15); t2.join(timeout=15)
    finally:
        reset_shared_scheduler()


def test_musetalk_coalesced_sessions_with_feature_coalescer(stack, tmp_path_factory):
    """Two MuseTalk sessions under --coalesce: shared BatchScheduler AND
    shared FeatureCoalescer (cross-session batched whisper encodes,
    engine/feature_coalescer.py) — both speak, both stream."""
    from livetalking_tpu.avatars.musetalk_avatar import (
        _shared,
        reset_shared_scheduler,
    )

    _opt, model, avatar = stack
    data_dir = tmp_path_factory.mktemp("data2")
    make_synthetic_musetalk_avatar(
        str(data_dir / "avatars" / "mt2"), model["vae_params"], n_frames=5)
    avatar2 = plugin.load_avatar("mt2", str(data_dir))

    reset_shared_scheduler()
    def mk(sid, av):
        o = default_opt(
            transport="queue", tts="dummy", batch_size=B, dtype="float32",
            musetalk_size="tiny", model="musetalk", sessionid=sid,
            coalesce=True,
        )
        return registry.create("avatar", "musetalk", opt=o, model=model,
                               avatar=av)

    s1, s2 = mk("co_a", avatar), mk("co_b", avatar2)
    assert s1._scheduler is s2._scheduler is not None
    assert s1.asr._coalescer is s2.asr._coalescer is not None

    q1, q2 = Event(), Event()
    t1 = Thread(target=s1.render, args=(q1,), daemon=True)
    t2 = Thread(target=s2.render, args=(q2,), daemon=True)
    t1.start(); t2.start()
    try:
        s1.put_msg_txt("session one coalesced features check")
        s2.put_msg_txt("session two coalesced features check")
        deadline = time.time() + 240
        f1, f2 = [], []
        while time.time() < deadline and (len(f1) < 4 or len(f2) < 4):
            for sess, acc in ((s1, f1), (s2, f2)):
                try:
                    acc.append(sess.output.video_queue.get(timeout=0.2))
                except queue.Empty:
                    pass
        assert len(f1) >= 4 and len(f2) >= 4
        # the coalescer actually ran (not the solo path)
        assert _shared["feat_coalescer"].requests_run > 0
    finally:
        q1.set(); q2.set()
        t1.join(timeout=15); t2.join(timeout=15)
        reset_shared_scheduler()


def test_quant_flag_cache_mismatch_rejected():
    """ADVICE r3: the process-shared quantized trees are keyed by the
    int8 flags that produced them — a later session with different
    attn_int8/vae_mid_int8 must be rejected, not silently served the
    first session's config."""
    from livetalking_tpu.avatars.musetalk_avatar import _check_quant_flags
    from livetalking_tpu.engine.scheduler import SchedulerConfigError

    model = {"unet_q_flags": {"attn_int8": True}}
    _check_quant_flags(model, "unet_q_flags", {"attn_int8": True})  # match ok
    with pytest.raises(SchedulerConfigError, match="int8 flag"):
        _check_quant_flags(model, "unet_q_flags", {"attn_int8": False})
    # externally installed trees without a record are accepted
    _check_quant_flags({}, "unet_q_flags", {"attn_int8": False})
