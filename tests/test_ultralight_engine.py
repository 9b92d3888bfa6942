"""End-to-end Ultralight pipeline: dummy TTS -> HuBERT features (tiny
config) -> Ultralight U-Net -> paste-back -> queue output."""

import queue
import time
from threading import Event, Thread

import pytest

from livetalking_tpu import registry
from livetalking_tpu.avatars import ultralight_avatar as plugin
from livetalking_tpu.config import default_opt
from livetalking_tpu.utils.synthetic import make_synthetic_avatar

B = 2


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    make_synthetic_avatar(
        str(data_dir / "avatars" / "ul1"), n_frames=5, face_size=168, coord_order="xy"
    )
    opt = default_opt(
        transport="queue", tts="dummy", batch_size=B, dtype="float32",
        hubert_size="tiny", sessionid="ul", model="ultralight",
    )
    model = plugin.load_model(opt)
    avatar = plugin.load_avatar("ul1", str(data_dir))
    sess = registry.create("avatar", "ultralight", opt=opt, model=model, avatar=avatar)
    quit_event = Event()
    t = Thread(target=sess.render, args=(quit_event,), daemon=True)
    t.start()
    yield sess
    quit_event.set()
    t.join(timeout=15)


def test_ultralight_speaks_and_streams(session):
    session.put_msg_txt("ultralight end to end check with enough words")
    deadline = time.time() + 120
    frames = []
    spoke = False
    while time.time() < deadline and len(frames) < 8:
        if session.is_speaking():
            spoke = True
        try:
            frames.append(session.output.video_queue.get(timeout=0.5))
        except queue.Empty:
            pass
    assert len(frames) >= 8
    assert frames[0].shape == (480, 640, 3)
    assert spoke, "session never spoke"


def test_silence_skips_network(session):
    # sustained silence -> zero features fast path (no HuBERT forward)
    feats = session.asr.feat_queue.get(timeout=20)
    # during silence the extractor reuses the cached zero block
    import numpy as np

    if not session.is_speaking():
        assert feats.shape == (B, 16, 32, 32)


def test_ultralight_coalesced_device_paste(tmp_path_factory):
    """Two ultralight sessions with DIFFERENT avatars (and therefore
    different per-avatar U-Net weights) share one BatchScheduler: the
    stacked-weights super-batch step (models/ultralight.py
    make_grouped_infer_fn) plus composed device paste-back — the wav2lip
    r4 treatment, extended to the per-avatar-weights family
    (VERDICT r4 item 5)."""
    from threading import Event, Thread

    import numpy as np

    from livetalking_tpu.avatars.ultralight_avatar import (
        _shared,
        reset_shared_scheduler,
    )

    data_dir = tmp_path_factory.mktemp("data_ulc")
    for aid in ("ulc1", "ulc2"):
        make_synthetic_avatar(str(data_dir / "avatars" / aid), n_frames=5,
                              face_size=168, coord_order="xy")

    reset_shared_scheduler()

    def mk(sid, aid):
        o = default_opt(
            transport="queue", tts="dummy", batch_size=B, dtype="float32",
            hubert_size="tiny", model="ultralight", sessionid=sid,
            coalesce=True, device_paste_back=True,
            coalesce_buckets="1,2",  # 2 sessions; fewer compiles on 1-core CI
        )
        model = plugin.load_model(o)
        avatar = plugin.load_avatar(aid, str(data_dir))
        if aid.endswith("2"):
            # distinct weights so slot selection is actually exercised
            import jax

            avatar["unet_params"] = jax.tree.map(
                lambda x: x * 1.01, avatar["unet_params"])
        return registry.create("avatar", "ultralight", opt=o, model=model,
                               avatar=avatar)

    s1, s2 = mk("ulc_a", "ulc1"), mk("ulc_b", "ulc2")
    try:
        assert s1._scheduler is s2._scheduler is not None
        assert s1._scheduler_composes and s2._scheduler_composes
        assert "ul_slot" in _shared["store"].aux
        assert "pb_frames" in _shared["store"].aux
        assert s1._slot == 0 and s2._slot == 1
        # stacked weights grew to 2 avatar slots
        import jax

        leaf = jax.tree.leaves(_shared["stacked"])[0]
        assert leaf.shape[0] == 2
        # compose inside the super-batch: paste_back_frame is identity
        probe = np.zeros((480, 640, 3), np.uint8)
        assert s1.paste_back_frame(probe, 0) is probe

        q1, q2 = Event(), Event()
        t1 = Thread(target=s1.render, args=(q1,), daemon=True)
        t2 = Thread(target=s2.render, args=(q2,), daemon=True)
        t1.start(); t2.start()
        try:
            s1.put_msg_txt("ultralight coalesced session one speaks now")
            s2.put_msg_txt("ultralight coalesced session two speaks now")
            deadline = time.time() + 420
            f1, f2 = [], []
            # wait for frames AND a real coalesced device batch: idle
            # frames flow even while the first super-batch compiles, so
            # frame count alone would exit before the scheduler ever ran
            while time.time() < deadline and (
                    len(f1) < 4 or len(f2) < 4
                    or s1._scheduler.batches_run < 1):
                for sess, acc in ((s1, f1), (s2, f2)):
                    try:
                        acc.append(sess.output.video_queue.get(timeout=0.2))
                    except queue.Empty:
                        pass
            assert len(f1) >= 4 and len(f2) >= 4
            assert f1[0].shape == (480, 640, 3)  # full frames egress
            # the scheduler actually coalesced at least one super-batch
            assert s1._scheduler.batches_run >= 1
        finally:
            q1.set(); q2.set()
            t1.join(timeout=15); t2.join(timeout=15)
    finally:
        reset_shared_scheduler()
