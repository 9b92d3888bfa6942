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
