"""ER-NeRF model family (models/ernerf.py + avatars/ernerf_avatar.py).

Numerics: volume-rendering invariants (zero density -> background passes
through; opaque field -> alpha ~ 1), triplane sampling interpolates
exactly at grid nodes, a few Adam steps reduce photometric loss; and the
plugin drives the full engine pipeline end to end on CPU."""

import os
import queue
import time
from threading import Event, Thread

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livetalking_tpu.models import ernerf

SIZE, NS = 16, 8
RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def params():
    return ernerf.init_params(jax.random.PRNGKey(0), plane_res=32,
                              plane_ch=8, audio_dim=64, audio_lat=8,
                              hidden=32)


def test_zero_density_passes_background(params):
    # force sigma to -inf pre-softplus: zero the sigma head and push bias low
    p = jax.tree.map(lambda x: x, params)
    p["sigma"] = {"w": jnp.zeros_like(params["sigma"]["w"]),
                  "b": jnp.full_like(params["sigma"]["b"], -30.0)}
    feats = jnp.zeros((2, 64), jnp.float32)
    bg = jnp.asarray(RNG.random((2, SIZE, SIZE, 3)).astype(np.float32))
    out = ernerf.render_frame_batch(p, feats, bg, size=SIZE, n_samples=NS)
    ref = jnp.clip(jnp.rint(bg * 255.0), 0, 255).astype(jnp.uint8)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_opaque_field_saturates_alpha(params):
    p = jax.tree.map(lambda x: x, params)
    p["sigma"] = {"w": jnp.zeros_like(params["sigma"]["w"]),
                  "b": jnp.full_like(params["sigma"]["b"], 50.0)}
    rays_o, rays_d = ernerf.make_frame_rays(SIZE)
    lat = jnp.zeros((8,), jnp.float32)
    _rgb, alpha = ernerf.render_rays(p, rays_o, rays_d, lat, n_samples=NS)
    assert float(alpha.min()) > 0.999


def test_weights_sum_to_alpha_leq_one(params):
    rays_o, rays_d = ernerf.make_frame_rays(SIZE)
    lat = jnp.asarray(RNG.standard_normal(8), jnp.float32)
    rgb, alpha = ernerf.render_rays(params, rays_o, rays_d, lat, n_samples=NS)
    assert float(alpha.max()) <= 1.0 + 1e-5
    assert float(alpha.min()) >= 0.0
    assert np.isfinite(np.asarray(rgb)).all()


def test_triplane_exact_at_grid_nodes():
    R, C = 8, 4
    plane = jnp.asarray(RNG.standard_normal((R, R, C)).astype(np.float32))
    # uv exactly at node (i, j): value must equal plane[j, i] (u=x, v=y)
    i, j = 5, 2
    uv = jnp.asarray([[2 * i / (R - 1) - 1, 2 * j / (R - 1) - 1]], jnp.float32)
    got = ernerf._bilinear_plane(plane, uv)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(plane[j, i]),
                               rtol=1e-5, atol=1e-5)
    # midpoint between two nodes = average
    uv_mid = jnp.asarray([[2 * (i + 0.5) / (R - 1) - 1, 2 * j / (R - 1) - 1]],
                         jnp.float32)
    got_mid = ernerf._bilinear_plane(plane, uv_mid)[0]
    ref_mid = 0.5 * (plane[j, i] + plane[j, i + 1])
    np.testing.assert_allclose(np.asarray(got_mid), np.asarray(ref_mid),
                               rtol=1e-4, atol=1e-5)


def test_train_step_reduces_loss(params):
    tx, step = ernerf.make_train_step(lr=3e-3, size=SIZE, n_samples=NS)
    opt_state = tx.init(params)
    feats = jnp.asarray(RNG.standard_normal((2, 64)).astype(np.float32))
    bg = jnp.zeros((2, SIZE, SIZE, 3), jnp.float32)
    target = jnp.asarray(RNG.random((2, SIZE, SIZE, 3)).astype(np.float32))
    p = params
    losses = []
    for _ in range(8):
        p, opt_state, loss = step(p, opt_state, feats, bg, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_field_params_roundtrip(tmp_path):
    from livetalking_tpu.avatars import ernerf_avatar as plugin

    p = ernerf.init_params(jax.random.PRNGKey(1), plane_res=16, plane_ch=4,
                           audio_dim=32, audio_lat=4, hidden=16)
    path = plugin.save_avatar_field(p, str(tmp_path))
    loaded = np.load(path)
    restored = plugin.unflatten_params({k: loaded[k] for k in loaded.files})
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_genavatar_ernerf_roundtrip(tmp_path):
    """Offline build (frames + coords + fitted field) round-trips through
    the runtime loader and renders."""
    import cv2

    from livetalking_tpu.avatars import ernerf_avatar as plugin
    from livetalking_tpu.genavatar import generate_ernerf_avatar
    from livetalking_tpu.genavatar.face import FaceDetector

    vid = str(tmp_path / "input.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 25, (320, 240))
    for i in range(6):
        frame = np.full((240, 320, 3), 60, np.uint8)
        cv2.ellipse(frame, (160 + i, 120), (60, 80), 0, 0, 360,
                    (90, 140, 200), -1)
        w.write(frame)
    w.release()

    data_dir = str(tmp_path)
    out = generate_ernerf_avatar(vid, "nfgen", data_dir, size=SIZE,
                                 train_steps=3, batch=2,
                                 face_detector=FaceDetector("center"))
    assert os.path.exists(os.path.join(out, "ernerf.npz"))

    avatar = plugin.load_avatar("nfgen", data_dir)
    assert avatar["nerf_params"] is not None
    assert len(avatar["frame_list_cycle"]) == 6
    feats = jnp.zeros((2, plugin.AUDIO_DIM), jnp.float32)
    bg = jnp.zeros((2, SIZE, SIZE, 3), jnp.float32)
    img = ernerf.render_frame_batch(avatar["nerf_params"], feats, bg,
                                    size=SIZE, n_samples=4)
    assert img.shape == (2, SIZE, SIZE, 3)


def test_engine_pipeline_ernerf(tmp_path):
    """Full pipeline: text -> dummy TTS -> HuBERT features -> NeRF render
    -> paste-back -> queue streamout."""
    from livetalking_tpu import registry
    from livetalking_tpu.avatars import ernerf_avatar as plugin
    from livetalking_tpu.config import default_opt
    from livetalking_tpu.utils.synthetic import make_synthetic_avatar

    make_synthetic_avatar(os.path.join(str(tmp_path), "avatars", "nf1"),
                          n_frames=4)
    opt = default_opt(transport="queue", tts="dummy", batch_size=2,
                      dtype="float32", sessionid="nf1", hubert_size="tiny",
                      ernerf_size=16, ernerf_samples=4)
    model = plugin.load_model(opt)
    avatar = plugin.load_avatar("nf1", str(tmp_path))
    sess = registry.create("avatar", "ernerf", opt=opt, model=model,
                           avatar=avatar)

    quit_event = Event()
    t = Thread(target=sess.render, args=(quit_event,), daemon=True)
    t.start()
    try:
        sess.put_msg_txt("neural radiance head end to end")
        deadline = time.time() + 90
        while time.time() < deadline and not sess.is_speaking():
            time.sleep(0.1)
        assert sess.is_speaking()
        frames = []
        deadline = time.time() + 90
        while len(frames) < 4 and time.time() < deadline:
            try:
                frames.append(sess.output.video_queue.get(timeout=0.5))
            except queue.Empty:
                pass
        assert len(frames) == 4
        assert all(f.shape == (480, 640, 3) for f in frames)
    finally:
        quit_event.set()
        t.join(timeout=10)
