"""Fused on-device paste-back op (ops/pallas_blend.py).

Checks, all on CPU: the Pallas kernel (interpret mode) matches its
pure-XLA twin; the XLA twin matches cv2's INTER_LINEAR resize+rect paste
(the reference host composite, reference avatars/wav2lip_avatar.py:141-147);
feathering ramps the blend at bbox edges; DevicePasteBack reproduces the
wav2lip host paste path on a synthetic avatar."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from livetalking_tpu.ops import pallas_blend as pb

RNG = np.random.default_rng(7)
S = 256


def _mk_inputs(n_frames=3, H=480, W=640, B=4):
    frames = RNG.integers(0, 256, (n_frames, H, W, 3), dtype=np.uint8)
    boxes = []
    for k in range(n_frames):
        h = int(RNG.integers(80, 300))
        w = int(RNG.integers(80, 300))
        y1 = int(RNG.integers(0, H - h))
        x1 = int(RNG.integers(0, W - w))
        boxes.append((y1, y1 + h, x1, x1 + w))
    boxes = np.asarray(boxes, dtype=np.int32)
    pred = RNG.integers(0, 256, (B, S, S, 3), dtype=np.uint8)
    idxs = RNG.integers(0, n_frames, (B,)).astype(np.int32)
    return frames, boxes, pred, idxs


def test_xla_matches_cv2_rect_paste():
    frames, boxes, pred, idxs = _mk_inputs()
    H, W = frames.shape[1:3]
    Ho, Wo = pb.bucket_shape(boxes)
    out = np.asarray(pb.resize_paste_xla(
        pred, frames, idxs, boxes, S=S, Ho=Ho, Wo=Wo, H=H, W=W, feather=0))

    for b in range(len(idxs)):
        y1, y2, x1, x2 = boxes[idxs[b]]
        ref = frames[idxs[b]].copy()
        ref[y1:y2, x1:x2] = cv2.resize(pred[b], (x2 - x1, y2 - y1),
                                       interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out[b].astype(np.int32) - ref.astype(np.int32))
        # cv2 INTER_LINEAR is 11-bit fixed point; float math may differ ±2
        assert diff.max() <= 2, diff.max()
        assert float(diff.mean()) < 0.2
        # untouched region must be byte-identical
        mask = np.ones((frames.shape[1], frames.shape[2]), bool)
        mask[y1:y2, x1:x2] = False
        assert np.array_equal(out[b][mask], frames[idxs[b]][mask])


def test_pallas_interpret_matches_xla_twin():
    frames, boxes, pred, idxs = _mk_inputs(B=3)
    H, W = frames.shape[1:3]
    Ho, Wo = pb.bucket_shape(boxes)
    for feather in (0, 9):
        fn_k = pb.make_resize_paste_fn(S, Ho, Wo, H, W, feather=feather,
                                       use_pallas=True, interpret=True)
        fn_x = pb.make_resize_paste_fn(S, Ho, Wo, H, W, feather=feather,
                                       use_pallas=False)
        out_k = np.asarray(fn_k(pred, frames, idxs, boxes)).astype(np.int32)
        out_x = np.asarray(fn_x(pred, frames, idxs, boxes)).astype(np.int32)
        # identical math, different accumulation order: allow 1 lsb at ties
        assert np.abs(out_k - out_x).max() <= 1


def test_feather_ramps_edges():
    H = W = 256
    frames = np.zeros((1, H, W, 3), np.uint8)          # black background
    pred = np.full((1, S, S, 3), 200, np.uint8)        # flat bright face
    boxes = np.asarray([[64, 192, 64, 192]], np.int32)  # 128x128 box
    Ho, Wo = pb.bucket_shape(boxes)
    out = np.asarray(pb.resize_paste_xla(
        pred, frames, np.zeros(1, np.int32), boxes,
        S=S, Ho=Ho, Wo=Wo, H=H, W=W, feather=16))
    g = out[0, :, :, 0].astype(np.int32)
    assert g[128, 128] == 200          # center: fully pred
    assert 0 < g[64, 128] < 200        # top edge row: blended toward bg
    assert g[63, 128] == 0             # outside box: untouched bg
    assert g[64, 128] < g[79, 128] <= 200  # monotone ramp over feather band


def test_device_paste_back_matches_host_path(tmp_path):
    from livetalking_tpu.avatars.wav2lip_avatar import load_avatar
    from livetalking_tpu.utils.synthetic import make_synthetic_avatar

    make_synthetic_avatar(str(tmp_path / "avatars" / "pb1"), n_frames=4)
    avatar = load_avatar("pb1", str(tmp_path))
    frames = np.stack(avatar["frame_list_cycle"])
    coords = avatar["coord_list_cycle"]

    dp = pb.DevicePasteBack(frames, coords, S, feather=0, use_pallas=False)
    assert dp.available

    pred = RNG.integers(0, 256, (2, S, S, 3), dtype=np.uint8)
    idxs = np.asarray([0, 3], np.int32)
    out = dp.paste_batch(pred, idxs)

    for b, idx in enumerate(idxs):
        y1, y2, x1, x2 = coords[idx]
        ref = frames[idx].copy()
        ref[y1:y2, x1:x2] = cv2.resize(pred[b], (x2 - x1, y2 - y1),
                                       interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out[b].astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 2


def test_bucket_shape_alignment():
    assert pb.bucket_shape([(0, 100, 0, 100)]) == (104, 128)
    assert pb.bucket_shape([(0, 8, 0, 128)]) == (8, 128)
    assert pb.bucket_shape([(10, 300, 5, 200), (0, 64, 0, 400)]) == (296, 512)


def test_bucket_exceeding_frame_raises():
    with pytest.raises(ValueError):
        pb.make_resize_paste_fn(S, 512, 512, 256, 256)


def test_masked_paste_matches_musetalk_host_blend(tmp_path):
    """MaskedDevicePasteBack (input-mask kernel variant) reproduces the
    musetalk host blend (blend_face) on a synthetic masked avatar."""
    import os

    from livetalking_tpu.avatars.musetalk_avatar import blend_face, load_avatar
    from livetalking_tpu.models import sd_vae
    from livetalking_tpu.utils.synthetic import make_synthetic_musetalk_avatar

    import jax

    vae_params = sd_vae.init_params(jax.random.PRNGKey(0))
    make_synthetic_musetalk_avatar(
        os.path.join(str(tmp_path), "avatars", "mk1"), vae_params, n_frames=4)
    avatar = load_avatar("mk1", str(tmp_path))
    frames = np.stack(avatar["frame_list_cycle"])
    coords = avatar["coord_list_cycle"]            # (x1, y1, x2, y2)
    mask_coords = avatar["mask_coords_list_cycle"]  # (xs, ys, xe, ye)
    masks = avatar["mask_list_cycle"]

    mp = pb.MaskedDevicePasteBack(frames, coords, mask_coords, masks, S,
                                  use_pallas=False)
    assert mp.available

    pred = RNG.integers(0, 256, (2, S, S, 3), dtype=np.uint8)
    idxs = np.asarray([0, 2], np.int32)
    out = mp.paste_batch(pred, idxs)

    for b, idx in enumerate(idxs):
        x1, y1, x2, y2 = coords[idx]
        face = cv2.resize(pred[b], (x2 - x1, y2 - y1),
                          interpolation=cv2.INTER_LINEAR)
        ref = blend_face(frames[idx].copy(), face, (x1, y1, x2, y2),
                         masks[idx], mask_coords[idx])
        diff = np.abs(out[b].astype(np.int32) - ref.astype(np.int32))
        # resize fixed-point + blend rounding: tight but not bit-exact
        assert diff.max() <= 3, diff.max()
        assert float(diff.mean()) < 0.2
        # outside the crop box the frame must be untouched
        xs, ys, xe, ye = mask_coords[idx]
        m = np.ones(frames[idx].shape[:2], bool)
        m[ys:ye, xs:xe] = False
        assert np.array_equal(out[b][m], frames[idx][m])


def test_masked_paste_pallas_interpret_matches_xla(tmp_path):
    import os

    from livetalking_tpu.avatars.musetalk_avatar import load_avatar
    from livetalking_tpu.models import sd_vae
    from livetalking_tpu.utils.synthetic import make_synthetic_musetalk_avatar

    import jax

    vae_params = sd_vae.init_params(jax.random.PRNGKey(0))
    make_synthetic_musetalk_avatar(
        os.path.join(str(tmp_path), "avatars", "mk2"), vae_params, n_frames=3)
    avatar = load_avatar("mk2", str(tmp_path))
    frames = np.stack(avatar["frame_list_cycle"])

    kw = dict(face_boxes=avatar["coord_list_cycle"],
              crop_boxes=avatar["mask_coords_list_cycle"],
              mask_imgs=avatar["mask_list_cycle"], S=S)
    mk = pb.MaskedDevicePasteBack(frames, use_pallas=True, interpret=True, **kw)
    mx = pb.MaskedDevicePasteBack(frames, use_pallas=False, **kw)

    pred = RNG.integers(0, 256, (2, S, S, 3), dtype=np.uint8)
    idxs = np.asarray([1, 2], np.int32)
    a = mk.paste_batch(pred, idxs).astype(np.int32)
    b = mx.paste_batch(pred, idxs).astype(np.int32)
    assert np.abs(a - b).max() <= 1


def test_engine_pipeline_with_device_paste_back(tmp_path):
    """Full per-session pipeline with --device_paste_back: speech frames
    come out as finished full frames from the device composite path."""
    import os
    import queue
    import time
    from threading import Event, Thread

    from livetalking_tpu import registry
    from livetalking_tpu.avatars import wav2lip_avatar as plugin
    from livetalking_tpu.config import default_opt
    from livetalking_tpu.utils.synthetic import make_synthetic_avatar

    make_synthetic_avatar(os.path.join(str(tmp_path), "avatars", "dp1"),
                          n_frames=4)
    opt = default_opt(transport="queue", tts="dummy", batch_size=2,
                      dtype="float32", sessionid="dp1",
                      device_paste_back=True)
    model = plugin.load_model("", opt)
    avatar = plugin.load_avatar("dp1", str(tmp_path))
    sess = registry.create("avatar", "wav2lip", opt=opt, model=model,
                           avatar=avatar)
    assert sess._device_paste is not None

    quit_event = Event()
    t = Thread(target=sess.render, args=(quit_event,), daemon=True)
    t.start()
    try:
        sess.put_msg_txt("device paste back end to end")
        deadline = time.time() + 60
        while time.time() < deadline and not sess.is_speaking():
            time.sleep(0.1)
        assert sess.is_speaking()

        frames = []
        deadline = time.time() + 60
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
