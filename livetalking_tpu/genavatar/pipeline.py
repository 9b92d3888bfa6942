"""Model-specific avatar build pipelines.

Output directory formats are byte-compatible with the runtime loaders
(and the reference):
  - wav2lip  (reference avatars/wav2lip/genavatar.py:50-166):
    full_imgs/ + face_imgs/ (img_size crops) + coords.pkl (y1, y2, x1, x2)
  - musetalk (reference avatars/musetalk/genavatar.py:49-183):
    full_imgs/ + coords.pkl (x1, y1, x2, y2) + latents.pt + mask/ +
    mask_coords.pkl
  - ultralight (reference avatars/ultralight/genavatar.py:40-95):
    full_imgs/ + face_imgs/ (168 px) + coords.pkl (x1, y1, x2, y2)
    [+ per-avatar ultralight.pth supplied by training]
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Callable, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from livetalking_tpu.genavatar.face import FaceDetector, detect_track
from livetalking_tpu.utils.logger import logger

Progress = Optional[Callable[[int, str], None]]


def _report(progress: Progress, pct: int, msg: str) -> None:
    if progress:
        progress(pct, msg)


def load_frames(video_path: str, watermark: bool = True) -> List[np.ndarray]:
    """Video file OR image directory -> list of BGR frames (reference
    video2imgs, avatars/wav2lip/genavatar.py:60-75)."""
    frames: List[np.ndarray] = []
    if os.path.isdir(video_path):
        paths = sorted(glob.glob(os.path.join(video_path, "*.[jpJP][pnPN]*[gG]")))
        frames = [cv2.imread(p) for p in paths]
    else:
        cap = cv2.VideoCapture(video_path)
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
        cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {video_path}")
    if watermark:
        for f in frames:
            cv2.putText(f, "LiveTalking", (10, 20), cv2.FONT_HERSHEY_SIMPLEX,
                        0.3, (128, 128, 128), 1)
    return frames


def _write_frames(dirpath: str, frames: Sequence[np.ndarray]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(dirpath, f"{i}.png"), f)


def _pickle(path: str, obj) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def generate_wav2lip_avatar(
    video_path: str,
    avatar_id: str,
    data_dir: str = "./data",
    img_size: int = 256,
    pads: Tuple[int, int, int, int] = (0, 10, 0, 0),
    face_detector: Optional[FaceDetector] = None,
    progress_callback: Progress = None,
) -> str:
    avatar_dir = os.path.join(data_dir, "avatars", avatar_id)
    detector = face_detector or FaceDetector()

    _report(progress_callback, 5, "decoding frames")
    frames = load_frames(video_path)
    _report(progress_callback, 25, "detecting faces")
    boxes = detect_track(frames, detector, pads)

    _report(progress_callback, 55, "cropping faces")
    _write_frames(os.path.join(avatar_dir, "full_imgs"), frames)
    faces = [cv2.resize(f[y1:y2, x1:x2], (img_size, img_size))
             for f, (x1, y1, x2, y2) in zip(frames, boxes)]
    _write_frames(os.path.join(avatar_dir, "face_imgs"), faces)
    # wav2lip coords use (y1, y2, x1, x2) (reference genavatar.py:126-138)
    _pickle(os.path.join(avatar_dir, "coords.pkl"),
            [(y1, y2, x1, x2) for (x1, y1, x2, y2) in boxes])
    _report(progress_callback, 100, "done")
    logger.info("wav2lip avatar %s built: %d frames", avatar_id, len(frames))
    return avatar_dir


def _feathered_mask(box: Tuple[int, int, int, int], crop_box, blur: int) -> np.ndarray:
    """Geometric stand-in for the BiSeNet face-parse mask (reference uses a
    parsing net + Gaussian feathering, avatars/musetalk/utils/blending.py:
    112-136; the parse-net path plugs in here when weights are present)."""
    x1, y1, x2, y2 = box
    xs, ys, xe, ye = crop_box
    mask = np.zeros((ye - ys, xe - xs, 3), np.uint8)
    cx, cy = (x1 + x2) // 2 - xs, (y1 + y2) // 2 - ys
    cv2.ellipse(mask, (cx, cy), ((x2 - x1) // 2, (y2 - y1) // 2), 0, 0, 360,
                (255, 255, 255), -1)
    k = blur | 1
    return cv2.GaussianBlur(mask, (k, k), 0)


def _load_face_parser(models_dir: str = "./models"):
    """Load the BiSeNet face parser when its checkpoint exists
    (models/bisenet.py, the reference face_parsing stack) — returns a
    ``(face_bgr_512) -> class_map`` callable or None."""
    import glob as _glob

    cands = (_glob.glob(os.path.join(models_dir, "face-parse*.pth"))
             + _glob.glob(os.path.join(models_dir, "79999_iter.pth")))
    if not cands:
        return None
    try:
        import torch

        from livetalking_tpu.models import bisenet

        sd = torch.load(cands[0], map_location="cpu", weights_only=False)
        params = bisenet.convert_torch_state_dict(sd)
        fn = bisenet.make_parse_fn(512)
        logger.info("face parser loaded from %s", cands[0])
        return lambda face_bgr: np.asarray(fn(params, face_bgr[None]))[0]
    except Exception as e:
        logger.warning("face parser unavailable (%s) - geometric masks", e)
        return None


def _parsed_mask(parse, frame: np.ndarray, box, crop_box, blur: int) -> np.ndarray:
    """BiSeNet path of the reference mask build (blending.py:112-136):
    parse the face crop, keep the mouth region, Gaussian-feather."""
    from livetalking_tpu.models.bisenet import mouth_mask

    x1, y1, x2, y2 = box
    xs, ys, xe, ye = crop_box
    face = cv2.resize(frame[y1:y2, x1:x2], (512, 512))
    classes = parse(face.astype(np.uint8))
    m = cv2.resize(mouth_mask(classes), (x2 - x1, y2 - y1),
                   interpolation=cv2.INTER_NEAREST)
    full = np.zeros((ye - ys, xe - xs), np.uint8)
    full[y1 - ys:y2 - ys, x1 - xs:x2 - xs] = m
    k = blur | 1
    full = cv2.GaussianBlur(full, (k, k), 0)
    return cv2.cvtColor(full, cv2.COLOR_GRAY2BGR)


def generate_musetalk_avatar(
    video_path: str,
    avatar_id: str,
    data_dir: str = "./data",
    vae_params=None,
    bbox_shift: int = 0,
    version: str = "v15",
    face_detector: Optional[FaceDetector] = None,
    models_dir: str = "./models",
    progress_callback: Progress = None,
) -> str:
    from livetalking_tpu.models.musetalk import encode_avatar_latents

    avatar_dir = os.path.join(data_dir, "avatars", avatar_id)
    detector = face_detector or FaceDetector()

    _report(progress_callback, 5, "decoding frames")
    frames = load_frames(video_path)
    H, W = frames[0].shape[:2]
    _report(progress_callback, 20, "detecting faces")
    boxes = detect_track(frames, detector, pads=(0, 0, 0, 0))

    # landmark refinement when PFLD weights are available (reference
    # preprocessing.py:126-140 fuses detector boxes with landmarks)
    from livetalking_tpu.genavatar.landmarks import (
        load_pfld_landmarker,
        musetalk_crop_box,
    )

    landmarker = load_pfld_landmarker(models_dir)
    if landmarker is not None:
        _report(progress_callback, 30, "regressing landmarks")

        def shifted(b):  # detector-box fallback keeps the bbox_shift too
            x1, y1, x2, y2 = b
            return (x1, max(0, y1 + bbox_shift), x2, min(H, y2 + bbox_shift))

        refined = []
        for frame, box in zip(frames, boxes):
            lms = landmarker.landmarks(frame, box)
            refined.append(
                musetalk_crop_box(lms, (H, W), bbox_shift) or shifted(box))
        boxes = refined
    elif bbox_shift:
        boxes = [(x1, max(0, y1 + bbox_shift), x2, min(H, y2 + bbox_shift))
                 for (x1, y1, x2, y2) in boxes]
    if version == "v15":  # extra chin margin (reference genavatar.py:121-124)
        boxes = [(x1, y1, x2, min(H, y2 + (y2 - y1) // 10)) for (x1, y1, x2, y2) in boxes]

    _report(progress_callback, 40, "encoding VAE latents")
    if vae_params is None:
        raise ValueError("musetalk avatar build requires VAE params")
    faces = np.stack([cv2.resize(f[y1:y2, x1:x2], (256, 256))
                      for f, (x1, y1, x2, y2) in zip(frames, boxes)]).astype(np.uint8)
    latents = encode_avatar_latents(vae_params, faces)

    _report(progress_callback, 70, "building masks")
    _write_frames(os.path.join(avatar_dir, "full_imgs"), frames)
    mask_dir = os.path.join(avatar_dir, "mask")
    os.makedirs(mask_dir, exist_ok=True)
    parse = _load_face_parser()
    mask_coords = []
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        mx, my = (x2 - x1) // 10, (y2 - y1) // 10
        crop_box = (max(0, x1 - mx), max(0, y1 - my), min(W, x2 + mx), min(H, y2 + my))
        blur = max(5, (x2 - x1) // 12)
        if parse is not None:
            mask = _parsed_mask(parse, frames[i], (x1, y1, x2, y2), crop_box, blur)
        else:
            mask = _feathered_mask((x1, y1, x2, y2), crop_box, blur)
        cv2.imwrite(os.path.join(mask_dir, f"{i}.png"), mask)
        mask_coords.append(crop_box)

    import torch

    tensors = [torch.from_numpy(np.transpose(l, (2, 0, 1))[None]) for l in latents]
    torch.save(tensors, os.path.join(avatar_dir, "latents.pt"))
    _pickle(os.path.join(avatar_dir, "coords.pkl"), boxes)
    _pickle(os.path.join(avatar_dir, "mask_coords.pkl"), mask_coords)
    _report(progress_callback, 100, "done")
    logger.info("musetalk avatar %s built: %d frames", avatar_id, len(frames))
    return avatar_dir


def generate_ultralight_avatar(
    video_path: str,
    avatar_id: str,
    data_dir: str = "./data",
    unet_checkpoint: Optional[str] = None,
    face_detector: Optional[FaceDetector] = None,
    models_dir: str = "./models",
    progress_callback: Progress = None,
) -> str:
    avatar_dir = os.path.join(data_dir, "avatars", avatar_id)
    detector = face_detector or FaceDetector()

    _report(progress_callback, 5, "decoding frames")
    frames = load_frames(video_path)
    _report(progress_callback, 30, "detecting faces")
    boxes = detect_track(frames, detector, pads=(0, 0, 0, 0))
    H, W = frames[0].shape[:2]

    # landmark-derived square crops when PFLD weights are available
    # (reference genavatar.py:76-82); square-expanded detector boxes
    # otherwise
    from livetalking_tpu.genavatar.landmarks import (
        load_pfld_landmarker,
        ultralight_crop_box,
    )

    landmarker = load_pfld_landmarker(models_dir)
    if landmarker is not None:
        _report(progress_callback, 45, "regressing landmarks")
        lm_boxes = []
        for frame, box in zip(frames, boxes):
            lms = landmarker.landmarks(frame, box)
            lm_boxes.append(ultralight_crop_box(lms, (H, W)) or box)
        boxes = lm_boxes
    else:
        logger.info("no PFLD weights (models/pfld.pth + mean_face.txt): "
                    "using square-expanded detector boxes")
        sq = []
        for (x1, y1, x2, y2) in boxes:
            s = max(x2 - x1, y2 - y1)
            cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
            x1 = max(0, cx - s // 2); y1 = max(0, cy - s // 2)
            sq.append((x1, y1, min(W, x1 + s), min(H, y1 + s)))
        boxes = sq

    _report(progress_callback, 60, "cropping")
    _write_frames(os.path.join(avatar_dir, "full_imgs"), frames)
    crops = [cv2.resize(f[y1:y2, x1:x2], (168, 168))
             for f, (x1, y1, x2, y2) in zip(frames, boxes)]
    _write_frames(os.path.join(avatar_dir, "face_imgs"), crops)
    _pickle(os.path.join(avatar_dir, "coords.pkl"), boxes)  # (x1, y1, x2, y2)

    if unet_checkpoint and os.path.exists(unet_checkpoint):
        import shutil

        shutil.copy(unet_checkpoint, os.path.join(avatar_dir, "ultralight.pth"))
    else:
        logger.warning("no per-avatar ultralight checkpoint provided - "
                       "runtime will use random U-Net weights")
    _report(progress_callback, 100, "done")
    logger.info("ultralight avatar %s built: %d frames", avatar_id, len(frames))
    return avatar_dir


def generate_ernerf_avatar(
    video_path: str,
    avatar_id: str,
    data_dir: str = "./data",
    size: int = 64,
    train_steps: int = 200,
    batch: int = 4,
    hubert_params=None,
    hubert_cfg=None,
    face_detector: Optional[FaceDetector] = None,
    progress_callback: Progress = None,
) -> str:
    """Build an ernerf avatar: frames + coords + a per-avatar triplane
    field fit photometrically to the clip, conditioned on its audio.

    The reference snapshot ships no ernerf pipeline; format is ours
    (avatars/ernerf_avatar.py load_avatar): ``full_imgs/ + coords.pkl
    (y1, y2, x1, x2) + ernerf.npz``. Audio features use the same HuBERT
    window geometry as the runtime extractor (multiplier 2, window
    (4, 4)) so train/serve conditioning matches.
    """
    import jax
    import jax.numpy as jnp

    from livetalking_tpu.audio_features.base import clamp_window_indices
    from livetalking_tpu.avatars.ernerf_avatar import AUDIO_DIM, save_avatar_field
    from livetalking_tpu.models import ernerf
    from livetalking_tpu.models import hubert as hub

    avatar_dir = os.path.join(data_dir, "avatars", avatar_id)
    detector = face_detector or FaceDetector()

    _report(progress_callback, 5, "decoding frames")
    frames = load_frames(video_path)
    _report(progress_callback, 20, "detecting faces")
    boxes = detect_track(frames, detector, pads=(0, 10, 0, 0))
    _write_frames(os.path.join(avatar_dir, "full_imgs"), frames)
    _pickle(os.path.join(avatar_dir, "coords.pkl"),
            [(y1, y2, x1, x2) for (x1, y1, x2, y2) in boxes])

    n = len(frames)
    _report(progress_callback, 35, "extracting audio features")
    feats = np.zeros((n, AUDIO_DIM), np.float32)
    if not os.path.isdir(video_path):
        try:
            from livetalking_tpu.utils.audio import decode_audio, resample

            wav, sr = decode_audio(video_path)
            wav = resample(wav, sr, 16000)
            cfg = hubert_cfg or hub.LARGE
            params = hubert_params or hub.init_params(jax.random.PRNGKey(0), cfg)
            h = np.asarray(hub.apply(params, cfg, jnp.asarray(wav)[None, :])[0])
            rows = clamp_window_indices(n, h.shape[0], (4, 4), start=0,
                                        multiplier=2.0)
            feats = h[rows].reshape(n, -1).astype(np.float32)
            if feats.shape[1] != AUDIO_DIM:  # tiny configs in tests
                pad = np.zeros((n, AUDIO_DIM), np.float32)
                pad[:, : feats.shape[1]] = feats[:, :AUDIO_DIM]
                feats = pad
        except Exception as e:
            logger.warning("ernerf: no usable audio track (%s) - "
                           "zero conditioning", e)

    _report(progress_callback, 45, "fitting triplane field")
    crops = np.stack([
        cv2.resize(f[y1:y2, x1:x2], (size, size)).astype(np.float32) / 255.0
        for f, (x1, y1, x2, y2) in zip(frames, boxes)
    ])
    params = ernerf.init_params(jax.random.PRNGKey(0), audio_dim=AUDIO_DIM)
    tx, step = ernerf.make_train_step(lr=2e-3, size=size, n_samples=16)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    for it in range(train_steps):
        sel = rng.integers(0, n, (batch,))
        # random solid background per sample (classic NeRF trick): forces
        # the field to explain the head with alpha ~ 1 rather than relying
        # on any particular compositing background — at serve time the
        # render composites over the avatar's own bbox crop
        # (avatars/ernerf_avatar.py NerfReal.bg_cycle_device)
        bg = np.broadcast_to(
            rng.random((batch, 1, 1, 3)).astype(np.float32),
            (batch, size, size, 3))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(feats[sel]), jnp.asarray(bg),
            jnp.asarray(crops[sel]))
        if it % max(1, train_steps // 10) == 0:
            _report(progress_callback,
                    45 + int(50 * it / train_steps),
                    f"fit step {it}/{train_steps} loss={float(loss):.4f}")

    save_avatar_field(params, avatar_dir)
    _report(progress_callback, 100, "done")
    logger.info("ernerf avatar %s built: %d frames, %d fit steps",
                avatar_id, n, train_steps)
    return avatar_dir
