"""Synthetic avatar generation for tests, benches and air-gapped demos.

Writes a reference-format avatar directory (full_imgs/face_imgs/coords.pkl,
see avatars/wav2lip_avatar.py docstring) containing a procedurally drawn
"face" so the full pipeline can run without downloaded assets.
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import cv2
import numpy as np


def make_synthetic_avatar(
    avatar_dir: str,
    n_frames: int = 10,
    frame_hw: Tuple[int, int] = (480, 640),
    face_size: int = 256,
    seed: int = 0,
    coord_order: str = "yx",
) -> str:
    """Create a synthetic reference-format avatar at ``avatar_dir``.

    ``coord_order``: "yx" writes (y1, y2, x1, x2) coords (wav2lip/musetalk
    format); "xy" writes (x1, y1, x2, y2) (ultralight format, which also
    uses ``face_size=168``).
    """
    rng = np.random.default_rng(seed)
    full_dir = os.path.join(avatar_dir, "full_imgs")
    face_dir = os.path.join(avatar_dir, "face_imgs")
    os.makedirs(full_dir, exist_ok=True)
    os.makedirs(face_dir, exist_ok=True)

    H, W = frame_hw
    fh = fw = min(H, W) // 2
    y1 = (H - fh) // 2
    x1 = (W - fw) // 2
    coords = []
    for i in range(n_frames):
        frame = np.full((H, W, 3), 40 + 10 * (i % 3), np.uint8)
        # a drifting ellipse "head" so frames differ
        cx, cy = W // 2 + int(5 * np.sin(i)), H // 2
        cv2.ellipse(frame, (cx, cy), (fw // 2, fh // 2), 0, 0, 360,
                    (90, 140, 200), -1)
        cv2.circle(frame, (cx - 30, cy - 30), 10, (30, 30, 30), -1)
        cv2.circle(frame, (cx + 30, cy - 30), 10, (30, 30, 30), -1)
        cv2.ellipse(frame, (cx, cy + 40), (30, 10 + (i % 4) * 3), 0, 0, 360,
                    (40, 40, 120), -1)
        noise = rng.integers(0, 8, frame.shape, dtype=np.uint8)
        frame = cv2.add(frame, noise)
        cv2.imwrite(os.path.join(full_dir, f"{i}.png"), frame)

        face = cv2.resize(frame[y1 : y1 + fh, x1 : x1 + fw], (face_size, face_size))
        cv2.imwrite(os.path.join(face_dir, f"{i}.png"), face)
        if coord_order == "xy":
            coords.append((x1, y1, x1 + fw, y1 + fh))
        else:
            coords.append((y1, y1 + fh, x1, x1 + fw))

    with open(os.path.join(avatar_dir, "coords.pkl"), "wb") as f:
        pickle.dump(coords, f)
    return avatar_dir


def make_synthetic_musetalk_avatar(avatar_dir: str, vae_params, n_frames: int = 6,
                                   frame_hw: Tuple[int, int] = (480, 640), seed: int = 0) -> str:
    """Create a musetalk-format avatar: synthetic frames + VAE-encoded
    latents.pt + feathered masks + coords/mask_coords pickles (the offline
    product of the reference musetalk genavatar, SURVEY §2.8)."""
    import torch

    from livetalking_tpu.models.musetalk import encode_avatar_latents

    make_synthetic_avatar(avatar_dir, n_frames=n_frames, frame_hw=frame_hw,
                          face_size=256, seed=seed, coord_order="xy")
    with open(os.path.join(avatar_dir, "coords.pkl"), "rb") as f:
        coords = pickle.load(f)

    faces = []
    for i in range(n_frames):
        face = cv2.imread(os.path.join(avatar_dir, "face_imgs", f"{i}.png"))
        faces.append(cv2.resize(face, (256, 256)))
    lat = encode_avatar_latents(vae_params, np.stack(faces))  # (N, 32, 32, 8)
    tensors = [torch.from_numpy(np.transpose(l, (2, 0, 1))[None]) for l in lat]
    torch.save(tensors, os.path.join(avatar_dir, "latents.pt"))

    H, W = frame_hw
    mask_dir = os.path.join(avatar_dir, "mask")
    os.makedirs(mask_dir, exist_ok=True)
    mask_coords = []
    for i, (x1, y1, x2, y2) in enumerate(coords):
        # crop box: bbox expanded by 10% clamped to the frame
        mx = (x2 - x1) // 10
        my = (y2 - y1) // 10
        xs, ys = max(0, x1 - mx), max(0, y1 - my)
        xe, ye = min(W, x2 + mx), min(H, y2 + my)
        mask = np.zeros((ye - ys, xe - xs, 3), np.uint8)
        cv2.ellipse(mask, ((xe - xs) // 2, (ye - ys) // 2),
                    ((x2 - x1) // 2, (y2 - y1) // 2), 0, 0, 360,
                    (255, 255, 255), -1)
        mask = cv2.GaussianBlur(mask, (31, 31), 0)
        cv2.imwrite(os.path.join(mask_dir, f"{i}.png"), mask)
        mask_coords.append((xs, ys, xe, ye))
    with open(os.path.join(avatar_dir, "mask_coords.pkl"), "wb") as f:
        pickle.dump(mask_coords, f)
    return avatar_dir


def ensure_demo_avatar(data_dir: str, avatar_id: str) -> str:
    """Create the avatar directory if it doesn't exist; returns its path."""
    path = os.path.join(data_dir, "avatars", avatar_id)
    if not os.path.exists(os.path.join(path, "coords.pkl")):
        make_synthetic_avatar(path)
    return path
