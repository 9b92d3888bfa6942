"""Face detection for the offline avatar build, with pluggable backends.

The reference vendors S3FD (~1,100 LoC torch, reference
avatars/wav2lip/face_detection/) plus SCRFD/PFLD for ultralight; all need
downloaded weights. Here detection is a strategy interface:

  - ``yunet``: cv2.FaceDetectorYN (ONNX model file required,
    ``--face_model`` / models_dir/face_detection_yunet.onnx);
  - ``haar``: cv2 Haar cascade when the cascade XML ships with cv2;
  - ``center``: geometric fallback (centered square, half the frame) so
    the pipeline always completes — with a warning — on portrait footage;

plus the reference's temporal box smoothing (mean over a window of 5,
reference avatars/wav2lip/genavatar.py:41-48) and pad application.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from livetalking_tpu.utils.logger import logger

Box = Tuple[int, int, int, int]  # (x1, y1, x2, y2)


class FaceDetector:
    """Strategy dispatcher. ``kind`` in {auto, yunet, haar, center}."""

    def __init__(self, kind: str = "auto", model_path: Optional[str] = None):
        self.kind = kind
        self._yunet = None
        self._haar = None

        if kind in ("auto", "yunet") and model_path and os.path.exists(model_path):
            self._yunet = cv2.FaceDetectorYN.create(model_path, "", (320, 320))
            self.kind = "yunet"
        elif kind in ("auto", "haar"):
            xml = os.path.join(cv2.data.haarcascades, "haarcascade_frontalface_default.xml")
            if os.path.exists(xml):
                self._haar = cv2.CascadeClassifier(xml)
                self.kind = "haar"
            elif kind == "auto":
                self.kind = "center"
        if self.kind == "center":
            logger.warning(
                "face detection falling back to geometric center boxes - "
                "provide a YuNet ONNX model for real detection"
            )

    def detect(self, frame_bgr: np.ndarray) -> Optional[Box]:
        H, W = frame_bgr.shape[:2]
        if self._yunet is not None:
            self._yunet.setInputSize((W, H))
            _, faces = self._yunet.detect(frame_bgr)
            if faces is not None and len(faces):
                x, y, w, h = faces[0][:4].astype(int)
                return (max(0, x), max(0, y), min(W, x + w), min(H, y + h))
            return None
        if self._haar is not None:
            gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
            faces = self._haar.detectMultiScale(gray, 1.1, 4)
            if len(faces):
                x, y, w, h = max(faces, key=lambda f: f[2] * f[3])
                return (x, y, x + w, y + h)
            return None
        # geometric fallback
        s = min(H, W) // 2
        return ((W - s) // 2, (H - s) // 2, (W + s) // 2, (H + s) // 2)


def smooth_boxes(boxes: Sequence[Box], window: int = 5) -> List[Box]:
    """Temporal mean smoothing over a sliding window (reference
    avatars/wav2lip/genavatar.py:41-48)."""
    arr = np.asarray(boxes, np.float64)
    out = []
    for i in range(len(arr)):
        lo = max(0, i - window // 2)
        hi = min(len(arr), lo + window)
        out.append(tuple(int(round(v)) for v in arr[lo:hi].mean(axis=0)))
    return out


def apply_pads(box: Box, frame_hw: Tuple[int, int],
               pads: Tuple[int, int, int, int] = (0, 10, 0, 0)) -> Box:
    """Expand a box by (pad_top, pad_bottom, pad_left, pad_right) clamped
    to the frame (reference avatars/wav2lip/genavatar.py:112-118)."""
    H, W = frame_hw
    x1, y1, x2, y2 = box
    top, bottom, left, right = pads
    return (max(0, x1 - left), max(0, y1 - top),
            min(W, x2 + right), min(H, y2 + bottom))


def detect_track(frames: Sequence[np.ndarray], detector: FaceDetector,
                 pads=(0, 10, 0, 0), smooth_window: int = 5) -> List[Box]:
    """Per-frame boxes with hold-last-box on misses, smoothing, and pads."""
    boxes: List[Box] = []
    last: Optional[Box] = None
    for frame in frames:
        box = detector.detect(frame) or last
        if box is None:
            raise ValueError("no face detected in the first frame")
        boxes.append(box)
        last = box
    boxes = smooth_boxes(boxes, smooth_window)
    return [apply_pads(b, frames[0].shape[:2], pads) for b in boxes]
