"""Training-data pipeline: avatar-directory sampling + whole-utterance
feature windowing.

Fills the role of the reference's ``PortraitDataset``
(imported at reference avatars/musetalk/utils/training_utils.py:18 and
``initialize_dataloaders``:144-200; the dataset module itself is absent
from the snapshot): sample (target frame, reference frame, aligned audio
window) triples from an avatar directory produced by the genavatar
pipelines (genavatar/pipeline.py dir formats) plus a 16 kHz utterance.

Offline windowing mirrors the runtime extractors exactly — same
clamp-to-edge slicer (audio_features/base.py ``clamp_window_indices``),
same per-family windows (mel 16-wide at 80/fps; whisper [0,5] x2;
hubert [4,4] x2) — so a net trained here sees the identical feature
distribution the streaming pipeline feeds at serve time.

All feature functions are whole-utterance jitted device programs (one
dispatch per clip, not per frame); batch assembly is host-side numpy.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Any, Dict, Iterator, Optional

import numpy as np

from livetalking_tpu.audio_features.base import clamp_window_indices

FPS = 25
SR = 16000


def n_video_frames(n_samples: int, fps: int = FPS) -> int:
    return int(n_samples / SR * fps)


# ---------------------------------------------------------------------------
# whole-utterance feature windows (one row per video frame)
# ---------------------------------------------------------------------------

def mel_windows(audio: np.ndarray, fps: int = FPS) -> np.ndarray:
    """(n_samples,) float32 -> (F, 80, 16) mel windows, the wav2lip
    training alignment: window i starts at mel column int(i * 80/fps)
    (floor — the same truncation as the serving slicer ops/mel.py and the
    reference avatars/audio_features/mel.py ``int(left + i *
    mel_idx_multiplier)``, so training sees the identical feature
    distribution the streaming pipeline feeds at serve time)."""
    import jax.numpy as jnp

    from livetalking_tpu.ops import mel as melops

    F = n_video_frames(audio.shape[0], fps)
    m = np.asarray(melops.melspectrogram(jnp.asarray(audio)))  # (80, T)
    T = m.shape[1]
    mult = 80.0 / fps
    starts = np.minimum((np.arange(F) * mult).astype(np.int32),
                        max(T - 16, 0))
    return np.stack([m[:, s : s + 16] for s in starts]).astype(np.float32)


def sync_mel_windows(audio: np.ndarray, clip_starts: np.ndarray,
                     fps: int = FPS) -> np.ndarray:
    """(n,) clip start frame indices -> (n, 80, 16, 1) mel windows for the
    sync expert (one window per T-frame clip, at the clip's start)."""
    wins = mel_windows(audio, fps)
    return wins[np.asarray(clip_starts, np.int64)][..., None]


def sync_mel16_windows(audio: np.ndarray, clip_starts: np.ndarray,
                       fps: int = FPS, width: int = 52) -> np.ndarray:
    """(n,) clip start frame indices -> (n, 80, 52, 1) mel windows for the
    MuseTalk 16-frame sync expert (models/musetalk_syncnet.py: 16 frames
    @25 fps = 0.64 s = ~52 mel columns @80/s)."""
    import jax.numpy as jnp

    from livetalking_tpu.ops import mel as melops

    m = np.asarray(melops.melspectrogram(jnp.asarray(audio)))  # (80, T)
    T = m.shape[1]
    mult = 80.0 / fps
    starts = np.minimum(
        (np.asarray(clip_starts, np.int64) * mult).astype(np.int64),
        max(T - width, 0))
    return np.stack([m[:, s : s + width] for s in starts]).astype(
        np.float32)[..., None]


def whisper_windows(audio: np.ndarray, whisper_params, whisper_cfg=None,
                    fps: int = FPS) -> np.ndarray:
    """-> (F, 50, 384) U-Net cross-attention windows: whisper-tiny stacked
    hidden states at 50 Hz, window [0,5], multiplier 2 (the runtime
    audio_features/whisper_features.py gather, whole-utterance). Clips
    longer than whisper's 30 s window are truncated."""
    import jax
    import jax.numpy as jnp

    from livetalking_tpu.models import whisper_encoder as we
    from livetalking_tpu.ops.whisper_mel import log_mel_spectrogram

    cfg = whisper_cfg or we.TINY
    F = min(n_video_frames(audio.shape[0], fps), cfg.max_positions // 2)
    rows = clamp_window_indices(F, cfg.max_positions, (0, 5), start=0,
                                multiplier=2.0)  # (F, 10)

    # params enter as a jit ARG — closed-over arrays would be inlined as
    # HLO constants, bloating the compile request by the full weight size
    @jax.jit
    def run(params, wav):
        mel = log_mel_spectrogram(wav)[None]
        states = we.apply_stacked(params, cfg, mel)[0]  # (1500, L+1, D)
        g = jnp.take(states, jnp.asarray(rows).reshape(-1), axis=0)
        return g.reshape(F, -1, cfg.d_model).astype(jnp.float32)

    return np.asarray(run(whisper_params, jnp.asarray(audio)))


def hubert_windows(audio: np.ndarray, hubert_params, hubert_cfg=None,
                   fps: int = FPS) -> np.ndarray:
    """-> (F, 32, 32, 16) HuBERT window planes (NHWC: the trainer/apply
    layout; the runtime gather in audio_features/hubert_features.py)."""
    import jax
    import jax.numpy as jnp

    from livetalking_tpu.models import hubert as hub

    cfg = hubert_cfg or hub.LARGE
    F = n_video_frames(audio.shape[0], fps)
    feat_len = cfg.out_length(audio.shape[0])
    rows = clamp_window_indices(F, feat_len, (4, 4), start=0, multiplier=2.0)
    plane = int(np.sqrt(cfg.hidden_size))

    # params as a jit ARG (see whisper_windows: closures inline weights
    # as HLO constants)
    @jax.jit
    def run(params, wav):
        h = hub.apply(params, cfg, wav[None, :])[0]  # (feat_len, H)
        g = jnp.take(h, jnp.asarray(rows).reshape(-1), axis=0)
        g = g.reshape(F, rows.shape[1], plane, plane)
        return jnp.transpose(g, (0, 2, 3, 1)).astype(jnp.float32)

    return np.asarray(run(hubert_params, jnp.asarray(audio)))


# ---------------------------------------------------------------------------
# avatar-directory frame loading (genavatar/pipeline.py formats)
# ---------------------------------------------------------------------------

def _read_dir(dirpath: str) -> np.ndarray:
    import cv2

    paths = sorted(glob.glob(os.path.join(dirpath, "*.png")),
                   key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
    if not paths:
        raise FileNotFoundError(f"no frames under {dirpath}")
    return np.stack([cv2.imread(p) for p in paths])


def load_faces(avatar_dir: str, family: str) -> np.ndarray:
    """(N, S, S, 3) uint8 BGR face crops for training.

    wav2lip: ``face_imgs/`` as-is (256 px). ultralight: ``face_imgs/``
    (168 px) center-cropped to 160 (reference ultralight_avatar.py:146
    ``[4:164, 4:164]``). musetalk: ``full_imgs/`` cropped by ``coords.pkl``
    and resized to 256 (the VAE input crop, reference genavatar flow).
    """
    import cv2

    if family == "wav2lip":
        return _read_dir(os.path.join(avatar_dir, "face_imgs"))
    if family == "ultralight":
        faces = _read_dir(os.path.join(avatar_dir, "face_imgs"))
        return faces[:, 4:164, 4:164]
    if family == "musetalk":
        frames = _read_dir(os.path.join(avatar_dir, "full_imgs"))
        with open(os.path.join(avatar_dir, "coords.pkl"), "rb") as f:
            boxes = pickle.load(f)
        crops = []
        for img, (x1, y1, x2, y2) in zip(frames, boxes):
            crops.append(cv2.resize(img[y1:y2, x1:x2], (256, 256),
                                    interpolation=cv2.INTER_LANCZOS4))
        return np.stack(crops)
    raise ValueError(f"unknown family {family!r}")


# ---------------------------------------------------------------------------
# batch assembly
# ---------------------------------------------------------------------------

def _mask_wav2lip(face01: np.ndarray) -> np.ndarray:
    m = face01.copy()
    m[:, face01.shape[1] // 2:] = 0.0
    return m


def _mask_ultralight(face01: np.ndarray) -> np.ndarray:
    """Interior-rectangle mask (reference ultralight_avatar.py:150-152:
    rows/cols [5, 150/145) of the 160 px crop blacked out)."""
    m = face01.copy()
    m[:, 5:150, 5:145] = 0.0
    return m


def make_batch(family: str, faces: np.ndarray, feats: np.ndarray,
               idx: np.ndarray, rng: np.random.RandomState,
               audio: Optional[np.ndarray] = None,
               fps: int = FPS, clip_len: int = 5) -> Dict[str, np.ndarray]:
    """Assemble one training batch for ``idx`` (frame indices).

    faces: (N, S, S, 3) uint8 BGR (load_faces); feats: per-frame feature
    rows aligned to the clip's frames (mel_windows / whisper_windows /
    hubert_windows output). Reference frames are sampled uniformly away
    from the target (the PortraitDataset ref-frame convention).
    """
    idx = np.asarray(idx, np.int64)
    N = faces.shape[0]
    ref_idx = (idx + rng.randint(1, max(N, 2), size=idx.shape)) % max(N, 1)
    tgt = faces[idx].astype(np.float32)
    ref = faces[ref_idx].astype(np.float32)
    f = feats[np.minimum(idx, feats.shape[0] - 1)]

    if family == "wav2lip":
        t01, r01 = tgt / 255.0, ref / 255.0
        batch = {
            "mel": f[..., None].astype(np.float32),        # (B, 80, 16, 1)
            "face": np.concatenate([_mask_wav2lip(t01), r01], axis=-1),
            "target": t01,
        }
    elif family == "musetalk":
        rgb_t = tgt[..., ::-1] / 127.5 - 1.0
        rgb_r = ref[..., ::-1] / 127.5 - 1.0
        batch = {"gt": rgb_t, "ref": rgb_r, "audio": f}
    elif family == "ultralight":
        # (real, masked) channel order per the inference contract
        # (reference ultralight_avatar.py:153 cat(real, masked)); the
        # "real" slot gets an off-time frame at train time so the GT
        # mouth can't leak through the unmasked channels.
        t01, r01 = tgt / 255.0, ref / 255.0
        batch = {
            "face": np.concatenate([r01, _mask_ultralight(t01)], axis=-1),
            "audio": f,
            "target": t01,
        }
    else:
        raise ValueError(f"unknown family {family!r}")

    if audio is not None:  # sync-expert recipes: one mel window per clip
        starts = idx.reshape(-1, clip_len)[:, 0]
        if clip_len == 16:  # MuseTalk's dedicated 16-frame expert
            batch["sync_mel16"] = sync_mel16_windows(audio, starts, fps)
        else:
            batch["sync_mel"] = sync_mel_windows(audio, starts, fps)
    return {k: np.ascontiguousarray(v) for k, v in batch.items()}


def clip_batches(family: str, faces: np.ndarray, feats: np.ndarray,
                 batch_size: int, rng: np.random.RandomState,
                 clip_len: int = 1, audio: Optional[np.ndarray] = None,
                 fps: int = FPS) -> Iterator[Dict[str, np.ndarray]]:
    """Endless batch generator. ``clip_len > 1`` samples consecutive-frame
    clips (batch_size must be a multiple of clip_len — the sync/GAN
    recipes need temporal structure), else i.i.d. frames."""
    n_usable = min(faces.shape[0], feats.shape[0])
    if n_usable < clip_len:
        raise ValueError(f"need >= {clip_len} aligned frames, have {n_usable}")
    if clip_len > 1 and batch_size % clip_len:
        raise ValueError(
            f"batch_size ({batch_size}) must be a multiple of clip_len "
            f"({clip_len}) — the sync/GAN recipes sample whole "
            f"{clip_len}-frame clips; use e.g. --batch_size "
            f"{((batch_size + clip_len - 1) // clip_len) * clip_len}")
    while True:
        if clip_len > 1:
            starts = rng.randint(0, n_usable - clip_len + 1,
                                 size=batch_size // clip_len)
            idx = (starts[:, None] + np.arange(clip_len)[None]).reshape(-1)
        else:
            idx = rng.randint(0, n_usable, size=batch_size)
        yield make_batch(family, faces, feats, idx, rng, audio=audio,
                         fps=fps, clip_len=clip_len)
