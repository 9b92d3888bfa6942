"""Wav2Lip avatar plugin (model family "wav2lip").

Module contract per reference app.py:128-151: exports ``load_model`` /
``load_avatar`` / ``warm_up`` plus a ``BaseAvatar`` subclass registered as
``avatar/wav2lip``. Avatar directory format is byte-compatible with the
reference (reference avatars/wav2lip_avatar.py:72-88):
``data/avatars/<id>/{full_imgs/*.png, face_imgs/*.png, coords.pkl}`` with
coords entries ``(y1, y2, x1, x2)``.

TPU design: the face-crop cycle is uploaded once per avatar as a device-
resident uint8 array; ``inference_batch`` sends only B int32 mirror indices
up and receives B uint8 frames back from the fused jitted step
(models/wav2lip.py ``make_infer_fn``).
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Any, Dict, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.audio_features.mel_features import MelFeatures
from livetalking_tpu.avatars.base_avatar import BaseAvatar
from livetalking_tpu.engine.scheduler import AvatarStore, BatchScheduler
from livetalking_tpu.models import wav2lip as w2l
from livetalking_tpu.registry import register
from livetalking_tpu.utils.image import mirror_indices, read_imgs
from livetalking_tpu.utils.logger import logger

IMG_SIZE = 256

# shared cross-session batching state (one device worker per process,
# engine/scheduler.py) — created lazily when --coalesce sessions appear
import threading as _threading

_shared_lock = _threading.Lock()
_shared: dict = {"store": None, "scheduler": None}


def get_shared_scheduler(model: Dict[str, Any], batch_size: int,
                         buckets=(1, 2, 4, 8),
                         coalesce_window_s: float = 0.0,
                         paste_spec: Dict[str, int] = None,
                         d2h_subsample: int = 1) -> tuple:
    """Lazily create the process-wide (AvatarStore, BatchScheduler) pair.

    ``paste_spec`` ({"S","H","W","Ho","Wo"}, from the FIRST session's
    avatar geometry) composes the device rect paste-back
    (reference avatars/wav2lip_avatar.py:141-147 semantics, fused via
    ops/pallas_blend.make_resize_paste_fn) into the super-batch step —
    the coalesced path then returns finished FULL frames, like the
    musetalk wiring."""
    from livetalking_tpu.engine.scheduler import SchedulerConfigError

    with _shared_lock:
        cfg = {"batch_size": batch_size, "buckets": tuple(buckets),
               "coalesce_window_s": float(coalesce_window_s),
               "paste": (None if paste_spec is None
                         else (paste_spec["H"], paste_spec["W"])),
               "d2h_subsample": int(d2h_subsample)}
        if _shared["scheduler"] is None:
            store = AvatarStore(IMG_SIZE)
            paste_fn = None
            if paste_spec is not None:
                from livetalking_tpu.ops.pallas_blend import (
                    make_resize_paste_fn,
                )

                paste_fn = make_resize_paste_fn(
                    paste_spec["S"], paste_spec["Ho"], paste_spec["Wo"],
                    paste_spec["H"], paste_spec["W"])
                _shared["paste_geom"] = dict(paste_spec)

            def step_factory(n):
                step = w2l.make_infer_fn(n, IMG_SIZE, model["dtype"])
                if paste_fn is None:
                    return step

                def wrapped(params, buffer, idxs, mel):
                    pred = step(params, buffer, idxs, mel)
                    aux = store.aux  # re-read: grows as avatars register
                    out = paste_fn(pred, aux["pb_frames"], idxs,
                                   aux["pb_boxes"])
                    if d2h_subsample > 1:  # dev/bench tunnel workaround
                        out = out[:, ::d2h_subsample, ::d2h_subsample]
                    return out
                return wrapped

            sched = BatchScheduler(
                model["params"], store, step_factory,
                batch_size, buckets=buckets,
                coalesce_window_s=coalesce_window_s,
            )
            sched.start()
            _shared["store"] = store
            _shared["scheduler"] = sched
            _shared["config"] = cfg
        elif _shared.get("config") != cfg:
            # reject conflicting per-session flags instead of silently
            # batching with the first session's configuration
            raise SchedulerConfigError(
                f"coalesce: shared scheduler already running with "
                f"{_shared.get('config')}; conflicting session config {cfg} "
                "rejected (per-session scheduler overrides are not allowed "
                "under --coalesce)")
        return _shared["store"], _shared["scheduler"]


def reset_shared_scheduler() -> None:
    """Stop and drop the process-wide scheduler (tests / reconfiguration)."""
    with _shared_lock:
        if _shared["scheduler"] is not None:
            _shared["scheduler"].stop()
        _shared["scheduler"] = None
        _shared["store"] = None
        _shared.pop("config", None)
        _shared.pop("paste_geom", None)


def load_model(path: str, opt=None) -> Dict[str, Any]:
    """Load wav2lip weights. Accepts the reference ``wav2lip.pth`` torch
    checkpoint; falls back to random init when no file exists (demo/bench
    mode — same graph, same speed, untrained output)."""
    dtype = jnp.bfloat16 if getattr(opt, "dtype", "bfloat16") == "bfloat16" else jnp.float32
    if path and os.path.exists(path):
        logger.info("Load checkpoint from: %s", path)
        params = w2l.load_torch_checkpoint(path, dtype)
    else:
        logger.warning("wav2lip checkpoint %s not found - using random init", path)
        from livetalking_tpu.utils.jaxinit import jit_init

        params = jit_init(w2l.init_params, jax.random.PRNGKey(0), dtype)
    return {"params": params, "dtype": dtype}


def load_avatar(avatar_id: str, data_dir: str = "./data") -> Dict[str, Any]:
    """Load a reference-format avatar directory onto host + device."""
    avatar_path = os.path.join(data_dir, "avatars", avatar_id)
    with open(os.path.join(avatar_path, "coords.pkl"), "rb") as f:
        coord_list_cycle = pickle.load(f)

    def _sorted_imgs(sub: str):
        paths = glob.glob(os.path.join(avatar_path, sub, "*.[jpJP][pnPN]*[gG]"))
        return sorted(paths, key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))

    frame_list_cycle = read_imgs(_sorted_imgs("full_imgs"))
    face_list_cycle = read_imgs(_sorted_imgs("face_imgs"))

    faces = np.stack(
        [cv2.resize(f, (IMG_SIZE, IMG_SIZE)) if f.shape[:2] != (IMG_SIZE, IMG_SIZE) else f
         for f in face_list_cycle]
    ).astype(np.uint8)
    return {
        "avatar_id": avatar_id,
        "frame_list_cycle": frame_list_cycle,
        "coord_list_cycle": coord_list_cycle,
        "face_cycle_host": faces,  # for the shared AvatarStore (coalesce mode)
        "face_cycle_device": jnp.asarray(faces),  # (N, 256, 256, 3) resident in HBM
    }


def warm_up(batch_size: int, model: Dict[str, Any], modelres: int = IMG_SIZE) -> None:
    """Compile + execute the fused step once (doubles as a graph smoke test,
    reference avatars/wav2lip_avatar.py:90-96)."""
    logger.info("warmup wav2lip model...")
    step = w2l.make_infer_fn(batch_size, modelres, model["dtype"])
    cycle = jnp.zeros((1, modelres, modelres, 3), jnp.uint8)
    idxs = jnp.zeros((batch_size,), jnp.int32)
    mel = jnp.zeros((batch_size, 80, 16), jnp.float32)
    step(model["params"], cycle, idxs, mel).block_until_ready()


@register("avatar", "wav2lip")
class LipReal(BaseAvatar):
    def __init__(self, opt, model: Dict[str, Any], avatar: Dict[str, Any]):
        super().__init__(opt)
        self.model = model
        self.frame_list_cycle = avatar["frame_list_cycle"]
        self.coord_list_cycle = avatar["coord_list_cycle"]
        self.face_cycle_device = avatar["face_cycle_device"]
        self._n_faces = int(self.face_cycle_device.shape[0])

        self._scheduler = None
        self._store_offset = 0
        self._scheduler_composes = False
        if getattr(opt, "coalesce", False):
            from livetalking_tpu.engine.scheduler import (
                SchedulerConfigError,
                parse_buckets,
                resolve_coalesce_window,
            )

            paste_spec = None
            use_paste = bool(getattr(opt, "device_paste_back", False))
            if use_paste:
                from livetalking_tpu.ops.pallas_blend import bucket_shape

                fh, fw = self.frame_list_cycle[0].shape[:2]
                ho, wo = bucket_shape(self.coord_list_cycle)  # (y1,y2,x1,x2)
                paste_spec = {"S": IMG_SIZE, "H": fh, "W": fw,
                              "Ho": ho, "Wo": wo}
            store, self._scheduler = get_shared_scheduler(
                model, self.batch_size, buckets=parse_buckets(opt),
                coalesce_window_s=resolve_coalesce_window(
                    opt, self.batch_size),
                paste_spec=paste_spec,
                d2h_subsample=int(getattr(opt, "d2h_subsample", 1)))
            aux = None
            if use_paste:
                # validate against the SHARED bucket/frame geometry fixed
                # by the first session BEFORE store.add (no remove API)
                geom = _shared["paste_geom"]
                fh, fw = self.frame_list_cycle[0].shape[:2]
                if (fh, fw) != (geom["H"], geom["W"]):
                    raise SchedulerConfigError(
                        f"coalesce+device_paste_back: avatar frame "
                        f"{fw}x{fh} != shared {geom['W']}x{geom['H']}")
                for i, (y1, y2, x1, x2) in enumerate(self.coord_list_cycle):
                    if y2 - y1 > geom["Ho"] or x2 - x1 > geom["Wo"]:
                        raise SchedulerConfigError(
                            f"coalesce+device_paste_back: face box "
                            f"{x2 - x1}x{y2 - y1} (frame {i}) exceeds the "
                            f"shared bucket {geom['Wo']}x{geom['Ho']}")
                aux = {
                    "pb_frames": np.stack(self.frame_list_cycle).astype(np.uint8),
                    "pb_boxes": np.asarray(self.coord_list_cycle, np.int32),
                }
                self._scheduler_composes = True
            self._store_offset, _ = store.add(
                avatar["avatar_id"], avatar["face_cycle_host"], aux=aux)
        else:
            self._step = w2l.make_infer_fn(self.batch_size, IMG_SIZE, model["dtype"])

        # on-device composite: resize+blend+paste fused on TPU so only
        # finished full frames cross to the host (ops/pallas_blend.py)
        self._device_paste = None
        if getattr(opt, "device_paste_back", False) and self._scheduler is None:
            from livetalking_tpu.ops.pallas_blend import DevicePasteBack

            dp = DevicePasteBack(
                np.stack(self.frame_list_cycle), self.coord_list_cycle, IMG_SIZE
            )
            if dp.available:
                self._device_paste = dp
            else:
                logger.warning(
                    "device_paste_back: bbox bucket exceeds frame - host path")

        self.asr = MelFeatures(opt, self)
        self.asr.warm_up()

        # production prewarm: background-compile every bucket program now
        # that this avatar's cycle (and paste aux) is registered — same
        # policy as the musetalk wiring; (80, 16) is the per-frame mel
        # window shape the scheduler step takes
        if (self._scheduler is not None
                and int(getattr(opt, "scheduler_prewarm", 1))):
            self._scheduler.prewarm_async((80, 16))

    def submit_batch(self, index: int, audiofeat_batch):
        """Pipelined submission into the shared scheduler (see
        musetalk_avatar.submit_batch); sync fallback when not coalesced."""
        if self._scheduler is None:
            return self.inference_batch(index, audiofeat_batch)
        idxs = mirror_indices(self._n_faces, index, self.batch_size)
        return self._scheduler.submit(idxs + self._store_offset,
                                      audiofeat_batch)

    def resolve_batch(self, handle) -> np.ndarray:
        if isinstance(handle, np.ndarray):
            return handle
        return self._scheduler.wait(handle)

    def inference_batch(self, index: int, audiofeat_batch) -> np.ndarray:
        idxs = mirror_indices(self._n_faces, index, self.batch_size)
        if self._scheduler is not None:
            # cross-session batching: one shared device worker per process
            return self._scheduler.infer(idxs + self._store_offset, audiofeat_batch)
        pred = self._step(
            self.model["params"], self.face_cycle_device, jnp.asarray(idxs), audiofeat_batch
        )
        if self._device_paste is not None:
            # crop stays on device through resize/blend/paste; this D2H copy
            # is finished (B, H, W, 3) frames
            return self._device_paste.paste_batch(pred, idxs)
        return np.asarray(pred)  # (B, 256, 256, 3) uint8

    def paste_back_frame(self, pred_frame: np.ndarray, idx: int) -> np.ndarray:
        if self._device_paste is not None or self._scheduler_composes:
            return pred_frame  # already a full frame (engine normalizes layout)
        y1, y2, x1, x2 = self.coord_list_cycle[idx]
        frame = self.frame_list_cycle[idx].copy()
        frame[y1:y2, x1:x2] = cv2.resize(pred_frame, (x2 - x1, y2 - y1))
        return frame
