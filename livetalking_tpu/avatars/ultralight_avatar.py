"""Ultralight avatar plugin (model family "ultralight").

Contract per reference avatars/ultralight_avatar.py: the shared model is
only the HuBERT audio front-end; the U-Net weights are PER-AVATAR
(``data/avatars/<id>/ultralight.pth``). Avatar dir format:
``{full_imgs/, face_imgs/ (168 px crops), coords.pkl (x1, y1, x2, y2)}``
— note the coordinate order differs from wav2lip's (y1, y2, x1, x2).

The fused device step (models/ultralight.py ``make_infer_fn``) handles the
interior crop/mask prep; paste-back writes the 160 px prediction into the
168 px crop then resizes into the bbox (reference
ultralight_avatar.py:173-184).
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Any, Dict

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.audio_features.hubert_features import HubertFeatures
from livetalking_tpu.avatars.base_avatar import BaseAvatar
from livetalking_tpu.models import hubert as hub
from livetalking_tpu.models import ultralight as ul
from livetalking_tpu.registry import register
from livetalking_tpu.utils.image import mirror_indices, read_imgs
from livetalking_tpu.utils.logger import logger

CROP_SIZE = 168  # face_imgs are 168 px; the net sees the 160 px interior

# shared cross-session batching state (one device worker per process).
# Ultralight's twist vs the wav2lip/musetalk wiring: the U-Net weights are
# PER-AVATAR (reference avatars/ultralight_avatar.py:58-81), so the shared
# step stacks every registered avatar's parameter tree on a leading axis
# and each session-block selects its slot by id (models/ultralight.py
# make_grouped_infer_fn). The per-item "ul_slot" aux plane maps any global
# frame index to its avatar's weight slot.
import threading as _threading

_shared_lock = _threading.Lock()
_shared: dict = {"store": None, "scheduler": None, "stacked": None,
                 "slots": {}}


def get_shared_scheduler(model: Dict[str, Any], batch_size: int,
                         buckets=(1, 2, 4, 8),
                         coalesce_window_s: float = 0.0,
                         paste_spec: Dict[str, int] = None,
                         d2h_subsample: int = 1) -> tuple:
    """Lazily create the process-wide (AvatarStore, BatchScheduler) pair
    for the ultralight family. Must be called with ``_shared_lock`` NOT
    held. ``paste_spec`` ({"H","W","Ho","Wo"}) composes the device
    paste-back into the super-batch: the 160 px prediction is written
    into the 168 px crop in-graph, then resize+paste
    (ops/pallas_blend.make_resize_paste_fn) yields finished full frames."""
    from livetalking_tpu.engine.scheduler import (
        AvatarStore,
        BatchScheduler,
        SchedulerConfigError,
    )

    with _shared_lock:
        cfg = {"batch_size": batch_size, "buckets": tuple(buckets),
               "coalesce_window_s": float(coalesce_window_s),
               "paste": (None if paste_spec is None
                         else (paste_spec["H"], paste_spec["W"])),
               "d2h_subsample": int(d2h_subsample)}
        if _shared["scheduler"] is None:
            store = AvatarStore(item_shape=(CROP_SIZE, CROP_SIZE, 3),
                                dtype=np.uint8)
            paste_fn = None
            if paste_spec is not None:
                from livetalking_tpu.ops.pallas_blend import (
                    make_resize_paste_fn,
                )

                paste_fn = make_resize_paste_fn(
                    CROP_SIZE, paste_spec["Ho"], paste_spec["Wo"],
                    paste_spec["H"], paste_spec["W"])
                _shared["paste_geom"] = dict(paste_spec)

            def step_factory(total):
                n = total // batch_size
                grouped = ul.make_grouped_infer_fn(n, batch_size,
                                                   model["dtype"])

                def wrapped(_params, buffer, idxs, audio):
                    # re-read per call: both grow as avatars register
                    # (stacked is appended BEFORE store.add, so any index
                    # visible through `idxs` has a valid slot)
                    stacked = _shared["stacked"]
                    aux = store.aux
                    slots = jnp.take(aux["ul_slot"], idxs)
                    slots = slots.reshape(n, batch_size)[:, 0]
                    pred = grouped(stacked, buffer, idxs, slots, audio)
                    if paste_fn is None:
                        return pred
                    crops = jnp.take(buffer, idxs, axis=0)
                    crops = crops.at[:, 4 : 4 + 160, 4 : 4 + 160, :].set(pred)
                    out = paste_fn(crops, aux["pb_frames"], idxs,
                                   aux["pb_boxes"])
                    if d2h_subsample > 1:  # dev/bench tunnel workaround
                        out = out[:, ::d2h_subsample, ::d2h_subsample]
                    return out
                return wrapped

            sched = BatchScheduler(
                None, store, step_factory, batch_size, buckets=buckets,
                coalesce_window_s=coalesce_window_s)
            sched.start()
            _shared["store"] = store
            _shared["scheduler"] = sched
            _shared["config"] = cfg
        elif _shared.get("config") != cfg:
            raise SchedulerConfigError(
                f"coalesce: shared ultralight scheduler already running "
                f"with {_shared.get('config')}; conflicting session config "
                f"{cfg} rejected")
        return _shared["store"], _shared["scheduler"]


def register_session_avatar(avatar: Dict[str, Any],
                            aux_extra: Dict[str, np.ndarray] = None) -> tuple:
    """Register one avatar's crops + per-avatar U-Net weights with the
    shared store: appends the weight tree to the stacked pytree FIRST
    (append-only, so already-registered indices never see a missing
    slot), then packs the cycle with its "ul_slot" plane.

    Returns (store_offset, slot)."""
    store = _shared["store"]
    with _shared_lock:
        aid = avatar["avatar_id"]
        if aid in _shared["slots"]:
            slot = _shared["slots"][aid]
            return store.lookup(aid)[0], slot
        slot = len(_shared["slots"])
        if _shared["stacked"] is None:
            _shared["stacked"] = ul.stack_params([avatar["unet_params"]])
        else:
            _shared["stacked"] = ul.append_stacked(
                _shared["stacked"], avatar["unet_params"])
        _shared["slots"][aid] = slot
    crops = avatar["crop_cycle_host"]
    aux = {"ul_slot": np.full((crops.shape[0],), slot, np.int32)}
    aux.update(aux_extra or {})
    offset, _ = store.add(aid, crops, aux=aux)
    return offset, slot


def reset_shared_scheduler() -> None:
    """Stop and drop the process-wide scheduler (tests / reconfiguration)."""
    with _shared_lock:
        if _shared["scheduler"] is not None:
            _shared["scheduler"].stop()
        _shared["scheduler"] = None
        _shared["store"] = None
        _shared["stacked"] = None
        _shared["slots"] = {}
        _shared.pop("config", None)
        _shared.pop("paste_geom", None)

# small config for environments without the pretrained HuBERT weights
TINY_HUBERT = hub.HubertConfig(
    conv_dim=(64, 64, 64, 64, 64, 64, 64),
    conv_kernel=(10, 3, 3, 3, 3, 2, 2),
    conv_stride=(5, 2, 2, 2, 2, 2, 2),
    hidden_size=1024,  # must stay 1024: features reshape to 32x32 planes
    num_layers=2, num_heads=4, intermediate_size=256,
)


def load_model(opt=None) -> Dict[str, Any]:
    """Load the shared audio front-end (HuBERT). The per-avatar U-Net comes
    from ``load_avatar`` (reference ultralight_avatar.py:58-62)."""
    dtype = jnp.bfloat16 if getattr(opt, "dtype", "bfloat16") == "bfloat16" else jnp.float32
    hdir = os.path.join(getattr(opt, "models_dir", "./models"), "hubert-large-ls960-ft")
    if os.path.isdir(hdir):
        logger.info("loading HuBERT weights from %s", hdir)
        import transformers

        tmodel = transformers.HubertModel.from_pretrained(hdir)
        cfg = hub.LARGE
        params = hub.convert_torch_state_dict(tmodel.state_dict(), cfg, dtype)
    else:
        size = getattr(opt, "hubert_size", "large")
        cfg = TINY_HUBERT if size == "tiny" else hub.LARGE
        logger.warning("HuBERT weights not found at %s - random init (%s)", hdir, size)
        from livetalking_tpu.utils.jaxinit import jit_init

        params = jit_init(hub.init_params, jax.random.PRNGKey(0), cfg, dtype)
    return {"hubert_params": params, "hubert_cfg": cfg, "dtype": dtype}


def load_avatar(avatar_id: str, data_dir: str = "./data") -> Dict[str, Any]:
    avatar_path = os.path.join(data_dir, "avatars", avatar_id)
    with open(os.path.join(avatar_path, "coords.pkl"), "rb") as f:
        coord_list_cycle = pickle.load(f)

    def _sorted_imgs(sub: str):
        paths = glob.glob(os.path.join(avatar_path, sub, "*.[jpJP][pnPN]*[gG]"))
        return sorted(paths, key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))

    frame_list_cycle = read_imgs(_sorted_imgs("full_imgs"))
    face_list_cycle = read_imgs(_sorted_imgs("face_imgs"))
    crops = np.stack([
        cv2.resize(f, (CROP_SIZE, CROP_SIZE)) if f.shape[:2] != (CROP_SIZE, CROP_SIZE) else f
        for f in face_list_cycle
    ]).astype(np.uint8)

    # per-avatar U-Net weights (reference: data/avatars/<id>/ultralight.pth)
    unet_path = os.path.join(avatar_path, "ultralight.pth")
    if os.path.exists(unet_path):
        unet_params = ul.load_torch_checkpoint(unet_path, jnp.bfloat16)
    else:
        logger.warning("%s not found - random U-Net init", unet_path)
        from livetalking_tpu.utils.jaxinit import jit_init

        unet_params = jit_init(ul.init_params, jax.random.PRNGKey(1), jnp.bfloat16)

    return {
        "avatar_id": avatar_id,
        "frame_list_cycle": frame_list_cycle,
        "face_list_cycle": face_list_cycle,
        "coord_list_cycle": coord_list_cycle,
        "crop_cycle_host": crops,
        "crop_cycle_device": jnp.asarray(crops),
        "unet_params": unet_params,
    }


def warm_up(batch_size: int, model: Dict[str, Any], modelres: int = 160) -> None:
    logger.info("warmup ultralight model...")
    step = ul.make_infer_fn(batch_size, model["dtype"])
    params = ul.init_params(jax.random.PRNGKey(0), model["dtype"])
    cycle = jnp.zeros((1, CROP_SIZE, CROP_SIZE, 3), jnp.uint8)
    idxs = jnp.zeros((batch_size,), jnp.int32)
    audio = jnp.zeros((batch_size, 16, 32, 32), jnp.float32)
    step(params, cycle, idxs, audio).block_until_ready()


@register("avatar", "ultralight")
class LightReal(BaseAvatar):
    def __init__(self, opt, model: Dict[str, Any], avatar: Dict[str, Any]):
        super().__init__(opt)
        self.model = model
        self.frame_list_cycle = avatar["frame_list_cycle"]
        self.face_list_cycle = avatar["face_list_cycle"]
        self.coord_list_cycle = avatar["coord_list_cycle"]
        self.crop_cycle_device = avatar["crop_cycle_device"]
        self.unet_params = avatar["unet_params"]
        self._n_faces = int(self.crop_cycle_device.shape[0])

        # per-avatar weights may need a dtype cast to the session dtype
        if model["dtype"] == jnp.float32:
            self.unet_params = jax.tree.map(
                lambda x: x.astype(jnp.float32), self.unet_params
            )

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
            aux_extra = None
            use_paste = bool(getattr(opt, "device_paste_back", False))
            if use_paste:
                from livetalking_tpu.ops.pallas_blend import bucket_shape

                fh, fw = self.frame_list_cycle[0].shape[:2]
                # ultralight coords are (x1, y1, x2, y2) — convert to the
                # paste op's (y1, y2, x1, x2) order
                boxes = np.asarray(
                    [(y1, y2, x1, x2)
                     for (x1, y1, x2, y2) in self.coord_list_cycle],
                    np.int32)
                ho, wo = bucket_shape([tuple(b) for b in boxes])
                paste_spec = {"H": fh, "W": fw, "Ho": ho, "Wo": wo}
            store, self._scheduler = get_shared_scheduler(
                model, self.batch_size, buckets=parse_buckets(opt),
                coalesce_window_s=resolve_coalesce_window(
                    opt, self.batch_size),
                paste_spec=paste_spec,
                d2h_subsample=int(getattr(opt, "d2h_subsample", 1)))
            if use_paste:
                geom = _shared["paste_geom"]
                fh, fw = self.frame_list_cycle[0].shape[:2]
                if (fh, fw) != (geom["H"], geom["W"]):
                    raise SchedulerConfigError(
                        f"coalesce+device_paste_back: avatar frame "
                        f"{fw}x{fh} != shared {geom['W']}x{geom['H']}")
                for i, (y1, y2, x1, x2) in enumerate(boxes):
                    if y2 - y1 > geom["Ho"] or x2 - x1 > geom["Wo"]:
                        raise SchedulerConfigError(
                            f"coalesce+device_paste_back: face box "
                            f"{x2 - x1}x{y2 - y1} (frame {i}) exceeds the "
                            f"shared bucket {geom['Wo']}x{geom['Ho']}")
                aux_extra = {
                    "pb_frames": np.stack(self.frame_list_cycle).astype(np.uint8),
                    "pb_boxes": boxes,
                }
                self._scheduler_composes = True
            reg_avatar = dict(avatar)
            reg_avatar["unet_params"] = self.unet_params
            self._store_offset, self._slot = register_session_avatar(
                reg_avatar, aux_extra)
        else:
            self._step = ul.make_infer_fn(self.batch_size, model["dtype"])

        self.asr = HubertFeatures(
            opt, self,
            hubert_params=model["hubert_params"], hubert_cfg=model["hubert_cfg"],
            audio_feat_length=(4, 4),
        )
        self.asr.warm_up()

        # production prewarm: compile every bucket now that this avatar's
        # crops/weights are registered; (16, 32, 32) is the per-frame
        # hubert feature shape the scheduler step takes
        if (self._scheduler is not None
                and int(getattr(opt, "scheduler_prewarm", 1))):
            self._scheduler.prewarm_async((16, 32, 32))

    def submit_batch(self, index: int, audiofeat_batch):
        """Pipelined submission into the shared scheduler (see
        wav2lip_avatar.submit_batch); sync fallback when not coalesced."""
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
            return self._scheduler.infer(idxs + self._store_offset,
                                         audiofeat_batch)
        pred = self._step(self.unet_params, self.crop_cycle_device,
                          jnp.asarray(idxs), audiofeat_batch)
        return np.asarray(pred)  # (B, 160, 160, 3) uint8

    def paste_back_frame(self, pred_frame: np.ndarray, idx: int) -> np.ndarray:
        if self._scheduler_composes:
            return pred_frame  # already a full frame (engine normalizes layout)
        x1, y1, x2, y2 = self.coord_list_cycle[idx]
        frame = self.frame_list_cycle[idx].copy()
        crop = self.face_list_cycle[idx].copy()
        crop[4 : 4 + 160, 4 : 4 + 160] = pred_frame
        frame[y1:y2, x1:x2] = cv2.resize(crop, (x2 - x1, y2 - y1))
        return frame
