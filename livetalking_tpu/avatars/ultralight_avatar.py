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
        self._step = ul.make_infer_fn(self.batch_size, model["dtype"])

        self.asr = HubertFeatures(
            opt, self,
            hubert_params=model["hubert_params"], hubert_cfg=model["hubert_cfg"],
            audio_feat_length=(4, 4),
        )
        self.asr.warm_up()

    def inference_batch(self, index: int, audiofeat_batch) -> np.ndarray:
        idxs = jnp.asarray(mirror_indices(self._n_faces, index, self.batch_size))
        pred = self._step(self.unet_params, self.crop_cycle_device, idxs, audiofeat_batch)
        return np.asarray(pred)  # (B, 160, 160, 3) uint8

    def paste_back_frame(self, pred_frame: np.ndarray, idx: int) -> np.ndarray:
        x1, y1, x2, y2 = self.coord_list_cycle[idx]
        frame = self.frame_list_cycle[idx].copy()
        crop = self.face_list_cycle[idx].copy()
        crop[4 : 4 + 160, 4 : 4 + 160] = pred_frame
        frame[y1:y2, x1:x2] = cv2.resize(crop, (x2 - x1, y2 - y1))
        return frame
