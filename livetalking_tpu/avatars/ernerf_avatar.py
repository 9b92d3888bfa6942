"""ER-NeRF avatar plugin (model family "ernerf").

The reference README lists ernerf among its model families but the
snapshot ships no code for it, so this plugin follows the same module
contract as the other families (reference app.py:128-151):
``load_model`` / ``load_avatar`` / ``warm_up`` plus a ``BaseAvatar``
subclass registered as ``avatar/ernerf``.

Design (models/ernerf.py): an audio-conditioned triplane NeRF renders
the head crop per frame — fully TPU-native volume rendering with static
shapes — composited over the avatar frame's own bbox crop, then pasted
back like the other families. The shared model is the HuBERT audio
front-end (as in ultralight); the NeRF weights are PER-AVATAR
(``data/avatars/<id>/ernerf.npz``), mirroring how ultralight stores
per-avatar U-Net weights.
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
from livetalking_tpu.avatars.ultralight_avatar import TINY_HUBERT
from livetalking_tpu.models import ernerf
from livetalking_tpu.models import hubert as hub
from livetalking_tpu.registry import register
from livetalking_tpu.utils.image import mirror_indices, read_imgs
from livetalking_tpu.utils.logger import logger

AUDIO_DIM = 16 * 32 * 32  # flattened HuBERT window, as ultralight shapes it


def _render_opts(opt) -> Dict[str, int]:
    return {
        "size": int(getattr(opt, "ernerf_size", 128) or 128),
        "n_samples": int(getattr(opt, "ernerf_samples", 32) or 32),
    }


def load_model(opt=None) -> Dict[str, Any]:
    """Shared audio front-end only; NeRF weights live with the avatar."""
    dtype = jnp.bfloat16 if getattr(opt, "dtype", "bfloat16") == "bfloat16" else jnp.float32
    hdir = os.path.join(getattr(opt, "models_dir", "./models"), "hubert-large-ls960-ft")
    if os.path.isdir(hdir):
        import transformers

        logger.info("loading HuBERT weights from %s", hdir)
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
    """Avatar dir: ``{full_imgs/, coords.pkl (y1,y2,x1,x2), ernerf.npz}``.

    ``ernerf.npz`` holds the per-avatar trained field (flat key->array);
    missing file falls back to random init (demo/bench mode).
    """
    avatar_path = os.path.join(data_dir, "avatars", avatar_id)
    with open(os.path.join(avatar_path, "coords.pkl"), "rb") as f:
        coord_list_cycle = pickle.load(f)

    paths = glob.glob(os.path.join(avatar_path, "full_imgs", "*.[jpJP][pnPN]*[gG]"))
    paths = sorted(paths, key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
    frame_list_cycle = read_imgs(paths)

    nerf_path = os.path.join(avatar_path, "ernerf.npz")
    nerf_params = None
    if os.path.exists(nerf_path):
        loaded = np.load(nerf_path)
        nerf_params = unflatten_params({k: loaded[k] for k in loaded.files})
        logger.info("loaded ernerf field from %s", nerf_path)

    return {
        "avatar_id": avatar_id,
        "frame_list_cycle": frame_list_cycle,
        "coord_list_cycle": coord_list_cycle,
        "nerf_params": nerf_params,
    }


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, key + "."))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        node = tree
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_avatar_field(params, avatar_path: str) -> str:
    path = os.path.join(avatar_path, "ernerf.npz")
    np.savez(path, **flatten_params(params))
    return path


def warm_up(batch_size: int, model: Dict[str, Any], modelres: int = 128) -> None:
    logger.info("warmup ernerf model...")
    params = ernerf.init_params(jax.random.PRNGKey(0), audio_dim=AUDIO_DIM)
    feats = jnp.zeros((batch_size, AUDIO_DIM), jnp.float32)
    bg = jnp.zeros((batch_size, modelres, modelres, 3), jnp.float32)
    ernerf.render_frame_batch(params, feats, bg,
                              size=modelres).block_until_ready()


@register("avatar", "ernerf")
class NerfReal(BaseAvatar):
    def __init__(self, opt, model: Dict[str, Any], avatar: Dict[str, Any]):
        super().__init__(opt)
        self.model = model
        self.frame_list_cycle = avatar["frame_list_cycle"]
        self.coord_list_cycle = avatar["coord_list_cycle"]
        ropts = _render_opts(opt)
        self._size = ropts["size"]
        self._n_samples = ropts["n_samples"]

        self.nerf_params = avatar.get("nerf_params") or ernerf.init_params(
            jax.random.PRNGKey(0), audio_dim=AUDIO_DIM)

        # background crops: each cycle frame's own bbox region at render
        # resolution, device-resident (compositing target for alpha)
        bgs = []
        for frame, (y1, y2, x1, x2) in zip(self.frame_list_cycle,
                                           self.coord_list_cycle):
            crop = cv2.resize(frame[y1:y2, x1:x2], (self._size, self._size))
            bgs.append(crop.astype(np.float32) / 255.0)
        self.bg_cycle_device = jnp.asarray(np.stack(bgs))
        self._n_frames = len(self.frame_list_cycle)

        self.asr = HubertFeatures(
            opt, self,
            hubert_params=model["hubert_params"], hubert_cfg=model["hubert_cfg"],
            audio_feat_length=(4, 4),
        )
        self.asr.warm_up()

    def inference_batch(self, index: int, audiofeat_batch) -> np.ndarray:
        idxs = jnp.asarray(mirror_indices(self._n_frames, index, self.batch_size))
        feats = jnp.reshape(audiofeat_batch, (self.batch_size, -1)).astype(jnp.float32)
        bg = jnp.take(self.bg_cycle_device, idxs, axis=0)
        pred = ernerf.render_frame_batch(
            self.nerf_params, feats, bg,
            size=self._size, n_samples=self._n_samples)
        return np.asarray(pred)  # (B, size, size, 3) uint8

    def paste_back_frame(self, pred_frame: np.ndarray, idx: int) -> np.ndarray:
        y1, y2, x1, x2 = self.coord_list_cycle[idx]
        frame = self.frame_list_cycle[idx].copy()
        frame[y1:y2, x1:x2] = cv2.resize(pred_frame, (x2 - x1, y2 - y1))
        return frame
