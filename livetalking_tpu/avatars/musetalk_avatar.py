"""MuseTalk avatar plugin (model family "musetalk").

Avatar directory format is byte-compatible with the reference
(reference avatars/musetalk_avatar.py:69-91):
``{full_imgs/, coords.pkl (x1, y1, x2, y2), latents.pt, mask/,
mask_coords.pkl}``. ``latents.pt`` holds per-frame (1, 8, 32, 32) U-Net
input latents = cat(masked-half latents, reference latents).

Paste-back uses the precomputed feathered face-parse mask: the predicted
256 px face is resized into the bbox inside the larger mask crop box and
linearly blended (reference avatars/musetalk/myutil.py:4-26).
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

from livetalking_tpu.audio_features.whisper_features import WhisperFeatures
from livetalking_tpu.avatars.base_avatar import BaseAvatar
from livetalking_tpu.models import musetalk as mt
from livetalking_tpu.models import sd_unet, sd_vae
from livetalking_tpu.models import whisper_encoder as we
from livetalking_tpu.registry import register
from livetalking_tpu.utils.jaxinit import jit_init
from livetalking_tpu.utils.image import mirror_indices, read_imgs
from livetalking_tpu.utils.logger import logger

TINY_UNET = sd_unet.UNetConfig(block_out=(32, 64, 96, 96), heads=4)

# cross-session batching (SURVEY §2.10(a)): one shared device worker per
# process, packing every avatar's latent cycle into one store
import threading as _threading

_shared_lock = _threading.Lock()
_shared: dict = {"store": None, "scheduler": None}


def get_shared_scheduler(model: Dict[str, Any], batch_size: int,
                         unet_params, vae_params, vae_int8: bool,
                         unet_int8: bool, buckets=(1, 2, 4, 8),
                         paste_spec: Dict[str, int] = None,
                         d2h_subsample: int = 1,
                         coalesce_window_s: float = 0.0) -> tuple:
    """``paste_spec`` (from the FIRST session's avatar geometry:
    ``{"S", "H", "W", "Ho", "Wo"}``) composes the device paste-back into
    the super-batch step itself — the coalesced path then returns
    finished FULL frames and the per-session host compose stage
    (reference avatars/base_avatar.py:383-467 paste/blend) disappears.
    Later sessions must agree on frame resolution and fit the shared
    crop bucket (checked when their paste data is prepared)."""
    from livetalking_tpu.engine.scheduler import (
        AvatarStore,
        BatchScheduler,
        SchedulerConfigError,
        parse_buckets,
    )

    with _shared_lock:
        cfg = {"batch_size": batch_size, "vae_int8": vae_int8,
               "unet_int8": unet_int8, "buckets": tuple(buckets),
               "paste": (None if paste_spec is None
                         else (paste_spec["H"], paste_spec["W"])),
               "d2h_subsample": int(d2h_subsample),
               "coalesce_window_s": float(coalesce_window_s)}
        if _shared["scheduler"] is None:
            store = AvatarStore(item_shape=(32, 32, 8), dtype=np.float32)
            paste_fn = None
            if paste_spec is not None:
                from livetalking_tpu.ops.pallas_blend import (
                    make_masked_paste_fn,
                )

                paste_fn = make_masked_paste_fn(
                    paste_spec["S"], paste_spec["Ho"], paste_spec["Wo"],
                    paste_spec["H"], paste_spec["W"])
                _shared["paste_geom"] = dict(paste_spec)

            def step_factory(n):
                step = mt.make_infer_fn(model["unet_cfg"], n,
                                        dtype=model["dtype"], vae_int8=vae_int8,
                                        unet_int8=unet_int8)

                def wrapped(params, buffer, idxs, whisper):
                    pred = step(params[0], params[1], buffer, idxs, whisper)
                    if paste_fn is None:
                        return pred
                    aux = store.aux  # re-read: grows as avatars register
                    out = paste_fn(pred, aux["pb_frames"], idxs,
                                   aux["pb_origins"], aux["pb_scalars"],
                                   aux["pb_masks"])
                    if d2h_subsample > 1:  # dev/bench tunnel workaround
                        out = out[:, ::d2h_subsample, ::d2h_subsample]
                    return out
                return wrapped

            sched = BatchScheduler((unet_params, vae_params), store,
                                   step_factory, batch_size, buckets=buckets,
                                   coalesce_window_s=coalesce_window_s)
            sched.start()
            _shared["store"] = store
            _shared["scheduler"] = sched
            _shared["config"] = cfg
        elif _shared.get("config") != cfg:
            # the process-wide scheduler is built once from the FIRST
            # session's flags; a later session with conflicting flags would
            # silently run with the wrong batching — reject it instead
            # (surfaces as a clean error envelope through /offer|/session)
            raise SchedulerConfigError(
                f"coalesce: shared scheduler already running with "
                f"{_shared.get('config')}; conflicting session config {cfg} "
                "rejected (per-session scheduler overrides are not allowed "
                "under --coalesce)")
        return _shared["store"], _shared["scheduler"]


def get_shared_feature_coalescer(model: Dict[str, Any], opt):
    """Process-wide cross-session whisper encoder
    (engine/feature_coalescer.py): per-session feature encodes stagger
    the BatchScheduler submissions and super-batches coalesce poorly
    (measured 9.6 vs 27.2 fps/session, SERVING_r02.json); batching the
    encodes keeps every super-batch full."""
    from livetalking_tpu.audio_features.whisper_features import (
        make_batched_encode_factory,
    )
    from livetalking_tpu.engine.feature_coalescer import FeatureCoalescer
    from livetalking_tpu.engine.scheduler import (
        SchedulerConfigError,
        parse_buckets,
        resolve_coalesce_window,
    )

    with _shared_lock:
        cfg = {"batch_size": opt.batch_size, "l": opt.l, "r": opt.r,
               "fps": int(getattr(opt, "fps", 25)),
               "whisper_short_window": bool(getattr(
                   opt, "whisper_short_window", False)),
               "buckets": parse_buckets(opt),
               # NOT resolve_coalesce_window: a feature-side hold
               # serializes into the request critical path (measured
               # 24.4 -> 22.7 fps/session at B=4 with an auto window);
               # encode alignment is opt-in via --feature_window_ms
               "coalesce_window_s": max(0.0, float(getattr(
                   opt, "feature_window_ms", 0.0) or 0.0) / 1000.0)}
        if _shared.get("feat_coalescer") is None:
            factory, n_samples = make_batched_encode_factory(
                model["whisper_params"], model["whisper_cfg"],
                batch_size=cfg["batch_size"], l=cfg["l"], r=cfg["r"],
                short_window=cfg["whisper_short_window"], fps=cfg["fps"])
            fc = FeatureCoalescer(factory, n_samples,
                                  buckets=cfg["buckets"],
                                  coalesce_window_s=cfg["coalesce_window_s"])
            fc.start()
            fc.prewarm()  # background-compile every bucket program
            _shared["feat_coalescer"] = fc
            _shared["feat_config"] = cfg
        elif _shared.get("feat_config") != cfg:
            # a mismatched window geometry would assert (or silently
            # mis-gather) inside the shared worker — reject like the
            # scheduler config contract
            raise SchedulerConfigError(
                f"coalesce: shared feature coalescer already running with "
                f"{_shared.get('feat_config')}; conflicting session config "
                f"{cfg} rejected")
        return _shared["feat_coalescer"]


def reset_shared_scheduler() -> None:
    """Stop and drop the process-wide scheduler (tests / reconfiguration)."""
    with _shared_lock:
        if _shared["scheduler"] is not None:
            _shared["scheduler"].stop()
        _shared["scheduler"] = None
        _shared["store"] = None
        if _shared.get("feat_coalescer") is not None:
            _shared["feat_coalescer"].stop()
        _shared["feat_coalescer"] = None
        _shared.pop("config", None)
        _shared.pop("feat_config", None)
        _shared.pop("paste_geom", None)


def load_model(opt=None) -> Dict[str, Any]:
    """Load whisper encoder + VAE + latent U-Net (shared across sessions)."""
    dtype = jnp.bfloat16 if getattr(opt, "dtype", "bfloat16") == "bfloat16" else jnp.float32
    models_dir = getattr(opt, "models_dir", "./models")

    # whisper-tiny
    wdir = os.path.join(models_dir, "whisper")
    if os.path.isdir(wdir):
        import transformers

        logger.info("loading whisper weights from %s", wdir)
        tmodel = transformers.WhisperModel.from_pretrained(wdir)
        whisper_params = we.convert_torch_state_dict(tmodel.state_dict(), we.TINY, dtype)
    else:
        logger.warning("whisper weights not found at %s - random init", wdir)
        whisper_params = jit_init(we.init_params, jax.random.PRNGKey(0), we.TINY, dtype)

    # VAE (sd-vae-ft-mse)
    vdir = os.path.join(models_dir, "sd-vae-ft-mse")
    vae_sd = _load_diffusers_weights(vdir)
    if vae_sd is not None:
        logger.info("loading VAE weights from %s", vdir)
        vae_params = sd_vae.convert_torch_state_dict(vae_sd, dtype)
    else:
        logger.warning("VAE weights not found at %s - random init", vdir)
        vae_params = jit_init(sd_vae.init_params, jax.random.PRNGKey(1), dtype)

    # latent U-Net
    upath = os.path.join(models_dir, "musetalkV15", "unet.pth")
    if os.path.exists(upath):
        import torch

        logger.info("loading musetalk unet from %s", upath)
        sd = torch.load(upath, map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        unet_cfg = sd_unet.MUSETALK
        unet_params = sd_unet.convert_torch_state_dict(sd, unet_cfg, dtype)
    else:
        size = getattr(opt, "musetalk_size", "full")
        unet_cfg = TINY_UNET if size == "tiny" else sd_unet.MUSETALK
        logger.warning("musetalk unet not found at %s - random init (%s)", upath, size)
        unet_params = jit_init(sd_unet.init_params, jax.random.PRNGKey(2), unet_cfg, dtype)

    return {
        "whisper_params": whisper_params, "whisper_cfg": we.TINY,
        "vae_params": vae_params,
        "unet_params": unet_params, "unet_cfg": unet_cfg,
        "dtype": dtype,
    }


def _load_diffusers_weights(dirpath: str):
    """Read a diffusers model dir (bin or safetensors) as a state dict."""
    bin_path = os.path.join(dirpath, "diffusion_pytorch_model.bin")
    st_path = os.path.join(dirpath, "diffusion_pytorch_model.safetensors")
    if os.path.exists(bin_path):
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=False)
    if os.path.exists(st_path):
        try:
            from safetensors.torch import load_file

            return load_file(st_path)
        except ImportError:
            logger.error("safetensors unavailable; cannot read %s", st_path)
    return None


def load_avatar(avatar_id: str, data_dir: str = "./data") -> Dict[str, Any]:
    avatar_path = os.path.join(data_dir, "avatars", avatar_id)

    import torch

    latents = torch.load(os.path.join(avatar_path, "latents.pt"), map_location="cpu",
                         weights_only=False)
    # list of (1, 8, 32, 32) NCHW tensors -> (N, 32, 32, 8)
    lat = np.stack([np.asarray(t.detach().to(torch.float32)).reshape(8, 32, 32) for t in latents])
    lat = np.transpose(lat, (0, 2, 3, 1)).astype(np.float32)

    with open(os.path.join(avatar_path, "coords.pkl"), "rb") as f:
        coord_list_cycle = pickle.load(f)
    with open(os.path.join(avatar_path, "mask_coords.pkl"), "rb") as f:
        mask_coords_list_cycle = pickle.load(f)

    def _sorted_imgs(sub: str):
        paths = glob.glob(os.path.join(avatar_path, sub, "*.[jpJP][pnPN]*[gG]"))
        return sorted(paths, key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))

    frame_list_cycle = read_imgs(_sorted_imgs("full_imgs"))
    mask_list_cycle = read_imgs(_sorted_imgs("mask"))

    return {
        "avatar_id": avatar_id,
        "frame_list_cycle": frame_list_cycle,
        "mask_list_cycle": mask_list_cycle,
        "coord_list_cycle": coord_list_cycle,
        "mask_coords_list_cycle": mask_coords_list_cycle,
        "latent_cycle_host": lat,
        "latent_cycle_device": jnp.asarray(lat),
    }


def _check_quant_flags(model: Dict[str, Any], key: str,
                       wanted: Dict[str, bool]) -> None:
    """The quantized trees cached in the shared ``model`` dict were built
    with the FIRST session's int8 flags; a later session requesting
    different flags must be rejected (mirroring the scheduler-config
    contract), not silently served the first session's config. Trees
    installed by external harnesses without a flag record are accepted
    as-is (they own the process-wide config)."""
    from livetalking_tpu.engine.scheduler import SchedulerConfigError

    recorded = model.get(key)
    if recorded is not None and recorded != wanted:
        raise SchedulerConfigError(
            f"quantized params cached with {recorded}; conflicting "
            f"session config {wanted} rejected (per-session int8 flag "
            "overrides are not allowed once quantization ran)")


def _with_dummy_scales(tree):
    """Give every quantized conv site a placeholder activation scale so a
    warm-up compile produces the same (static-scale) program the
    calibrated params will run; calibrated trees swap in compile-free."""
    if isinstance(tree, dict):
        out = {k: _with_dummy_scales(v) for k, v in tree.items()}
        if "wq" in out and out["wq"].ndim == 4:
            # conv sites only: calibration assigns static scales there.
            # Linear sites (2-D wq, quantize_transformer) always run
            # dynamic activation scales — giving them a dummy "as" would
            # compile a static-scale program the calibrated tree never
            # runs, forcing a recompile at swap.
            out["as"] = jnp.asarray(1.0, jnp.float32)
        return out
    if isinstance(tree, list):
        return [_with_dummy_scales(v) for v in tree]
    return tree


def warm_up(batch_size: int, model: Dict[str, Any], modelres: int = 256,
            opt=None) -> None:
    """Compile the EXACT program sessions will run: the int8 flags change
    the jitted graph, so warm with quantized trees (dummy scales) when
    the flags are on — otherwise the first utterance pays the compile."""
    vae_int8 = bool(getattr(opt, "vae_int8", False))
    unet_int8 = bool(getattr(opt, "unet_int8", False))
    attn_int8 = bool(getattr(opt, "attn_int8", True))
    mid_int8 = bool(getattr(opt, "vae_mid_int8", True))
    logger.info("warmup musetalk model... (vae_int8=%s unet_int8=%s "
                "attn_int8=%s vae_mid_int8=%s)",
                vae_int8, unet_int8, attn_int8, mid_int8)
    step = mt.make_infer_fn(model["unet_cfg"], batch_size,
                            dtype=model["dtype"], vae_int8=vae_int8,
                            unet_int8=unet_int8)
    up = model["unet_params"]
    vp = model["vae_params"]
    if unet_int8:
        up = _with_dummy_scales(sd_unet.quantize_unet(up, attn_int8=attn_int8))
    if vae_int8:
        vp = _with_dummy_scales(sd_vae.quantize_decoder(vp, mid_int8=mid_int8))
    cycle = jnp.zeros((1, 32, 32, 8), jnp.float32)
    idxs = jnp.zeros((batch_size,), jnp.int32)
    whisper = jnp.zeros((batch_size, 50, model["unet_cfg"].cross_dim),
                        jnp.float32)
    step(up, vp, cycle, idxs, whisper).block_until_ready()


def blend_face(body: np.ndarray, face: np.ndarray, face_box, mask: np.ndarray, crop_box) -> np.ndarray:
    """Feathered linear blend of the predicted face into the full frame
    (reference avatars/musetalk/myutil.py:4-26)."""
    x, y, x1, y1 = face_box
    xs, ys, xe, ye = crop_box
    out = body
    face_large = out[ys:ye, xs:xe].copy()
    face_large[y - ys : y1 - ys, x - xs : x1 - xs] = face

    m = (cv2.cvtColor(mask, cv2.COLOR_BGR2GRAY) / 255.0).astype(np.float32)[..., None]
    region = out[ys:ye, xs:xe].astype(np.float32)
    out[ys:ye, xs:xe] = (face_large.astype(np.float32) * m + region * (1.0 - m)).astype(np.uint8)
    return out


@register("avatar", "musetalk")
class MuseReal(BaseAvatar):
    def __init__(self, opt, model: Dict[str, Any], avatar: Dict[str, Any]):
        super().__init__(opt)
        self.model = model
        self.frame_list_cycle = avatar["frame_list_cycle"]
        self.mask_list_cycle = avatar["mask_list_cycle"]
        self.coord_list_cycle = avatar["coord_list_cycle"]
        self.mask_coords_list_cycle = avatar["mask_coords_list_cycle"]
        self.latent_cycle_device = avatar["latent_cycle_device"]
        self._n_frames = int(self.latent_cycle_device.shape[0])

        self._vae_params = model["vae_params"]
        use_int8 = bool(getattr(opt, "vae_int8", False))
        if use_int8:
            mid_int8 = bool(getattr(opt, "vae_mid_int8", True))
            if "vae_params_q" in model:
                # the process-shared quantized tree was produced by the
                # FIRST session's flags; silently reusing it under other
                # flags would run a config the user did not request
                _check_quant_flags(model, "vae_q_flags",
                                   {"vae_mid_int8": mid_int8})
            else:  # shared across sessions
                # device-native (jnp) quantize: weights never leave the
                # chip; eager per-conv ops reuse tiny cached kernels (a
                # whole-tree jit would mean one huge remote compile)
                q = sd_vae.quantize_decoder(
                    model["vae_params"], mid_int8=mid_int8)
                # calibrate on the reference-face latent channels ([4:] of
                # cat(masked, ref)) - the decode-time distribution
                zc = jnp.asarray(self.latent_cycle_device[:4, :, :, 4:])
                model["vae_params_q"] = sd_vae.calibrate_decoder(
                    model["vae_params"], q, zc)
                model["vae_q_flags"] = {"vae_mid_int8": mid_int8}
                logger.info("musetalk: int8 VAE decoder calibrated")
            self._vae_params = model["vae_params_q"]

        self._unet_params = model["unet_params"]
        use_unet_int8 = bool(getattr(opt, "unet_int8", False))
        if use_unet_int8:
            attn_int8 = bool(getattr(opt, "attn_int8", True))
            if "unet_params_q" in model:
                _check_quant_flags(model, "unet_q_flags",
                                   {"attn_int8": attn_int8})
            else:  # shared across sessions
                # device-native (jnp) quantize, eager (see VAE note)
                q = sd_unet.quantize_unet(
                    model["unet_params"], attn_int8=attn_int8)
                # calibrate on real avatar input latents + a whisper
                # context with REAL encoder statistics: encode 1 s of
                # noise through the model's own whisper encoder and take
                # runtime-layout windows (position-major, layer-fast =
                # 10 positions x 5 layer-states per 50-row window, the
                # exact gather whisper_features.py performs). A unit-
                # normal proxy under-estimates the activation scales at
                # the cross-attention-fed sites and clips at runtime.
                ucfg = model["unet_cfg"]
                nb = min(4, self._n_frames)
                zc = jnp.asarray(self.latent_cycle_device[:nb]).astype(
                    model["dtype"])
                pe = jnp.asarray(mt.positional_encoding_table(
                    50, ucfg.cross_dim))
                wcfg = model["whisper_cfg"]
                if wcfg.d_model == ucfg.cross_dim:
                    from livetalking_tpu.ops.whisper_mel import (
                        log_mel_spectrogram,
                    )

                    @jax.jit
                    def _enc(params, w):
                        mel = log_mel_spectrogram(w)[None]
                        return we.apply_stacked(params, wcfg, mel)[0]

                    wav = jax.random.normal(jax.random.PRNGKey(0),
                                            (16000,)) * 0.1
                    states = _enc(model["whisper_params"], wav)
                    flat = states.reshape(-1, wcfg.d_model)
                    ctx = flat[: nb * 50].reshape(nb, 50, wcfg.d_model)
                else:  # mismatched custom config: magnitude-only proxy
                    ctx = jax.random.normal(jax.random.PRNGKey(0),
                                            (nb, 50, ucfg.cross_dim))
                ctx = (ctx + pe).astype(model["dtype"])
                tt = jnp.zeros((nb,), jnp.float32)
                model["unet_params_q"] = sd_unet.calibrate_unet(
                    model["unet_params"], q, ucfg, zc, tt, ctx)
                model["unet_q_flags"] = {"attn_int8": attn_int8}
                logger.info("musetalk: int8 U-Net calibrated")
            self._unet_params = model["unet_params_q"]

        self._scheduler = None
        self._store_offset = 0
        self._scheduler_composes = False
        feat_coalescer = None
        if getattr(opt, "coalesce", False):
            from livetalking_tpu.engine.scheduler import (
                SchedulerConfigError,
                parse_buckets,
            )

            paste_spec = None
            use_paste = bool(getattr(opt, "device_paste_back", False))
            if use_paste:
                from livetalking_tpu.ops.pallas_blend import bucket_shape

                fh, fw = self.frame_list_cycle[0].shape[:2]
                ho, wo = bucket_shape(
                    [(ys, ye, xs, xe)
                     for (xs, ys, xe, ye) in self.mask_coords_list_cycle])
                paste_spec = {"S": 256, "H": fh, "W": fw, "Ho": ho, "Wo": wo}
            from livetalking_tpu.engine.scheduler import (
                resolve_coalesce_window,
            )

            store, self._scheduler = get_shared_scheduler(
                model, self.batch_size, self._unet_params, self._vae_params,
                use_int8, use_unet_int8, buckets=parse_buckets(opt),
                paste_spec=paste_spec,
                d2h_subsample=int(getattr(opt, "d2h_subsample", 1)),
                coalesce_window_s=resolve_coalesce_window(
                    opt, self.batch_size))
            # validate the feature-coalescer config BEFORE store.add: a
            # conflicting session must be rejected without leaking its
            # packed latent cycle into the shared device store (the store
            # has no remove API)
            feat_coalescer = get_shared_feature_coalescer(model, opt)
            aux = None
            if use_paste:
                # paste data prepared against the SHARED bucket (fixed by
                # the first session); a too-big face crop raises BEFORE
                # store.add so nothing leaks into the shared store
                from livetalking_tpu.ops.pallas_blend import (
                    prepare_masked_paste_data,
                )

                geom = _shared["paste_geom"]
                if (fh, fw) != (geom["H"], geom["W"]):
                    raise SchedulerConfigError(
                        f"coalesce+device_paste_back: avatar frame "
                        f"{fw}x{fh} != shared {geom['W']}x{geom['H']}")
                try:
                    origins, scalars, masks = prepare_masked_paste_data(
                        self.coord_list_cycle, self.mask_coords_list_cycle,
                        self.mask_list_cycle, geom["Ho"], geom["Wo"],
                        geom["H"], geom["W"])
                except ValueError as e:
                    raise SchedulerConfigError(
                        f"coalesce+device_paste_back: {e}") from e
                aux = {
                    "pb_frames": np.stack(self.frame_list_cycle).astype(np.uint8),
                    "pb_origins": origins,
                    "pb_scalars": scalars,
                    "pb_masks": masks,
                }
                self._scheduler_composes = True
            self._store_offset, _ = store.add(
                avatar["avatar_id"], avatar["latent_cycle_host"], aux=aux)
        else:
            self._step = mt.make_infer_fn(model["unet_cfg"], self.batch_size,
                                          dtype=model["dtype"], vae_int8=use_int8,
                                          unet_int8=use_unet_int8)

        # on-device composite with the per-frame feathered parse masks
        # (ops/pallas_blend.py MaskedDevicePasteBack); under --coalesce
        # the compose rides the shared scheduler's super-batch step
        # instead (self._scheduler_composes above)
        self._device_paste = None
        if getattr(opt, "device_paste_back", False) and self._scheduler is None:
            from livetalking_tpu.ops.pallas_blend import MaskedDevicePasteBack

            dp = MaskedDevicePasteBack(
                np.stack(self.frame_list_cycle), self.coord_list_cycle,
                self.mask_coords_list_cycle, self.mask_list_cycle, 256,
            )
            if dp.available:
                self._device_paste = dp
            else:
                logger.warning(
                    "device_paste_back: crop bucket exceeds frame - host path")

        self.asr = WhisperFeatures(
            opt, self,
            whisper_params=model["whisper_params"], whisper_cfg=model["whisper_cfg"],
            coalescer=feat_coalescer,
        )
        self.asr.warm_up()

        # production prewarm: background-compile every bucket program now
        # that this avatar's cycle (and paste aux) is registered, so no
        # live session's first utterance lands on a cold bucket (benches
        # call the synchronous prewarm explicitly and will block on this
        # one's lock until the buckets are genuinely warm)
        if (self._scheduler is not None
                and int(getattr(opt, "scheduler_prewarm", 1))):
            self._scheduler.prewarm_async(tuple(self.asr._zero.shape[1:]))

    def submit_batch(self, index: int, audiofeat_batch):
        """Pipelined submission into the shared scheduler: the session
        keeps --session_inflight super-batch requests in flight so its
        emission period tracks the device step rate instead of the
        per-request round-trip latency (base_avatar.inference drains the
        handles in order). Non-coalesced sessions fall back to the
        synchronous default."""
        if self._scheduler is None:
            return self.inference_batch(index, audiofeat_batch)
        host_idxs = mirror_indices(self._n_frames, index, self.batch_size)
        return self._scheduler.submit(host_idxs + self._store_offset,
                                      audiofeat_batch)

    def resolve_batch(self, handle) -> np.ndarray:
        if isinstance(handle, np.ndarray):
            return handle
        return self._scheduler.wait(handle)

    def inference_batch(self, index: int, audiofeat_batch) -> np.ndarray:
        host_idxs = mirror_indices(self._n_frames, index, self.batch_size)
        if self._scheduler is not None:
            # cross-session batching: one shared device worker per
            # process; with _scheduler_composes the result is already
            # finished FULL frames (device paste inside the super-batch)
            pred = self._scheduler.infer(host_idxs + self._store_offset,
                                         audiofeat_batch)
        else:
            idxs = jnp.asarray(host_idxs)
            pred = self._step(
                self._unet_params, self._vae_params,
                self.latent_cycle_device, idxs, audiofeat_batch,
            )
        if self._device_paste is not None:
            return self._device_paste.paste_batch(pred, host_idxs)
        return np.asarray(pred)  # (B, 256, 256, 3) uint8 BGR

    def paste_back_frame(self, pred_frame: np.ndarray, idx: int) -> np.ndarray:
        if self._device_paste is not None or self._scheduler_composes:
            return pred_frame  # already a composited full frame (engine normalizes layout)
        x1, y1, x2, y2 = self.coord_list_cycle[idx]
        frame = self.frame_list_cycle[idx].copy()
        face = cv2.resize(pred_frame.astype(np.uint8), (x2 - x1, y2 - y1))
        return blend_face(frame, face, (x1, y1, x2, y2),
                          self.mask_list_cycle[idx], self.mask_coords_list_cycle[idx])
