"""MuseTalk U-Net finetune: the reference training recipe, TPU-native.

Behavior spec (reference avatars/musetalk/utils/training_utils.py:48-283
and utils.py ``get_image_pred``): the latent U-Net is the only trainable
net; the VAE and the Whisper feature extractor are frozen. Per step the
ground-truth frame is lower-half masked, the masked frame and a reference
frame are VAE-encoded, their latents concatenated to the 8-channel U-Net
input, the U-Net predicts the ground-truth latents in ONE step at t=0
conditioned on the audio window via cross-attention, and the prediction
is VAE-decoded for the pixel-space losses. Loss terms (reference
``cfg.loss_params``): pixel/latent L1, a pyramid perceptual term (the
reference feeds an image pyramid into VGG-face; here the pyramid L1 with
an injectable feature extractor), an expert sync loss (frozen SyncNet
over T-frame lower-half clips), and two multi-scale GAN discriminators —
full face and mouth region — each with its own AdamW + cosine schedule.

TPU-native design: one jitted train step; frozen nets enter as
stop-gradient'd params so XLA dead-code-eliminates their backward pass;
optional ``remat`` wraps the U-Net in ``jax.checkpoint`` (the reference's
``gradient_checkpointing``) trading FLOPs for HBM; optimizers are optax
AdamW with the reference's warmup+cosine schedule. Multi-chip: the step
is a plain jit — place the batch with ``parallel.mesh.shard_batch`` (dp)
and params with ``shard_params`` (tp) and XLA's SPMD partitioner inserts
the gradient psums over ICI (same pattern as train/wav2lip_train.py).

Batch layout (all device arrays):
  gt:       (B, S, S, 3) target frames, RGB in [-1, 1]
  ref:      (B, S, S, 3) reference frames (other timestep), RGB [-1, 1]
  audio:    (B, 50, 384) whisper windows (audio_features/whisper_features)
  sync_mel: (B // 5, 80, 16, 1) mel windows per 5-frame clip (sync loss
            only; B must be a multiple of syncnet.FRAMES when sync_wt>0)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from livetalking_tpu.models import multiscale_disc, sd_unet, sd_vae, syncnet
from livetalking_tpu.models.musetalk import positional_encoding_table


class LossWeights(NamedTuple):
    """Reference loss_params defaults (musetalk stage-2 style recipe)."""

    pixel: float = 1.0
    latent: float = 1.0
    perceptual: float = 0.01
    sync: float = 0.0
    gan: float = 0.0
    mouth_gan: float = 0.0


def make_schedule(lr: float = 1e-5, warmup: int = 500,
                  max_steps: int = 100_000) -> optax.Schedule:
    """Reference get_scheduler('cosine', warmup) equivalent."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=max(warmup, 1),
        decay_steps=max(max_steps, warmup + 1), end_value=lr * 1e-2)


def _mask_lower_half(gt: jnp.ndarray) -> jnp.ndarray:
    """Reference utils.py get_image_pred: masked[:, :, h//2:, :] = -1."""
    S = gt.shape[1]
    row = jnp.arange(S)[None, :, None, None]
    return jnp.where(row < S // 2, gt, jnp.asarray(-1.0, gt.dtype))


def _mouth_crop(img01: jnp.ndarray) -> jnp.ndarray:
    """Center lower-half crop: rows [S/2, S), cols [S/4, 3S/4) — the
    mouth region the reference's mouth discriminator judges."""
    S = img01.shape[1]
    return img01[:, S // 2:, S // 4: 3 * S // 4, :]


def pyramid_l1(pred01: jnp.ndarray, gt01: jnp.ndarray,
               scales: Tuple[float, ...] = (1.0, 0.5, 0.25),
               feature_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Image-pyramid perceptual term (reference vgg_face.ImagePyramide →
    Vgg19 features; ``feature_fn`` slots in a VGG-style extractor, the
    default compares pyramid pixels directly)."""
    total = jnp.asarray(0.0, jnp.float32)
    for s in scales:
        f = int(round(1.0 / s))
        p = multiscale_disc._downsample(pred01, f)
        g = multiscale_disc._downsample(gt01, f)
        if feature_fn is not None:
            p, g = feature_fn(p), feature_fn(g)
        total = total + jnp.mean(jnp.abs(p - g))
    return total / len(scales)


def _sync_loss(sync_params, pred01: jnp.ndarray, sync_mel: jnp.ndarray) -> jnp.ndarray:
    """Frozen-expert sync loss over 5-frame lower-half windows (reference
    initialize_syncnet: frozen, eval, drives the generator only)."""
    T = syncnet.FRAMES
    n = pred01.shape[0] // T
    S = pred01.shape[1]
    clips = pred01[: n * T].reshape(n, T, S, S, 3)[:, :, S // 2:, :, :]
    windows = jnp.concatenate([clips[:, i] for i in range(T)], axis=-1)
    v, a = syncnet.apply(sync_params, windows, sync_mel)
    return syncnet.cosine_bce_loss(v, a, jnp.ones((n,), jnp.float32))


def _sync_loss_musetalk(sync_params, pred01: jnp.ndarray,
                        sync_mel16: jnp.ndarray, sync_cfg) -> jnp.ndarray:
    """MuseTalk's dedicated ResNet/attention sync expert
    (models/musetalk_syncnet.py, reference avatars/musetalk/models/
    syncnet.py:18-240): 16-frame lower-half windows channel-stacked
    against the clip's 52-column mel (reference training_utils.py:254
    requires n_sample_frames == 16)."""
    from livetalking_tpu.models import musetalk_syncnet as msn

    T = msn.FRAMES
    n = pred01.shape[0] // T
    S = pred01.shape[1]
    clips = pred01[: n * T].reshape(n, T, S, S, 3)[:, :, S // 2:, :, :]
    windows = jnp.concatenate([clips[:, i] for i in range(T)], axis=-1)
    v, a = msn.apply(sync_params, windows, sync_mel16, sync_cfg)
    return msn.cosine_bce_loss(v, a, jnp.ones((n,), jnp.float32))


def forward(unet_params, vae_params, cfg: sd_unet.UNetConfig, pe,
            gt, ref, audio, dtype=jnp.float32):
    """The differentiable forward: (pred_latents, pred01, gt_latents).

    VAE params are stop-gradient'd — only U-Net gradients exist, matching
    vae.requires_grad_(False) in the reference."""
    vae_p = jax.lax.stop_gradient(vae_params)
    masked = _mask_lower_half(gt)
    m_lat = jax.lax.stop_gradient(sd_vae.encode(vae_p, masked.astype(dtype)))
    r_lat = jax.lax.stop_gradient(sd_vae.encode(vae_p, ref.astype(dtype)))
    gt_lat = jax.lax.stop_gradient(sd_vae.encode(vae_p, gt.astype(dtype)))
    x = jnp.concatenate([m_lat, r_lat], axis=-1).astype(dtype)
    ctx = (audio + pe).astype(dtype)
    t = jnp.zeros((gt.shape[0],), jnp.float32)
    pred_lat = sd_unet.apply(unet_params, cfg, x, t, ctx)
    pred01 = sd_vae.decode(vae_p, pred_lat.astype(dtype),
                           dtype=dtype)  # (B,S,S,3) [0,1]
    return pred_lat, pred01.astype(jnp.float32), gt_lat


class TrainState(NamedTuple):
    unet: Any
    unet_opt: Any
    face_disc: Any
    face_disc_opt: Any
    mouth_disc: Any
    mouth_disc_opt: Any


def init_train_state(key, cfg: sd_unet.UNetConfig, txs, weights: LossWeights,
                     unet_params=None, dtype=jnp.float32) -> TrainState:
    """Build params + optimizer states. ``txs`` from make_train_step."""
    tx_g, tx_d = txs
    k1, k2, k3 = jax.random.split(key, 3)
    unet_p = unet_params if unet_params is not None else sd_unet.init_params(
        k1, cfg, dtype=dtype)
    fd = multiscale_disc.init_params(k2) if weights.gan > 0 else None
    md = multiscale_disc.init_params(k3) if weights.mouth_gan > 0 else None
    return TrainState(
        unet=unet_p, unet_opt=tx_g.init(unet_p),
        face_disc=fd, face_disc_opt=tx_d.init(fd) if fd is not None else None,
        mouth_disc=md,
        mouth_disc_opt=tx_d.init(md) if md is not None else None)


def make_train_step(cfg: sd_unet.UNetConfig, weights: LossWeights = LossWeights(),
                    lr: float = 1e-5, disc_lr: float = 2e-5,
                    warmup: int = 500, max_steps: int = 100_000,
                    weight_decay: float = 1e-2, remat: bool = False,
                    ctx_len: int = 50, dtype=jnp.float32,
                    feature_fn: Optional[Callable] = None,
                    sync_backend: str = "generic", sync_cfg=None):
    """Returns ((tx_gen, tx_disc), jitted step).

    step(state, vae_params, sync_params, batch) -> (state, metrics);
    ``sync_params`` may be None when weights.sync == 0 (the branch is
    compiled out by the Python-level weight check).

    ``sync_backend``: "generic" scores 5-frame clips with the shared
    models/syncnet.py expert (batch carries ``sync_mel``); "musetalk"
    uses the dedicated LatentSync-style expert on 16-frame clips
    (models/musetalk_syncnet.py, batch carries ``sync_mel16``;
    ``sync_cfg`` defaults to musetalk_syncnet.MUSETALK).
    """
    if sync_cfg is None and sync_backend == "musetalk":
        from livetalking_tpu.models import musetalk_syncnet as msn

        sync_cfg = msn.MUSETALK
    pe = jnp.asarray(positional_encoding_table(ctx_len, cfg.cross_dim))
    tx_g = optax.adamw(make_schedule(lr, warmup, max_steps),
                       b1=0.9, b2=0.999, weight_decay=weight_decay)
    tx_d = optax.adamw(optax.cosine_decay_schedule(disc_lr, max_steps, 1e-2),
                       b1=0.9, b2=0.999, weight_decay=weight_decay)
    fwd = forward if not remat else jax.checkpoint(
        forward, static_argnums=(2, 7))

    def gen_loss_fn(unet_p, state: TrainState, vae_params, sync_params, batch):
        pred_lat, pred01, gt_lat = fwd(
            unet_p, vae_params, cfg, pe,
            batch["gt"], batch["ref"], batch["audio"], dtype)
        gt01 = batch["gt"].astype(jnp.float32) / 2.0 + 0.5
        m = {"latent_l1": jnp.mean(jnp.abs(pred_lat - gt_lat)),
             "pixel_l1": jnp.mean(jnp.abs(pred01 - gt01))}
        loss = weights.latent * m["latent_l1"] + weights.pixel * m["pixel_l1"]
        if weights.perceptual > 0:
            m["perceptual"] = pyramid_l1(pred01, gt01, feature_fn=feature_fn)
            loss = loss + weights.perceptual * m["perceptual"]
        if weights.sync > 0:
            if sync_backend == "musetalk":
                m["sync"] = _sync_loss_musetalk(
                    jax.lax.stop_gradient(sync_params), pred01,
                    batch["sync_mel16"], sync_cfg)
            else:
                m["sync"] = _sync_loss(jax.lax.stop_gradient(sync_params),
                                       pred01, batch["sync_mel"])
            loss = loss + weights.sync * m["sync"]
        if weights.gan > 0:
            m["gan"] = multiscale_disc.gen_loss(
                jax.lax.stop_gradient(state.face_disc), pred01)
            loss = loss + weights.gan * m["gan"]
        if weights.mouth_gan > 0:
            m["mouth_gan"] = multiscale_disc.gen_loss(
                jax.lax.stop_gradient(state.mouth_disc), _mouth_crop(pred01))
            loss = loss + weights.mouth_gan * m["mouth_gan"]
        m["loss"] = loss
        return loss, (m, pred01)

    @jax.jit
    def step(state: TrainState, vae_params, sync_params, batch):
        (_, (metrics, pred01)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(
                state.unet, state, vae_params, sync_params, batch)
        updates, unet_opt = tx_g.update(grads, state.unet_opt, state.unet)
        unet_p = optax.apply_updates(state.unet, updates)
        gt01 = batch["gt"].astype(jnp.float32) / 2.0 + 0.5
        fake = jax.lax.stop_gradient(pred01)

        fd, fdo = state.face_disc, state.face_disc_opt
        if weights.gan > 0:
            d_loss, d_grads = jax.value_and_grad(multiscale_disc.disc_loss)(
                fd, gt01, fake)
            du, fdo = tx_d.update(d_grads, fdo, fd)
            fd = optax.apply_updates(fd, du)
            metrics["face_disc"] = d_loss
        md, mdo = state.mouth_disc, state.mouth_disc_opt
        if weights.mouth_gan > 0:
            d_loss, d_grads = jax.value_and_grad(multiscale_disc.disc_loss)(
                md, _mouth_crop(gt01), _mouth_crop(fake))
            du, mdo = tx_d.update(d_grads, mdo, md)
            md = optax.apply_updates(md, du)
            metrics["mouth_disc"] = d_loss

        return TrainState(unet_p, unet_opt, fd, fdo, md, mdo), metrics

    return (tx_g, tx_d), step
