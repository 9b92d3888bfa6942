"""MuseTalk composite model: PE + single-step latent U-Net + VAE decode.

Runtime contract (reference avatars/musetalk_avatar.py:130-152): whisper
feature chunks (B, 50, 384) get sinusoidal positional encoding
(reference avatars/musetalk/models/unet.py:12-28), the latent U-Net runs
ONE denoise step at t=0 with the audio as cross-attention context over the
8-channel (masked||reference) avatar latents, and the VAE decodes the
4-channel prediction to a 256 px BGR uint8 face.

The fused jitted step does latent-cycle gather -> PE add -> U-Net ->
VAE decode -> uint8 BGR in one device program; only B indices go up and
B frames come down.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models import sd_unet, sd_vae

Params = Dict[str, Any]


def positional_encoding_table(seq_len: int, d_model: int = 384) -> np.ndarray:
    """Interleaved sin/cos PE (reference unet.py:14-22)."""
    pe = np.zeros((seq_len, d_model), np.float32)
    pos = np.arange(seq_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def make_infer_fn(unet_cfg: sd_unet.UNetConfig, batch_size: int, ctx_len: int = 50,
                  dtype=jnp.bfloat16, vae_int8: bool = False,
                  unet_int8: bool = False):
    """(unet_params, vae_params, latent_cycle (N,32,32,8), idxs (B,),
    whisper (B, ctx_len, 384)) -> (B, 256, 256, 3) uint8 BGR faces.

    ``vae_int8`` / ``unet_int8``: run the VAE decoder / U-Net convs W8A8
    (int8 MXU: measured 372 vs 177 TFLOPs bf16 on v5e); the corresponding
    params must then be the quantize_decoder / quantize_unet outputs
    (ideally calibrated)."""
    pe = jnp.asarray(positional_encoding_table(ctx_len, unet_cfg.cross_dim))
    if vae_int8:
        decode = sd_vae.decode_int8
    else:
        # thread the step dtype through: decode's own default is bf16,
        # which would silently downcast a dtype=float32 run
        decode = functools.partial(sd_vae.decode, dtype=dtype)
    unet_apply = sd_unet.apply_int8 if unet_int8 else sd_unet.apply

    @jax.jit
    def step(unet_params, vae_params, latent_cycle, idxs, whisper):
        # trace-time check: the step is compiled for this batch size
        assert whisper.shape[0] == batch_size, (whisper.shape, batch_size)
        lat = jnp.take(latent_cycle, idxs, axis=0).astype(dtype)
        ctx = (whisper + pe).astype(dtype)
        t = jnp.zeros((whisper.shape[0],), jnp.float32)
        pred = unet_apply(unet_params, unet_cfg, lat, t, ctx)  # (B,32,32,4) f32
        img = decode(vae_params, pred.astype(dtype))  # (B,256,256,3) RGB [0,1]
        u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
        return u8[..., ::-1]  # RGB -> BGR (reference vae.py:115)

    return step


def make_sharded_infer_fn(unet_cfg: sd_unet.UNetConfig, batch_size: int, mesh,
                          ctx_len: int = 50, dtype=jnp.bfloat16):
    """Multi-chip inference step (SURVEY §2.10(b)): batch over ``dp``,
    U-Net/VAE conv channels over ``tp`` — XLA inserts the ICI collectives.

    Params must be pre-placed with ``parallel.mesh.shard_params(params,
    mesh)``; the step pins the latent cycle replicated and idxs/whisper/
    output batch-sharded so per-chip latency drops with tp and throughput
    scales with dp. ``batch_size`` must divide the dp axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from livetalking_tpu.parallel.mesh import DP_AXIS

    if batch_size % mesh.shape.get(DP_AXIS, 1):
        raise ValueError(
            f"batch {batch_size} not divisible by dp={mesh.shape.get(DP_AXIS, 1)}")
    pe = jnp.asarray(positional_encoding_table(ctx_len, unet_cfg.cross_dim))
    rep = NamedSharding(mesh, P())
    dpb = NamedSharding(mesh, P(DP_AXIS))

    def step(unet_params, vae_params, latent_cycle, idxs, whisper):
        lat = jnp.take(latent_cycle, idxs, axis=0).astype(dtype)
        ctx = (whisper + pe).astype(dtype)
        t = jnp.zeros((whisper.shape[0],), jnp.float32)
        pred = sd_unet.apply(unet_params, unet_cfg, lat, t, ctx)
        img = sd_vae.decode(vae_params, pred.astype(dtype), dtype=dtype)
        u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
        return u8[..., ::-1]

    return jax.jit(step, in_shardings=(None, None, rep, dpb, dpb),
                   out_shardings=dpb)


def encode_avatar_latents(vae_params, faces_bgr: np.ndarray, batch: int = 8) -> np.ndarray:
    """Precompute the per-frame (32, 32, 8) U-Net input latents for an
    avatar: cat(masked-half latents, reference latents) — the offline path
    of reference vae.py:101-122 ``get_latents_for_unet``.

    faces_bgr: (N, 256, 256, 3) uint8. Returns (N, 32, 32, 8) float32.
    """
    N = faces_bgr.shape[0]
    rgb = faces_bgr[..., ::-1].astype(np.float32) / 255.0
    x = (rgb - 0.5) / 0.5  # [-1, 1]
    half_mask = np.ones((256, 256, 1), np.float32)
    half_mask[128:] = 0.0

    # params as a jit ARG (a closure would inline them as HLO constants,
    # bloating the compile request by the full VAE encoder size)
    @jax.jit
    def enc(params, img):
        return sd_vae.encode(params, img)

    out = []
    for s in range(0, N, batch):
        chunk = jnp.asarray(x[s : s + batch])
        masked = jnp.asarray(x[s : s + batch] * half_mask)
        lat_ref = np.asarray(enc(vae_params, chunk))
        lat_masked = np.asarray(enc(vae_params, masked))
        out.append(np.concatenate([lat_masked, lat_ref], axis=-1))
    return np.concatenate(out, axis=0).astype(np.float32)
