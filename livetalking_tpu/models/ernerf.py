"""ER-NeRF-class audio-driven volumetric head, TPU-first.

The reference lists an "ernerf" model family (reference README feature
table; the code is absent from the snapshot, so behavior parity follows
the published ER-NeRF design: an audio-conditioned NeRF that renders the
head crop per frame, composited over the torso/background).

TPU-native design decisions (vs the CUDA original's instant-ngp hash
grid + raymarching kernels):

* **Triplane feature volumes** instead of a hash grid: three dense 2D
  planes (xy/xz/yz) sampled bilinearly. Dense planes keep memory access
  regular (XLA vectorizes the 4-tap gathers); a hash grid's random
  gathers would thrash a TPU's vector memory.
* **Fixed sample count per ray** (static shapes): every ray takes
  ``n_samples`` stratified samples; empty space is handled by the
  density MLP, not by data-dependent early-exit (which XLA cannot tile).
* **Volume rendering as dense tensor algebra**: transmittance is an
  exclusive cumulative product along the sample axis — one
  ``jnp.cumsum`` in log space — so the whole render is matmuls +
  elementwise ops on the MXU/VPU, batched over (rays x samples).
* **Audio conditioning** enters as a per-frame latent concatenated to
  every sample's feature vector (the ER-NeRF "audio feature" input),
  produced by a small MLP over the per-frame HuBERT/mel window.

All functions are pure; ``render_frame_batch`` jits end-to-end.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------


def init_params(key, plane_res: int = 128, plane_ch: int = 16,
                audio_dim: int = 512, audio_lat: int = 32,
                hidden: int = 64, dtype=jnp.float32) -> Dict[str, Any]:
    """Triplane + MLP parameter pytree.

    plane_res/plane_ch: triplane resolution and channel count.
    audio_dim: flattened per-frame audio feature window size.
    """
    ks = jax.random.split(key, 8)

    def dense(k, fan_in, fan_out):
        w = jax.random.normal(k, (fan_in, fan_out), dtype) * (fan_in ** -0.5)
        return {"w": w, "b": jnp.zeros((fan_out,), dtype)}

    feat_in = 3 * plane_ch + audio_lat
    return {
        "planes": 0.1 * jax.random.normal(ks[0], (3, plane_res, plane_res, plane_ch), dtype),
        "audio1": dense(ks[1], audio_dim, 128),
        "audio2": dense(ks[2], 128, audio_lat),
        "trunk1": dense(ks[3], feat_in, hidden),
        "trunk2": dense(ks[4], hidden, hidden),
        "sigma": dense(ks[5], hidden, 1),
        "color1": dense(ks[6], hidden + 3, hidden),   # + view direction
        "color2": dense(ks[7], hidden, 3),
    }


def _apply_dense(p, x):
    return x @ p["w"] + p["b"]


def audio_encoder(params, audio_feat: jnp.ndarray) -> jnp.ndarray:
    """(B, audio_dim) flattened feature window -> (B, audio_lat)."""
    h = jax.nn.relu(_apply_dense(params["audio1"], audio_feat))
    return jnp.tanh(_apply_dense(params["audio2"], h))


# ---------------------------------------------------------------------------
# triplane sampling
# ---------------------------------------------------------------------------


def _bilinear_plane(plane: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample a (R, R, C) plane at continuous uv in [-1, 1]^2.

    uv: (..., 2). Returns (..., C). Four-tap gather + lerp; indices are
    clamped to the edge (border replicate).
    """
    R = plane.shape[0]
    p = (uv + 1.0) * 0.5 * (R - 1)          # to pixel coords
    p0 = jnp.floor(p)
    f = p - p0
    i0 = jnp.clip(p0.astype(jnp.int32), 0, R - 1)
    i1 = jnp.clip(i0 + 1, 0, R - 1)

    flat = plane.reshape(R * R, -1)

    def tap(iy, ix):
        return jnp.take(flat, iy * R + ix, axis=0)

    v00 = tap(i0[..., 1], i0[..., 0])
    v01 = tap(i0[..., 1], i1[..., 0])
    v10 = tap(i1[..., 1], i0[..., 0])
    v11 = tap(i1[..., 1], i1[..., 0])
    fx = f[..., 0:1]
    fy = f[..., 1:2]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def triplane_features(planes: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """(3, R, R, C) planes, (..., 3) points in [-1,1]^3 -> (..., 3C)."""
    f_xy = _bilinear_plane(planes[0], xyz[..., (0, 1)])
    f_xz = _bilinear_plane(planes[1], xyz[..., (0, 2)])
    f_yz = _bilinear_plane(planes[2], xyz[..., (1, 2)])
    return jnp.concatenate([f_xy, f_xz, f_yz], axis=-1)


# ---------------------------------------------------------------------------
# field evaluation + volume rendering
# ---------------------------------------------------------------------------


def field(params, xyz, view_dir, audio_lat):
    """Evaluate density + color at sample points.

    xyz: (..., 3); view_dir/audio_lat broadcast along sample axes.
    Returns (sigma (...,), rgb (..., 3)).
    """
    feats = triplane_features(params["planes"], xyz)
    a = jnp.broadcast_to(audio_lat, feats.shape[:-1] + audio_lat.shape[-1:])
    h = jax.nn.relu(_apply_dense(params["trunk1"], jnp.concatenate([feats, a], -1)))
    h = jax.nn.relu(_apply_dense(params["trunk2"], h))
    sigma = jax.nn.softplus(_apply_dense(params["sigma"], h)[..., 0] - 1.0)
    d = jnp.broadcast_to(view_dir, h.shape[:-1] + (3,))
    hc = jax.nn.relu(_apply_dense(params["color1"], jnp.concatenate([h, d], -1)))
    rgb = jax.nn.sigmoid(_apply_dense(params["color2"], hc))
    return sigma, rgb


def render_rays(params, rays_o, rays_d, audio_lat, *, n_samples: int = 32,
                near: float = 0.5, far: float = 2.5):
    """Volume-render a bundle of rays.

    rays_o/rays_d: (R, 3); audio_lat: (audio_lat,) per-frame latent.
    Returns (rgb (R, 3), alpha (R,)) with white = fully transparent
    handled by the caller compositing over a background.
    """
    R = rays_o.shape[0]
    t = jnp.linspace(near, far, n_samples)                       # (N,)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[None, :, None]
    dirs = rays_d[:, None, :]

    sigma, rgb = field(params, pts, dirs, audio_lat[None, None, :])
    delta = (far - near) / n_samples
    # transmittance: exclusive cumprod of exp(-sigma*delta), via cumsum in log
    tau = sigma * delta                                          # (R, N)
    trans = jnp.exp(-jnp.concatenate(
        [jnp.zeros((R, 1), tau.dtype), jnp.cumsum(tau, -1)[:, :-1]], -1))
    weights = trans * (1.0 - jnp.exp(-tau))                      # (R, N)
    out_rgb = jnp.sum(weights[..., None] * rgb, axis=1)          # (R, 3)
    alpha = jnp.sum(weights, axis=1)                             # (R,)
    return out_rgb, alpha


def make_frame_rays(size: int, fov: float = 0.45):
    """Static pinhole ray grid for an (size, size) head crop, camera on
    the +z axis looking at the origin."""
    i = (np.arange(size) + 0.5) / size * 2 - 1
    xs, ys = np.meshgrid(i, i)
    dirs = np.stack([xs * fov, ys * fov, -np.ones_like(xs)], -1)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(np.array([0.0, 0.0, 2.0]), dirs.shape)
    return (jnp.asarray(origins.reshape(-1, 3), jnp.float32),
            jnp.asarray(dirs.reshape(-1, 3), jnp.float32))


@functools.partial(jax.jit, static_argnames=("size", "n_samples", "ray_chunk"))
def render_frame_batch(params, audio_feats, bg_crops, *, size: int = 64,
                       n_samples: int = 32, ray_chunk: int = 4096):
    """Render B audio-conditioned head crops composited over backgrounds.

    audio_feats: (B, audio_dim) flattened feature windows.
    bg_crops: (B, size, size, 3) float32 in [0, 1].
    Returns (B, size, size, 3) uint8.
    """
    rays_o, rays_d = make_frame_rays(size)
    lat = audio_encoder(params, audio_feats)                     # (B, A)

    def one(lat_b, bg_b):
        rgb, alpha = render_rays(params, rays_o, rays_d, lat_b,
                                 n_samples=n_samples)
        img = rgb.reshape(size, size, 3)
        a = alpha.reshape(size, size, 1)
        return img * a + bg_b * (1.0 - a)

    out = jax.vmap(one)(lat, bg_crops)
    return jnp.clip(jnp.rint(out * 255.0), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# training step (photometric regression toward target crops)
# ---------------------------------------------------------------------------


def make_train_step(lr: float = 1e-3, size: int = 64, n_samples: int = 32):
    import optax

    tx = optax.adam(lr)

    def loss_fn(params, audio_feats, bg, target):
        rays_o, rays_d = make_frame_rays(size)
        lat = audio_encoder(params, audio_feats)

        def one(lat_b, bg_b):
            rgb, alpha = render_rays(params, rays_o, rays_d, lat_b,
                                     n_samples=n_samples)
            img = rgb.reshape(size, size, 3)
            a = alpha.reshape(size, size, 1)
            return img * a + bg_b * (1.0 - a)

        pred = jax.vmap(one)(lat, bg)
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def step(params, opt_state, audio_feats, bg, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, audio_feats, bg, target)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return tx, step
