"""Fused on-device paste-back: bilinear resize + feathered blend + paste.

The reference composes frames on the host per frame (reference
avatars/wav2lip_avatar.py:141-147 ``cv2.resize`` + rect overwrite;
avatars/musetalk/myutil.py:4-26 feathered blend).  Here the whole
composite runs on the TPU as one fused batched step so full frames never
leave HBM between the U-Net forward and the egress encode:

    gather full frame by cycle index
    -> bilinear-resize the (S, S) predicted mouth crop into its bbox
    -> feathered alpha blend against the frame background
    -> dynamic_update_slice the blended crop back into the frame

TPU-native formulation
----------------------
Bilinear resize is expressed as two small matmuls (separable
interpolation): ``crop = Rv @ pred @ Rh`` with ``Rv: (Ho, S)`` and
``Rh: (S, Wo)``.  On the MXU these dense matmuls cost microseconds; the
trick is that **the interpolation matrices are built inside the kernel**
from four scalars (bbox height/width and its offset inside the padded
crop) using ``relu(1 - |pos_i - j|)`` — bilinear weights are exactly the
unit triangle kernel — so nothing is precomputed or stored per frame.
The feather mask is likewise computed in-kernel from edge distances.

Because every session's bbox differs per cycle frame, bbox geometry
arrives as a scalar-prefetch array (SMEM) so block index maps stay
static; the crop is padded to a per-avatar static bucket
``(Ho, Wo)`` = (next multiple of 8, next multiple of 128) ≥ the largest
bbox in the cycle, keeping XLA shapes static across the session.

A pure-XLA twin (``resize_paste_xla``) with identical numerics serves as
the CPU fallback and the test oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pallas unavailable: the XLA twin still works
    pl = None
    pltpu = None

__all__ = [
    "make_resize_paste_fn",
    "make_masked_paste_fn",
    "resize_paste_xla",
    "DevicePasteBack",
    "MaskedDevicePasteBack",
    "prepare_masked_paste_data",
    "bucket_shape",
]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bucket_shape(coords: Sequence[Tuple[int, int, int, int]]) -> Tuple[int, int]:
    """Static padded crop bucket covering every bbox in a cycle.

    coords entries are reference-format ``(y1, y2, x1, x2)``.
    """
    max_h = max(int(y2) - int(y1) for y1, y2, x1, x2 in coords)
    max_w = max(int(x2) - int(x1) for y1, y2, x1, x2 in coords)
    return _round_up(max(max_h, 8), 8), _round_up(max(max_w, 128), 128)


def _interp_matrix(dst_pos: jnp.ndarray, src_n: int, axis_shape, dst_axis: int):
    """Bilinear weight matrix rows from fractional source positions.

    W[d, j] = relu(1 - |dst_pos[d] - j|); invalid rows carry pos = -2 so
    every weight is zero.  Built with broadcasted_iota (TPU needs >= 2D).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, axis_shape,
                                 dimension=1 - dst_axis).astype(jnp.float32)
    pos = jnp.expand_dims(dst_pos, axis=1 - dst_axis)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - j))


def _src_positions(n_out: int, h: jnp.ndarray, off: jnp.ndarray, src_n: int):
    """Half-pixel-center source positions for each padded-crop row/col.

    i-th output pixel of an ``src_n -> h`` resize samples
    ``(i + 0.5) * src_n / h - 0.5`` (cv2.INTER_LINEAR convention), clamped
    to the edge.  Rows outside ``[off, off + h)`` get pos = -2 (zero weight).
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)[:, 0]
    i = (r - off).astype(jnp.float32)
    scale = jnp.float32(src_n) / jnp.maximum(h.astype(jnp.float32), 1.0)
    pos = (i + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, float(src_n - 1))
    valid = (r >= off) & (r < off + h)
    return jnp.where(valid, pos, -2.0), valid


def _feather_alpha(n_out: int, h: jnp.ndarray, off: jnp.ndarray, feather: int):
    """Per-row (or col) blend alpha: 0 outside the bbox, ramping 0->1 over
    ``feather`` pixels from each bbox edge (0 = hard rectangle)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)[:, 0]
    i = r - off
    inside = (i >= 0) & (i < h)
    if feather <= 0:
        return inside.astype(jnp.float32)
    d = jnp.minimum(i, h - 1 - i).astype(jnp.float32)
    return jnp.where(inside, jnp.clip((d + 1.0) / float(feather), 0.0, 1.0), 0.0)


def _blend_kernel(scal_ref, pred_ref, bg_ref, out_ref, *, S: int, Ho: int,
                  Wo: int, feather: int):
    """One grid step = one batch item: resize pred into its bbox inside the
    (Ho, Wo) padded crop and alpha-blend over the background crop."""
    b = pl.program_id(0)
    h = scal_ref[b, 0]
    w = scal_ref[b, 1]
    dy = scal_ref[b, 2]
    dx = scal_ref[b, 3]

    pos_y, _ = _src_positions(Ho, h, dy, S)
    pos_x, _ = _src_positions(Wo, w, dx, S)
    rv = _interp_matrix(pos_y, S, (Ho, S), dst_axis=0)   # (Ho, S)
    rh = _interp_matrix(pos_x, S, (S, Wo), dst_axis=1)   # (S, Wo)

    ay = _feather_alpha(Ho, h, dy, feather)
    ax = _feather_alpha(Wo, w, dx, feather)
    alpha = ay[:, None] * ax[None, :]                     # (Ho, Wo)

    for c in range(3):
        t = jnp.dot(rv, pred_ref[0, c], preferred_element_type=jnp.float32)
        resized = jnp.dot(t, rh, preferred_element_type=jnp.float32)
        out_ref[0, c] = alpha * resized + (1.0 - alpha) * bg_ref[0, c]


def _blend_kernel_input_mask(scal_ref, pred_ref, bg_ref, mask_ref, out_ref, *,
                             S: int, Ho: int, Wo: int):
    """Input-mask variant: alpha comes from a per-item precomputed mask
    (e.g. MuseTalk's feathered face-parse mask, reference
    avatars/musetalk/myutil.py:4-26) that is already zero outside the
    bbox; geometry scalars only drive the resize matrices."""
    b = pl.program_id(0)
    h = scal_ref[b, 0]
    w = scal_ref[b, 1]
    dy = scal_ref[b, 2]
    dx = scal_ref[b, 3]

    pos_y, _ = _src_positions(Ho, h, dy, S)
    pos_x, _ = _src_positions(Wo, w, dx, S)
    rv = _interp_matrix(pos_y, S, (Ho, S), dst_axis=0)
    rh = _interp_matrix(pos_x, S, (S, Wo), dst_axis=1)
    alpha = mask_ref[0]

    for c in range(3):
        t = jnp.dot(rv, pred_ref[0, c], preferred_element_type=jnp.float32)
        resized = jnp.dot(t, rh, preferred_element_type=jnp.float32)
        out_ref[0, c] = alpha * resized + (1.0 - alpha) * bg_ref[0, c]


def _blend_pallas_input_mask(scalars, pred_cf, bg_cf, alpha, *, S, Ho, Wo,
                             interpret):
    B = pred_cf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, S, S), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Ho, Wo), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, Ho, Wo), lambda b, s: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_blend_kernel_input_mask, S=S, Ho=Ho, Wo=Wo)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, Ho, Wo), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * 3 * 2 * (Ho * S * S + Ho * Wo * S),
            bytes_accessed=B * 4 * (3 * S * S + 7 * Ho * Wo),
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, pred_cf, bg_cf, alpha)


def _blend_xla_input_mask(scalars, pred_cf, bg_cf, alpha, *, S, Ho, Wo):
    h, w, dy, dx = (scalars[:, i] for i in range(4))

    def per_item(h, w, dy, dx, pred, bg, a):
        pos_y, _ = _src_positions(Ho, h, dy, S)
        pos_x, _ = _src_positions(Wo, w, dx, S)
        rv = _interp_matrix(pos_y, S, (Ho, S), dst_axis=0)
        rh = _interp_matrix(pos_x, S, (S, Wo), dst_axis=1)
        resized = jnp.einsum("hs,csj,jw->chw", rv, pred, rh)
        return a[None] * resized + (1.0 - a[None]) * bg

    return jax.vmap(per_item)(h, w, dy, dx, pred_cf, bg_cf, alpha)


def _blend_pallas(scalars, pred_cf, bg_cf, *, S, Ho, Wo, feather, interpret):
    B = pred_cf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, S, S), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Ho, Wo), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, Ho, Wo), lambda b, s: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_blend_kernel, S=S, Ho=Ho, Wo=Wo, feather=feather)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, Ho, Wo), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * 3 * 2 * (Ho * S * S + Ho * Wo * S),
            bytes_accessed=B * 3 * 4 * (S * S + 2 * Ho * Wo),
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, pred_cf, bg_cf)


def _blend_xla_math(scalars, pred_cf, bg_cf, *, S, Ho, Wo, feather):
    """Identical math to the kernel, in batched XLA ops (CPU fallback)."""
    h, w, dy, dx = (scalars[:, i] for i in range(4))

    def per_item(h, w, dy, dx, pred, bg):
        pos_y, _ = _src_positions(Ho, h, dy, S)
        pos_x, _ = _src_positions(Wo, w, dx, S)
        rv = _interp_matrix(pos_y, S, (Ho, S), dst_axis=0)
        rh = _interp_matrix(pos_x, S, (S, Wo), dst_axis=1)
        ay = _feather_alpha(Ho, h, dy, feather)
        ax = _feather_alpha(Wo, w, dx, feather)
        alpha = ay[:, None] * ax[None, :]
        resized = jnp.einsum("hs,csj,jw->chw", rv, pred, rh)
        return alpha[None] * resized + (1.0 - alpha[None]) * bg

    return jax.vmap(per_item)(h, w, dy, dx, pred_cf, bg_cf)


def _paste_step(params_unused, pred_u8, frames_u8, idxs, boxes, *, S, Ho, Wo,
                H, W, feather, use_pallas, interpret):
    """Full device composite: gather -> resize/blend crop -> paste."""
    picked = jnp.take(frames_u8, idxs, axis=0)            # (B, H, W, 3) uint8
    box = jnp.take(boxes, idxs, axis=0).astype(jnp.int32)  # (B, 4) y1,y2,x1,x2
    y1, y2, x1, x2 = box[:, 0], box[:, 1], box[:, 2], box[:, 3]
    h = jnp.clip(y2 - y1, 1, Ho)
    w = jnp.clip(x2 - x1, 1, Wo)
    oy = jnp.clip(y1, 0, H - Ho)
    ox = jnp.clip(x1, 0, W - Wo)
    scalars = jnp.stack([h, w, y1 - oy, x1 - ox], axis=1).astype(jnp.int32)

    bg = jax.vmap(
        lambda f, oy, ox: jax.lax.dynamic_slice(f, (oy, ox, 0), (Ho, Wo, 3))
    )(picked, oy, ox)
    bg_cf = bg.astype(jnp.float32).transpose(0, 3, 1, 2)
    pred_cf = pred_u8.astype(jnp.float32).transpose(0, 3, 1, 2)

    if use_pallas:
        crop = _blend_pallas(scalars, pred_cf, bg_cf, S=S, Ho=Ho, Wo=Wo,
                             feather=feather, interpret=interpret)
    else:
        crop = _blend_xla_math(scalars, pred_cf, bg_cf, S=S, Ho=Ho, Wo=Wo,
                               feather=feather)
    crop_u8 = jnp.clip(jnp.rint(crop), 0, 255).astype(jnp.uint8).transpose(0, 2, 3, 1)

    return jax.vmap(
        lambda f, c, oy, ox: jax.lax.dynamic_update_slice(f, c, (oy, ox, 0))
    )(picked, crop_u8, oy, ox)


def make_resize_paste_fn(S: int, Ho: int, Wo: int, H: int, W: int,
                         feather: int = 0, use_pallas: Optional[bool] = None,
                         interpret: bool = False):
    """Build the jitted batched paste-back step.

    Returns ``fn(pred_u8 (B,S,S,3), frames_u8 (N,H,W,3), idxs (B,),
    boxes (N,4)) -> (B,H,W,3) uint8`` full frames.  ``use_pallas=None``
    auto-selects the Pallas kernel on TPU and the XLA twin elsewhere.
    """
    if Ho > H or Wo > W:
        raise ValueError(f"crop bucket ({Ho},{Wo}) exceeds frame ({H},{W})")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    step = functools.partial(_paste_step, None, S=S, Ho=Ho, Wo=Wo, H=H, W=W,
                             feather=feather, use_pallas=use_pallas,
                             interpret=interpret)
    return jax.jit(step)


def make_masked_paste_fn(S: int, Ho: int, Wo: int, H: int, W: int,
                         use_pallas: Optional[bool] = None,
                         interpret: bool = False):
    """Masked-variant step for per-index precomputed alpha masks.

    Returns ``fn(pred_u8 (B,S,S,3), frames_u8 (N,H,W,3), idxs (B,),
    origins (N,2) i32, scalars (N,4) i32, masks_u8 (N,Ho,Wo))
    -> (B,H,W,3) uint8``. ``origins`` are clamped paste origins (oy, ox);
    ``scalars`` are (h, w, dy, dx) bbox geometry relative to the origin;
    ``masks_u8`` must be zero outside the bbox.
    """
    if Ho > H or Wo > W:
        raise ValueError(f"crop bucket ({Ho},{Wo}) exceeds frame ({H},{W})")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def step(pred_u8, frames_u8, idxs, origins, scalars, masks_u8):
        picked = jnp.take(frames_u8, idxs, axis=0)
        org = jnp.take(origins, idxs, axis=0)
        scal = jnp.take(scalars, idxs, axis=0)
        alpha = jnp.take(masks_u8, idxs, axis=0).astype(jnp.float32) / 255.0
        oy, ox = org[:, 0], org[:, 1]

        bg = jax.vmap(
            lambda f, oy, ox: jax.lax.dynamic_slice(f, (oy, ox, 0), (Ho, Wo, 3))
        )(picked, oy, ox)
        bg_cf = bg.astype(jnp.float32).transpose(0, 3, 1, 2)
        pred_cf = pred_u8.astype(jnp.float32).transpose(0, 3, 1, 2)

        if use_pallas:
            crop = _blend_pallas_input_mask(scal, pred_cf, bg_cf, alpha,
                                            S=S, Ho=Ho, Wo=Wo,
                                            interpret=interpret)
        else:
            crop = _blend_xla_input_mask(scal, pred_cf, bg_cf, alpha,
                                         S=S, Ho=Ho, Wo=Wo)
        crop_u8 = (jnp.clip(jnp.rint(crop), 0, 255)
                   .astype(jnp.uint8).transpose(0, 2, 3, 1))
        return jax.vmap(
            lambda f, c, oy, ox: jax.lax.dynamic_update_slice(f, c, (oy, ox, 0))
        )(picked, crop_u8, oy, ox)

    return jax.jit(step)


def resize_paste_xla(pred_u8, frames_u8, idxs, boxes, *, S, Ho, Wo, H, W,
                     feather=0):
    """Un-jitted pure-XLA twin (test oracle)."""
    return _paste_step(None, pred_u8, frames_u8, jnp.asarray(idxs),
                       jnp.asarray(boxes), S=S, Ho=Ho, Wo=Wo, H=H, W=W,
                       feather=feather, use_pallas=False, interpret=False)


class DevicePasteBack:
    """Per-avatar device-resident composite path.

    Uploads the full-frame cycle once, derives the static crop bucket from
    the coord cycle, and exposes ``paste_batch`` which keeps the model
    output on device through resize/blend/paste and returns finished full
    frames (one D2H copy per batch).
    """

    def __init__(self, frames: np.ndarray, coords, S: int,
                 feather: int = 0, use_pallas: Optional[bool] = None,
                 interpret: bool = False):
        self.S = S
        N, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
        self.Ho, self.Wo = bucket_shape(coords)
        self.available = self.Ho <= H and self.Wo <= W
        if not self.available:
            return
        self.frames_dev = jnp.asarray(frames.astype(np.uint8))
        self.boxes_dev = jnp.asarray(
            np.asarray([[y1, y2, x1, x2] for (y1, y2, x1, x2) in coords],
                       dtype=np.int32))
        self._fn = make_resize_paste_fn(S, self.Ho, self.Wo, H, W,
                                        feather=feather,
                                        use_pallas=use_pallas,
                                        interpret=interpret)

    def paste_batch(self, pred_u8, idxs: np.ndarray) -> np.ndarray:
        """(B,S,S,3) uint8 device/host crops + (B,) indices -> (B,H,W,3)."""
        out = self._fn(jnp.asarray(pred_u8), self.frames_dev,
                       jnp.asarray(idxs, dtype=jnp.int32), self.boxes_dev)
        return np.asarray(out)


def prepare_masked_paste_data(face_boxes, crop_boxes, mask_imgs,
                              Ho: int, Wo: int, H: int, W: int):
    """Precompute per-cycle-index masked-paste geometry against a given
    (Ho, Wo) crop bucket: the clamped paste origin, the bbox geometry
    scalars, and an (Ho, Wo) uint8 alpha buffer = parse mask restricted
    to the bbox (outside the bbox the reference blend is identity, so
    alpha is zeroed there — reference avatars/musetalk/myutil.py:4-26).

    Returns ``(origins (N,2) i32, scalars (N,4) i32, masks (N,Ho,Wo)
    u8)``. Raises ``ValueError`` when a crop box exceeds the bucket —
    callers sharing a bucket across avatars (the coalesced scheduler)
    must surface that as a session-config error."""
    import cv2

    N = len(face_boxes)
    origins = np.zeros((N, 2), np.int32)
    scalars = np.zeros((N, 4), np.int32)
    masks = np.zeros((N, Ho, Wo), np.uint8)
    for i, ((x, y, x1, y1), (xs, ys, xe, ye), m) in enumerate(
            zip(face_boxes, crop_boxes, mask_imgs)):
        if ye - ys > Ho or xe - xs > Wo:
            raise ValueError(
                f"crop box {xe - xs}x{ye - ys} (index {i}) exceeds the "
                f"paste bucket {Wo}x{Ho}")
        oy = int(np.clip(ys, 0, H - Ho))
        ox = int(np.clip(xs, 0, W - Wo))
        origins[i] = (oy, ox)
        scalars[i] = (y1 - y, x1 - x, y - oy, x - ox)
        g = m if m.ndim == 2 else cv2.cvtColor(m, cv2.COLOR_BGR2GRAY)
        if g.shape != (ye - ys, xe - xs):
            g = cv2.resize(g, (xe - xs, ye - ys))
        buf = np.zeros((Ho, Wo), np.uint8)
        buf[ys - oy:ye - oy, xs - ox:xe - ox] = g
        # outside the bbox the reference blend is identity: zero alpha
        keep = np.zeros_like(buf)
        keep[y - oy:y1 - oy, x - ox:x1 - ox] = 1
        masks[i] = buf * keep
    return origins, scalars, masks


class MaskedDevicePasteBack:
    """MuseTalk-shaped device composite: per-cycle-index feathered
    face-parse masks inside a larger crop box (reference
    avatars/musetalk/myutil.py:4-26 + musetalk_avatar.py:154-164).

    Precomputes the geometry via ``prepare_masked_paste_data``.
    Everything is device-resident; ``paste_batch`` gathers by index on
    device.
    """

    def __init__(self, frames: np.ndarray, face_boxes, crop_boxes, mask_imgs,
                 S: int, use_pallas: Optional[bool] = None,
                 interpret: bool = False):
        N, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
        self.Ho, self.Wo = bucket_shape(
            [(ys, ye, xs, xe) for (xs, ys, xe, ye) in crop_boxes])
        self.available = self.Ho <= H and self.Wo <= W
        if not self.available:
            return

        origins, scalars, masks = prepare_masked_paste_data(
            face_boxes, crop_boxes, mask_imgs, self.Ho, self.Wo, H, W)

        self.frames_dev = jnp.asarray(frames.astype(np.uint8))
        self.origins_dev = jnp.asarray(origins)
        self.scalars_dev = jnp.asarray(scalars)
        self.masks_dev = jnp.asarray(masks)
        self._fn = make_masked_paste_fn(S, self.Ho, self.Wo, H, W,
                                        use_pallas=use_pallas,
                                        interpret=interpret)

    def paste_batch(self, pred_u8, idxs: np.ndarray) -> np.ndarray:
        out = self._fn(jnp.asarray(pred_u8), self.frames_dev,
                       jnp.asarray(idxs, dtype=jnp.int32),
                       self.origins_dev, self.scalars_dev, self.masks_dev)
        return np.asarray(out)
