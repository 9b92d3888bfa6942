"""Shared functional conv layers (NHWC / HWIO), TPU-first.

Design notes:
  - Everything is inference-graph oriented: BatchNorm is folded into the
    preceding conv at weight-conversion/init time (scale into ``w``, shift
    into ``b``), so the runtime graph is pure conv+bias+act — fewer HBM
    round-trips and XLA fuses the add+relu into the conv epilogue.
  - ``conv_transpose2d`` implements torch ConvTranspose2d semantics via an
    input-dilated convolution with a spatially-flipped kernel, which lowers
    to a plain MXU convolution.
  - Compute dtype is the activation dtype (bf16 by default); accumulation
    is float32 via ``preferred_element_type``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DIMS = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """One conv (+folded BN) (+activation) layer.

    ``residual`` adds the layer input before the activation
    (reference avatars/wav2lip/models/conv.py:16-19).
    """

    cin: int
    cout: int
    kernel: Any = 3
    stride: Any = 1
    padding: Any = 1
    residual: bool = False
    transpose: bool = False
    output_padding: Any = 0
    bn: bool = True  # whether the torch layer had a BatchNorm to fold
    act: Optional[str] = "relu"  # relu | sigmoid | leaky | None
    groups: int = 1  # feature groups (groups == cin -> depthwise)


def init_conv_params(key: jax.Array, spec: ConvSpec, dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """He-normal init; BN-identity at init so folded == plain conv."""
    kh, kw = _pair(spec.kernel)
    fan_in = (spec.cin // spec.groups) * kh * kw
    std = math.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (kh, kw, spec.cin // spec.groups, spec.cout), jnp.float32) * std
    return {"w": w.astype(dtype), "b": jnp.zeros((spec.cout,), dtype)}


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride, padding, groups: int = 1) -> jnp.ndarray:
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=DIMS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return y + b.astype(jnp.float32)


def conv_transpose2d(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, kernel, stride, padding, output_padding
) -> jnp.ndarray:
    """torch.nn.ConvTranspose2d(k, s, p, op) as an lhs-dilated convolution.

    The kernel ``w`` is expected already flipped+transposed to HWIO by the
    converter/init (see ``torch_tconv_to_hwio``), so this is a standard
    convolution with input dilation ``s`` and padding ``k-1-p`` low,
    ``k-1-p+op`` high — which reproduces
    out = (in-1)*s - 2p + k + op exactly.
    """
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=DIMS,
        preferred_element_type=jnp.float32,
    )
    return y + b.astype(jnp.float32)


def apply_conv_layer(p: Dict[str, jnp.ndarray], spec: ConvSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Run one ConvSpec layer: conv/tconv -> (+residual) -> activation."""
    dtype = x.dtype
    if spec.transpose:
        y = conv_transpose2d(x, p["w"], p["b"], spec.kernel, spec.stride, spec.padding, spec.output_padding)
    else:
        y = conv2d(x, p["w"], p["b"], spec.stride, spec.padding, spec.groups)
    if spec.residual:
        y = y + x.astype(jnp.float32)
    if spec.act == "relu":
        y = jax.nn.relu(y)
    elif spec.act == "sigmoid":
        y = jax.nn.sigmoid(y)
    elif spec.act == "leaky":
        y = jax.nn.leaky_relu(y, 0.01)
    return y.astype(dtype)


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsampling with torch ``align_corners=True`` semantics.

    Implemented as two small dense interpolation matmuls (one per spatial
    axis) so it rides the MXU instead of a gather; matrices are baked as
    constants per (in, out) size.
    """

    def interp_matrix(n_in: int) -> np.ndarray:
        n_out = 2 * n_in
        m = np.zeros((n_out, n_in), np.float32)
        if n_in == 1:
            m[:, 0] = 1.0
            return m
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(np.float32)
        m[np.arange(n_out), lo] += 1.0 - frac
        m[np.arange(n_out), hi] += frac
        return m

    B, H, W, C = x.shape
    mh = jnp.asarray(interp_matrix(H), x.dtype)
    mw = jnp.asarray(interp_matrix(W), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y, preferred_element_type=jnp.float32).astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# torch -> JAX weight conversion helpers (host-side numpy; no torch import)
# ---------------------------------------------------------------------------

def torch_conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_tconv_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flipped HWIO.

    Spatial flip + IO ordering so the lhs-dilated convolution in
    ``conv_transpose2d`` matches torch's transposed convolution.
    """
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def fold_bn(
    w_hwio: np.ndarray,
    b: Optional[np.ndarray],
    gamma: np.ndarray,
    beta: np.ndarray,
    mean: np.ndarray,
    var: np.ndarray,
    eps: float = 1e-5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BatchNorm(gamma, beta, mean, var) into conv (w, b).

    y = gamma * (conv(x) + b - mean) / sqrt(var + eps) + beta
      = conv(x) * s + (b - mean) * s + beta,  s = gamma / sqrt(var + eps)
    """
    s = gamma / np.sqrt(var + eps)
    w2 = w_hwio * s[None, None, None, :]
    b0 = b if b is not None else np.zeros_like(mean)
    b2 = (b0 - mean) * s + beta
    return w2, b2


# -- shared transformer/conversion primitives --------------------------------
# (single home for helpers previously duplicated across whisper/hubert/
# ultralight/wav2lip/diffusion_blocks)

def to_numpy(v) -> np.ndarray:
    """torch tensor or array-like -> np.ndarray (checkpoint converters)."""
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def linear_f32(p, x):
    """x @ w + b with f32 accumulation, output in x.dtype."""
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if p.get("b") is not None:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_f32(p, x, eps):
    """LayerNorm with f32 statistics, gamma/beta keys 'g'/'b'."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def gelu_exact(x):
    """Non-approximate GELU in f32 (HF default), output in x.dtype."""
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
