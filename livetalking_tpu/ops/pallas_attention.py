"""Single-tile VMEM attention kernel for the short token sequences of the
SD-family transformer blocks.

MuseTalk's latent U-Net runs self-attention over T = H*W latent tokens
(1024 at the 32x32 level; the reference reaches this graph through
diffusers' BasicTransformerBlock, reference avatars/musetalk/models/
unet.py:30-47), and the VAE mid-block attends over 1024 tokens at 512
channels (reference avatars/musetalk/models/vae.py:24). XLA's einsum
attention materializes the (B, heads, T, T) f32 score tensor in HBM for
every block — ~0.5 GB per level-0 U-Net block at B=16, ~1.6 GB of HBM
traffic with the softmax round-trips — so attention is bandwidth-bound
(measured 1.59 ms/block on v5e vs ~0.12 ms of matmul ideal).

At these sizes the WHOLE per-(batch, head) problem fits in VMEM, so this
kernel computes scores -> softmax -> AV on-chip in one grid step per
(batch*head), touching HBM only for q/k/v/o. No online-softmax tiling is
needed (that is what makes the generic pallas flash_attention kernel a
poor fit here: measured 3.99 ms at (16,8,1024,40) from its block-K
recompute and head-dim padding overhead, vs 1.59 ms XLA and ~0.5 ms for
this kernel).

Head dims are zero-padded to the 128-lane multiple inside the wrapper;
zero K columns contribute zero scores and zero V columns produce output
columns that are sliced off, so padding is exact.

The pure-XLA twin (``attention_xla``) has identical numerics (f32
scores/softmax) and serves as the CPU fallback and test oracle;
``interpret=True`` runs the Pallas kernel on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    import jax.experimental.pallas as pl
except ImportError:  # pallas unavailable: the XLA twin still works
    pl = None

__all__ = ["vmem_attention", "attention_xla", "vmem_attention_fits"]

# per-core VMEM is ~16 MB on v5e; the kernel holds q/k/v/o tiles
# (4*T*Dp*2 bytes) plus the f32 score matrix and its exp (2*T*T*4 bytes)
_VMEM_BUDGET = 14 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def vmem_attention_fits(T: int, D: int, itemsize: int = 2) -> bool:
    """True when the single-tile kernel's working set fits VMEM AND the
    sequence is long enough for the HBM-traffic win to matter (short-T
    score tensors are small; XLA's einsum path is already fine there and
    skipping the kernel keeps compiled programs lean). ``itemsize`` is
    the q/k/v dtype width in bytes (scores/exp are always f32)."""
    if T < 512:
        return False
    Dp = _round_up(max(D, 1), 128)
    tiles = 4 * T * Dp * itemsize
    scores = 2 * T * T * 4
    return tiles + scores <= _VMEM_BUDGET


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  sm_scale: float) -> jnp.ndarray:
    """(B, H, T, D) x3 -> (B, H, T, D); f32 scores/softmax, einsum path."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", a, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float):
    q = q_ref[0]  # (T, Dp)
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    a = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0] = jnp.dot(a, v, preferred_element_type=jnp.float32).astype(v.dtype)


def _pallas_forward(q, k, v, sm_scale: float, interpret: bool):
    B, H, T, D = q.shape
    Dp = _round_up(D, 128)
    pad = ((0, 0), (0, 0), (0, 0), (0, Dp - D))

    def prep(t):
        return jnp.pad(t, pad).reshape(B * H, T, Dp)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale),
        grid=(B * H,),
        in_specs=[pl.BlockSpec((1, T, Dp), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, T, Dp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dp), q.dtype),
        interpret=interpret,
    )(prep(q), prep(k), prep(v))
    return out.reshape(B, H, T, Dp)[..., :D]


# pallas_call has no VJP rule, so the kernel carries a custom one: the
# backward pass recomputes scores/softmax in XLA f32 (standard attention
# backward) — training through sd_unet.apply / sd_vae.decode on TPU
# differentiates cleanly while inference keeps the kernel forward.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attn_pallas(q, k, v, sm_scale: float, interpret: bool):
    return _pallas_forward(q, k, v, sm_scale, interpret)


def _attn_pallas_fwd(q, k, v, sm_scale, interpret):
    return _pallas_forward(q, k, v, sm_scale, interpret), (q, k, v)


def _attn_pallas_bwd(sm_scale, interpret, res, do):
    q, k, v = res
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    a = jax.nn.softmax(s, axis=-1)  # f32
    do_f = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", a, do_f)
    da = jnp.einsum("bhqd,bhkd->bhqk", do_f, v.astype(jnp.float32))
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * sm_scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * sm_scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attn_pallas.defvjp(_attn_pallas_fwd, _attn_pallas_bwd)


def vmem_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   sm_scale: float, *,
                   interpret: bool = False,
                   use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Dense non-causal attention, (B, H, T, D) x3 -> (B, H, T, D).

    Takes the single-tile Pallas path on TPU when the working set fits
    VMEM (vmem_attention_fits), else the XLA twin. ``use_pallas``
    overrides the auto-selection; ``interpret=True`` runs the kernel on
    CPU for tests. Differentiable either way (custom VJP on the kernel).
    """
    B, H, T, D = q.shape
    if use_pallas is None:
        use_pallas = (pl is not None and not interpret
                      and jax.default_backend() == "tpu"
                      and vmem_attention_fits(T, D, q.dtype.itemsize))
    if not (use_pallas or interpret):
        return attention_xla(q, k, v, sm_scale)
    return _attn_pallas(q, k, v, sm_scale, interpret)
