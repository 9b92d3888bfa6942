"""Pallas int8 3x3 stride-1 conv kernel — the VAE-decoder hot op.

MuseTalk's serving step is dominated by the VAE decode (reference
avatars/musetalk/models/vae.py:76-122 runs diffusers' AutoencoderKL
decoder per frame batch); on v5e the decoder's large-resolution int8
convs are the bottleneck and XLA's conv lowering reaches only ~24-39%
of the 394 TOP/s int8 MXU peak at the 256px shapes (measured B=16:
3.47 ms for 256px 128->128, 8.53 ms for the 256px 256ch upsampler).

This kernel reformulates the conv as one implicit GEMM per row tile:

- The padded int8 input stays in HBM (``MemorySpace.ANY``); each grid
  step manually DMAs an overlapping (TH+2, W+8, C) row window into a
  double-buffered VMEM scratch (overlap = the 3x3 halo; Pallas
  BlockSpecs cannot express overlapping blocks, so the copy is explicit
  and pipelined one tile ahead).
- The three ROW taps (dy) are free slices of the window's untiled
  leading dim; they concatenate into a patch matrix P (TH*Wp, 3C)
  without any sublane relayout.
- The three COLUMN taps (dx) fold into the weight side: W' is
  (3C, 3O) with W'[dy-block, dx-block] = w[dy, dx], so ONE int8 MXU
  dot Z = P @ W' computes all nine taps; the dx alignment happens on
  the OUTPUT side as three shifted int32 adds
  (y[c] = Z[c, 0:O] + Z[c+1, O:2O] + Z[c+2, 2O:3O]).

  Building dx-shifted int8 patches instead (the naive im2col) costs
  nine unaligned sublane relayouts per tile and measured 1.5x slower;
  shifting the int32 Z costs two unaligned adds only.
- Epilogue: int32 -> f32 * scale[o] + bias[o] (+ optional fused
  residual) -> bf16, written through a normal pipelined out BlockSpec.

Measured B=16 v5e with the chained-loop two-K methodology (quantize
producer included in both sides): 256px 128->128 2.59 ms vs XLA 2.68,
256px 256->256 5.37 vs 6.72 (1.25x), 128px 512->512 4.48 vs 5.55
(1.24x), 64px 512->512 1.55 vs 1.27 (0.82x — SLOWER; small maps are
DMA-latency-bound). Numerics are bit-exact (integer accumulation in
both paths).

IN-GRAPH CAUTION: routed inside ``sd_vae.decode_int8`` this
standalone kernel is a net LOSS (57.3 ms vs 40.5 pure-XLA decode,
B=16; still 50.2 with only the 256px convs routed) — the pallas call
is a fusion barrier, so the GN/silu/quantize producers and the
dequant/residual consumers that XLA folds into its conv passes become
separate HBM round trips. ``conv3x3_q`` therefore stays un-routed
(benchmark/reference kernel); the production path is ``conv3x3_gnq``
below, which absorbs the producer chain (GroupNorm apply + SiLU +
quantize) into the kernel prologue and the residual add + next-GN
channel moments into the epilogue.

The bf16 twin (``conv3x3_bf16``) shares the exact same structure with
f32 accumulation for the non-quantized decode path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover - pallas unavailable
    pl = None
    pltpu = None

__all__ = ["conv3x3_q", "conv3x3_bf16", "conv3x3_fits"]

_VMEM_BUDGET = 12 * 1024 * 1024

# Measured-best row tiles per decoder conv shape (B=16 v5e sweep,
# /tmp/tune_conv_th methodology: TH in {16,8,4} x every shape conv_q
# routes here in sd_vae.decode_int8, incl. fused-residual variants).
# All three tiles compiled and beat XLA at every shape; the deltas
# between tiles are 2-20%, so untuned shapes fall back to the
# conservative VMEM formula below without a correctness risk.
_TUNED_TH = {  # (H, W, C, O, has_res) -> TH
    (256, 256, 128, 128, True): 8,
    (256, 256, 128, 128, False): 8,
    (256, 256, 256, 128, False): 16,
    (256, 256, 256, 256, False): 16,
    (128, 128, 256, 256, True): 16,
    (128, 128, 256, 256, False): 16,
    (128, 128, 512, 256, False): 8,
    (128, 128, 512, 512, False): 16,
    (64, 64, 512, 512, True): 4,
    (64, 64, 512, 512, False): 16,
}


def _vmem_bytes(TH: int, W: int, C: int, O: int, acc_itemsize: int,
                in_itemsize: int) -> int:
    Wp = W + 8
    window = 2 * (TH + 2) * Wp * C * in_itemsize
    patches = TH * Wp * 3 * C * in_itemsize
    z = TH * Wp * 3 * O * acc_itemsize
    out = 2 * TH * W * O * 2
    weights = 3 * C * 3 * O * in_itemsize
    return window + patches + z + out + weights


def _pick_th(H: int, W: int, C: int, O: int, acc_itemsize: int,
             in_itemsize: int, has_res: bool = False) -> Optional[int]:
    th = (_TUNED_TH.get((H, W, C, O, has_res))
          or _TUNED_TH.get((H, W, C, O, not has_res)))
    if th is not None:
        return th
    for th in (16, 8, 4):
        if H % th == 0 and _vmem_bytes(th, W, C, O, acc_itemsize,
                                       in_itemsize) <= _VMEM_BUDGET:
            return th
    return None


def conv3x3_fits(H: int, W: int, C: int, O: int,
                 itemsize: int = 1) -> bool:
    """True when the implicit-GEMM kernel supports/benefits this shape:
    lane-aligned channels, sublane-aligned width, resolution at least
    64 px (small feature maps are latency-bound; XLA is fine there),
    and a row tile that fits VMEM."""
    if C % 128 or O % 128 or W % 8 or H < 64 or W < 64:
        return False
    acc = 4 if itemsize == 1 else 4  # int32 / f32
    return _pick_th(H, W, C, O, acc, itemsize) is not None


def _kernel(xpad_hbm, w_ref, scale_ref, bias_ref, res_ref, o_ref, win, sems,
            *, TH, W, Wp, C, O, n_tiles, acc_dtype, has_res):
    i = pl.program_id(0)

    def dma(slot, step):
        return pltpu.make_async_copy(
            xpad_hbm.at[step // n_tiles, pl.ds((step % n_tiles) * TH, TH + 2)],
            win.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    w = win[i % 2]  # (TH+2, Wp, C)
    # dy taps: free slices of the untiled leading dim -> (TH*Wp, 3C)
    p = jnp.concatenate(
        [w[dy:dy + TH].reshape(TH * Wp, C) for dy in range(3)], axis=1)
    z = jnp.dot(p, w_ref[:, :], preferred_element_type=acc_dtype)
    z3 = z.reshape(TH, Wp, 3 * O)
    # dx taps: output-side shifted adds (exact; pad columns are zero)
    acc = (z3[:, 0:W, 0:O] + z3[:, 1:W + 1, O:2 * O]
           + z3[:, 2:W + 2, 2 * O:3 * O])
    y = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _conv3x3_core(xq, w2, scale, bias, residual, acc_dtype, out_dtype,
                  interpret):
    B, H, W, C = xq.shape
    O = w2.shape[-1] // 3
    TH = _pick_th(H, W, C, O, 4, xq.dtype.itemsize,
                  has_res=residual is not None)
    n_tiles = H // TH
    Wp = W + 8
    xpad = jnp.pad(xq, ((0, 0), (1, 1), (1, 7), (0, 0)))

    has_res = residual is not None
    res_spec = (pl.BlockSpec((1, TH, W, O),
                             lambda i, nt=n_tiles: (i // nt, i % nt, 0, 0))
                if has_res else pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
    res_arg = residual if has_res else jnp.zeros((1, 1), out_dtype)

    return pl.pallas_call(
        functools.partial(_kernel, TH=TH, W=W, Wp=Wp, C=C, O=O,
                          n_tiles=n_tiles,
                          acc_dtype=acc_dtype, has_res=has_res),
        grid=(B * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3 * C, 3 * O), lambda i: (0, 0)),
            pl.BlockSpec((1, O), lambda i: (0, 0)),
            pl.BlockSpec((1, O), lambda i: (0, 0)),
            res_spec,
        ],
        out_specs=pl.BlockSpec((1, TH, W, O),
                               lambda i, nt=n_tiles: (i // nt, i % nt, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, Wp, C), xq.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xpad, w2, scale[None], bias[None], res_arg)


def _fold_w(w):
    """(3, 3, C, O) -> (3C, 3O) with W'[dy*C:, dx*O:] = w[dy, dx]."""
    C, O = w.shape[2], w.shape[3]
    return w.transpose(0, 2, 1, 3).reshape(3 * C, 3 * O)


def conv3x3_q(xq: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
              bias: jnp.ndarray, residual: Optional[jnp.ndarray] = None,
              out_dtype=jnp.bfloat16, *, interpret: bool = False):
    """int8 3x3 stride-1 pad-1 conv: (B,H,W,C) int8 x (3,3,C,O) int8 ->
    (B,H,W,O) ``out_dtype``; y = conv(xq, wq) * scale[o] + bias[o]
    (+ residual).  ``scale`` folds the activation scale and the
    per-channel weight scale (sx * ws)."""
    scale = jnp.broadcast_to(scale.astype(jnp.float32), (wq.shape[-1],))
    return _conv3x3_core(xq, _fold_w(wq), scale,
                         bias.astype(jnp.float32), residual,
                         jnp.int32, out_dtype, interpret)


def conv3x3_bf16(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                 residual: Optional[jnp.ndarray] = None,
                 out_dtype=jnp.bfloat16, *, interpret: bool = False):
    """bf16 twin (f32 accumulation): y = conv(x, w) + bias (+ residual)."""
    x = x.astype(jnp.bfloat16)
    O = w.shape[-1]
    return _conv3x3_core(x, _fold_w(w.astype(jnp.bfloat16)),
                         jnp.ones((O,), jnp.float32),
                         bias.astype(jnp.float32), residual,
                         jnp.float32, out_dtype, interpret)
