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

__all__ = ["conv3x3_q", "conv3x3_bf16", "conv3x3_fits",
           "conv3x3_gnq", "conv3x3_gnq_fits"]

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
    if TH is None:
        raise ValueError(
            f"conv3x3: no feasible row tile for shape H={H} W={W} C={C} "
            f"O={O}; gate call sites with conv3x3_fits")
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


# ---------------------------------------------------------------------------
# Fused GroupNorm->SiLU->quantize->conv3x3->dequant(+residual)(+moments)
# ---------------------------------------------------------------------------
#
# The production VAE-decoder kernel (see the module docstring for why the
# standalone conv kernel loses in-graph). One pallas_call per decoder
# conv covers the whole resnet interior:
#
#   in  : x (B, H, W, C) bf16 in HBM, UNPADDED — the previous conv's
#         output; GroupNorm scale/shift (B, C) f32 precomputed from the
#         previous kernel's channel moments (a (B, C)-sized XLA op).
#   body: DMA an overlapping (TH+2, W, C) row window (3-case at the
#         H edges: the missing halo row is masked to zero in activation
#         space, which is exactly conv zero-padding); apply
#         a = silu(x * scale + shift) in f32; quantize with the conv's
#         calibrated static activation scale; implicit GEMM
#         P(TH*W, 3C) @ W'(3C, 3O) in int8 with int32 accumulation;
#         fold the three dx taps with output-side shifted adds
#         (W edges get zero slabs — conv zero-padding again).
#   out : y = Z * (act_scale*w_scale)[o] + bias[o] (+ residual) in bf16,
#         PLUS the per-channel spatial moments sum(y), sum(y^2) (B, O)
#         f32, accumulated across row tiles — the next GroupNorm's
#         statistics, so the between-conv stats pass disappears.
#
# HBM traffic per conv collapses to: read x once (in the window DMA),
# write y once, read the residual where fused — the GN-apply/SiLU/
# quantize elementwise pass, the int8 materialization, the pad copy,
# and the next GN's stats read are all gone.


def _vmem_bytes_gnq(TH: int, W: int, C: int, O: int) -> int:
    win = 2 * (TH + 2) * W * C * 2       # bf16 window, double-buffered
    af32 = (TH + 2) * W * C * 4          # f32 activation temp
    aq = (TH + 2) * W * C                # int8 activations
    p = TH * W * 3 * C                   # patch matrix
    z = TH * W * 3 * O * 4               # int32 GEMM out
    acc = 2 * TH * W * O * 4             # shifted adds + f32 epilogue
    out = 2 * TH * W * O * 2
    res = 2 * TH * W * O * 2
    w = 9 * C * O
    return win + af32 + aq + p + z + acc + out + res + w


# The gnq budget is looser than the standalone kernel's: the f32
# activation/epilogue temps in the formula are streamed by Mosaic, not
# fully resident, so the formula overestimates. 14.5 MB accepts the
# 128px 512->512 decoder shape at TH=4 (formula says 14.0 MB; compiles
# and runs within the 16 MB VMEM).
_VMEM_BUDGET_GNQ = int(14.5 * 1024 * 1024)


def _vmem_bytes_gnq_up(TH: int, W: int, C: int, O: int) -> int:
    # upsample variant: the DMA window is quarter-size; the expanded
    # int8 window replaces the full-size bf16 one
    win = 2 * (TH // 2 + 2) * (W // 2) * C * 2
    af32 = (TH // 2 + 2) * (W // 2) * C * 4
    aq = (TH + 2) * W * C + (TH // 2 + 2) * (W // 2) * C
    p = TH * W * 3 * C
    z = TH * W * 3 * O * 4
    acc = 2 * TH * W * O * 4
    out = 2 * TH * W * O * 2
    w = 9 * C * O
    return win + af32 + aq + p + z + acc + out + w


def _pick_th_gnq(H: int, W: int, C: int, O: int,
                 upsample: bool = False) -> Optional[int]:
    fml = _vmem_bytes_gnq_up if upsample else _vmem_bytes_gnq
    for th in (8, 4):
        if H % th == 0 and H // th >= 2 and \
                fml(th, W, C, O) <= _VMEM_BUDGET_GNQ:
            return th
    return None


def conv3x3_gnq_fits(H: int, W: int, C: int, O: int, min_h: int = 64,
                     upsample: bool = False) -> bool:
    """H, W are the OUTPUT resolution (2x the input when upsample)."""
    if C % 128 or O % 128 or W % 8 or H < min_h or W < min_h:
        return False
    if upsample and (W // 2) % 8:
        return False
    return _pick_th_gnq(H, W, C, O, upsample=upsample) is not None


def _gnq_kernel(x_hbm, w_ref, act_ref, scale_ref, bias_ref, gns_ref, gnb_ref,
                res_ref, o_ref, s1_ref, s2_ref, win, sems,
                *, TH, H, W, C, O, n_tiles, has_gn, has_res, upsample):
    i = pl.program_id(0)
    # Source-space geometry: with the nearest-2x prologue the DMA reads
    # the HALF-resolution tensor (TSRC = TH//2 source rows per output
    # tile; the window still carries a one-row halo on each side).
    TSRC = TH // 2 if upsample else TH
    HSRC = H // 2 if upsample else H
    SR = TSRC + 2  # window rows in source space

    def start(slot, step):
        b = step // n_tiles
        t = step % n_tiles

        @pl.when(t == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, SR - 1)],
                win.at[slot, pl.ds(1, SR - 1)],
                sems.at[slot]).start()

        @pl.when(jnp.logical_and(t > 0, t < n_tiles - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(t * TSRC - 1, SR)],
                win.at[slot],
                sems.at[slot]).start()

        @pl.when(t == n_tiles - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(HSRC - SR + 1, SR - 1)],
                win.at[slot, pl.ds(0, SR - 1)],
                sems.at[slot]).start()

    def wait(slot, step):
        t = step % n_tiles
        edge = jnp.logical_or(t == 0, t == n_tiles - 1)

        @pl.when(edge)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, SR - 1)],
                win.at[slot, pl.ds(0, SR - 1)],
                sems.at[slot]).wait()

        @pl.when(jnp.logical_not(edge))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, SR)],
                win.at[slot],
                sems.at[slot]).wait()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        start((i + 1) % 2, i + 1)

    wait(i % 2, i)
    t = i % n_tiles

    xw = win[i % 2].astype(jnp.float32)  # (SR, Wsrc, C)
    if has_gn:
        a = xw * gns_ref[0][None] + gnb_ref[0][None]
        a = a * jax.nn.sigmoid(a)
    else:
        a = xw
    # Source-edge halo rows -> 0 in activation space == conv zero
    # padding (after 2x expansion each still maps to the pad rows).
    # Also kills the uninitialized-scratch garbage on edge tiles.
    row = t * TSRC - 1 + jax.lax.broadcasted_iota(jnp.int32, (SR, 1, 1), 0)
    a = jnp.where(jnp.logical_and(row >= 0, row < HSRC), a, 0.0)
    aq = jnp.clip(jnp.round(a / act_ref[0, 0]), -127, 127).astype(jnp.int8)

    if upsample:
        # nearest-2x in VMEM, on the QUANTIZED half-size window.
        # Rows (free leading-dim concat): window row j of the upsampled
        # halo window maps to source row (t*TH-1+j)//2 - (t*TSRC-1)
        # = (j-1)//2 + 1  ->  indices [0, 1,1, 2,2, ..., TSRC+1].
        rows = [aq[0:1]]
        for k in range(1, TSRC + 1):
            rows += [aq[k:k + 1], aq[k:k + 1]]
        rows.append(aq[TSRC + 1:TSRC + 2])
        aq = jnp.concatenate(rows, axis=0)          # (TH+2, W//2, C)
        # Columns: duplicate every source column (stack+reshape lowers
        # to a sublane interleave).
        aq = jnp.stack([aq, aq], axis=2).reshape(TH + 2, W, C)

    p = jnp.concatenate(
        [aq[dy:dy + TH].reshape(TH * W, C) for dy in range(3)], axis=1)
    z3 = jnp.dot(p, w_ref[:, :],
                 preferred_element_type=jnp.int32).reshape(TH, W, 3 * O)
    zero = jnp.zeros((TH, 1, O), jnp.int32)
    acc = (jnp.concatenate([zero, z3[:, :W - 1, 0:O]], axis=1)
           + z3[:, :, O:2 * O]
           + jnp.concatenate([z3[:, 1:, 2 * O:3 * O], zero], axis=1))
    y = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    yb = y.astype(o_ref.dtype)
    o_ref[0] = yb

    yf = yb.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(0, 1))
    s2 = jnp.sum(yf * yf, axis=(0, 1))

    @pl.when(t == 0)
    def _():
        s1_ref[0, 0] = s1
        s2_ref[0, 0] = s2

    @pl.when(t > 0)
    def _():
        s1_ref[0, 0] += s1
        s2_ref[0, 0] += s2


def conv3x3_gnq(x: jnp.ndarray, gn_scale: Optional[jnp.ndarray],
                gn_shift: Optional[jnp.ndarray], act_scale: jnp.ndarray,
                wq: jnp.ndarray, out_scale: jnp.ndarray, bias: jnp.ndarray,
                residual: Optional[jnp.ndarray] = None,
                out_dtype=jnp.bfloat16, *, upsample: bool = False,
                interpret: bool = False):
    """Fused GN-apply+SiLU+quantize+conv3x3+dequant(+residual) with
    channel-moment epilogue.

    x (B,H,W,C) bf16; gn_scale/gn_shift (B,C) f32 (None = quantize-only
    prologue, for the upsampler convs whose input has no norm);
    act_scale scalar f32 (static calibrated); wq (3,3,C,O) int8;
    out_scale (O,) f32 (= act_scale * per-channel weight scale); bias
    (O,) f32; residual (B,H,W,O) optional.

    Returns (y, s1, s2): y (B,H,W,O) ``out_dtype`` and the per-channel
    spatial moments s1 = sum_hw y, s2 = sum_hw y^2, both (B,O) f32 —
    feed them to the next GroupNorm's scale/shift computation.

    ``upsample=True`` computes conv3x3(nearest2x(x)): x is the
    HALF-resolution tensor, the output is (B, 2H, 2W, O), and the 2x
    expansion happens in VMEM on the quantized window — the kernel
    DMAs a quarter of the bytes and the XLA upsample pass disappears."""
    B, H, W, C = x.shape
    if upsample:
        H, W = 2 * H, 2 * W
    O = wq.shape[-1]
    TH = _pick_th_gnq(H, W, C, O, upsample=upsample)
    if TH is None:
        raise ValueError(
            f"conv3x3_gnq: no feasible row tile for output shape H={H} "
            f"W={W} C={C} O={O} upsample={upsample}; gate call sites "
            f"with conv3x3_gnq_fits")
    n_tiles = H // TH
    has_gn = gn_scale is not None
    has_res = residual is not None

    # (B, 1, C) with (1, 1, C) blocks: same (8, 128)-divisibility
    # workaround as the moment outputs below
    gns = (gn_scale.astype(jnp.float32).reshape(B, 1, C) if has_gn
           else jnp.zeros((1, 1, C), jnp.float32))
    gnb = (gn_shift.astype(jnp.float32).reshape(B, 1, C) if has_gn
           else jnp.zeros((1, 1, C), jnp.float32))
    gn_spec = (pl.BlockSpec((1, 1, C), lambda i, nt=n_tiles: (i // nt, 0, 0))
               if has_gn else pl.BlockSpec((1, 1, C), lambda i: (0, 0, 0)))
    res_spec = (pl.BlockSpec((1, TH, W, O),
                             lambda i, nt=n_tiles: (i // nt, i % nt, 0, 0))
                if has_res else pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
    res_arg = residual if has_res else jnp.zeros((1, 1), out_dtype)

    scale = jnp.broadcast_to(out_scale.astype(jnp.float32), (O,))
    sr = (TH // 2 if upsample else TH) + 2
    wsrc = W // 2 if upsample else W
    y, s1, s2 = pl.pallas_call(
        functools.partial(_gnq_kernel, TH=TH, H=H, W=W, C=C, O=O,
                          n_tiles=n_tiles, has_gn=has_gn, has_res=has_res,
                          upsample=upsample),
        grid=(B * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3 * C, 3 * O), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, O), lambda i: (0, 0)),
            pl.BlockSpec((1, O), lambda i: (0, 0)),
            gn_spec,
            gn_spec,
            res_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W, O),
                         lambda i, nt=n_tiles: (i // nt, i % nt, 0, 0)),
            # (1, 1, O) blocks: the second-minor block dim must equal
            # the (size-1) array dim to satisfy the TPU lowering's
            # (8, 128)-divisibility rule on small outputs
            pl.BlockSpec((1, 1, O), lambda i, nt=n_tiles: (i // nt, 0, 0)),
            pl.BlockSpec((1, 1, O), lambda i, nt=n_tiles: (i // nt, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, O), out_dtype),
            jax.ShapeDtypeStruct((B, 1, O), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, O), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, sr, wsrc, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), _fold_w(wq),
      jnp.reshape(act_scale.astype(jnp.float32), (1, 1)),
      scale[None], bias.astype(jnp.float32)[None], gns, gnb, res_arg)
    return y, s1.reshape(B, O), s2.reshape(B, O)
