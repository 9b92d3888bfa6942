"""A/B the VAE decoder's bandwidth-bound epilogue sites on one chip.

VAE_MFU_r04.json showed three conv classes far below roofline at B=16:
  - 1x1 skip convs: 256px 256->128 4.34 ms (23% of bandwidth roofline),
    128px 512->256 1.90 ms (26%)
  - final 256px 128->3 conv: 3.07 ms (11%)
  - 256px k3 convs: 27-39% of the int8 compute roofline

This tool measures drop-in XLA reformulations of those sites (no Pallas,
so no fusion barriers), each as a chained two-K difference with a null-
step dispatch-overhead subtraction (CLAUDE.md r4 micro-bench rule):

  skip1x1   conv_general_dilated 1x1 int8   (shipped)
  skipdot   reshape (B*H*W, C) + int8 jnp.dot (GEMM lowering)
  skipbf16  bf16 1x1 conv (no quantize pass at all)
  out3conv  int8 3x3 128->3 conv            (shipped)
  out3dot   im2col-free: 3x3 as 9 shifted int8 dots accumulated
  out3bf16  bf16 3x3 128->3 conv
  k3conv    int8 3x3 256px 128->128 conv    (shipped, reference point)
  k3dot     3x3 as lax.conv with explicit im2col patches -> dot

Usage: python tools/bench_vae_epilogue.py [--k 40] [--out FILE]
Prints one JSON line per site; decisions feed sd_vae routing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B = args.b
    rng = np.random.default_rng(0)

    def timed_chain(step, x0, k):
        """Two-K python-side chained loop; carry stays on device. The
        step must map (x) -> x-shaped tensor (data dependence chains
        iterations). Returns per-step ms with the per-step dispatch
        overhead of a null chain subtracted."""
        jstep = jax.jit(step)
        x = jstep(x0)  # compile + warm
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

        def run(n):
            cur = x0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                c = cur
                for _i in range(n):
                    c = jstep(c)
                np.asarray(jax.tree_util.tree_leaves(c)[0].ravel()[0])
                best = min(best, time.perf_counter() - t0)
            return best

        k1, k2 = max(4, k // 4), k
        return (run(k2) - run(k1)) / (k2 - k1) * 1e3

    # null chain = per-step HOST dispatch floor (tiny carry: the +1 on a
    # big carry would itself cost an HBM read+write and over-subtract)
    def null_overhead(shape, dtype):
        z = jnp.zeros((8, 8), jnp.float32)
        return timed_chain(lambda t: t + 1, z, args.k)

    results = []

    def report(name, ms, extra=None):
        row = {"site": name, "ms": round(ms, 3), "batch": B}
        row.update(extra or {})
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- site 1: 256px 256->128 1x1 skip conv (int8, static scale) ----
    H = 256
    cin, cout = 256, 128
    x0 = jnp.asarray(rng.standard_normal((B, H, H, cin)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 127, (1, 1, cin, cout)),
                     jnp.int8)
    ws = jnp.full((cout,), 0.01, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)
    sx = jnp.float32(0.05)
    # pad cout back to cin so the chain carries a same-shaped tensor
    wpad = jnp.asarray(rng.standard_normal((cout, cin)).astype(np.float32)
                       ).astype(jnp.bfloat16)

    ov = null_overhead((B, H, H, cin), np.float32)
    report("null_overhead_256px", ov)

    def chain_back(y):  # cheap bf16 expand back to cin for the carry
        return jnp.einsum("bhwc,cd->bhwd", y, wpad).astype(jnp.bfloat16)

    def skip_conv(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (sx * ws) + bias).astype(jnp.bfloat16)
        return chain_back(y)

    def skip_dot(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        y = jnp.dot(xq.reshape(-1, cin), wq[0, 0],
                    preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (sx * ws) + bias).astype(jnp.bfloat16)
        return chain_back(y.reshape(B, H, H, cout))

    wb = (wq.astype(jnp.float32) * ws).astype(jnp.bfloat16)

    def skip_bf16(x):
        y = jax.lax.conv_general_dilated(
            x, wb, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return chain_back((y + bias).astype(jnp.bfloat16))

    report("skip1x1_int8_conv", timed_chain(skip_conv, x0, args.k) - ov)
    report("skip1x1_int8_dot", timed_chain(skip_dot, x0, args.k) - ov)
    report("skip1x1_bf16_conv", timed_chain(skip_bf16, x0, args.k) - ov)

    # ---- site 2: final 256px 128->3 conv ----
    cin2 = 128
    x1 = jnp.asarray(rng.standard_normal((B, H, H, cin2)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w3q = jnp.asarray(rng.integers(-127, 127, (3, 3, cin2, 3)), jnp.int8)
    w3s = jnp.full((3,), 0.01, jnp.float32)
    b3 = jnp.zeros((3,), jnp.float32)
    back2 = jnp.asarray(rng.standard_normal((3, cin2)).astype(np.float32)
                        ).astype(jnp.bfloat16)

    def back_to_cin2(y):
        return jnp.einsum("bhwc,cd->bhwd", y, back2).astype(jnp.bfloat16)

    def out3_conv(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, w3q, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (sx * w3s) + b3).astype(jnp.bfloat16)
        return back_to_cin2(y)

    # pad output channels to 128 (MXU lane width) then slice: tests
    # whether the 3-channel output layout is the bottleneck
    w3q_pad = jnp.zeros((3, 3, cin2, 128), jnp.int8).at[..., :3].set(w3q)
    w3s_pad = jnp.full((128,), 0.01, jnp.float32)

    def out3_conv_padded(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, w3q_pad, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32)[..., :3] * (sx * w3s) + b3
             ).astype(jnp.bfloat16)
        return back_to_cin2(y)

    w3b = (w3q.astype(jnp.float32) * w3s).astype(jnp.bfloat16)

    def out3_bf16(x):
        y = jax.lax.conv_general_dilated(
            x, w3b, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return back_to_cin2((y + b3).astype(jnp.bfloat16))

    report("out3_int8_conv", timed_chain(out3_conv, x1, args.k) - ov)
    report("out3_int8_conv_pad128", timed_chain(out3_conv_padded, x1,
                                                args.k) - ov)
    report("out3_bf16_conv", timed_chain(out3_bf16, x1, args.k) - ov)

    # ---- site 3 reference: 256px 128->128 k3 int8 conv (the resnet
    # body shape) so the epilogue numbers sit next to the bulk shape ----
    wkq = jnp.asarray(rng.integers(-127, 127, (3, 3, cin2, cin2)), jnp.int8)
    wks = jnp.full((cin2,), 0.01, jnp.float32)
    bk = jnp.zeros((cin2,), jnp.float32)

    def k3_conv(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wkq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (sx * wks) + bk).astype(jnp.bfloat16)

    report("k3_256px_128ch_int8_conv", timed_chain(k3_conv, x1, args.k) - ov)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"metric": "vae_epilogue_ab", "batch": B,
                       "null_overhead_ms": results[0]["ms"],
                       "rows": results}, f, indent=1)
    print(json.dumps({"metric": "vae_epilogue_ab", "rows": len(results)}),
          flush=True)


if __name__ == "__main__":
    main()
