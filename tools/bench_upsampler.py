"""A/B micro-bench for the VAE decoder's upsampler convs — the measured
bottleneck of the int8 serving step (VERDICT r2: VAE decode 39.6 ms at
B=16, ~2/3 of the super-batch, upsampler convs the part where the fused
pallas kernel loses to XLA).

Variants (all mathematically exact, same conv weights):
  xla_up    current production: nearest-2x upsample (XLA fuses the int8
            quantize into the upsample write) then 3x3 int8 conv on the
            (2H, 2W) tensor  [models/diffusion_blocks.py conv_q]
  dilated   ONE lhs-dilated conv on the (H, W) tensor: zero-insertion
            dilation 2 + folded 4x4 kernel (1D fold [w0, w0+w1, w1+w2,
            w2] along each axis) + padding (2,2). conv3x3(nearest2x(x))
            == this identically; the upsampled tensor never exists and
            the quantize pass reads/writes 4x less.
  pallas_up the fused conv3x3_gnq kernel's upsample prologue (reference
            point; known to lose to xla_up at big shapes)

Methodology per CLAUDE.md: K data-chained steps inside one jitted
lax.fori_loop, timed at two K values, ms from the difference (the
pallas variant uses a python-side chained loop — fori around pallas
dies in the tunnel's remote compiler). The chain reducer is a 2x2 mean
pool back to (H, W) — touches every output pixel, so no dead-code
slicing; its cost cancels in the A/B.

Usage: python tools/bench_upsampler.py [--b 16] [--k 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from livetalking_tpu.models.diffusion_blocks import (  # noqa: E402
    conv_q_up, fold_up_kernel, quantize_conv_up)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--shapes", default="32x512,64x512,128x256")
    ap.add_argument("--skip-pallas", action="store_true")
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    from livetalking_tpu.models.diffusion_blocks import (
        conv_q, upsample_nearest2x)

    results = []
    for tok in args.shapes.split(","):
        hw, ch = (int(t) for t in tok.split("x"))
        B = args.b
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, hw, hw, ch)).astype(np.float32)
                        * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ch, ch)).astype(np.float32)
                        * (0.3 / np.sqrt(9 * ch)))
        b = jnp.asarray(rng.standard_normal((ch,)).astype(np.float32) * 0.1)
        pq = quantize_conv_up({"w": w, "b": b})
        pq["as"] = jnp.asarray(0.02, jnp.float32)

        # --- exactness: dilated == upsample+conv in f32 (no quant noise)
        def f32_up(xx):
            y = jax.lax.conv_general_dilated(
                upsample_nearest2x(xx.astype(jnp.float32)), w, (1, 1),
                ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b
        def f32_dil(xx):
            y = jax.lax.conv_general_dilated(
                xx.astype(jnp.float32), fold_up_kernel(w), (1, 1),
                ((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b
        xs = jnp.asarray(x[:1, :16, :16], jnp.float32)
        err = float(jnp.max(jnp.abs(f32_up(xs) - f32_dil(xs))))
        ref = float(jnp.max(jnp.abs(f32_up(xs))))
        # bit-exact on CPU (<=4e-5); on TPU the two conv lowerings hit the
        # MXU with different accumulation orders -> ~1e-3 relative f32 noise
        assert err <= 5e-3 * max(ref, 1.0), (err, ref)
        print(f"# {tok}: dilated==up+conv exact (max err {err:.2e})",
              flush=True)
        if args.check_only:
            continue

        def chain(step_fn, k):
            def body(_, h):
                y = step_fn(h)
                # 2x2 mean pool back to (H, W): touches every output px
                B_, H2, W2, C_ = y.shape
                p = y.reshape(B_, H2 // 2, 2, W2 // 2, 2, C_).mean((2, 4))
                return (p * jnp.bfloat16(0.25) + x * jnp.bfloat16(0.75)
                        ).astype(jnp.bfloat16)
            return jax.jit(lambda h: jax.lax.fori_loop(0, k, body, h))

        def timeit(step_fn, name):
            t_ms = {}
            for k in (args.k, 2 * args.k):
                f = chain(step_fn, k)
                r = f(x)
                np.asarray(r[0, 0, 0, :1])  # sync
                t0 = time.time()
                r = f(x)
                np.asarray(r[0, 0, 0, :1])
                t_ms[k] = (time.time() - t0) * 1e3
            per = (t_ms[2 * args.k] - t_ms[args.k]) / args.k
            print(f"#   {name}: {per:.2f} ms/step", flush=True)
            return round(per, 3)

        row = {"shape": f"B{B} {hw}->{2*hw}px {ch}ch",
               "xla_up_ms": timeit(
                   lambda h: conv_q(pq, upsample_nearest2x(h)), "xla_up"),
               "dilated_ms": timeit(
                   lambda h: conv_q_up(pq, h), "dilated")}

        if not args.skip_pallas:
            from livetalking_tpu.ops.pallas_conv import (
                conv3x3_gnq, conv3x3_gnq_fits)
            if conv3x3_gnq_fits(2 * hw, 2 * hw, ch, ch, 64, upsample=True):
                def pallas_step(h):
                    y, _, _ = conv3x3_gnq(h, None, None, pq["as"], pq["wq"],
                                          pq["as"] * pq["ws"], pq["b"],
                                          upsample=True)
                    return y
                # python-side chained loop (fori around pallas dies in the
                # tunnel's remote compiler, CLAUDE.md)
                def pooled(h):
                    y = pallas_step(h)
                    B_, H2, W2, C_ = y.shape
                    p = y.reshape(B_, H2 // 2, 2, W2 // 2, 2, C_).mean((2, 4))
                    return (p * jnp.bfloat16(0.25) + x * jnp.bfloat16(0.75)
                            ).astype(jnp.bfloat16)
                pooled_j = jax.jit(pooled)
                def py_chain(k):
                    h = x
                    for _ in range(k):
                        h = pooled_j(h)
                    np.asarray(h[0, 0, 0, :1])
                py_chain(2)  # warm
                t = {}
                for k in (args.k, 2 * args.k):
                    t0 = time.time(); py_chain(k); t[k] = (time.time() - t0) * 1e3
                row["pallas_up_ms"] = round((t[2*args.k] - t[args.k]) / args.k, 3)
                print(f"#   pallas_up: {row['pallas_up_ms']:.2f} ms/step",
                      flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"bench": "vae_upsampler_ab", "b": args.b,
                      "rows": results}), flush=True)


if __name__ == "__main__":
    main()
