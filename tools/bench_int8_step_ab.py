"""A/B: full MuseTalk int8 serving step with vs without the round-3
transformer-linear / VAE-mid-block quantization.

Configs (same inputs, dummy static conv scales — production graph
shape; linears always run dynamic activation scales):
  conv_only   round-2 shipped path: quantize_unet(attn_int8=False) +
              quantize_decoder(mid_int8=False)
  full_int8   round-3 default: attn_int8=True, mid_int8=True

Times the COMPLETE fused step (gather -> PE -> U-Net -> VAE decode ->
uint8) at B=16 via the python-side chained two-K difference that
CLAUDE.md validates against the fori methodology.

Usage: python tools/bench_int8_step_ab.py [--b 16] [--k 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    from livetalking_tpu.avatars.musetalk_avatar import _with_dummy_scales
    from livetalking_tpu.models import musetalk as mt
    from livetalking_tpu.models import sd_unet, sd_vae
    from livetalking_tpu.utils.jaxinit import jit_init

    B, N = args.b, 64
    cfg = sd_unet.MUSETALK
    print(f"# init (B={B}) on {jax.devices()[0].platform}", flush=True)
    up = jit_init(sd_unet.init_params, jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    vp = jit_init(sd_vae.init_params, jax.random.PRNGKey(1), jnp.bfloat16)

    rng = np.random.default_rng(0)
    cycle = jnp.asarray(rng.standard_normal((N, 32, 32, 8)).astype(np.float32) * 0.2)
    whisper = jnp.asarray(rng.standard_normal((B, 50, 384)).astype(np.float32))
    step = mt.make_infer_fn(cfg, B, dtype=jnp.bfloat16,
                            vae_int8=True, unet_int8=True)

    @jax.jit
    def chain(idxs, frames):  # device-resident carry, no fetch
        s = jnp.sum(frames[:, ::64, ::64, 0].astype(jnp.int32))
        return (idxs + 1 + (s % 2)) % N

    def bench(uq, vq, name):
        idxs = jnp.arange(B, dtype=jnp.int32) % N
        t0 = time.time()
        frames = step(uq, vq, cycle, idxs, whisper)
        idxs = chain(idxs, frames)
        int(jnp.sum(frames.astype(jnp.int32)))
        print(f"#   {name}: compiled in {time.time() - t0:.0f}s", flush=True)

        def timed(k):
            nonlocal idxs
            best = float("inf")
            for _ in range(2):
                cur = idxs
                t0 = time.time()
                for _i in range(k):
                    f = step(uq, vq, cycle, cur, whisper)
                    cur = chain(cur, f)
                int(cur[0])
                best = min(best, time.time() - t0)
                idxs = cur
            return best

        k1, k2 = args.k, 4 * args.k
        t1, t2 = timed(k1), timed(k2)
        ms = (t2 - t1) / (k2 - k1) * 1e3
        fps = B / (ms / 1e3)
        print(f"#   {name}: {ms:.2f} ms/step = {fps:.1f} fps (B={B})",
              flush=True)
        return round(ms, 2)

    results = {}
    print("# quantize full_int8 (r5 bf16-epilogue default)", flush=True)
    uq1 = _with_dummy_scales(sd_unet.quantize_unet(up, attn_int8=True))
    vq1 = _with_dummy_scales(sd_vae.quantize_decoder(vp, mid_int8=True))
    results["full_int8"] = bench(uq1, vq1, "full_int8")
    print("# quantize full_int8_int8ep (pre-r5 all-int8 epilogue)", flush=True)
    vq2 = _with_dummy_scales(sd_vae.quantize_decoder(vp, mid_int8=True,
                                                     bf16_epilogue=False))
    results["full_int8_int8ep"] = bench(uq1, vq2, "full_int8_int8ep")
    del vq2
    print("# quantize conv_only", flush=True)
    uq0 = _with_dummy_scales(sd_unet.quantize_unet(up, attn_int8=False))
    vq0 = _with_dummy_scales(sd_vae.quantize_decoder(vp, mid_int8=False))
    results["conv_only"] = bench(uq0, vq0, "conv_only")

    out = {"bench": "musetalk_int8_step_ab", "b": B,
           "ms_per_step": results,
           "speedup": round(results["conv_only"] / results["full_int8"], 3)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
