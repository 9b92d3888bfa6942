"""Decode-level A/B for the int8 VAE decoder configs (VERDICT r2 item 1:
the decoder is ~2/3 of the serving step; commit an A/B artifact).

Configs (same quantized tree, same latents):
  xla            pure XLA up-chain, upsample-then-conv (r2 baseline)
  xla_dilated    XLA up-chain, shape-aware lhs-dilated upsamplers
                 (models/sd_vae.py _up_conv_q auto routing)
  fused_full     LT_FUSED_VAE=1 full chain (r2: lost 46.6 vs 40.5)
  fused_restart  fused resnets per block with XLA/dilated upsamplers:
                 skip_up=0,1,2 + restart_block=1 (the chain-drop-then-
                 restart configuration the r2 advisor asked to exercise)

Methodology: python-side chained loop with a device carry (fori around
pallas dies in the tunnel's remote compiler, CLAUDE.md), two-K
difference, decode output folded back into the latent carry through a
mean pool so every output pixel is consumed.

Usage: python tools/bench_vae_decode.py [--b 16] [--k 20] [--out FILE]
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
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--configs", default="xla,xla_dilated,fused_restart,fused_full")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from livetalking_tpu.avatars.musetalk_avatar import _with_dummy_scales
    from livetalking_tpu.models import sd_vae
    from livetalking_tpu.utils.jaxinit import jit_init

    B = args.b
    print(f"# init + quantize (B={B}) on {jax.devices()[0].platform}",
          flush=True)
    vp = jit_init(sd_vae.init_params, jax.random.PRNGKey(0), jnp.bfloat16)
    vq = _with_dummy_scales(sd_vae.quantize_decoder(vp))
    # r5 epilogue A/B: same graph except the 1x1 shortcuts + final conv
    # run int8 (the pre-r5 default) instead of bf16
    vq_int8ep = _with_dummy_scales(
        sd_vae.quantize_decoder(vp, bf16_epilogue=False))

    rng = np.random.default_rng(0)
    z0 = jnp.asarray(rng.standard_normal((B, 32, 32, 4)).astype(np.float32)
                     * sd_vae.SCALING_FACTOR)

    ENV = {
        "xla": {"LT_FUSED_VAE": "0", "LT_DILATED_UP": "0"},
        "xla_dilated": {"LT_FUSED_VAE": "0", "LT_DILATED_UP": "auto"},
        "fused_full": {"LT_FUSED_VAE": "1", "LT_DILATED_UP": "auto",
                       "LT_FUSED_VAE_SKIP_UP": "", "LT_FUSED_VAE_FROM": "0"},
        "fused_restart": {"LT_FUSED_VAE": "1", "LT_DILATED_UP": "auto",
                          "LT_FUSED_VAE_SKIP_UP": "0,1,2",
                          "LT_FUSED_VAE_RESTART": "1",
                          "LT_FUSED_VAE_FROM": "0"},
        # pre-r5 all-int8 epilogue (1x1 shortcuts + final conv int8)
        "xla_dilated_int8ep": {"LT_FUSED_VAE": "0", "LT_DILATED_UP": "auto"},
    }

    results = {}
    for name in args.configs.split(","):
        tree = vq_int8ep if name.endswith("_int8ep") else vq
        env = ENV[name]
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            @jax.jit
            def step(params_q, z):
                y = sd_vae.decode_int8(params_q, z)  # (B,256,256,3) f32
                # fold back into a latent-shaped carry: mean-pool 8x8 ->
                # (B,32,32,3); every output pixel is consumed
                p = y.reshape(B, 32, 8, 32, 8, 3).mean((2, 4))
                z2 = jnp.concatenate([p, p[..., :1]], axis=-1)
                return z * 0.9 + z2.astype(z.dtype) * (0.01 *
                                                       sd_vae.SCALING_FACTOR)

            def chain(k):
                z = z0
                for _ in range(k):
                    z = step(tree, z)
                np.asarray(z[0, 0, 0, :1])  # serialize + tiny fetch

            t0 = time.time()
            chain(2)  # warm/compile
            print(f"#   {name}: compiled in {time.time() - t0:.0f}s",
                  flush=True)
            t = {}
            for k in (args.k, 2 * args.k):
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    chain(k)
                    best = min(best, time.time() - t0)
                t[k] = best * 1e3
            per = (t[2 * args.k] - t[args.k]) / args.k
            results[name] = round(per, 2)
            print(f"#   {name}: {per:.2f} ms/decode (B={B})", flush=True)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    out = {"bench": "vae_decode_int8_ab", "b": B, "ms_per_decode": results}
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
