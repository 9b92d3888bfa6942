"""A/B: int8-quantize the VAE decoder MID-BLOCK resnets (prototype).

quantize_decoder keeps the mid block bf16 ("the tiny latent-side convs
stay bf16"), but at B=16 the two mid resnets are 4x conv3x3 512->512 @
32px (~310 GFLOP bf16) -- worth ~1-1.5 ms of the ~39.5 ms decode if int8
holds quality. The mid attention and dec_conv_in (cin=4, MXU-hostile)
stay bf16 either way.

Configs (same latents, dummy static scales -- production graph shape):
  mid_bf16   current default: sd_vae.decode_int8, LT_DILATED_UP=auto
  mid_int8   prototype: mid r0/r1 via _resnet_block_q, same up-chain

Also reports decode-output RMSE between the two (random-init weights --
a smoke signal only; the real PSNR gate runs with calibrated scales in
tests/test_int8_quality.py if this is promoted).

Usage: python tools/bench_vae_mid.py [--b 16] [--k 20]
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
    args = ap.parse_args()

    os.environ["LT_FUSED_VAE"] = "0"
    os.environ["LT_DILATED_UP"] = "auto"

    from livetalking_tpu.avatars.musetalk_avatar import _with_dummy_scales
    from livetalking_tpu.models import sd_vae
    from livetalking_tpu.models.diffusion_blocks import (
        conv, group_norm, quantize_conv, resnet_block, silu,
        spatial_attention,
    )
    from livetalking_tpu.utils.jaxinit import jit_init

    B = args.b
    print(f"# init + quantize (B={B}) on {jax.devices()[0].platform}",
          flush=True)
    vp = jit_init(sd_vae.init_params, jax.random.PRNGKey(0), jnp.bfloat16)
    vq_raw = sd_vae.quantize_decoder(vp)
    vq = _with_dummy_scales(vq_raw)

    # prototype: additionally quantize the mid resnets
    def q_resnet(rp):
        out = {"norm1": rp["norm1"], "norm2": rp["norm2"],
               "conv1": quantize_conv(rp["conv1"]),
               "conv2": quantize_conv(rp["conv2"])}
        if "conv_shortcut" in rp:
            out["conv_shortcut"] = quantize_conv(rp["conv_shortcut"])
        return out

    vq_mid_raw = dict(vq_raw)
    vq_mid_raw["dec_mid"] = {"r0": q_resnet(vp["dec_mid"]["r0"]),
                             "attn": vp["dec_mid"]["attn"],
                             "r1": q_resnet(vp["dec_mid"]["r1"])}
    vq_mid = _with_dummy_scales(vq_mid_raw)

    def decode_mid_int8(params_q, z):
        """sd_vae.decode_int8's XLA path with int8 mid resnets."""
        z = (z / sd_vae.SCALING_FACTOR).astype(jnp.bfloat16)
        h = conv(params_q["post_quant_conv"], z, padding=0)
        h = conv(params_q["dec_conv_in"], h)
        h = sd_vae._resnet_block_q(params_q["dec_mid"]["r0"], h)
        h = spatial_attention(params_q["dec_mid"]["attn"], h)
        h = sd_vae._resnet_block_q(params_q["dec_mid"]["r1"], h)
        for blk in params_q["dec_up"]:
            for rp in blk["resnets"]:
                h = sd_vae._resnet_block_q(rp, h)
            if "up" in blk:
                h = sd_vae._up_conv_q(blk["up"], h)
        h = sd_vae._conv_q(params_q["dec_conv_out"],
                           silu(group_norm(params_q["dec_norm_out"], h)))
        return jnp.clip(h.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    rng = np.random.default_rng(0)
    z0 = jnp.asarray(rng.standard_normal((B, 32, 32, 4)).astype(np.float32)
                     * sd_vae.SCALING_FACTOR)

    def bench(decode, params_q, name):
        @jax.jit
        def step(pq, z):
            y = decode(pq, z)
            p = y.reshape(B, 32, 8, 32, 8, 3).mean((2, 4))
            z2 = jnp.concatenate([p, p[..., :1]], axis=-1)
            return z * 0.9 + z2.astype(z.dtype) * (0.01 *
                                                   sd_vae.SCALING_FACTOR)

        def chain(k):
            z = z0
            for _ in range(k):
                z = step(params_q, z)
            np.asarray(z[0, 0, 0, :1])

        t0 = time.time()
        chain(2)
        print(f"#   {name}: compiled in {time.time() - t0:.0f}s", flush=True)
        t = {}
        for k in (args.k, 2 * args.k):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                chain(k)
                best = min(best, time.time() - t0)
            t[k] = best * 1e3
        per = (t[2 * args.k] - t[args.k]) / args.k
        print(f"#   {name}: {per:.2f} ms/decode (B={B})", flush=True)
        return round(per, 2)

    results = {
        "mid_bf16": bench(sd_vae.decode_int8, vq, "mid_bf16"),
        "mid_int8": bench(decode_mid_int8, vq_mid, "mid_int8"),
    }

    # quality smoke on the raw trees (dynamic activation scales — the
    # dummy static scales used for timing produce garbage values)
    a = np.asarray(jax.jit(sd_vae.decode_int8)(vq_raw, z0), np.float64)
    b = np.asarray(jax.jit(decode_mid_int8)(vq_mid_raw, z0), np.float64)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    out = {"bench": "vae_decode_mid_int8_ab", "b": B,
           "ms_per_decode": results, "rmse_unit_range": round(rmse, 5)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
