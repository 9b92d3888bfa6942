"""VAE-decoder MFU / roofline study (VERDICT r3 item 4 close-out).

The int8 MuseTalk VAE decode is ~2/3 of the serving step (39.5 ms at
B=16 after the r3 folded-dilated-upsampler win) and two kernel attacks
lost honest A/Bs (fused gnq chain over the up-block resnets; the
sub-pixel fused upsampler). This study answers WHY by placing every
quantized decoder conv on the v5e roofline:

- walk the quantized tree, enumerate each conv site (shape, count,
  spatial position in the decode);
- time each distinct shape standalone (XLA int8 conv including its
  quantize producer — the production `conv_q` path), python-side
  chained two-K loop (CLAUDE.md methodology);
- compute achieved TOP/s, arithmetic intensity (int8 in / bf16 out /
  int8 weights, quantize fused into the producer), the roofline bound
  min(PEAK_INT8, intensity x HBM_BW), and the bound type;
- reconcile: sum of per-shape measured times vs the measured full
  decode, so fusion wins/losses are visible.

v5e peaks: 394 TOP/s int8 MXU, 819 GB/s HBM.

Usage: python tools/vae_mfu_study.py [--b 16] [--k 24] [--out FILE]
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

PEAK_INT8_TOPS = 394e12
HBM_BW = 819e9


def inventory(vq, h0: int = 32):
    """Walk the quantized decoder tree -> [(label, H, W, Cin, Cout, k)]
    with per-shape multiplicities, tracking the spatial size through the
    up-chain (mirrors sd_vae.decode_int8's traversal)."""
    sites = []

    def add(label, H, pq, k):
        wq = np.asarray(pq["wq"])  # (kh, kw, Cin, Cout)
        sites.append((label, H, H, int(wq.shape[2]), int(wq.shape[3]),
                      int(wq.shape[0])))

    h = h0
    mid = vq["dec_mid"]
    if "wq" in mid["r0"]["conv1"]:
        for rname in ("r0", "r1"):
            rp = mid[rname]
            add(f"mid.{rname}.conv1", h, rp["conv1"], 3)
            add(f"mid.{rname}.conv2", h, rp["conv2"], 3)
            if "conv_shortcut" in rp:
                add(f"mid.{rname}.short", h, rp["conv_shortcut"], 1)
    for bi, blk in enumerate(vq["dec_up"]):
        for ri, rp in enumerate(blk["resnets"]):
            add(f"up{bi}.r{ri}.conv1", h, rp["conv1"], 3)
            add(f"up{bi}.r{ri}.conv2", h, rp["conv2"], 3)
            if "conv_shortcut" in rp:
                add(f"up{bi}.r{ri}.short", h, rp["conv_shortcut"], 1)
        if "up" in blk:
            h *= 2
            add(f"up{bi}.upsampler(post-2x)", h, blk["up"], 3)
    add("conv_out", h, vq["dec_conv_out"], 3)
    return sites


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from livetalking_tpu.avatars.musetalk_avatar import _with_dummy_scales
    from livetalking_tpu.models import sd_vae
    from livetalking_tpu.models.diffusion_blocks import conv_q
    from livetalking_tpu.utils.jaxinit import jit_init

    B = args.b
    print(f"# init + quantize (B={B}) on {jax.devices()[0].platform}",
          flush=True)
    vp = jit_init(sd_vae.init_params, jax.random.PRNGKey(0), jnp.bfloat16)
    vq = _with_dummy_scales(sd_vae.quantize_decoder(vp))

    sites = inventory(vq)
    # measure each DISTINCT (H, Cin, Cout, k) once
    distinct = {}
    for label, H, W, ci, co, k in sites:
        distinct.setdefault((H, ci, co, k), []).append(label)

    rng = np.random.default_rng(0)

    # Per-dispatch host overhead baseline: a null step with the same
    # carry structure but a trivial body. The two-K difference cancels
    # per-RUN constants but NOT per-STEP dispatch cost, which for ~1 ms
    # programs is a large relative inflation (the tunnel-dispatch
    # artifact CLAUDE.md documents); subtract it per step.
    x_null = jnp.zeros((B, 8, 8, 8), jnp.bfloat16)

    @jax.jit
    def null_step(x):
        s = 1.0 + 1e-6 * jnp.tanh(jnp.mean(x.astype(jnp.float32)))
        return x * s.astype(jnp.bfloat16), x

    def null_run(kn):
        x = x_null
        x, y = null_step(x)
        float(jnp.sum(y.astype(jnp.float32))[None][0])
        t0 = time.perf_counter()
        for _ in range(kn):
            x, y = null_step(x)
        float(jnp.sum(y.astype(jnp.float32))[None][0])
        return time.perf_counter() - t0

    nk1, nk2 = 8, 48
    overhead = max(0.0, (null_run(nk2) - null_run(nk1)) / (nk2 - nk1))
    print(json.dumps({"per_dispatch_overhead_ms":
                      round(overhead * 1e3, 3)}), flush=True)

    rows = []
    for (H, ci, co, k), labels in sorted(distinct.items()):
        pq = None
        for label, Hh, _W, cci, cco, kk in sites:
            if (Hh, cci, cco, kk) == (H, ci, co, k):
                # find the actual param dict again by label walk
                pq = _find(vq, label)
                break
        x0 = jnp.asarray(rng.standard_normal((B, H, H, ci))
                         .astype(np.float32)).astype(jnp.bfloat16)
        pad = 1 if k == 3 else 0

        @jax.jit
        def step(pq, x):
            y = conv_q(pq, x, padding=pad)
            # data-dependent carry back to the input shape: scale x0 by a
            # scalar derived from y so steps chain without shape tricks
            s = 1.0 + 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
            return (x * s.astype(jnp.bfloat16)), y

        def run(kn):
            x = x0
            x, y = step(pq, x)  # warm
            float(jnp.sum(y.astype(jnp.float32))[None][0])
            t0 = time.perf_counter()
            for _ in range(kn):
                x, y = step(pq, x)
            float(jnp.sum(y.astype(jnp.float32))[None][0])
            return time.perf_counter() - t0

        k1, k2 = max(2, args.k // 4), args.k
        raw = (run(k2) - run(k1)) / (k2 - k1)
        t = max(1e-6, raw - overhead)
        floor = raw < 2.0 * overhead  # program ~ dispatch overhead:
        # the subtraction is noise-dominated, report raw + flag instead
        flops = 2.0 * B * H * H * (k * k) * ci * co
        byts = (2.0 * B * H * H * ci      # bf16 activation read
                + 2.0 * B * H * H * co    # bf16 output write
                + 1.0 * (k * k) * ci * co)  # int8 weights
        intensity = flops / byts
        roof = min(PEAK_INT8_TOPS, intensity * HBM_BW)
        row = {
            "shape": f"{H}px {ci}->{co} k{k}", "count": len(labels),
            "ms": round(t * 1e3, 3),
            "raw_ms": round(raw * 1e3, 3),
            "below_measurement_floor": floor,
            "tops_achieved": None if floor else round(flops / t / 1e12, 1),
            "mfu_vs_int8_peak": (None if floor
                                 else round(flops / t / PEAK_INT8_TOPS, 3)),
            "intensity_flops_per_byte": round(intensity, 1),
            "roofline_bound_tops": round(roof / 1e12, 1),
            "pct_of_roofline": (None if floor
                                else round(flops / t / roof, 3)),
            "bound": ("compute" if intensity * HBM_BW > PEAK_INT8_TOPS
                      else "bandwidth"),
            "sites": labels,
        }
        rows.append(row)
        print(json.dumps({kk: vv for kk, vv in row.items()
                          if kk != "sites"}), flush=True)

    # reconcile vs the full measured decode (shipped config)
    sum_ms = sum((r["raw_ms"] if r["below_measurement_floor"] else r["ms"])
                 * r["count"] for r in rows)
    z0 = jnp.asarray(rng.standard_normal((B, 32, 32, 4)).astype(np.float32)
                     * sd_vae.SCALING_FACTOR)

    @jax.jit
    def dec_step(vq, z):
        img = sd_vae.decode_int8(vq, z.astype(jnp.bfloat16))
        s = 1.0 + 1e-6 * jnp.tanh(jnp.mean(img))
        return z * s, img

    def drun(kn):
        z = z0
        z, img = dec_step(vq, z)
        float(jnp.sum(img)[None][0])
        t0 = time.perf_counter()
        for _ in range(kn):
            z, img = dec_step(vq, z)
        float(jnp.sum(img)[None][0])
        return time.perf_counter() - t0

    k1, k2 = 4, 12
    dec_ms = ((drun(k2) - drun(k1)) / (k2 - k1) - overhead) * 1e3
    artifact = {
        "metric": "vae_decode_mfu_study", "batch": B,
        "peak_int8_tops": PEAK_INT8_TOPS / 1e12, "hbm_gbps": HBM_BW / 1e9,
        "per_dispatch_overhead_ms": round(overhead * 1e3, 3),
        "rows": rows,
        "sum_of_conv_ms": round(sum_ms, 1),
        "measured_decode_ms": round(dec_ms, 1),
        "non_conv_and_fusion_delta_ms": round(dec_ms - sum_ms, 1),
        "note": "per-shape timing includes the quantize producer (the "
                "production conv_q path); decode also runs GroupNorm/SiLU/"
                "attention/upsample passes that XLA partially fuses, so "
                "the delta column captures fusion wins minus non-conv "
                "work",
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": "vae_decode_mfu_study",
                      "measured_decode_ms": artifact["measured_decode_ms"],
                      "sum_of_conv_ms": artifact["sum_of_conv_ms"]}),
          flush=True)


def _find(vq, label: str):
    """Resolve an inventory label back to its param dict."""
    parts = label.split(".")
    if parts[0] == "mid":
        rp = vq["dec_mid"][parts[1]]
        return (rp["conv_shortcut"] if parts[2] == "short"
                else rp[parts[2]])
    if parts[0] == "conv_out":
        return vq["dec_conv_out"]
    bi = int(parts[0][2:])
    blk = vq["dec_up"][bi]
    if parts[1].startswith("upsampler"):
        return blk["up"]
    rp = blk["resnets"][int(parts[1][1:])]
    return rp["conv_shortcut"] if parts[2] == "short" else rp[parts[2]]


if __name__ == "__main__":
    main()
