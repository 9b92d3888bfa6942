"""Int8 quality study for the shipped-on-by-default MuseTalk config
(VERDICT r3 item 3): PSNR of the int8 serving step vs the bf16 step on
STRUCTURED synthetic content, decomposed per stage and swept over the
calibration set size.

Content: a synthetic musetalk avatar (utils/synthetic.py — drifting
"head" with eyes/mouth, real VAE-encoded latents through the model's own
encoder), whisper contexts with REAL encoder statistics (1 s of noise
through the model's whisper encoder, runtime gather layout + positional
encoding) — the same distributions the engine feeds at runtime, unlike
the round-3 one-batch noise-latent probe.

Configs measured (each vs the same bf16 reference outputs):
  full            int8 U-Net (attn_int8) + int8 VAE (mid_int8) — shipped default
  conv_only       int8 convs only (attn/mid blocks bf16)
  unet_only       int8 U-Net -> bf16 VAE      (stage decomposition)
  vae_only        bf16 U-Net -> int8 VAE      (stage decomposition)
  full/ncal=N     calibration-set-size sweep for the default config
  vae_cal_unet_out  VAE calibrated on actual U-Net OUTPUT latents instead
                    of the encode-side proxy MuseReal uses

Usage: python tools/int8_quality_study.py [--batches 4] [--out FILE]
       [--tiny]  (tiny U-Net + small frames: CPU smoke of the harness)
Prints one JSON line per config; writes the full artifact to --out.

Reference quality bar: the fp16 pipeline at
reference avatars/musetalk_avatar.py:130-152 (no quantization); this
study quantifies what the TPU int8 default costs relative to bf16.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    rmse = float(np.sqrt(np.mean(
        (a.astype(np.float64) - b.astype(np.float64)) ** 2)))
    return 20 * float(np.log10(255.0 / max(rmse, 1e-9)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=4,
                    help="measurement batches of B=16 (distinct latent "
                         "indices + contexts)")
    ap.add_argument("--n_frames", type=int, default=24,
                    help="synthetic avatar cycle length (= full "
                         "calibration set)")
    ap.add_argument("--ncal", type=str, default="4,16,24",
                    help="calibration set sizes to sweep for the default "
                         "config")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny U-Net + 160x120 frames (CPU harness smoke)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from livetalking_tpu.avatars import musetalk_avatar as plugin
    from livetalking_tpu.config import default_opt
    from livetalking_tpu.models import musetalk as mt
    from livetalking_tpu.models import sd_unet, sd_vae
    from livetalking_tpu.models import whisper_encoder as we
    from livetalking_tpu.ops.whisper_mel import log_mel_spectrogram
    from livetalking_tpu.utils.synthetic import make_synthetic_musetalk_avatar

    B = 16
    hw = (120, 160) if args.tiny else (480, 640)
    opt = default_opt(musetalk_size="tiny" if args.tiny else "full",
                      dtype="bfloat16")
    t0 = time.time()
    model = plugin.load_model(opt)
    cfg = model["unet_cfg"]
    print(f"# model built ({time.time() - t0:.0f}s); encoding synthetic "
          f"avatar ({args.n_frames} frames {hw[1]}x{hw[0]})...", flush=True)

    tmp = tempfile.mkdtemp(prefix="lt_int8_study_")
    make_synthetic_musetalk_avatar(
        os.path.join(tmp, "avatars", "study"), model["vae_params"],
        n_frames=args.n_frames, frame_hw=hw)
    avatar = plugin.load_avatar("study", tmp)
    cycle = jnp.asarray(avatar["latent_cycle_host"])  # (N, 32, 32, 8)
    n_frames = int(cycle.shape[0])

    # whisper contexts with REAL encoder statistics, runtime gather layout
    # (the calibration recipe MuseReal ships — musetalk_avatar.py):
    # encode noise audio, take position-major/layer-fast 50-row windows
    wcfg = model["whisper_cfg"]

    @jax.jit
    def _enc(params, w):
        mel = log_mel_spectrogram(w)[None]
        return we.apply_stacked(params, wcfg, mel)[0]

    need = args.batches * B + n_frames
    states = []
    for s in range((need * 50) // (1500 * (wcfg.num_layers + 1)) + 1):
        wav = jax.random.normal(jax.random.PRNGKey(s), (16000 * 4,)) * 0.1
        states.append(np.asarray(_enc(model["whisper_params"], wav)
                                 .reshape(-1, wcfg.d_model)))
    flat = np.concatenate(states)[: need * 50]
    ctx_pool = jnp.asarray(flat.reshape(need, 50, wcfg.d_model))

    # bf16 reference outputs on `batches` distinct batches
    step_bf16 = mt.make_infer_fn(cfg, B, dtype=jnp.bfloat16)
    batches = []
    for k in range(args.batches):
        idxs = jnp.asarray((np.arange(B) * 3 + k * 7) % n_frames, jnp.int32)
        wctx = ctx_pool[n_frames + k * B: n_frames + (k + 1) * B]
        batches.append((idxs, wctx))
    print("# running bf16 reference...", flush=True)
    refs = [np.asarray(step_bf16(model["unet_params"], model["vae_params"],
                                 cycle, i, w)) for i, w in batches]

    # lip-sync feature-space scorer (SURVEY §7 names PSNR/LSE-D gates;
    # VERDICT r4 item 7): the repo's own musetalk-syncnet visual tower
    # embeds each batch's 16-frame lower-half window, and every int8
    # config reports (a) the embedding cosine vs the bf16 frames and
    # (b) the sync-confidence delta |cos(v,a)_int8 - cos(v,a)_bf16|
    # against one fixed mel window. Random-init weights (no trained
    # checkpoint obtainable here) make this a RELATIVE perturbation
    # gate in a mouth-region-sensitive feature space, not an absolute
    # LSE-D score — methodology recorded in the artifact.
    from livetalking_tpu.models import musetalk_syncnet as ms

    sync_cfg = ms.MUSETALK
    if args.tiny:  # same ladder, tiny channels. The early blocks need
        # >=32 channels (GroupNorm group count); the FINAL block needs
        # substantially more — at 1x1 spatial a 32ch/32-group norm has
        # one element per group and zeroes the embedding
        sync_cfg = ms.SyncNetConfig(
            audio=ms.EncoderConfig(1, (32,) * 5 + (256,),
                                   (2, 2, 2, 2, (5, 3), 1), (0,) * 6),
            visual=ms.EncoderConfig(48, (32,) * 7 + (256,),
                                    (2, 2, 2, 2, 2, 2, 2, (1, 2)),
                                    (0,) * 8))
    sync_params = ms.init_params(jax.random.PRNGKey(123), sync_cfg,
                                 jnp.float32)
    sync_mel = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 80, 52, 1)).astype(np.float32))
    sync_apply = jax.jit(lambda p, f, m: ms.apply(p, f, m, sync_cfg))

    def sync_embed(frames_u8: np.ndarray):
        """(16, S, S, 3) uint8 BGR -> (v_emb (D,), sync_cos float)."""
        h = frames_u8.shape[1]
        lower = frames_u8[:, h // 2:, :, :].astype(np.float32) / 255.0
        if lower.shape[1:3] != (128, 256):
            import cv2 as _cv2

            lower = np.stack([
                _cv2.resize(f, (256, 128), interpolation=_cv2.INTER_LINEAR)
                for f in lower])
        # 16-frame channel-concat window (the tower's 48ch ladder input)
        cat = np.concatenate(list(lower), axis=-1)[None]  # (1, 128, 256, 48)
        v, a = sync_apply(sync_params, jnp.asarray(cat), sync_mel)
        v, a = np.asarray(v)[0], np.asarray(a)[0]
        return v, float(np.dot(v, a))

    ref_sync = [sync_embed(r) for r in refs]

    # calibration inputs (the MuseReal recipe, parameterized by ncal)
    tt = lambda n: jnp.zeros((n,), jnp.float32)  # noqa: E731

    def cal_unet(q, ncal):
        zc = cycle[:ncal].astype(jnp.bfloat16)
        pe = jnp.asarray(mt.positional_encoding_table(50, cfg.cross_dim))
        ctx = (ctx_pool[:ncal] + pe).astype(jnp.bfloat16)
        return sd_unet.calibrate_unet(model["unet_params"], q, cfg,
                                      zc, tt(ncal), ctx)

    def cal_vae(q, ncal, on_unet_out=False):
        if on_unet_out:
            # calibrate on what the decoder ACTUALLY sees at runtime:
            # U-Net output latents (bf16 net on the calibration inputs)
            pe = jnp.asarray(mt.positional_encoding_table(50, cfg.cross_dim))
            ctx = (ctx_pool[:ncal] + pe).astype(jnp.bfloat16)
            z = jax.jit(lambda p, x, t, c: sd_unet.apply(p, cfg, x, t, c))(
                model["unet_params"], cycle[:ncal].astype(jnp.bfloat16),
                tt(ncal), ctx)
        else:
            # the shipped proxy: encode-side reference-face latents
            z = cycle[:ncal, :, :, 4:]
        return sd_vae.calibrate_decoder(model["vae_params"], q, z)

    def measure(name, unet_int8, vae_int8, attn, mid, ncal,
                vae_on_unet_out=False):
        up = model["unet_params"]
        vp = model["vae_params"]
        if unet_int8:
            up = cal_unet(sd_unet.quantize_unet(up, attn_int8=attn), ncal)
        if vae_int8:
            vp = cal_vae(sd_vae.quantize_decoder(vp, mid_int8=mid), ncal,
                         on_unet_out=vae_on_unet_out)
        step = mt.make_infer_fn(cfg, B, dtype=jnp.bfloat16,
                                vae_int8=vae_int8, unet_int8=unet_int8)
        outs = [np.asarray(step(up, vp, cycle, i, w)) for i, w in batches]
        vals = [psnr(o, r) for o, r in zip(outs, refs)]
        emb_cos, sync_delta = [], []
        for o, (rv, rcos) in zip(outs, ref_sync):
            v, c = sync_embed(o)
            emb_cos.append(float(np.dot(v, rv)))
            sync_delta.append(abs(c - rcos))
        row = {"config": name, "unet_int8": unet_int8, "vae_int8": vae_int8,
               "attn_int8": attn, "vae_mid_int8": mid, "ncal": ncal,
               "vae_cal_on_unet_out": vae_on_unet_out,
               "psnr_db_mean": round(float(np.mean(vals)), 2),
               "psnr_db_min": round(float(np.min(vals)), 2),
               "psnr_db_per_batch": [round(v, 2) for v in vals],
               "syncnet_emb_cos_vs_bf16_mean": round(float(np.mean(emb_cos)), 5),
               "syncnet_emb_cos_vs_bf16_min": round(float(np.min(emb_cos)), 5),
               "syncnet_sync_cos_delta_max": round(float(np.max(sync_delta)), 5)}
        print(json.dumps(row), flush=True)
        return row

    ncals = [min(int(v), n_frames) for v in args.ncal.split(",")]
    rows = []
    # per-stage decomposition at the shipped ncal=4
    rows.append(measure("full", True, True, True, True, ncals[0]))
    rows.append(measure("conv_only", True, True, False, False, ncals[0]))
    rows.append(measure("unet_only", True, False, True, True, ncals[0]))
    rows.append(measure("vae_only", False, True, True, True, ncals[0]))
    # calibration sweep for the default config
    for nc in ncals[1:]:
        rows.append(measure(f"full_ncal{nc}", True, True, True, True, nc))
    # decoder calibrated on actual U-Net outputs
    rows.append(measure("full_vae_cal_unet_out", True, True, True, True,
                        ncals[0], vae_on_unet_out=True))

    artifact = {
        "metric": "musetalk_int8_quality_study",
        "frame_hw": list(hw), "batch": B, "batches": args.batches,
        "n_frames": n_frames, "tiny": bool(args.tiny),
        "content": "structured synthetic avatar (real VAE-encoded "
                   "latents) + real-whisper-statistics contexts",
        "reference": "bf16 step on identical inputs (random-init weights; "
                     "real checkpoints unobtainable in this environment)",
        "syncnet_methodology": "relative lip-sync feature gate: the repo's "
                     "musetalk-syncnet visual tower (random init) embeds "
                     "each batch's 16-frame lower-half window; rows report "
                     "cos(v_int8, v_bf16) and the sync-confidence delta "
                     "against one fixed mel — a perturbation measure in a "
                     "mouth-sensitive feature space, NOT absolute LSE-D",
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": "musetalk_int8_quality_study",
                      "configs": len(rows),
                      "default_psnr_db": rows[0]["psnr_db_mean"]}),
          flush=True)


if __name__ == "__main__":
    main()
