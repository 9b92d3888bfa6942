"""BASELINE target 2 bench: N concurrent MuseTalk sessions through the
REAL cross-session BatchScheduler on one chip.

Methodology
-----------
- N session threads, each driving the full serving sequence per 16-frame
  batch: whisper feature encode (the rolling-window program
  audio_features/whisper_features.py runs per batch) -> submit to the
  shared engine/scheduler.py BatchScheduler (real coalescing, bucket
  padding, double-buffered dispatch) -> block on the resolved result.
- Sessions run closed-loop (submit next batch when the previous resolves)
  so the measured rate is the sustainable per-session throughput under
  full back-pressure — the ceiling for `finalfps` (egress pacing is 25
  fps; real-time holds iff this ceiling >= 25, reference README.md:188).
- Tunnel-only deviation: the per-batch result fetched to the host is a
  64x-subsampled view of the produced frames (a few KB) instead of the
  full (N*16, 256, 256, 3) tensor, because the dev chip sits behind a
  ~3 MB/s HTTP tunnel; the subsample depends on every output pixel, so
  device work is fully serialized into the timing. On direct-attached
  TPUs the full-frame D2H is PCIe-bound and amply fits 8x25 fps.

Usage:  python bench_serving.py [--sessions 8] [--batch 16] [--secs 20]
        [--no-int8] [--out SERVING.json]
Prints one JSON line; optionally writes the full artifact to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main() -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="musetalk",
                    choices=["musetalk", "wav2lip", "ultralight", "ernerf"])
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=20.0)
    ap.add_argument("--warmup", type=int, default=3, help="warmup batches/session")
    ap.add_argument("--no-int8", action="store_true",
                    help="bf16 U-Net+VAE instead of the int8 serving path")
    ap.add_argument("--no-whisper", action="store_true",
                    help="skip the per-batch whisper feature encode")
    ap.add_argument("--whisper_short", action="store_true",
                    help="short-window whisper features (the "
                         "--whisper_short_window serving fast path)")
    ap.add_argument("--per-session-feats", action="store_true",
                    help="each session encodes its own features "
                         "(staggered submits; the naive architecture)")
    ap.add_argument("--inflight", type=int, default=2,
                    help="rounds in flight (2 = resolve round k while "
                         "k+1 runs on device; 1 = the old serialized "
                         "drive that idles the device for the D2H RTT + "
                         "host scatter between rounds)")
    ap.add_argument("--session_inflight", type=int, default=2,
                    help="engine mode: per-session batches kept in "
                         "flight (config --session_inflight); 1 = the "
                         "synchronous loop (latency-bound, measured 18.9 "
                         "fps/session at 8 sessions)")
    ap.add_argument("--max_bucket", type=int, default=8,
                    help="engine mode: largest coalescing bucket (the "
                         "bucket-16 super-batch OOMs v5e HBM at 480x640 "
                         "with device paste-back; default 8)")
    ap.add_argument("--engine", action="store_true",
                    help="drive the REAL engine end to end: N MuseReal "
                         "sessions with render/inference/compose threads, "
                         "queue transport egress, --coalesce "
                         "--device_paste_back composed (finalfps per the "
                         "reference definition, reference "
                         "server/webrtc.py:149)")
    ap.add_argument("--warm_frames", type=int, default=0,
                    help="engine mode: per-session egress frames required "
                         "before the timed window opens (0 = auto, 8*B — "
                         "covers the bucket-ladder compiles)")
    ap.add_argument("--paced", action="store_true",
                    help="engine mode: consume egress at the real-time "
                         "25 fps cadence instead of free-running — the "
                         "deployment regime (device idles between "
                         "rounds); latency then measures what a viewer "
                         "experiences, and fps/session ~25 with zero "
                         "starvation is the pass criterion")
    ap.add_argument("--coalesce_window_ms", type=float, default=-1.0,
                    help="engine mode: idle-device session-alignment "
                         "window (config --coalesce_window_ms; -1 auto = "
                         "one request period)")
    ap.add_argument("--frame_h", type=int, default=480)
    ap.add_argument("--frame_w", type=int, default=640)
    ap.add_argument("--d2h_subsample", type=int, default=16,
                    help="engine mode: stride-subsample composed frames "
                         "before D2H (tunnel workaround; 1 = full frames)")
    ap.add_argument("--calibrated", action="store_true",
                    help="engine mode: real int8 calibration instead of "
                         "dummy scales (identical graph; adds the "
                         "calibration compile+walk to startup)")
    ap.add_argument("--fused_vae", action="store_true",
                    help="engine mode: route the int8 VAE up-chain onto "
                         "the fused pallas kernel (LT_FUSED_VAE=1)")
    ap.add_argument("--tiny", action="store_true",
                    help="engine mode: tiny U-Net config (smoke runs)")
    ap.add_argument("--egress_buffer_frames", type=int, default=5,
                    help="engine mode: render-loop back-pressure "
                         "threshold (config --egress_buffer_frames); "
                         "paced runs can deepen the jitter buffer")
    ap.add_argument("--ultralight_per_session", action="store_true",
                    help="ultralight: r4 per-session topology (no shared "
                         "scheduler) instead of the stacked-weights "
                         "coalesced default")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    # budget-aware degradation (bench.py sets BENCH_REMAINING_S): a tight
    # slot shrinks the measured window rather than losing the metric
    rem = float(os.environ.get("BENCH_REMAINING_S", "1e9"))
    if rem < 900.0 and args.secs > 15.0:
        args.secs = 15.0
        print(f"# tight budget ({rem:.0f}s): measured window -> 15s",
              flush=True)
    if args.engine:
        return _engine_serving(args)

    import jax
    import jax.numpy as jnp

    from livetalking_tpu.engine.scheduler import AvatarStore, BatchScheduler
    from livetalking_tpu.models import musetalk as mt
    from livetalking_tpu.models import sd_unet, sd_vae
    from livetalking_tpu.models import whisper_encoder as we
    from livetalking_tpu.ops.whisper_mel import log_mel_spectrogram
    from livetalking_tpu.utils.jaxinit import jit_init

    N, B = args.sessions, args.batch
    use_int8 = not args.no_int8 and args.family == "musetalk"
    dtype = jnp.bfloat16
    cfg = sd_unet.MUSETALK
    rng = np.random.default_rng(0)

    print(f"# building models (family={args.family}, int8={use_int8}, "
          f"sessions={N}, B={B}) on {jax.devices()[0].platform}", flush=True)
    if args.family == "wav2lip":
        return _wav2lip_serving(args, N, B, rng)
    unet_params = jit_init(sd_unet.init_params, jax.random.PRNGKey(0), cfg, dtype)
    vae_params = jit_init(sd_vae.init_params, jax.random.PRNGKey(1), dtype)
    if use_int8:
        # device-native (jnp) quantize: weights never leave the chip, and
        # eager per-conv ops avoid one huge remote compile. Static unit
        # activation scales stand in for calibrated ones — the "as"
        # scalar yields the IDENTICAL compute graph (calibration changes
        # values, not cost), and skipping it avoids compiling the big
        # calibration walk just for a throughput bench.
        print("# quantizing on device...", flush=True)
        from livetalking_tpu.avatars.musetalk_avatar import _with_dummy_scales

        unet_params = _with_dummy_scales(sd_unet.quantize_unet(unet_params))
        vae_params = _with_dummy_scales(sd_vae.quantize_decoder(vae_params))

    print("# building avatar store...", flush=True)
    # shared store: one synthetic latent cycle per session
    store = AvatarStore(item_shape=(32, 32, 8), dtype=np.float32)
    offsets = []
    n_frames = 25
    for s in range(N):
        lat = rng.standard_normal((n_frames, 32, 32, 8)).astype(np.float32) * 0.2
        off, _ = store.add(f"bench_{s}", lat)
        offsets.append(off)

    # one fused step per bucket; result subsampled for the tunnel (see
    # module docstring) — the slice depends on the full decode, so the
    # fetch serializes all device work into the timing
    def step_factory(total):
        step = mt.make_infer_fn(cfg, total, dtype=dtype,
                                vae_int8=use_int8, unet_int8=use_int8)

        def wrapped(params, buffer, idxs, whisper):
            frames = step(params[0], params[1], buffer, idxs, whisper)
            return frames[:, ::64, ::64, :]  # (total, 4, 4, 3) uint8
        return jax.jit(wrapped)

    sched = BatchScheduler((unet_params, vae_params), store, step_factory,
                           B, buckets=(N,))
    sched.start()

    # per-batch whisper feature program (the serving rolling window:
    # 2*B 20 ms chunks + strides — the same gather
    # audio_features/whisper_features.py jits). Cross-session BATCHED:
    # one (N, window) encode per round instead of N staggered singles —
    # submissions then land together and super-batches coalesce fully.
    whisper_params = jit_init(we.init_params, jax.random.PRNGKey(2), we.TINY, dtype)
    wcfg = we.TINY
    # rolling window: (2B + l + r) 20 ms chunks of 320 samples
    # (audio_features/base.py chunk = 16000 // (fps*2)); SERVING_r02's
    # committed runs used 640 — a 2x-longer window, i.e. a CONSERVATIVE
    # overestimate of the real per-batch whisper cost
    window_samples = (2 * B + 20) * 320
    if args.whisper_short:
        mel_samples = ((window_samples + 319) // 320) * 320
    else:
        mel_samples = 480000  # full 30 s pad (reference distribution)
    rows = np.clip(np.arange(B)[:, None] * 2 + np.arange(10)[None] + 10,
                   0, mel_samples // 320 - 1)

    @jax.jit
    def whisper_feats(params, wav):
        mel = log_mel_spectrogram(wav, n_samples=mel_samples)[None]
        states = we.apply_stacked(params, wcfg, mel.astype(dtype))[0]
        g = jnp.take(states, jnp.asarray(rows).reshape(-1), axis=0)
        return g.reshape(B, -1, wcfg.d_model).astype(jnp.float32)

    @jax.jit
    def whisper_feats_batched(params, wavs):  # (N, window) -> (N, B, 50, D)
        mels = jax.vmap(lambda w: log_mel_spectrogram(
            w, n_samples=mel_samples))(wavs)
        states = we.apply_stacked(params, wcfg, mels.astype(dtype))
        g = jnp.take(states, jnp.asarray(rows).reshape(-1), axis=1)
        return g.reshape(wavs.shape[0], B, -1,
                         wcfg.d_model).astype(jnp.float32)

    wavs = [jnp.asarray(rng.standard_normal(window_samples).astype(np.float32)
                        * 0.1) for _ in range(N)]
    wav_stack = jnp.stack(wavs)

    print("# compiling (first super-batch + whisper)...", flush=True)
    t0 = time.time()
    if not args.no_whisper:
        whisper_feats(whisper_params, wavs[0]).block_until_ready()
    warm_ctx = jnp.asarray(
        rng.standard_normal((B, 50, 384)).astype(np.float32))
    sched.infer(np.arange(B, dtype=np.int32) % n_frames, warm_ctx)
    print(f"# compile done in {time.time() - t0:.0f}s", flush=True)

    counts = [0] * N
    stop = threading.Event()
    errors = []

    def session(sid: int):
        """--per-session-feats: the naive architecture, each session
        serializes its own feature encode -> submissions stagger and
        super-batches coalesce poorly (measured 9.6 fps/session vs 25
        needed; kept for comparison)."""
        local = np.random.default_rng(sid)
        warm = 0
        try:
            while not stop.is_set():
                idxs = (offsets[sid]
                        + (local.integers(0, n_frames - B)
                           + np.arange(B)) % n_frames).astype(np.int32)
                if args.no_whisper:
                    ctx = warm_ctx
                else:
                    ctx = whisper_feats(whisper_params, wavs[sid])
                sched.infer(idxs, ctx)
                if warm < args.warmup:
                    warm += 1
                    continue
                counts[sid] += B
        except Exception as e:  # pragma: no cover
            errors.append(f"session {sid}: {e}")

    def round_driver():
        """Default: coalesced feature extraction — ONE batched whisper
        encode for all sessions per round, then all N submits land
        together so every super-batch is full. Rounds are pipelined one
        deep (features for round k+1 dispatch while round k resolves)."""
        local = np.random.default_rng(0)
        warm = 0

        def make_idxs():
            return [(offsets[s] + (local.integers(0, n_frames - B)
                                   + np.arange(B)) % n_frames
                     ).astype(np.int32) for s in range(N)]

        def encode():
            if args.no_whisper:
                return [warm_ctx] * N
            f = whisper_feats_batched(whisper_params, wav_stack)
            return [f[s] for s in range(N)]

        from collections import deque

        def resolve(futs):
            nonlocal warm
            for s, f in enumerate(futs):
                f.result(timeout=120)
                if warm >= args.warmup:
                    counts[s] += B
            warm += 1

        try:
            inflight: deque = deque()
            feats = encode()
            while not stop.is_set():
                inflight.append([sched.submit(i, c)
                                 for i, c in zip(make_idxs(), feats)])
                feats = encode()  # overlaps with the in-flight rounds
                # keep `--inflight` rounds queued: the device starts
                # round k+1 from the scheduler's own double buffer while
                # the host is still fetching/scattering round k's result
                # (one round deep, the D2H RTT serializes every round)
                if len(inflight) >= max(1, args.inflight):
                    resolve(inflight.popleft())
            while inflight:
                resolve(inflight.popleft())
        except Exception as e:  # pragma: no cover
            errors.append(f"round driver: {e}")

    if args.per_session_feats:
        threads = [threading.Thread(target=session, args=(s,), daemon=True)
                   for s in range(N)]
    else:
        threads = [threading.Thread(target=round_driver, daemon=True)]
    for t in threads:
        t.start()
    # wait until warmup passed, then open the timing window
    while any(c == 0 for c in counts) and not errors:
        time.sleep(0.2)
    snap0 = list(counts)
    t_start = time.time()
    time.sleep(args.secs)
    snap1 = list(counts)
    elapsed = time.time() - t_start
    stop.set()
    for t in threads:
        t.join(timeout=60)
    sched.stop()
    if errors:
        raise RuntimeError("; ".join(errors))

    per_session = [(b - a) / elapsed for a, b in zip(snap0, snap1)]
    result = {
        "metric": "musetalk_serving_finalfps_per_session",
        "value": round(min(per_session), 2),
        "unit": "frames/s/session",
        "vs_baseline": round(min(per_session) / 25.0, 2),
        "sessions": N,
        "batch": B,
        "int8": use_int8,
        "whisper_per_batch": not args.no_whisper,
        "whisper_short_window": bool(args.whisper_short),
        "feature_coalescing": not args.per_session_feats,
        "per_session_fps": [round(v, 2) for v in per_session],
        "aggregate_fps": round(sum(per_session), 1),
        "elapsed_s": round(elapsed, 1),
        "batches_run": sched.batches_run,
        "methodology": "closed-loop N-session drive through the real "
                       "BatchScheduler; per-batch whisper feature encode; "
                       "result fetched as a 64x frame subsample (tunnel "
                       "workaround, computation fully serialized)",
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


def _engine_serving(args) -> dict:
    """True egress measurement: N MuseReal sessions running the FULL
    per-session pipeline (render loop -> whisper feature coalescer ->
    shared BatchScheduler with DEVICE paste-back composed into the
    super-batch step -> process_frames -> queue transport), counting
    frames at the transport egress — `finalfps` per the reference
    definition (reference server/webrtc.py:149), compose INCLUDED.

    Tunnel-only deviation (same spirit as the module docstring): the
    composed FULL frames are stride-subsampled on device before the D2H
    fetch (--d2h_subsample, a production PCIe host runs 1 — 8 sessions
    x 25 fps x 480x640x3 u8 = 184 MB/s, trivial on PCIe, impossible on
    the ~3 MB/s dev tunnel). Every subsampled pixel depends on the
    composite, so device work is fully serialized into the timing.
    """
    import queue as pyqueue
    import tempfile
    from threading import Event, Thread

    if args.fused_vae:
        os.environ["LT_FUSED_VAE"] = "1"

    from livetalking_tpu import registry
    from livetalking_tpu.config import default_opt
    from livetalking_tpu.utils.synthetic import (
        make_synthetic_avatar,
        make_synthetic_musetalk_avatar,
    )

    family = args.family
    N, B = args.sessions, args.batch
    use_int8 = not args.no_int8 and family == "musetalk"
    # cap the largest super-batch at 8 sessions: the bucket-16 program
    # (256 frames, full U-Net+VAE+device paste at 480x640) exceeds v5e
    # HBM — measured "Used 16.03G of 15.75G hbm" compile OOM — so >8
    # sessions ride multiple in-flight 8-buckets instead
    cap = max(1, int(args.max_bucket))
    # with pipelined sessions (inflight 2) up to N*inflight requests are
    # outstanding at once: a bucket that size lets the scheduler run ONE
    # wide super-batch per period instead of two half-width rounds
    # (fewer dispatch/D2H round-trips) — bounded by --max_bucket, which
    # exists because bucket-16 at B=16 (256 frames, 480x640 paste) OOMs
    # v5e HBM
    wide = N * max(1, args.session_inflight)
    buckets = sorted({b for b in (1, 2, 4, 8, N, wide)
                      if b <= min(wide, cap)})
    tmp = tempfile.mkdtemp(prefix="lt_bench_engine_")
    # r5: ultralight now coalesces too (stacked per-avatar weights +
    # slot select, models/ultralight.py make_grouped_infer_fn);
    # --ultralight_per_session restores the r4 per-session topology A/B.
    # ernerf keeps the per-session topology (per-avatar NeRF fields,
    # no scheduler wiring — the family's capacity curve is measured on
    # the reference topology).
    coalesce = (family in ("musetalk", "wav2lip")
                or (family == "ultralight"
                    and not args.ultralight_per_session))
    base = dict(
        transport="queue", tts="dummy", batch_size=B, model=family,
        coalesce=coalesce, device_paste_back=coalesce,
        vae_int8=use_int8, unet_int8=use_int8,
        whisper_short_window=bool(args.whisper_short),
        coalesce_buckets=",".join(str(b) for b in buckets),
        coalesce_window_ms=float(args.coalesce_window_ms),
        d2h_subsample=max(1, args.d2h_subsample),
        session_inflight=max(1, args.session_inflight),
        egress_buffer_frames=max(1, args.egress_buffer_frames),
        musetalk_size="tiny" if args.tiny else "full",
    )
    print(f"# engine serving: family={family} N={N} B={B} int8={use_int8} "
          f"frame={args.frame_w}x{args.frame_h} "
          f"d2h_sub={base['d2h_subsample']} buckets={buckets} "
          f"calibrated={args.calibrated} fused_vae={args.fused_vae}",
          flush=True)

    opt0 = default_opt(sessionid="bench0", **base)
    if family == "musetalk":
        from livetalking_tpu.avatars import musetalk_avatar as plugin
        from livetalking_tpu.models import sd_unet, sd_vae

        model = plugin.load_model(opt0)  # random-init fallbacks, real graphs
        make_synthetic_musetalk_avatar(
            os.path.join(tmp, "avatars", "bench"), model["vae_params"],
            n_frames=10, frame_hw=(args.frame_h, args.frame_w))
        avatar = plugin.load_avatar("bench", tmp)

        if use_int8 and not args.calibrated:
            # dummy scales: identical compute graph, garbage values —
            # skips the calibration walk (throughput-only run;
            # --calibrated pairs real quality with the same timing)
            from livetalking_tpu.avatars.musetalk_avatar import (
                _with_dummy_scales,
            )

            print("# quantizing (dummy scales)...", flush=True)
            model["unet_params_q"] = _with_dummy_scales(
                sd_unet.quantize_unet(model["unet_params"]))
            model["vae_params_q"] = _with_dummy_scales(
                sd_vae.quantize_decoder(model["vae_params"]))
    elif family == "wav2lip":
        from livetalking_tpu.avatars import wav2lip_avatar as plugin

        model = plugin.load_model("", opt0)  # random init, real graph
        make_synthetic_avatar(
            os.path.join(tmp, "avatars", "bench"), n_frames=10,
            frame_hw=(args.frame_h, args.frame_w))
        avatar = plugin.load_avatar("bench", tmp)
    elif family == "ultralight":
        from livetalking_tpu.avatars import ultralight_avatar as plugin

        model = plugin.load_model(opt0)
        make_synthetic_avatar(
            os.path.join(tmp, "avatars", "bench"), n_frames=10,
            frame_hw=(args.frame_h, args.frame_w), face_size=168,
            coord_order="xy")
        avatar = plugin.load_avatar("bench", tmp)
    else:  # ernerf: per-session triplane render, reference topology
        from livetalking_tpu.avatars import ernerf_avatar as plugin

        model = plugin.load_model(opt0)
        make_synthetic_avatar(
            os.path.join(tmp, "avatars", "bench"), n_frames=10,
            frame_hw=(args.frame_h, args.frame_w))
        avatar = plugin.load_avatar("bench", tmp)

    if coalesce:
        plugin.reset_shared_scheduler()
    print("# building sessions...", flush=True)
    sessions = [
        registry.create("avatar", family,
                        opt=default_opt(sessionid=f"s{i}", **base),
                        model=model, avatar=avatar)
        for i in range(N)
    ]
    sched = plugin._shared["scheduler"] if coalesce else None
    if coalesce:
        assert sessions[0]._scheduler_composes, "device paste not composed"
        # compile every bucket program BEFORE traffic: lazily-landing
        # first-contact compiles (bucket ladder + whisper-encode buckets)
        # otherwise stall requests INSIDE the timed window (measured
        # B=8: p90 13.8 s, 5 fps/session — all compile wait)
        print("# prewarming scheduler buckets...", flush=True)
        if family == "musetalk":
            feat_shape = tuple(sessions[0].asr._zero.shape[1:])
        elif family == "wav2lip":
            feat_shape = (80, 16)
        else:  # ultralight
            feat_shape = (16, 32, 32)
        sched.prewarm(feat_shape)
        fc = plugin._shared.get("feat_coalescer")
        if fc is not None:
            print("# waiting for feature-coalescer prewarm...", flush=True)
            deadline = time.time() + 1200
            while (not set(fc.buckets) <= fc._warm
                   and time.time() < deadline):
                time.sleep(1.0)
            if not set(fc.buckets) <= fc._warm:
                raise RuntimeError("feature coalescer prewarm timed out")

    psnr_int8_vs_bf16 = None
    if use_int8 and args.calibrated:
        # VERDICT r2 item 6: pair the measured speed with the SAME
        # config's quality — calibrated int8 step vs the bf16 step on
        # one identical batch (session init above ran the real
        # calibration into model[*_params_q])
        import jax.numpy as jnp

        from livetalking_tpu.models import musetalk as mt

        cfg = model["unet_cfg"]
        rngq = np.random.default_rng(3)
        wctx = jnp.asarray(rngq.standard_normal(
            (B, 50, model["whisper_cfg"].d_model)).astype(np.float32))
        idxs = jnp.arange(B, dtype=jnp.int32) % 4
        cycle = jnp.asarray(rngq.standard_normal(
            (4, 32, 32, 8)).astype(np.float32) * 0.2)
        f_bf16 = mt.make_infer_fn(cfg, B, dtype=jnp.bfloat16)
        f_int8 = mt.make_infer_fn(cfg, B, dtype=jnp.bfloat16,
                                  vae_int8=True, unet_int8=True)
        a = np.asarray(f_bf16(model["unet_params"], model["vae_params"],
                              cycle, idxs, wctx)).astype(np.float64)
        bq = np.asarray(f_int8(model["unet_params_q"], model["vae_params_q"],
                               cycle, idxs, wctx)).astype(np.float64)
        rmse = float(np.sqrt(np.mean((a - bq) ** 2)))
        psnr_int8_vs_bf16 = round(20 * np.log10(255.0 / max(rmse, 1e-9)), 2)
        print(f"# calibrated int8 vs bf16 PSNR on one batch: "
              f"{psnr_int8_vs_bf16} dB", flush=True)

    quits = [Event() for _ in sessions]
    render_threads = [Thread(target=s.render, args=(q,), daemon=True)
                      for s, q in zip(sessions, quits)]
    stop = Event()
    counts = [0] * N
    errors: list = []

    def feeder(s):
        rng = np.random.default_rng(7)
        try:
            while not stop.is_set():
                if s.asr.queue.qsize() < 200:  # keep ~4 s of speech queued
                    s.put_audio_frame(
                        (rng.standard_normal(s.chunk) * 0.1).astype(np.float32))
                else:
                    time.sleep(0.05)
        except Exception as e:  # pragma: no cover
            errors.append(f"feeder: {e}")

    starved = [0] * N

    def consumer(i, s):
        """Free-run: drain as fast as produced (ceiling methodology).
        --paced: pull exactly one frame per 40 ms tick — the deployment
        regime, where the transport emits at 25 fps and the device idles
        between rounds; a tick with an empty queue counts as starvation
        (a viewer-visible frame drop)."""
        period = 1.0 / 25.0
        nxt = time.monotonic()
        try:
            while not stop.is_set():
                if args.paced:
                    now = time.monotonic()
                    if now < nxt:
                        time.sleep(min(nxt - now, 0.05))
                    else:
                        try:
                            s.output.video_queue.get_nowait()
                            counts[i] += 1
                        except pyqueue.Empty:
                            starved[i] += 1
                        nxt += period
                        if now - nxt > 1.0:  # never replay a long gap
                            nxt = now
                else:
                    try:
                        s.output.video_queue.get(timeout=0.2)
                        counts[i] += 1
                    except pyqueue.Empty:
                        pass
                while True:  # drain audio so eventpoints keep flowing
                    try:
                        s.output.audio_queue.get_nowait()
                    except pyqueue.Empty:
                        break
        except Exception as e:  # pragma: no cover
            errors.append(f"consumer {i}: {e}")

    aux_threads = ([Thread(target=feeder, args=(s,), daemon=True)
                    for s in sessions]
                   + [Thread(target=consumer, args=(i, s), daemon=True)
                      for i, s in enumerate(sessions)])
    for t in render_threads + aux_threads:
        t.start()

    # warmup: every session must egress several batches (covers the
    # super-batch + paste + whisper-bucket compiles, which land lazily
    # as coalescing widens through the bucket ladder)
    print("# warming (compiles on first contact)...", flush=True)
    warm_target = args.warm_frames if args.warm_frames > 0 else 8 * B
    deadline = time.time() + 1800
    last = 0.0
    while (any(c < warm_target for c in counts) and not errors
           and time.time() < deadline):
        if time.time() - last > 15:
            print(f"#   egress counts {counts}", flush=True)
            last = time.time()
        time.sleep(0.5)
    if errors:
        raise RuntimeError("; ".join(errors))
    if any(c < warm_target for c in counts):
        raise RuntimeError(f"warmup timed out: egress counts {counts}")

    lat_skip = len(sched.latency_s) if sched else 0
    bs_skip = len(sched.batch_sizes) if sched else 0
    snap0 = list(counts)
    starv0 = list(starved)
    t0 = time.time()
    time.sleep(args.secs)
    snap1 = list(counts)
    starv1 = list(starved)
    elapsed = time.time() - t0

    stop.set()
    for q in quits:
        q.set()
    for t in render_threads + aux_threads:
        t.join(timeout=20)
    lat = (np.asarray(list(sched.latency_s)[lat_skip:], np.float64)
           if sched else np.asarray([], np.float64))
    bsz = (np.asarray(list(sched.batch_sizes)[bs_skip:], np.int64)
           if sched else np.asarray([], np.int64))
    if coalesce:
        plugin.reset_shared_scheduler()
    if errors:
        raise RuntimeError("; ".join(errors))

    per_session = [(b - a) / elapsed for a, b in zip(snap0, snap1)]
    batch_budget_s = B / 25.0  # one B-frame request = B/25 s of video
    result = {
        "metric": f"{family}_engine_egress_finalfps_per_session",
        "value": round(min(per_session), 2),
        "unit": "frames/s/session",
        "vs_baseline": round(min(per_session) / 25.0, 2),
        "sessions": N,
        "batch": B,
        "int8": use_int8,
        "int8_calibrated": bool(args.calibrated and use_int8),
        "int8_vs_bf16_psnr_db": psnr_int8_vs_bf16,
        "fused_vae": bool(args.fused_vae),
        "device_paste_back": coalesce,
        "session_inflight": max(1, args.session_inflight),
        "egress_buffer_frames": max(1, args.egress_buffer_frames),
        "paced": bool(args.paced),
        "starved_ticks": ([b - a for a, b in zip(starv0, starv1)]
                          if args.paced else None),
        "coalesce_window_ms": float(args.coalesce_window_ms),
        "coalesce": coalesce,
        "frame_hw": [args.frame_h, args.frame_w],
        "d2h_subsample": base["d2h_subsample"],
        "per_session_fps": [round(v, 2) for v in per_session],
        "aggregate_fps": round(sum(per_session), 1),
        "elapsed_s": round(elapsed, 1),
        "latency_ms": {
            "p50": round(float(np.percentile(lat, 50)) * 1e3, 1),
            "p90": round(float(np.percentile(lat, 90)) * 1e3, 1),
            "p99": round(float(np.percentile(lat, 99)) * 1e3, 1),
            "max": round(float(lat.max()) * 1e3, 1),
            "budget": round(batch_budget_s * 1e3, 1),
            "n": int(lat.size),
        } if lat.size else None,
        "deadline_miss_rate": (round(float((lat > batch_budget_s).mean()), 4)
                               if lat.size else None),
        "mean_coalesced_sessions": (round(float(bsz.mean()), 2)
                                    if bsz.size else None),
        "methodology": (
            f"N real {family} engine sessions end to end (render + "
            "inference + compose threads, queue transport); frames counted "
            "at transport egress"
            + (", shared scheduler with device paste composed into the "
               "super-batch step; latency = per-request submit->resolve at "
               "the scheduler; composed frames stride-subsampled before "
               "D2H (tunnel workaround)" if coalesce else
               "; per-session device steps (per-avatar weights: no "
               "cross-session coalescing), host paste in the compose "
               "thread")
            + ("; feature coalescer" if family == "musetalk" else "")),
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


def _wav2lip_serving(args, N, B, rng) -> dict:
    """wav2lip-256 variant: uint8 face cycles in the store, mel feature
    windows per batch (cheap vs whisper, computed per round on device)."""
    import jax
    import jax.numpy as jnp

    from livetalking_tpu.engine.scheduler import AvatarStore, BatchScheduler
    from livetalking_tpu.models import wav2lip as w2l
    from livetalking_tpu.utils.jaxinit import jit_init

    S = 256
    params = jit_init(w2l.init_params, jax.random.PRNGKey(0),
                      dtype=jnp.bfloat16)
    store = AvatarStore(S)
    offsets = []
    n_frames = 25
    for s in range(N):
        faces = rng.integers(0, 255, (n_frames, S, S, 3), dtype=np.uint8)
        off, _ = store.add(f"w2l_{s}", faces)
        offsets.append(off)

    def step_factory(total):
        step = w2l.make_infer_fn(total, S, jnp.bfloat16)

        def wrapped(p, buffer, idxs, mel):
            return step(p, buffer, idxs, mel)[:, ::64, ::64, :]
        return jax.jit(wrapped)

    sched = BatchScheduler(params, store, step_factory, B, buckets=(N,))
    sched.start()
    mel = jnp.asarray(rng.standard_normal((B, 80, 16)).astype(np.float32))

    print("# compiling super-batch...", flush=True)
    sched.infer(np.arange(B, dtype=np.int32) % n_frames, mel)
    print("# compile done", flush=True)

    import threading
    counts = [0] * N
    stop = threading.Event()
    errors = []

    def driver():
        local = np.random.default_rng(0)
        warm = 0
        try:
            while not stop.is_set():
                futs = []
                for s in range(N):
                    idxs = (offsets[s] + (local.integers(0, n_frames - B)
                                          + np.arange(B)) % n_frames
                            ).astype(np.int32)
                    futs.append(sched.submit(idxs, mel))
                for s, f in enumerate(futs):
                    f.result(timeout=120)
                    if warm >= args.warmup:
                        counts[s] += B
                warm += 1
        except Exception as e:  # pragma: no cover
            errors.append(str(e))

    t = threading.Thread(target=driver, daemon=True)
    t.start()
    while any(c == 0 for c in counts) and not errors:
        time.sleep(0.2)
    snap0 = list(counts)
    t0 = time.time()
    time.sleep(args.secs)
    snap1 = list(counts)
    elapsed = time.time() - t0
    stop.set()
    t.join(timeout=60)
    sched.stop()
    if errors:
        raise RuntimeError("; ".join(errors))
    per_session = [(b - a) / elapsed for a, b in zip(snap0, snap1)]
    result = {
        "metric": "wav2lip_serving_finalfps_per_session",
        "value": round(min(per_session), 2),
        "unit": "frames/s/session",
        "vs_baseline": round(min(per_session) / 25.0, 2),
        "sessions": N, "batch": B,
        "per_session_fps": [round(v, 2) for v in per_session],
        "aggregate_fps": round(sum(per_session), 1),
        "elapsed_s": round(elapsed, 1),
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
