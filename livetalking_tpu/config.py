"""Configuration: CLI flags + optional YAML overlay.

Flag surface and precedence (CLI > YAML > built-in defaults) match the
reference (config.py:39-120) so existing launch scripts keep working, with
additional TPU-specific flags grouped at the bottom.  ``customvideo_config``
JSON is post-parsed into ``opt.customopt`` like the reference
(config.py:115-118).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Optional, Sequence


def _declare_flags(parser: argparse.ArgumentParser) -> None:
    add = parser.add_argument

    add("--config", "-c", type=str, default="config.yaml",
        help="YAML config file path (empty string skips)")

    # audio timing
    add("--fps", type=int, default=25, help="video fps (must be 25)")
    add("-l", type=int, default=10, help="left stride context, in 20ms frames")
    add("-m", type=int, default=8)
    add("-r", type=int, default=10, help="right stride context, in 20ms frames")

    # avatar model
    add("--model", type=str, default="wav2lip",
        help="avatar model: musetalk/wav2lip/ultralight/ernerf")
    add("--avatar_id", type=str, default="wav2lip256_avatar1",
        help="avatar id in data/avatars")
    add("--batch_size", type=int, default=16, help="inference batch size")
    add("--modelres", type=int, default=192)
    add("--modelfile", type=str, default="")

    # custom choreography / multi-avatar
    add("--customvideo_config", type=str, default="", help="custom action json")

    # TTS
    add("--tts", type=str, default="edgetts",
        help="tts plugin: edgetts/gpt-sovits/cosyvoice/fishtts/tencent/"
             "doubao/indextts2/azuretts/qwentts/omnitts/xtts")
    add("--REF_FILE", type=str, default="zh-CN-YunxiaNeural",
        help="reference audio filename or voice model id")
    add("--REF_TEXT", type=str, default=None)
    add("--TTS_SERVER", type=str, default="http://127.0.0.1:9880")

    # transport
    add("--transport", type=str, default="webrtc",
        help="output: rtcpush/webrtc/rtmp/virtualcam")
    add("--stun", type=str, default="stun:stun.freeswitch.org:3478")
    add("--push_url", type=str,
        default="http://localhost:1985/rtc/v1/whip/?app=live&stream=livestream")
    add("--max_session", type=int, default=5)
    add("--listenport", type=int, default=8010, help="web listen port")

    # virtualcam
    add("--audio_output_device", type=int, default=None,
        help="audio output device index (virtualcam transport only)")

    # ---- TPU-native additions -------------------------------------------
    add("--dtype", type=str, default="bfloat16",
        choices=["bfloat16", "float32"], help="model compute dtype on device")
    add("--coalesce", action="store_true", default=False,
        help="coalesce concurrent sessions into one device batch per tick "
             "(engine/scheduler.py)")
    add("--coalesce_buckets", type=str, default="1,2,4,8",
        help="session-count bucket sizes compiled for the coalescing "
             "scheduler (padding absorbs counts in between)")
    add("--capacity_sessions", type=int, default=-1,
        help="measured per-chip real-time capacity (sessions sustaining "
             ">=25 fps each) used for admission beyond --max_session: "
             "-1 = auto (the committed per-family measurement, e.g. "
             "musetalk 480x640 int8 = 8), 0 = disable, N = override")
    add("--capacity_policy", type=str, default="warn",
        choices=["warn", "strict", "off"],
        help="what to do when a new session exceeds measured capacity: "
             "warn (admit + log + flag in /api/admin/sessions), strict "
             "(reject with a clean error envelope), off")
    add("--feature_window_ms", type=float, default=0.0,
        help="alignment window for the cross-session FEATURE coalescer "
             "(whisper encodes), in ms. Default 0 (dispatch on arrival): "
             "holding encodes serializes into the request critical path "
             "— measured at batch_size=4, a one-period feature window "
             "dropped 24.4 -> 22.7 fps/session with 8%% starved ticks "
             "even though encode coalescing improved 2.1 -> 6.8 of 8 "
             "(SERVING_r04 runs); the scheduler window (below) is the "
             "one that aligns sessions profitably")
    add("--coalesce_window_ms", type=float, default=-1.0,
        help="idle-device session-alignment window for the coalescing "
             "scheduler, in ms. While the device is idle and a "
             "super-batch is partial, the scheduler holds it up to this "
             "long for other sessions to land on the same batch (a lone "
             "session never waits). -1 = auto (one request period, "
             "1000*batch_size/fps); 0 = dispatch immediately when idle")
    add("--scheduler_prewarm", type=int, default=1,
        help="background-compile every coalescing-bucket super-batch "
             "program as soon as the first session registers (1, "
             "default) so later sessions never pay a first-contact "
             "compile inside a live utterance; 0 = compile buckets "
             "lazily under the scheduler's compile-grace window")
    add("--egress_buffer_frames", type=int, default=5,
        help="transport egress backlog (video frames) at which the "
             "render loop throttles feature extraction (reference "
             "basereal back-pressure value 5 = ~200 ms). Paced "
             "deployments with thin supply margins can raise this: a "
             "deeper jitter buffer absorbs request-latency spikes that "
             "would otherwise starve playout ticks, at +40 ms playout "
             "latency per extra frame")
    add("--session_inflight", type=int, default=2,
        help="per-session inference batches kept in flight (>=1). With "
             "the shared scheduler a synchronous loop is latency-bound "
             "(session period = request round-trip, measured 18.9 "
             "fps/session at 8 sessions vs the >=25 bar); depth 2 "
             "decouples emission rate from latency at the cost of one "
             "extra batch (~640 ms) of glass-to-glass latency. Depth 1 "
             "restores the synchronous reference behavior")
    add("--vae_int8", action="store_true", default=False,
        help="musetalk: run the VAE decoder with calibrated W8A8 int8 "
             "convs (sd_vae.decode_int8; with the channel-moment "
             "GroupNorm this takes the decode from 91.8 to ~43 ms at "
             "B=16 on v5e; small quantization error)")
    add("--unet_int8", action="store_true", default=False,
        help="musetalk: run the latent U-Net convs W8A8 int8 "
             "(sd_unet.apply_int8; small quantization error)")
    add("--attn_int8", type=int, default=1,
        help="musetalk --unet_int8: also quantize the U-Net transformer "
             "matmuls except q/k and cross-attn k/v (softmax scores stay "
             "exact; diffusion_blocks.quantize_transformer). 0 keeps the "
             "transformer blocks bf16")
    add("--vae_mid_int8", type=int, default=1,
        help="musetalk --vae_int8: also quantize the VAE decoder "
             "mid-block resnets (the mid attention and the tiny "
             "latent-side convs stay bf16). 0 keeps the mid block bf16")
    add("--whisper_short_window", action="store_true", default=False,
        help="musetalk: encode whisper features over the actual rolling "
             "window instead of the 30 s zero-padded chunk (~20x fewer "
             "encoder positions; identical mel values but attention "
             "normalizes over the shorter context — slight feature "
             "drift vs the reference's HF extractor)")
    add("--device_paste_back", action="store_true", default=False,
        help="composite predicted crops into full frames on device "
             "(ops/pallas_blend.py fused resize+blend+paste) instead of "
             "per-frame host cv2")
    add("--d2h_subsample", type=int, default=1,
        help="DEV/BENCH ONLY: stride-subsample the composed full frames "
             "before the device->host fetch under --coalesce "
             "--device_paste_back (a ~3 MB/s tunneled dev chip cannot "
             "carry full-frame egress; production PCIe hosts run 1)")
    add("--mesh", type=str, default="",
        help="device mesh spec, e.g. 'dp=4,tp=2'; empty = single chip")
    add("--profile_dir", type=str, default="",
        help="when set, dump jax.profiler traces here")
    add("--models_dir", type=str, default="./models")
    add("--data_dir", type=str, default="./data")


def _yaml_overlay(parser: argparse.ArgumentParser, argv: Optional[Sequence[str]]) -> None:
    """Apply YAML file values as parser defaults (so CLI still wins)."""
    try:
        import yaml
    except ImportError:
        return
    probe, _ = parser.parse_known_args(argv)
    path = probe.config
    if not path or not os.path.exists(path):
        return
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    if isinstance(cfg, dict):
        parser.set_defaults(**{k.replace("-", "_"): v for k, v in cfg.items()})


def parse_args(argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="LiveTalking-TPU Digital Human Server")
    _declare_flags(parser)
    _yaml_overlay(parser, argv)
    opt = parser.parse_args(argv)

    opt.customopt = []
    if opt.customvideo_config:
        with open(opt.customvideo_config, "r") as f:
            opt.customopt = json.load(f)
    return opt


def default_opt(**overrides: Any) -> argparse.Namespace:
    """Programmatic config (tests, embedding): defaults + keyword overrides."""
    opt = parse_args(["--config", ""])
    for k, v in overrides.items():
        setattr(opt, k, v)
    return opt
