"""MuseTalk's dedicated audio-visual SyncNet (LatentSync "StableSyncNet"
lineage) in functional JAX — the frozen sync expert for the MuseTalk
training recipe.

Architecture per the reference torch implementation
(reference avatars/musetalk/models/syncnet.py:18-240): two ``DownEncoder2D``
towers (audio + visual), each ``conv_in`` -> interleaved
[ResnetBlock2D, optional AttentionBlock2D] ladder -> GroupNorm + ReLU,
flattened and L2-normalized into matching embeddings. The reference
builds it purely from a yaml config dict
(``SyncNet(OmegaConf.to_container(syncnet_config.model))``, reference
avatars/musetalk/utils/training_utils.py:251-269 — loaded frozen from a
``{"state_dict": ...}`` checkpoint); the yaml itself is not in the
snapshot, so :data:`MUSETALK` is a working LatentSync-16-pixel-style
default (16-frame lower-half RGB window + 52-column mel) and every shape
is config-driven exactly like the reference.

Blocks follow the reference faithfully:

- ResnetBlock2D (reference syncnet.py:74-140): GN-silu-conv3x3 twice,
  1x1 shortcut on channel change, then an asymmetric-padded stride
  ``downsample_factor`` conv (pad (0,1,0,1); (0,1,1,1)/(1,1,0,1) for
  (1,f)/(f,1) factors — torch F.pad order is W-then-H).
- AttentionBlock2D (reference syncnet.py:142-181): GN -> conv1x1 ->
  tokens; LN -> 8-head self-attention (q/k/v/out all biased, diffusers
  ``Attention(bias=True)``) residual; LN -> GEGLU FF residual; conv1x1
  -> + input residual.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models.diffusion_blocks import (
    Params,
    attention,
    conv,
    geglu_ff,
    group_norm,
    layer_norm,
    silu,
    t_conv,
    t_lin,
    t_norm,
)

Factor = Union[int, Tuple[int, int]]
HEADS = 8  # reference syncnet.py:160 CrossAttention(heads=8)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    in_channels: int
    block_out: Tuple[int, ...]
    downsample_factors: Tuple[Factor, ...]
    attn_blocks: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class SyncNetConfig:
    audio: EncoderConfig
    visual: EncoderConfig

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "SyncNetConfig":
        """Reference yaml layout: {"audio_encoder": {...},
        "visual_encoder": {...}} (reference syncnet.py:20-35)."""

        def enc(e):
            return EncoderConfig(
                in_channels=int(e["in_channels"]),
                block_out=tuple(e["block_out_channels"]),
                downsample_factors=tuple(
                    tuple(f) if isinstance(f, (list, tuple)) else int(f)
                    for f in e["downsample_factors"]),
                attn_blocks=tuple(e["attn_blocks"]),
            )

        return SyncNetConfig(audio=enc(d["audio_encoder"]),
                             visual=enc(d["visual_encoder"]))


# Working default: 16 consecutive lower-half 256px frames (48ch, 128x256)
# against the clip's 52-column mel window (16 frames @25 fps = 0.64 s =
# 51.2 mel cols @80/s). Ladder reduces both towers to (1, 1, C).
MUSETALK = SyncNetConfig(
    audio=EncoderConfig(
        in_channels=1,
        block_out=(32, 64, 128, 256, 512, 1024),
        downsample_factors=(2, 2, 2, 2, (5, 3), 1),
        attn_blocks=(0, 0, 0, 0, 0, 0),
    ),
    visual=EncoderConfig(
        in_channels=48,
        block_out=(64, 128, 256, 256, 512, 512, 1024, 1024),
        downsample_factors=(2, 2, 2, 2, 2, 2, 2, (1, 2)),
        attn_blocks=(0, 0, 0, 1, 1, 0, 0, 0),
    ),
)

FRAMES = 16  # reference training_utils.py:254-256: n_sample_frames must be 16


def _pads(f: Factor):
    """Per-side ((top,bottom),(left,right)) pads for a downsample factor
    (reference syncnet.py:106-115; torch pad tuples are W-first)."""
    fh, fw = (f, f) if isinstance(f, int) else f
    ph = (1, 1) if fh == 1 else (0, 1)
    pw = (1, 1) if fw == 1 else (0, 1)
    return (fh, fw), (ph, pw)


def _resnet(p: Params, x: jnp.ndarray, factor: Factor) -> jnp.ndarray:
    h = conv(p["conv1"], silu(group_norm(p["norm1"], x)))
    h = conv(p["conv2"], silu(group_norm(p["norm2"], h)))
    if "conv_shortcut" in p:
        x = conv(p["conv_shortcut"], x, padding=0)
    h = x + h
    if "downsample_conv" in p:
        (fh, fw), pad = _pads(factor)
        y = jax.lax.conv_general_dilated(
            h, p["downsample_conv"]["w"].astype(h.dtype), (fh, fw), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        h = (y + p["downsample_conv"]["b"].astype(jnp.float32)).astype(h.dtype)
    return h


def _attn_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    h = conv(p["conv_in"], group_norm(p["norm1"], x), padding=0)
    h = h.reshape(B, H * W, C)
    h = attention(p["attn"], layer_norm(p["norm2"], h), None, HEADS) + h
    h = geglu_ff(p["ff"], layer_norm(p["norm3"], h)) + h
    h = conv(p["conv_out"], h.reshape(B, H, W, C), padding=0)
    return h + x


def _encoder(p: Params, cfg: EncoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, in_ch) -> (B, D) L2-normalized embedding."""
    h = conv(p["conv_in"], x)
    i = 0
    for factor, has_attn in zip(cfg.downsample_factors, cfg.attn_blocks):
        h = _resnet(p["down_blocks"][i], h, factor)
        i += 1
        if has_attn:
            h = _attn_block(p["down_blocks"][i], h)
            i += 1
    h = jax.nn.relu(group_norm(p["norm_out"], h))
    # flatten in NCHW order — the reference reshapes the torch tensor
    # (reference syncnet.py:43-44); irrelevant at 1x1 spatial but exact
    # parity for any ladder
    e = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1).astype(jnp.float32)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)


def apply(params: Params, faces: jnp.ndarray, audio: jnp.ndarray,
          cfg: SyncNetConfig = MUSETALK):
    """faces (B, H, W, 3*FRAMES) in [0,1]; audio (B, Ha, Wa, in_ch) mel.
    Returns (vision_embeds, audio_embeds), both (B, D) unit vectors
    (reference syncnet.py:39-50)."""
    v = _encoder(params["visual_encoder"], cfg.visual, faces)
    a = _encoder(params["audio_encoder"], cfg.audio, audio)
    return v, a


def cosine_bce_loss(v_emb, a_emb, labels) -> jnp.ndarray:
    """BCE on (cos+1)/2 — the LatentSync/ wav2lip sync objective."""
    cos = jnp.sum(v_emb * a_emb, axis=-1)
    p = jnp.clip((cos + 1.0) * 0.5, 1e-7, 1.0 - 1e-7)
    labels = labels.astype(jnp.float32)
    return -jnp.mean(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _rc(key, kh, kw, ci, co, dtype, scale=0.4):
    w = jax.random.normal(key, (kh, kw, ci, co), jnp.float32) * (
        scale / np.sqrt(kh * kw * ci))
    return {"w": w.astype(dtype), "b": jnp.zeros((co,), dtype)}


def _rn(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _rl(key, i, o, dtype, scale=0.4):
    return {"w": (jax.random.normal(key, (i, o), jnp.float32)
                  * (scale / np.sqrt(i))).astype(dtype),
            "b": jnp.zeros((o,), dtype)}


def _init_encoder(keys, cfg: EncoderConfig, dtype) -> Params:
    blocks = []
    cin = cfg.block_out[0]
    for cout, factor, has_attn in zip(cfg.block_out, cfg.downsample_factors,
                                      cfg.attn_blocks):
        blk = {"norm1": _rn(cin, dtype),
               "conv1": _rc(next(keys), 3, 3, cin, cout, dtype),
               "norm2": _rn(cout, dtype),
               "conv2": _rc(next(keys), 3, 3, cout, cout, dtype)}
        if cin != cout:
            blk["conv_shortcut"] = _rc(next(keys), 1, 1, cin, cout, dtype)
        fh, fw = (factor, factor) if isinstance(factor, int) else factor
        if (fh, fw) != (1, 1):
            blk["downsample_conv"] = _rc(next(keys), 3, 3, cout, cout, dtype)
        blocks.append(blk)
        if has_attn:
            blocks.append({
                "norm1": _rn(cout, dtype),
                "conv_in": _rc(next(keys), 1, 1, cout, cout, dtype),
                "norm2": _rn(cout, dtype),
                "attn": {"q": _rl(next(keys), cout, cout, dtype),
                         "k": _rl(next(keys), cout, cout, dtype),
                         "v": _rl(next(keys), cout, cout, dtype),
                         "o": _rl(next(keys), cout, cout, dtype)},
                "norm3": _rn(cout, dtype),
                "ff": {"proj": _rl(next(keys), cout, 8 * cout, dtype),
                       "out": _rl(next(keys), 4 * cout, cout, dtype)},
                "conv_out": _rc(next(keys), 1, 1, cout, cout, dtype),
            })
        cin = cout
    return {"conv_in": _rc(next(keys), 3, 3, cfg.in_channels,
                           cfg.block_out[0], dtype),
            "down_blocks": blocks,
            "norm_out": _rn(cfg.block_out[-1], dtype)}


def init_params(key: jax.Array, cfg: SyncNetConfig = MUSETALK,
                dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 512))
    return {"audio_encoder": _init_encoder(keys, cfg.audio, dtype),
            "visual_encoder": _init_encoder(keys, cfg.visual, dtype)}


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_torch_state_dict(sd: Dict[str, Any],
                             cfg: SyncNetConfig = MUSETALK,
                             dtype=jnp.float32) -> Params:
    """Reference checkpoint layout: ``torch.load(...)["state_dict"]`` with
    ``{audio,visual}_encoder.conv_in|down_blocks.N.*|norm_out`` keys
    (reference training_utils.py:263-265). Resnet vs attention blocks are
    distinguished by their key sets, mirroring the interleaved
    ``down_blocks`` ModuleList (reference syncnet.py:204-224)."""
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    def enc(prefix: str) -> Params:
        blocks = []
        i = 0
        while f"{prefix}.down_blocks.{i}.conv1.weight" in sd or \
                f"{prefix}.down_blocks.{i}.attn.to_q.weight" in sd:
            b = f"{prefix}.down_blocks.{i}"
            if f"{b}.conv1.weight" in sd:  # ResnetBlock2D
                blk = {"norm1": t_norm(sd, f"{b}.norm1", dtype),
                       "conv1": t_conv(sd, f"{b}.conv1", dtype),
                       "norm2": t_norm(sd, f"{b}.norm2", dtype),
                       "conv2": t_conv(sd, f"{b}.conv2", dtype)}
                if f"{b}.conv_shortcut.weight" in sd:
                    blk["conv_shortcut"] = t_conv(sd, f"{b}.conv_shortcut",
                                                  dtype)
                if f"{b}.downsample_conv.weight" in sd:
                    blk["downsample_conv"] = t_conv(sd, f"{b}.downsample_conv",
                                                    dtype)
            else:  # AttentionBlock2D
                blk = {
                    "norm1": t_norm(sd, f"{b}.norm1", dtype),
                    "conv_in": t_conv(sd, f"{b}.conv_in", dtype),
                    "norm2": t_norm(sd, f"{b}.norm2", dtype),
                    "attn": {"q": t_lin(sd, f"{b}.attn.to_q", dtype),
                             "k": t_lin(sd, f"{b}.attn.to_k", dtype),
                             "v": t_lin(sd, f"{b}.attn.to_v", dtype),
                             "o": t_lin(sd, f"{b}.attn.to_out.0", dtype)},
                    "norm3": t_norm(sd, f"{b}.norm3", dtype),
                    "ff": {"proj": t_lin(sd, f"{b}.ff.net.0.proj", dtype),
                           "out": t_lin(sd, f"{b}.ff.net.2", dtype)},
                    "conv_out": t_conv(sd, f"{b}.conv_out", dtype),
                }
            blocks.append(blk)
            i += 1
        return {"conv_in": t_conv(sd, f"{prefix}.conv_in", dtype),
                "down_blocks": blocks,
                "norm_out": t_norm(sd, f"{prefix}.norm_out", dtype)}

    return {"audio_encoder": enc("audio_encoder"),
            "visual_encoder": enc("visual_encoder")}
