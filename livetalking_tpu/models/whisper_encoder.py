"""Whisper encoder (tiny by default), functional JAX, with stacked hidden
states — the MuseTalk audio feature network.

The reference runs HF ``WhisperModel.encoder(..., output_hidden_states=
True)`` and stacks ALL hidden states into per-50Hz-frame features of shape
(layers+1, 384) (reference avatars/musetalk/whisper/audio2feature.py:
118-127). Architecture: conv1d(80->d, k3) gelu -> conv1d(d->d, k3, s2)
gelu -> +sinusoidal positions -> pre-LN transformer layers (k_proj has no
bias) -> final LayerNorm applied only to the LAST stacked state, matching
HF's hidden_states tuple layout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 384
    num_layers: int = 4
    num_heads: int = 6
    ffn: int = 1536
    max_positions: int = 1500
    layer_norm_eps: float = 1e-5


TINY = WhisperConfig()

Params = Dict[str, Any]


from livetalking_tpu.models.layers import (  # shared primitives
    gelu_exact as _gelu,
    layer_norm_f32 as _ln,
    linear_f32 as _linear,
    to_numpy as _to_numpy,
)


def _attn(p, x, heads):
    B, T, D = x.shape
    hd = D // heads
    q = _linear(p["q"], x) * (hd ** -0.5)
    k = _linear(p["k"], x)
    v = _linear(p["v"], x)

    def split(t):
        return t.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    pr = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr, v, preferred_element_type=jnp.float32).astype(x.dtype)
    return _linear(p["o"], o.transpose(0, 2, 1, 3).reshape(B, T, D))


def _conv1d(x, w, b, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), ((padding, padding),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def apply_stacked(params: Params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """(B, n_mels, T_mel) log-mel -> (B, T_mel//2, num_layers+1, d_model)
    stacked hidden states (HF hidden_states layout: embed output, each
    layer's output, final LayerNorm applied to the last entry only)."""
    x = jnp.transpose(mel, (0, 2, 1))  # (B, T, 80)
    x = _gelu(_conv1d(x, params["conv1"]["w"], params["conv1"]["b"], 1, 1))
    x = _gelu(_conv1d(x, params["conv2"]["w"], params["conv2"]["b"], 2, 1))
    T = x.shape[1]
    x = x + params["pos"][:T].astype(x.dtype)

    states: List[jnp.ndarray] = []
    for lp in params["layers"]:
        states.append(x)
        x = x + _attn(lp["attn"], _ln(lp["ln1"], x, cfg.layer_norm_eps), cfg.num_heads)
        x = x + _linear(lp["fc2"], _gelu(_linear(lp["fc1"], _ln(lp["ln2"], x, cfg.layer_norm_eps))))
    states.append(_ln(params["ln_post"], x, cfg.layer_norm_eps))
    return jnp.stack(states, axis=2)  # (B, T, L+1, D)


def init_params(key: jax.Array, cfg: WhisperConfig = TINY, dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    D = cfg.d_model

    def lin(i, o, bias=True):
        p = {"w": (jax.random.normal(next(keys), (i, o), jnp.float32) / math.sqrt(i)).astype(dtype)}
        p["b"] = jnp.zeros((o,), dtype) if bias else None
        return p

    def ln():
        return {"g": jnp.ones((D,), jnp.float32), "b": jnp.zeros((D,), jnp.float32)}

    # fixed sinusoidal positions (whisper layout: sin | cos concatenated)
    pos = np.zeros((cfg.max_positions, D), np.float32)
    half = D // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / (half - 1))
    ang = np.arange(cfg.max_positions)[:, None] * freqs[None, :]
    pos[:, :half] = np.sin(ang)
    pos[:, half:] = np.cos(ang)

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "attn": {"q": lin(D, D), "k": lin(D, D, bias=False), "v": lin(D, D), "o": lin(D, D)},
            "ln1": ln(), "ln2": ln(),
            "fc1": lin(D, cfg.ffn), "fc2": lin(cfg.ffn, D),
        })
    return {
        "conv1": {"w": (jax.random.normal(next(keys), (3, cfg.n_mels, D), jnp.float32) * 0.02).astype(dtype),
                  "b": jnp.zeros((D,), dtype)},
        "conv2": {"w": (jax.random.normal(next(keys), (3, D, D), jnp.float32) * 0.02).astype(dtype),
                  "b": jnp.zeros((D,), dtype)},
        "pos": jnp.asarray(pos, dtype),
        "ln_post": ln(),
        "layers": layers,
    }


_np = _to_numpy


def convert_torch_state_dict(sd: Dict[str, Any], cfg: WhisperConfig = TINY, dtype=jnp.bfloat16) -> Params:
    """HF ``WhisperModel``/``WhisperEncoder`` state dict -> our tree.

    Accepts keys with or without the ``encoder.``/``model.encoder.`` prefix.
    """
    sd = {k: _np(v) for k, v in sd.items()}
    for prefix in ("model.encoder.", "encoder."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break

    def lin(prefix, bias=True):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T.astype(np.float32), dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"].astype(np.float32), dtype) if bias else None}

    def ln(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight"].astype(np.float32)),
                "b": jnp.asarray(sd[f"{prefix}.bias"].astype(np.float32))}

    layers = []
    for i in range(cfg.num_layers):
        b = f"layers.{i}"
        layers.append({
            "attn": {
                "q": lin(f"{b}.self_attn.q_proj"),
                "k": lin(f"{b}.self_attn.k_proj", bias=False),
                "v": lin(f"{b}.self_attn.v_proj"),
                "o": lin(f"{b}.self_attn.out_proj"),
            },
            "ln1": ln(f"{b}.self_attn_layer_norm"),
            "ln2": ln(f"{b}.final_layer_norm"),
            "fc1": lin(f"{b}.fc1"),
            "fc2": lin(f"{b}.fc2"),
        })
    return {
        "conv1": {"w": jnp.asarray(sd["conv1.weight"].transpose(2, 1, 0).astype(np.float32), dtype),
                  "b": jnp.asarray(sd["conv1.bias"].astype(np.float32), dtype)},
        "conv2": {"w": jnp.asarray(sd["conv2.weight"].transpose(2, 1, 0).astype(np.float32), dtype),
                  "b": jnp.asarray(sd["conv2.bias"].astype(np.float32), dtype)},
        "pos": jnp.asarray(sd["embed_positions.weight"].astype(np.float32), dtype),
        "ln_post": ln("layer_norm"),
        "layers": layers,
    }
