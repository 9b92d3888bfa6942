"""HuBERT speech encoder, functional JAX (config-driven).

Drives the Ultralight model family: the reference runs HF
``HubertModel`` (hubert-large-ls960-ft) over 16 kHz speech and consumes
``last_hidden_state`` frames at 50 Hz (reference
avatars/ultralight/audio2feature.py:15-54). This is a from-scratch JAX
implementation of the same architecture family (wav2vec2-style conv
feature extractor + transformer encoder, both the post-LN "base" and the
stable-pre-LN "large" variants), with a converter from a transformers
``HubertModel`` state dict.

TPU notes: all matmuls (QKV, FFN, feature projection) run in the model
dtype (bf16) with f32 accumulation; sequence length for the streaming
window is static (51 tokens for the 1.04 s engine window), so the whole
encoder jits into one fused program.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # "layer" (large) | "group" (base)
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    do_stable_layer_norm: bool = True  # True for -large
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @property
    def total_stride(self) -> int:
        return int(np.prod(self.conv_stride))

    @property
    def receptive_field(self) -> int:
        rf = 1
        for k, s in zip(reversed(self.conv_kernel), reversed(self.conv_stride)):
            rf = (rf - 1) * s + k
        return rf

    def out_length(self, n_samples: int) -> int:
        t = n_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t


LARGE = HubertConfig()
BASE = HubertConfig(
    conv_bias=False, feat_extract_norm="group", hidden_size=768,
    num_layers=12, num_heads=12, intermediate_size=3072,
    do_stable_layer_norm=False,
)

Params = Dict[str, Any]


# -- primitive helpers ------------------------------------------------------

from livetalking_tpu.models.layers import (  # shared primitives
    layer_norm_f32 as _layer_norm,
    linear_f32 as _linear,
    to_numpy as _hoisted_np,
)


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b, stride: int, padding: int, groups: int = 1) -> jnp.ndarray:
    """x (B, T, C), w (K, Cin/groups, Cout)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), ((padding, padding),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _attention(p: Dict, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    B, T, D = x.shape
    hd = D // n_heads
    q = _linear(p["q"], x) * (hd ** -0.5)
    k = _linear(p["k"], x)
    v = _linear(p["v"], x)

    def split(t):
        return t.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return _linear(p["o"], out)


from livetalking_tpu.models.layers import gelu_exact as _gelu  # noqa: E402


# -- forward ----------------------------------------------------------------

def feature_extractor(params: Params, cfg: HubertConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """(B, T) normalized waveform -> (B, T', conv_dim[-1])."""
    x = wav[:, :, None]  # (B, T, 1)
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        p = params["fe"][i]
        x = _conv1d(x, p["w"], p.get("bias"), s, 0)
        if cfg.feat_extract_norm == "layer":
            x = _layer_norm(p["ln"], x, cfg.layer_norm_eps)
        elif i == 0:  # group norm == per-channel instance norm over time
            xf = x.astype(jnp.float32)
            mu = xf.mean(axis=1, keepdims=True)
            var = xf.var(axis=1, keepdims=True)
            xf = (xf - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x = (xf * p["gn"]["g"] + p["gn"]["b"]).astype(x.dtype)
        x = _gelu(x)
    return x


def encoder(params: Params, cfg: HubertConfig, h: jnp.ndarray) -> jnp.ndarray:
    # positional conv embedding (grouped conv, same-pad with trailing trim)
    pc = params["pos_conv"]
    pos = _conv1d(h, pc["w"], pc["b"], 1, cfg.num_conv_pos_embeddings // 2,
                  cfg.num_conv_pos_embedding_groups)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1, :]
    h = h + _gelu(pos)

    if not cfg.do_stable_layer_norm:
        h = _layer_norm(params["enc_ln"], h, cfg.layer_norm_eps)

    for lp in params["layers"]:
        if cfg.do_stable_layer_norm:  # pre-LN (large)
            h = h + _attention(lp["attn"], _layer_norm(lp["ln1"], h, cfg.layer_norm_eps), cfg.num_heads)
            ff_in = _layer_norm(lp["ln2"], h, cfg.layer_norm_eps)
            h = h + _linear(lp["ff2"], _gelu(_linear(lp["ff1"], ff_in)))
        else:  # post-LN (base)
            h = _layer_norm(lp["ln1"], h + _attention(lp["attn"], h, cfg.num_heads), cfg.layer_norm_eps)
            h = _layer_norm(lp["ln2"], h + _linear(lp["ff2"], _gelu(_linear(lp["ff1"], h))), cfg.layer_norm_eps)

    if cfg.do_stable_layer_norm:
        h = _layer_norm(params["enc_ln"], h, cfg.layer_norm_eps)
    return h


def apply(params: Params, cfg: HubertConfig, wav: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """(B, T) raw 16 kHz waveform -> (B, T', hidden) last_hidden_state.

    ``normalize`` applies the Wav2Vec2Processor zero-mean/unit-var input
    normalization (reference audio2feature.py:27 ``processor(speech, ...)``).
    """
    if normalize:
        wf = wav.astype(jnp.float32)
        mu = wf.mean(axis=-1, keepdims=True)
        var = wf.var(axis=-1, keepdims=True)
        wav = ((wf - mu) / jnp.sqrt(var + 1e-7)).astype(wav.dtype)

    x = feature_extractor(params, cfg, wav)
    fp = params["fp"]
    x = _layer_norm(fp["ln"], x, cfg.layer_norm_eps)
    x = _linear(fp["proj"], x)
    return encoder(params, cfg, x)


# -- init -------------------------------------------------------------------

def init_params(key: jax.Array, cfg: HubertConfig = LARGE, dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))

    def lin(i, o):
        return {"w": (jax.random.normal(next(keys), (i, o), jnp.float32) * (1 / math.sqrt(i))).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def ln(d):
        return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    fe = []
    cin = 1
    for i, (d, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        p = {"w": (jax.random.normal(next(keys), (k, cin, d), jnp.float32) * (1 / math.sqrt(k * cin))).astype(dtype)}
        if cfg.conv_bias:
            p["bias"] = jnp.zeros((d,), dtype)
        if cfg.feat_extract_norm == "layer":
            p["ln"] = ln(d)
        elif i == 0:
            p["gn"] = {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}
        fe.append(p)
        cin = d

    D = cfg.hidden_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "attn": {"q": lin(D, D), "k": lin(D, D), "v": lin(D, D), "o": lin(D, D)},
            "ln1": ln(D), "ln2": ln(D),
            "ff1": lin(D, cfg.intermediate_size), "ff2": lin(cfg.intermediate_size, D),
        })

    kpos = cfg.num_conv_pos_embeddings
    return {
        "fe": fe,
        "fp": {"ln": ln(cfg.conv_dim[-1]), "proj": lin(cfg.conv_dim[-1], D)},
        "pos_conv": {
            "w": (jax.random.normal(next(keys), (kpos, D // cfg.num_conv_pos_embedding_groups, D), jnp.float32)
                  * 0.02).astype(dtype),
            "b": jnp.zeros((D,), dtype),
        },
        "enc_ln": ln(D),
        "layers": layers,
    }


# -- torch conversion -------------------------------------------------------

_np = _hoisted_np


def convert_torch_state_dict(sd: Dict[str, Any], cfg: HubertConfig = LARGE, dtype=jnp.bfloat16) -> Params:
    """transformers ``HubertModel.state_dict()`` -> our param tree."""
    sd = {k: _np(v) for k, v in sd.items()}

    def t_lin(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T.astype(np.float32), dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"].astype(np.float32), dtype)}

    def t_ln(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight"].astype(np.float32), dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"].astype(np.float32), dtype)}

    fe = []
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        # torch conv1d weight (O, I, K) -> (K, I, O)
        p = {"w": jnp.asarray(sd[f"{base}.conv.weight"].transpose(2, 1, 0).astype(np.float32), dtype)}
        if f"{base}.conv.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{base}.conv.bias"].astype(np.float32), dtype)
        if cfg.feat_extract_norm == "layer":
            p["ln"] = t_ln(f"{base}.layer_norm")
        elif i == 0:
            p["gn"] = {"g": jnp.asarray(sd[f"{base}.layer_norm.weight"].astype(np.float32)),
                       "b": jnp.asarray(sd[f"{base}.layer_norm.bias"].astype(np.float32))}
        fe.append(p)

    # pos conv: weight-normalized; support both old (weight_g/weight_v) and
    # new (parametrizations.weight.original0/1) torch layouts
    pcw = "encoder.pos_conv_embed.conv"
    if f"{pcw}.weight_g" in sd:
        g, v = sd[f"{pcw}.weight_g"], sd[f"{pcw}.weight_v"]
    else:
        g = sd[f"{pcw}.parametrizations.weight.original0"]
        v = sd[f"{pcw}.parametrizations.weight.original1"]
    # torch conv1d: (O, I/groups, K); weight norm over dims (0? dim=2 for conv)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # (O, I/g, K)
    pos_conv = {
        "w": jnp.asarray(w.transpose(2, 1, 0).astype(np.float32), dtype),
        "b": jnp.asarray(sd[f"{pcw}.bias"].astype(np.float32), dtype),
    }

    layers = []
    for i in range(cfg.num_layers):
        base = f"encoder.layers.{i}"
        layers.append({
            "attn": {
                "q": t_lin(f"{base}.attention.q_proj"),
                "k": t_lin(f"{base}.attention.k_proj"),
                "v": t_lin(f"{base}.attention.v_proj"),
                "o": t_lin(f"{base}.attention.out_proj"),
            },
            "ln1": t_ln(f"{base}.layer_norm"),
            "ln2": t_ln(f"{base}.final_layer_norm"),
            "ff1": t_lin(f"{base}.feed_forward.intermediate_dense"),
            "ff2": t_lin(f"{base}.feed_forward.output_dense"),
        })

    return {
        "fe": fe,
        "fp": {"ln": t_ln("feature_projection.layer_norm"),
               "proj": t_lin("feature_projection.projection")},
        "pos_conv": pos_conv,
        "enc_ln": t_ln("encoder.layer_norm"),
        "layers": layers,
    }
