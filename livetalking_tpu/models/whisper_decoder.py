"""Whisper decoder (tiny by default) with KV-cache greedy decoding — the
TPU-native STT path behind the local ``/api/asr`` endpoint.

The reference keeps STT on the host GPU via funasr/SenseVoice (reference
server/asr_server.py:33-67); we instead run Whisper-tiny end to end in
JAX: the encoder is shared with the MuseTalk feature path
(models/whisper_encoder.py), and this module adds the autoregressive text
decoder. The whole greedy loop runs on device under one ``jit`` via
``lax.while_loop`` with a static-length KV cache — no per-token host
round-trips, static shapes throughout (XLA-friendly; the reference does a
fresh torch forward per token inside HF ``generate``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models.whisper_encoder import (
    WhisperConfig,
    _gelu,
    _linear,
    _ln,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperDecoderConfig:
    vocab_size: int = 51865
    d_model: int = 384
    num_layers: int = 4
    num_heads: int = 6
    ffn: int = 1536
    max_target_positions: int = 448
    layer_norm_eps: float = 1e-5
    # special tokens (multilingual tiny layout)
    sot: int = 50258
    eot: int = 50257
    task_transcribe: int = 50359
    no_timestamps: int = 50363
    lang_en: int = 50259
    lang_zh: int = 50260


TINY_DECODER = WhisperDecoderConfig()


def _split_heads(t: jnp.ndarray, heads: int) -> jnp.ndarray:
    B, T, D = t.shape
    return t.reshape(B, T, heads, D // heads).transpose(0, 2, 1, 3)


def _merge_heads(t: jnp.ndarray) -> jnp.ndarray:
    B, H, T, hd = t.shape
    return t.transpose(0, 2, 1, 3).reshape(B, T, H * hd)


def _cached_self_attn(p, x, cache_k, cache_v, pos, heads):
    """One-token self-attention against a static-length KV cache.

    x: (B, 1, D). cache_{k,v}: (B, H, T_max, hd) updated in place at
    ``pos``; entries at t > pos are masked out of the softmax.
    """
    B, _, D = x.shape
    hd = D // heads
    q = _split_heads(_linear(p["q"], x) * (hd ** -0.5), heads)  # (B,H,1,hd)
    k_new = _split_heads(_linear(p["k"], x), heads)  # (B,H,1,hd)
    v_new = _split_heads(_linear(p["v"], x), heads)

    cache_k = jax.lax.dynamic_update_slice(cache_k, k_new, (0, 0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v_new, (0, 0, pos, 0))

    s = jnp.einsum("bhqd,bhkd->bhqk", q, cache_k,
                   preferred_element_type=jnp.float32)
    t_ids = jnp.arange(cache_k.shape[2])[None, None, None, :]
    s = jnp.where(t_ids <= pos, s, -jnp.inf)
    pr = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr, cache_v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return _linear(p["o"], _merge_heads(o)), cache_k, cache_v


def _cross_attn(p, x, xk, xv, heads):
    """Cross-attention with precomputed encoder K/V: xk/xv (B,H,S,hd)."""
    B, T, D = x.shape
    hd = D // heads
    q = _split_heads(_linear(p["q"], x) * (hd ** -0.5), heads)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, xk,
                   preferred_element_type=jnp.float32)
    pr = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr, xv,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return _linear(p["o"], _merge_heads(o))


def precompute_cross_kv(params: Params, cfg: WhisperDecoderConfig,
                        enc: jnp.ndarray):
    """Encoder output (B,S,D) -> per-layer cross-attention K/V."""
    kv = []
    for lp in params["layers"]:
        kv.append((
            _split_heads(_linear(lp["xattn"]["k"], enc), cfg.num_heads),
            _split_heads(_linear(lp["xattn"]["v"], enc), cfg.num_heads),
        ))
    return kv


def decode_step(params: Params, cfg: WhisperDecoderConfig, token: jnp.ndarray,
                pos: jnp.ndarray, caches, cross_kv):
    """One decoder step. token (B,) int32; pos scalar int32; caches is a
    list of (k, v) per layer. Returns (logits (B,V), new caches)."""
    x = params["tok_emb"][token][:, None, :]  # (B,1,D)
    x = (x + jax.lax.dynamic_slice_in_dim(
        params["pos_emb"], pos, 1, axis=0)[None]).astype(x.dtype)

    new_caches = []
    for lp, (ck, cv), (xk, xv) in zip(params["layers"], caches, cross_kv):
        h, ck, cv = _cached_self_attn(
            lp["attn"], _ln(lp["ln1"], x, cfg.layer_norm_eps), ck, cv, pos,
            cfg.num_heads)
        x = x + h
        x = x + _cross_attn(lp["xattn"], _ln(lp["ln_x"], x, cfg.layer_norm_eps),
                            xk, xv, cfg.num_heads)
        x = x + _linear(lp["fc2"], _gelu(_linear(
            lp["fc1"], _ln(lp["ln2"], x, cfg.layer_norm_eps))))
        new_caches.append((ck, cv))

    x = _ln(params["ln_post"], x, cfg.layer_norm_eps)
    logits = jnp.einsum("btd,vd->btv", x.astype(jnp.float32),
                        params["tok_emb"].astype(jnp.float32))
    return logits[:, 0], new_caches


def make_greedy_decode(params: Params, cfg: WhisperDecoderConfig,
                       max_new: int = 128, dtype=jnp.bfloat16,
                       no_repeat_ngram: int = 3,
                       repetition_penalty: float = 1.0):
    """Build a jitted fn: encoder states (B,S,D) + prompt (B,P) int32 ->
    (tokens (B,max_new), n_valid (B,)). Greedy by default, stops at EOT
    (device-side while_loop; stopped rows keep emitting EOT).

    Degenerate-loop guards (the reference's SenseVoice backend never
    loops; our autoregressive decoder needs the standard Whisper
    safeguards):

    - ``no_repeat_ngram`` (=3): a token that would complete an n-gram
      already present in the generated text is banned that step.
    - ``repetition_penalty`` (>1): HF-style down-weighting of already
      emitted tokens.
    - The returned fn takes optional ``(temperature, seed)`` runtime
      args (no recompile) so callers can retry degenerate transcripts
      with sampling — the compression-ratio fallback in
      server/asr_server.py WhisperJaxSTT.transcribe.
    """
    ng = int(no_repeat_ngram)

    def fn(params, enc, prompt, temperature, seed):
        B = prompt.shape[0]
        H, D = cfg.num_heads, cfg.d_model
        hd = D // H
        T_max = prompt.shape[1] + max_new
        cross_kv = precompute_cross_kv(params, cfg, enc.astype(dtype))
        caches = [(jnp.zeros((B, H, T_max, hd), dtype),
                   jnp.zeros((B, H, T_max, hd), dtype))
                  for _ in range(cfg.num_layers)]

        # prime the cache with the prompt (last logits kept)
        def prompt_body(i, carry):
            caches, logits = carry
            logits, caches = decode_step(params, cfg, prompt[:, i], i,
                                         caches, cross_kv)
            return caches, logits

        caches, logits = jax.lax.fori_loop(
            0, prompt.shape[1], prompt_body,
            (caches, jnp.zeros((B, cfg.vocab_size), jnp.float32)))

        # text tokens + EOT only; no timestamp / special continuation
        allow = jnp.arange(cfg.vocab_size) < cfg.eot
        allow = allow.at[cfg.eot].set(True)
        rows = jnp.arange(B)

        def cond(state):
            step, _, _, done, _, _, _ = state
            return jnp.logical_and(step < max_new, ~jnp.all(done))

        def body(state):
            step, caches, logits, done, out, seen, key = state
            masked = jnp.where(allow[None], logits, -jnp.inf)
            if repetition_penalty != 1.0:
                pen = jnp.where(masked > 0, masked / repetition_penalty,
                                masked * repetition_penalty)
                masked = jnp.where(seen, pen, masked)
            if ng > 1:
                # ban tokens completing an n-gram already in `out`: for
                # every j with out[:, j:j+ng-1] == last ng-1 emitted
                # tokens, ban out[:, j+ng-1]
                last = jax.lax.dynamic_slice(
                    out, (0, jnp.maximum(step - (ng - 1), 0)),
                    (B, ng - 1))  # (B, ng-1)
                J = max_new - (ng - 1)
                cand = jnp.stack(
                    [jax.lax.slice(out, (0, k), (B, J + k))
                     for k in range(ng - 1)], axis=-1)  # (B, J, ng-1)
                tails = jax.lax.slice(out, (0, ng - 1),
                                      (B, max_new))  # (B, J)
                match = jnp.all(cand == last[:, None, :], axis=-1)
                # the banned token must itself be generated history, and
                # the guard only applies once ng-1 tokens exist
                j_ids = jnp.arange(J)[None]
                match &= (j_ids + ng - 1 < step) & (step >= ng - 1)
                ban = jnp.zeros((B, cfg.vocab_size), bool)
                ban = ban.at[rows[:, None], tails].max(match)
                ban = ban.at[:, cfg.eot].set(False)
                masked = jnp.where(ban, -jnp.inf, masked)
            key, sub = jax.random.split(key)
            gumbel = -jnp.log(-jnp.log(
                jax.random.uniform(sub, masked.shape, jnp.float32,
                                   1e-20, 1.0)))
            t = jnp.maximum(temperature, 1e-6)
            scored = masked / t + jnp.where(temperature > 0.0, gumbel, 0.0)
            tok = jnp.argmax(scored, axis=-1).astype(jnp.int32)
            tok = jnp.where(done, cfg.eot, tok)
            out = out.at[:, step].set(tok)
            seen = seen.at[rows, tok].set(True)
            seen = seen.at[:, cfg.eot].set(False)
            done = jnp.logical_or(done, tok == cfg.eot)
            logits, caches = decode_step(
                params, cfg, tok, prompt.shape[1] + step, caches, cross_kv)
            return step + 1, caches, logits, done, out, seen, key

        out = jnp.full((B, max_new), cfg.eot, jnp.int32)
        done = jnp.zeros((B,), bool)
        seen = jnp.zeros((B, cfg.vocab_size), bool)
        key = jax.random.PRNGKey(seed)
        _, _, _, done, out, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), caches, logits, done, out, seen, key))
        n_valid = jnp.sum(out != cfg.eot, axis=-1)
        return out, n_valid

    # params are a jit ARG (closed-over weights would be inlined into the
    # HLO as constants, bloating the compile request by the weight size)
    jfn = jax.jit(fn)
    return lambda enc, prompt, temperature=0.0, seed=0: jfn(
        params, enc, prompt, jnp.float32(temperature), jnp.uint32(seed))


def init_params(key: jax.Array, cfg: WhisperDecoderConfig = TINY_DECODER,
                dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, 4 + 12 * cfg.num_layers))
    D = cfg.d_model

    def lin(i, o, bias=True):
        p = {"w": (jax.random.normal(next(keys), (i, o), jnp.float32)
                   / np.sqrt(i)).astype(dtype)}
        p["b"] = jnp.zeros((o,), dtype) if bias else None
        return p

    def ln():
        return {"g": jnp.ones((D,), jnp.float32),
                "b": jnp.zeros((D,), jnp.float32)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "attn": {"q": lin(D, D), "k": lin(D, D, bias=False),
                     "v": lin(D, D), "o": lin(D, D)},
            "xattn": {"q": lin(D, D), "k": lin(D, D, bias=False),
                      "v": lin(D, D), "o": lin(D, D)},
            "ln1": ln(), "ln_x": ln(), "ln2": ln(),
            "fc1": lin(D, cfg.ffn), "fc2": lin(cfg.ffn, D),
        })
    return {
        "tok_emb": (jax.random.normal(
            next(keys), (cfg.vocab_size, D), jnp.float32) * 0.02).astype(dtype),
        "pos_emb": (jax.random.normal(
            next(keys), (cfg.max_target_positions, D), jnp.float32)
            * 0.02).astype(dtype),
        "ln_post": ln(),
        "layers": layers,
    }


from livetalking_tpu.models.layers import to_numpy as _np  # noqa: E402


def convert_torch_state_dict(sd: Dict[str, Any],
                             cfg: WhisperDecoderConfig = TINY_DECODER,
                             dtype=jnp.bfloat16) -> Params:
    """HF ``WhisperModel`` decoder state dict -> our tree. Accepts keys
    with or without the ``decoder.`` / ``model.decoder.`` prefix."""
    sd = {k: _np(v) for k, v in sd.items()}
    for prefix in ("model.decoder.", "decoder."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
            break

    def lin(prefix, bias=True):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T.astype(np.float32), dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"].astype(np.float32), dtype)
                if bias else None}

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
            "xattn": {
                "q": lin(f"{b}.encoder_attn.q_proj"),
                "k": lin(f"{b}.encoder_attn.k_proj", bias=False),
                "v": lin(f"{b}.encoder_attn.v_proj"),
                "o": lin(f"{b}.encoder_attn.out_proj"),
            },
            "ln1": ln(f"{b}.self_attn_layer_norm"),
            "ln_x": ln(f"{b}.encoder_attn_layer_norm"),
            "ln2": ln(f"{b}.final_layer_norm"),
            "fc1": lin(f"{b}.fc1"),
            "fc2": lin(f"{b}.fc2"),
        })
    return {
        "tok_emb": jnp.asarray(
            sd["embed_tokens.weight"].astype(np.float32), dtype),
        "pos_emb": jnp.asarray(
            sd["embed_positions.weight"].astype(np.float32), dtype),
        "ln_post": ln("layer_norm"),
        "layers": layers,
    }
