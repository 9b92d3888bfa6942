"""A/B: int8 transformer linears in the MuseTalk U-Net (prototype).

The U-Net's conv path is already W8A8 int8 (sd_unet.apply_int8) but the
transformer blocks stay bf16. At B=16 their linears are ~1 TFLOP/step
(FF geglu 12C^2/token + projections), i.e. roughly half the measured
20.4 ms U-Net step. This bench prototypes quantizing the softmax-SAFE
matmuls only -- ff.proj, ff.out, attn1.v/o, attn2.o, proj_in, proj_out;
q/k stay bf16 so attention scores are untouched, and cross-attention's
k/v stay bf16 (50-token whisper ctx, negligible FLOPs) -- and times:

  1. transformer_2d bf16 vs int8 variant at the three U-Net shapes
     (C=320 T=1024, C=640 T=256, C=1280 T=64), B=16
  2. the full U-Net int8 step with/without quantized transformers

Methodology: K data-chained iterations inside one jitted lax.fori_loop,
timed at two K values, time difference / (K2-K1) (CLAUDE.md -- naive
dispatch loops and block_until_ready are unreliable behind the axon
tunnel). Pure-XLA programs, so fori_loop wrapping is safe (the
remote-compiler hang only bites pallas-kernel bodies).

Run:  python - < tools/bench_unet_attn.py   (from the repo root; a
PYTHONPATH entry breaks the axon plugin init per CLAUDE.md)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.models import sd_unet
from livetalking_tpu.models.diffusion_blocks import (
    attention, conv_q, geglu_ff, layer_norm, linear, group_norm,
    quantize_conv, transformer_2d,
)

B = 16
HEADS = 8
CROSS = 384


# --- prototype int8 linear primitives (candidates for diffusion_blocks) ---

def quantize_linear(p):
    w = jnp.asarray(p["w"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"wq": wq, "ws": scale,
            "b": None if p.get("b") is None else jnp.asarray(p["b"], jnp.float32)}


def linear_q(pq, x):
    if "as" in pq:
        sx = pq["as"]
    else:
        sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jnp.dot(xq, pq["wq"], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * pq["ws"])
    if pq.get("b") is not None:
        y = y + pq["b"]
    return y.astype(x.dtype)


def quantize_transformer(p):
    tb = p["block"]
    return {
        "norm": p["norm"],
        "proj_in": quantize_conv(p["proj_in"]),
        "proj_out": quantize_conv(p["proj_out"]),
        "block": {
            "norm1": tb["norm1"],
            "attn1": {"q": tb["attn1"]["q"], "k": tb["attn1"]["k"],
                      "v": quantize_linear(tb["attn1"]["v"]),
                      "o": quantize_linear(tb["attn1"]["o"])},
            "norm2": tb["norm2"],
            "attn2": {"q": tb["attn2"]["q"], "k": tb["attn2"]["k"],
                      "v": tb["attn2"]["v"],
                      "o": quantize_linear(tb["attn2"]["o"])},
            "norm3": tb["norm3"],
            "ff": {"proj": quantize_linear(tb["ff"]["proj"]),
                   "out": quantize_linear(tb["ff"]["out"])},
        },
    }


def attention_q(p, x, ctx, heads):
    """attention() with int8 v/o (self) or o (cross); q/k bf16."""
    from livetalking_tpu.ops.pallas_attention import attention_xla, vmem_attention

    B_, T, C = x.shape
    kv_src = x if ctx is None else ctx
    q = linear(p["q"], x)
    k = linear(p["k"], kv_src)
    v = (linear_q(p["v"], kv_src) if "wq" in p["v"] else linear(p["v"], kv_src))
    hd = C // heads

    def split(t):
        return t.reshape(B_, -1, heads, hd).transpose(0, 2, 1, 3)

    core = vmem_attention if ctx is None else attention_xla
    o = core(split(q), split(k), split(v), hd ** -0.5)
    o = o.transpose(0, 2, 1, 3).reshape(B_, T, C)
    return linear_q(p["o"], o)


def geglu_ff_q(p, x):
    h = linear_q(p["proj"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(a.dtype)
    return linear_q(p["out"], h)


def transformer_2d_q(p, x, ctx, heads):
    B_, H, W, C = x.shape
    res = x
    h = group_norm(p["norm"], x, eps=1e-6)
    h = conv_q(p["proj_in"], h, padding=0).reshape(B_, H * W, C)
    tb = p["block"]
    h = h + attention_q(tb["attn1"], layer_norm(tb["norm1"], h), None, heads)
    h = h + attention_q(tb["attn2"], layer_norm(tb["norm2"], h), ctx, heads)
    h = h + geglu_ff_q(tb["ff"], layer_norm(tb["norm3"], h))
    h = conv_q(p["proj_out"], h.reshape(B_, H, W, C), padding=0)
    return h + res


# --- chained-loop timing -------------------------------------------------

def timed(fn, x0, k1=20, k2=60, reps=2):
    """ms/iter via the PYTHON-side chained two-K difference (device
    carry, one data-dependent fetch at the end). The graphs here include
    the Pallas VMEM attention kernel at T=1024, and wrapping Pallas
    bodies in ``lax.fori_loop`` kills the tunnel's remote compiler
    (CLAUDE.md); the python-side chain is validated within 2% of the
    fori methodology."""
    @jax.jit
    def step(x):
        # keep shapes closed: renormalize into the input's scale
        return (fn(x) * 0.999).astype(x.dtype)

    x0 = step(x0)  # compile + warm
    np.asarray(x0)

    def run(k):
        best = float("inf")
        for _ in range(reps):
            cur = x0
            t0 = time.perf_counter()
            for _i in range(k):
                cur = step(cur)
            np.asarray(jnp.sum(cur, dtype=jnp.float32))  # one fetch
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(k2) - run(k1)) / (k2 - k1) * 1e3


def main():
    from livetalking_tpu.avatars.musetalk_avatar import _with_dummy_scales

    rng = jax.random.PRNGKey(0)
    print(f"# backend={jax.default_backend()} B={B}")
    shapes = [(320, 32), (640, 16), (1280, 8)]
    keys = iter(jax.random.split(rng, 64))
    for C, HW in shapes:
        p = sd_unet._r_transformer(keys, C, CROSS, jnp.bfloat16)
        pq = _with_dummy_scales(quantize_transformer(p))
        x = jax.random.normal(next(keys), (B, HW, HW, C), jnp.bfloat16)
        ctx = jax.random.normal(next(keys), (B, 50, CROSS), jnp.bfloat16)
        ms_bf16 = timed(lambda h: transformer_2d(p, h, ctx, HEADS), x)
        ms_int8 = timed(lambda h: transformer_2d_q(pq, h, ctx, HEADS), x)
        print(f"transformer C={C:4d} T={HW*HW:4d}: "
              f"bf16 {ms_bf16:.3f} ms  int8 {ms_int8:.3f} ms  "
              f"({ms_bf16/ms_int8:.2f}x)")

    # full U-Net step A/B: conv-int8 baseline vs conv-int8 + attn-int8
    cfg = sd_unet.MUSETALK
    params = sd_unet.init_params(jax.random.PRNGKey(1), cfg)
    pq = _with_dummy_scales(sd_unet.quantize_unet(params))

    def q_attn_tree(tree):
        out = dict(tree)
        out["down"] = [dict(b) for b in tree["down"]]
        out["up"] = [dict(b) for b in tree["up"]]
        for b in out["down"] + out["up"]:
            if "attentions" in b:
                b["attentions"] = [quantize_transformer(a) for a in b["attentions"]]
        out["mid"] = dict(tree["mid"])
        out["mid"]["attn"] = quantize_transformer(tree["mid"]["attn"])
        return out

    pq_attn = _with_dummy_scales(q_attn_tree(pq))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 32, 8), jnp.bfloat16)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (B, 50, CROSS), jnp.bfloat16)

    def step_base(xx):
        y = sd_unet.apply_int8(pq, cfg, xx, t, ctx).astype(jnp.bfloat16)
        return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 4)))  # back to 8ch

    def walk_attn_q(xx):
        return _walk_int8_attn(pq_attn, cfg, xx, t, ctx)

    def step_attn(xx):
        y = walk_attn_q(xx).astype(jnp.bfloat16)
        return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 4)))

    ms_base = timed(step_base, x, k1=10, k2=30)
    ms_attn = timed(step_attn, x, k1=10, k2=30)
    print(f"unet step B={B}: conv-int8 {ms_base:.2f} ms  "
          f"+attn-int8 {ms_attn:.2f} ms  ({ms_base - ms_attn:+.2f} ms)")


def _walk_int8_attn(pq, cfg, x, t, ctx):
    """sd_unet._walk_int8 with transformer_2d_q at quantized sites."""
    from livetalking_tpu.models.diffusion_blocks import (
        resnet_block, silu, timestep_embedding,
    )

    def tf(p, h):
        if "wq" in p["block"]["ff"]["proj"]:
            return transformer_2d_q(p, h, ctx, cfg.heads)
        return transformer_2d(p, h, ctx, cfg.heads)

    def resnet(rq, h_in):
        h = conv_q(rq["conv1"],
                   silu(group_norm(rq["norm1"], h_in, eps=cfg.norm_eps)))
        if "time_emb_proj" in rq:
            tproj = linear(rq["time_emb_proj"], silu(temb))
            h = h + tproj[:, None, None, :].astype(h.dtype)
        h = conv_q(rq["conv2"],
                   silu(group_norm(rq["norm2"], h, eps=cfg.norm_eps)))
        sc = h_in
        if "conv_shortcut" in rq:
            sc = conv_q(rq["conv_shortcut"], h_in, padding=0)
        return sc + h

    temb = timestep_embedding(t, cfg.block_out[0])
    temb = linear(pq["time2"], silu(linear(pq["time1"], temb.astype(x.dtype))))
    h = conv_q(pq["conv_in"], x)
    skips = [h]
    for bq in pq["down"]:
        for j, rq in enumerate(bq["resnets"]):
            h = resnet(rq, h)
            if "attentions" in bq:
                h = tf(bq["attentions"][j], h)
            skips.append(h)
        if "down" in bq:
            h = conv_q(bq["down"], h, stride=2)
            skips.append(h)
    h = resnet(pq["mid"]["r0"], h)
    h = tf(pq["mid"]["attn"], h)
    h = resnet(pq["mid"]["r1"], h)
    for bq in pq["up"]:
        for j, rq in enumerate(bq["resnets"]):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = resnet(rq, h)
            if "attentions" in bq:
                h = tf(bq["attentions"][j], h)
        if "up" in bq:
            from livetalking_tpu.models.diffusion_blocks import upsample_nearest2x
            h = conv_q(bq["up"], upsample_nearest2x(h))
    a_out = silu(group_norm(pq["norm_out"], h, eps=cfg.norm_eps))
    return conv_q(pq["conv_out"], a_out).astype(jnp.float32)


if __name__ == "__main__":
    main()
