"""End-to-end tests for the diffusers-checkpoint converters
(sd_unet.convert_torch_state_dict / sd_vae.convert_torch_state_dict).

No pretrained checkpoints exist in this environment, so each test builds
a torch module tree whose ``state_dict()`` yields the EXACT diffusers key
names (``down_blocks.N.resnets.M.conv1.weight`` ...) with a faithful
torch forward, then round-trips the state_dict through the converter and
asserts full-model numeric parity (reference avatars/musetalk/models/
unet.py:12-48 and vae.py:10-122 load these exact layouts).

The state_dict is wrapped in a key-access recorder so the tests also
prove every checkpoint tensor is consumed — a converter typo either
KeyErrors (missing key) or leaves a key unread (wrong prefix), and both
fail here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from livetalking_tpu.models import sd_unet, sd_vae  # noqa: E402


class RecordingSD(dict):
    """state_dict wrapper that records which keys the converter read."""

    def __init__(self, sd):
        super().__init__(sd)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _init(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (nn.GroupNorm, nn.LayerNorm)):
                m.weight.normal_(1.0, 0.05, generator=g)
                m.bias.normal_(0.0, 0.05, generator=g)
            elif isinstance(m, nn.Conv2d):
                fan = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.normal_(0.0, 0.5 / fan**0.5, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.02, generator=g)
            elif isinstance(m, nn.Linear):
                m.weight.normal_(0.0, 0.5 / m.weight.shape[1] ** 0.5,
                                 generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.02, generator=g)
    return module


# ---------------------------------------------------------------------------
# torch recompositions (diffusers module/key layout, minimal forwards)
# ---------------------------------------------------------------------------


class TResnet(nn.Module):
    def __init__(self, cin, cout, tdim=None, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        if tdim:
            self.time_emb_proj = nn.Linear(tdim, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TAttn(nn.Module):
    """BasicTransformerBlock attention (to_q/k/v no bias, to_out.0)."""

    def __init__(self, c, kv, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(c, c, bias=False)
        self.to_k = nn.Linear(kv, c, bias=False)
        self.to_v = nn.Linear(kv, c, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        B, T, C = x.shape
        hd = C // self.heads

        def split(t):
            return t.view(B, -1, self.heads, hd).transpose(1, 2)

        o = F.scaled_dot_product_attention(
            split(self.to_q(x)), split(self.to_k(ctx)), split(self.to_v(ctx)))
        return self.to_out[0](o.transpose(1, 2).reshape(B, T, C))


class TGeglu(nn.Module):
    def __init__(self, c, inner):
        super().__init__()
        self.proj = nn.Linear(c, 2 * inner)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TFeedForward(nn.Module):
    def __init__(self, c, inner):
        super().__init__()
        self.net = nn.ModuleList(
            [TGeglu(c, inner), nn.Identity(), nn.Linear(inner, c)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class TBasicBlock(nn.Module):
    def __init__(self, c, cross, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(c)
        self.attn1 = TAttn(c, c, heads)
        self.norm2 = nn.LayerNorm(c)
        self.attn2 = TAttn(c, cross, heads)
        self.norm3 = nn.LayerNorm(c)
        self.ff = TFeedForward(c, 4 * c)

    def forward(self, h, ctx):
        h = h + self.attn1(self.norm1(h))
        h = h + self.attn2(self.norm2(h), ctx)
        return h + self.ff(self.norm3(h))


class TTransformer2D(nn.Module):
    def __init__(self, c, cross, heads):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.transformer_blocks = nn.ModuleList([TBasicBlock(c, cross, heads)])
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.transformer_blocks[0](h, ctx)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.proj_out(h) + res


class TDownsampler(nn.Module):
    def __init__(self, c, vae=False):
        super().__init__()
        self.vae = vae
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0 if vae else 1)

    def forward(self, x):
        if self.vae:  # diffusers VAE Downsample2D pads (0,1,0,1)
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsampler(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TTimeEmbedding(nn.Module):
    def __init__(self, c, tdim):
        super().__init__()
        self.linear_1 = nn.Linear(c, tdim)
        self.linear_2 = nn.Linear(tdim, tdim)

    def forward(self, emb):
        return self.linear_2(F.silu(self.linear_1(emb)))


def _sinusoid(t, dim):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    emb = np.asarray(t, np.float32)[:, None] * np.exp(exponent)[None]
    return np.concatenate([np.cos(emb), np.sin(emb)],
                          axis=-1).astype(np.float32)


class TorchUNet(nn.Module):
    """UNet2DConditionModel recomposition for a given UNetConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        tdim, eps = cfg.time_dim, cfg.norm_eps
        self.conv_in = nn.Conv2d(cfg.in_channels, cfg.block_out[0], 3, 1, 1)
        self.time_embedding = TTimeEmbedding(cfg.block_out[0], tdim)

        self.down_blocks = nn.ModuleList()
        for blk in sd_unet._down_plan(cfg):
            m = nn.Module()
            m.resnets = nn.ModuleList(
                [TResnet(ci, blk["out"], tdim, eps) for ci in blk["res_ins"]])
            if blk["attn"]:
                m.attentions = nn.ModuleList(
                    [TTransformer2D(blk["out"], cfg.cross_dim, cfg.heads)
                     for _ in blk["res_ins"]])
            if blk["down"]:
                m.downsamplers = nn.ModuleList([TDownsampler(blk["out"])])
            self.down_blocks.append(m)

        mc = cfg.block_out[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TResnet(mc, mc, tdim, eps), TResnet(mc, mc, tdim, eps)])
        self.mid_block.attentions = nn.ModuleList(
            [TTransformer2D(mc, cfg.cross_dim, cfg.heads)])

        self.up_blocks = nn.ModuleList()
        for blk in sd_unet._up_plan(cfg):
            m = nn.Module()
            m.resnets = nn.ModuleList(
                [TResnet(ci, blk["out"], tdim, eps) for ci in blk["res_ins"]])
            if blk["attn"]:
                m.attentions = nn.ModuleList(
                    [TTransformer2D(blk["out"], cfg.cross_dim, cfg.heads)
                     for _ in blk["res_ins"]])
            if blk["up"]:
                m.upsamplers = nn.ModuleList([TUpsampler(blk["out"])])
            self.up_blocks.append(m)

        self.conv_norm_out = nn.GroupNorm(32, cfg.block_out[0], eps=eps)
        self.conv_out = nn.Conv2d(cfg.block_out[0], cfg.out_channels, 3, 1, 1)

    def forward(self, x, t, ctx):
        temb = self.time_embedding(
            torch.from_numpy(_sinusoid(t, self.cfg.block_out[0])))
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVaeAttn(nn.Module):
    """AutoencoderKL mid attention, modern key layout (to_q/.../to_out.0)."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        o = F.scaled_dot_product_attention(
            self.to_q(h)[:, None], self.to_k(h)[:, None],
            self.to_v(h)[:, None])[:, 0]
        o = self.to_out[0](o)
        return x + o.reshape(B, H, W, C).permute(0, 3, 1, 2)


def _vae_mid(c):
    m = nn.Module()
    m.resnets = nn.ModuleList([TResnet(c, c), TResnet(c, c)])
    m.attentions = nn.ModuleList([TVaeAttn(c)])
    return m


def _vae_mid_fwd(m, h):
    return m.resnets[1](m.attentions[0](m.resnets[0](h)))


class TorchVAE(nn.Module):
    """AutoencoderKL recomposition (small channel ladder; the converter
    reads shapes from the state_dict so the ladder is test-local)."""

    def __init__(self, ch=(32, 32, 64, 64), zc=4):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, ch[0], 3, 1, 1)
        enc.down_blocks = nn.ModuleList()
        cin = ch[0]
        for i, cout in enumerate(ch):
            m = nn.Module()
            m.resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout) for j in range(2)])
            if i < len(ch) - 1:
                m.downsamplers = nn.ModuleList([TDownsampler(cout, vae=True)])
            enc.down_blocks.append(m)
            cin = cout
        enc.mid_block = _vae_mid(ch[-1])
        enc.conv_norm_out = nn.GroupNorm(32, ch[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * zc, 3, 1, 1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * zc, 2 * zc, 1)
        self.post_quant_conv = nn.Conv2d(zc, zc, 1)

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(zc, ch[-1], 3, 1, 1)
        dec.mid_block = _vae_mid(ch[-1])
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        cin = rev[0]
        for i, cout in enumerate(rev):
            m = nn.Module()
            m.resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout) for j in range(3)])
            if i < len(rev) - 1:
                m.upsamplers = nn.ModuleList([TUpsampler(cout)])
            dec.up_blocks.append(m)
            cin = cout
        dec.conv_norm_out = nn.GroupNorm(32, ch[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(ch[0], 3, 3, 1, 1)
        self.decoder = dec

    def encode_mean(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = _vae_mid_fwd(e.mid_block, h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        moments = self.quant_conv(h)
        return moments[:, : moments.shape[1] // 2] * sd_vae.SCALING_FACTOR

    def decode(self, z):
        d = self.decoder
        h = self.post_quant_conv(z / sd_vae.SCALING_FACTOR)
        h = d.conv_in(h)
        h = _vae_mid_fwd(d.mid_block, h)
        for blk in d.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        h = d.conv_out(F.silu(d.conv_norm_out(h)))
        return torch.clamp(h / 2.0 + 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

TINY = sd_unet.UNetConfig(block_out=(32, 64, 96, 96), heads=2)


def test_unet_converter_full_model_parity(rng):
    m = _init(TorchUNet(TINY), seed=0).eval()
    sd = RecordingSD({k: v for k, v in m.state_dict().items()})
    params = sd_unet.convert_torch_state_dict(sd, TINY, dtype=jnp.float32)
    assert set(sd) - sd.read == set(), "unconsumed checkpoint keys"

    x = rng.standard_normal((2, 32, 32, 8)).astype(np.float32)
    t = np.asarray([0.0, 7.0], np.float32)
    ctx = rng.standard_normal((2, 50, 384)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2)), t,
                 torch.from_numpy(ctx)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(sd_unet.apply(params, TINY, jnp.asarray(x),
                                   jnp.asarray(t), jnp.asarray(ctx)))
    scale = np.abs(want).max() + 1e-8
    assert np.abs(got - want).max() / scale < 2e-3


def test_unet_converter_missing_key_fails():
    m = _init(TorchUNet(TINY), seed=1)
    sd = dict(m.state_dict())
    del sd["down_blocks.1.resnets.0.conv1.weight"]  # deliberate typo stand-in
    with pytest.raises(KeyError):
        sd_unet.convert_torch_state_dict(sd, TINY, dtype=jnp.float32)


def test_unet_up_plan_matches_sd15_channel_table():
    """Known-good diffusers SD1.x skip arithmetic for the full MuseTalk
    config (reference models/musetalkV15/musetalk.json block ladder)."""
    ins = [blk["res_ins"] for blk in sd_unet._up_plan(sd_unet.MUSETALK)]
    assert ins == [
        [2560, 2560, 2560],
        [2560, 2560, 1920],
        [1920, 1280, 960],
        [960, 640, 640],
    ]


def test_vae_converter_full_model_parity(rng):
    m = _init(TorchVAE(), seed=2).eval()
    sd = RecordingSD({k: v for k, v in m.state_dict().items()})
    params = sd_vae.convert_torch_state_dict(sd, dtype=jnp.float32)
    assert set(sd) - sd.read == set(), "unconsumed checkpoint keys"

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        z_want = m.encode_mean(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    z_got = np.asarray(sd_vae.encode(params, jnp.asarray(x)))
    np.testing.assert_allclose(
        z_got, z_want.transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3)

    z = (rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
         * sd_vae.SCALING_FACTOR)
    with torch.no_grad():
        y_want = m.decode(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy()
    y_got = np.asarray(sd_vae.decode(params, jnp.asarray(z), dtype=jnp.float32))
    np.testing.assert_allclose(
        y_got, y_want.transpose(0, 2, 3, 1), atol=2e-3)


def test_vae_converter_legacy_attention_keys(rng):
    """Pre-0.15 diffusers checkpoints name the mid attention
    query/key/value/proj_attn; the converter must accept both."""
    m = _init(TorchVAE(), seed=3).eval()
    ren = {"to_q": "query", "to_k": "key", "to_v": "value",
           "to_out.0": "proj_attn"}
    sd = {}
    for k, v in m.state_dict().items():
        for new, old in ren.items():
            if ".attentions.0." + new + "." in k:
                k = k.replace("." + new + ".", "." + old + ".")
                break
        sd[k] = v
    params = sd_vae.convert_torch_state_dict(sd, dtype=jnp.float32)
    z = (rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
         * sd_vae.SCALING_FACTOR)
    with torch.no_grad():
        want = m.decode(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(sd_vae.decode(params, jnp.asarray(z), dtype=jnp.float32))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-3)
