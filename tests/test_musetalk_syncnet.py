"""MuseTalk SyncNet (models/musetalk_syncnet.py): torch-parity for the
forward + converter, checkpoint-layout round-trip, and loss sanity.

The torch recomposition mirrors the reference module/key layout
(reference avatars/musetalk/models/syncnet.py:18-240) so ``state_dict()``
produces the exact checkpoint keys ``{audio,visual}_encoder.conv_in /
down_blocks.N.* / norm_out`` that ``convert_torch_state_dict`` consumes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from livetalking_tpu.models import musetalk_syncnet as ms  # noqa: E402


class TResnet(nn.Module):
    def __init__(self, cin, cout, factor):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)
        fh, fw = (factor, factor) if isinstance(factor, int) else factor
        self.factor = (fh, fw)
        if (fh, fw) != (1, 1):
            self.downsample_conv = nn.Conv2d(cout, cout, 3, (fh, fw), 0)
            # torch pad order: (w_left, w_right, h_top, h_bottom)
            self.pad = (0, 1, 0, 1)
            if fh == 1:
                self.pad = (0, 1, 1, 1)
            elif fw == 1:
                self.pad = (1, 1, 0, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        h = x + h
        if hasattr(self, "downsample_conv"):
            h = self.downsample_conv(F.pad(h, self.pad))
        return h


class TAttnBiased(nn.Module):
    def __init__(self, c, heads=8):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        B, T, C = x.shape
        hd = C // self.heads

        def split(t):
            return t.view(B, -1, self.heads, hd).transpose(1, 2)

        o = F.scaled_dot_product_attention(
            split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x)))
        return self.to_out[0](o.transpose(1, 2).reshape(B, T, C))


class TGeglu(nn.Module):
    def __init__(self, c, inner):
        super().__init__()
        self.proj = nn.Linear(c, 2 * inner)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TFF(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.net = nn.ModuleList(
            [TGeglu(c, 4 * c), nn.Identity(), nn.Linear(4 * c, c)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class TAttnBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, c, eps=1e-6)
        self.norm2 = nn.LayerNorm(c)
        self.norm3 = nn.LayerNorm(c)
        self.ff = TFF(c)
        self.conv_in = nn.Conv2d(c, c, 1)
        self.conv_out = nn.Conv2d(c, c, 1)
        self.attn = TAttnBiased(c)

    def forward(self, x):
        B, C, H, W = x.shape
        res = x
        h = self.conv_in(self.norm1(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.attn(self.norm2(h)) + h
        h = self.ff(self.norm3(h)) + h
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.conv_out(h) + res


class TEncoder(nn.Module):
    def __init__(self, cfg: ms.EncoderConfig):
        super().__init__()
        self.conv_in = nn.Conv2d(cfg.in_channels, cfg.block_out[0], 3, 1, 1)
        blocks = []
        cin = cfg.block_out[0]
        for cout, factor, has_attn in zip(cfg.block_out,
                                          cfg.downsample_factors,
                                          cfg.attn_blocks):
            blocks.append(TResnet(cin, cout, factor))
            if has_attn:
                blocks.append(TAttnBlock(cout))
            cin = cout
        self.down_blocks = nn.ModuleList(blocks)
        self.norm_out = nn.GroupNorm(32, cfg.block_out[-1], eps=1e-6)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h)
        h = F.relu(self.norm_out(h))
        e = h.reshape(h.shape[0], -1)
        return F.normalize(e, p=2, dim=1)


class TSyncNet(nn.Module):
    def __init__(self, cfg: ms.SyncNetConfig):
        super().__init__()
        self.audio_encoder = TEncoder(cfg.audio)
        self.visual_encoder = TEncoder(cfg.visual)


def _init(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (nn.GroupNorm, nn.LayerNorm)):
                m.weight.normal_(1.0, 0.05, generator=g)
                m.bias.normal_(0.0, 0.05, generator=g)
            elif isinstance(m, (nn.Conv2d, nn.Linear)):
                fan = int(np.prod(m.weight.shape[1:]))
                m.weight.normal_(0.0, 0.5 / fan**0.5, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.02, generator=g)
    return module


TINY = ms.SyncNetConfig(
    audio=ms.EncoderConfig(1, (32, 64), (2, (2, 3)), (0, 1)),
    visual=ms.EncoderConfig(6, (32, 64), ((1, 2), 2), (1, 0)),
)


def test_converter_and_forward_match_torch(rng):
    m = _init(TSyncNet(TINY), seed=0).eval()
    sd = {"state_dict": dict(m.state_dict())}  # reference ckpt layout
    params = ms.convert_torch_state_dict(sd, TINY, dtype=jnp.float32)

    faces = rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    audio = rng.standard_normal((2, 8, 12, 1)).astype(np.float32)
    with torch.no_grad():
        v_want = m.visual_encoder(
            torch.from_numpy(faces.transpose(0, 3, 1, 2))).numpy()
        a_want = m.audio_encoder(
            torch.from_numpy(audio.transpose(0, 3, 1, 2))).numpy()
    v_got, a_got = ms.apply(params, jnp.asarray(faces), jnp.asarray(audio),
                            TINY)
    np.testing.assert_allclose(np.asarray(v_got), v_want, atol=2e-4)
    np.testing.assert_allclose(np.asarray(a_got), a_want, atol=2e-4)


def test_converter_handles_module_prefix():
    m = _init(TSyncNet(TINY), seed=1)
    sd = {"module." + k: v for k, v in m.state_dict().items()}
    params = ms.convert_torch_state_dict(sd, TINY, dtype=jnp.float32)
    # every interleaved block converted: resnet+attn per encoder
    assert len(params["audio_encoder"]["down_blocks"]) == 3
    assert len(params["visual_encoder"]["down_blocks"]) == 3


def test_default_config_shapes_and_loss():
    """MUSETALK default: 16-frame lower-half window + 52-col mel both
    reduce to a single spatial cell; embeddings are unit-norm and the
    cosine BCE behaves."""
    params = ms.init_params(jax.random.PRNGKey(0), ms.MUSETALK, jnp.float32)
    rng = np.random.default_rng(0)
    faces = jnp.asarray(rng.random((1, 128, 256, 48)).astype(np.float32))
    audio = jnp.asarray(
        rng.standard_normal((1, 80, 52, 1)).astype(np.float32))
    v, a = jax.jit(lambda p, f, m: ms.apply(p, f, m))(params, faces, audio)
    assert v.shape[0] == 1 and a.shape == v.shape
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)

    pos = ms.cosine_bce_loss(v, v, jnp.ones((1,)))
    neg = ms.cosine_bce_loss(v, -v, jnp.ones((1,)))
    assert float(pos) < float(neg)


def test_config_from_dict_yaml_layout():
    cfg = ms.SyncNetConfig.from_dict({
        "audio_encoder": {"in_channels": 1,
                          "block_out_channels": [32, 64],
                          "downsample_factors": [2, [2, 3]],
                          "attn_blocks": [0, 1], "dropout": 0.0},
        "visual_encoder": {"in_channels": 48,
                           "block_out_channels": [64, 128],
                           "downsample_factors": [2, 2],
                           "attn_blocks": [1, 0], "dropout": 0.0},
    })
    assert cfg.audio.downsample_factors == (2, (2, 3))
    assert cfg.visual.in_channels == 48
