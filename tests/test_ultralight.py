"""Numeric parity of the JAX Ultralight U-Net against a torch oracle.

Oracle assembled independently to the reference module/state_dict layout
(spec: reference avatars/ultralight/unet.py:7-215) with randomized BN
stats, exercising: inverted residuals (grouped/depthwise convs), BN fold,
bilinear align_corners=True upsampling, audio branch, and the fused step's
crop/mask prep (reference avatars/ultralight_avatar.py:143-171).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from livetalking_tpu.models import ultralight as ul  # noqa: E402


class IR(nn.Module):
    def __init__(self, inp, oup, stride, res, expand=2):
        super().__init__()
        h = inp * expand
        self.use_res = res
        self.conv = nn.Sequential(
            nn.Conv2d(inp, h, 1, 1, 0, bias=False), nn.BatchNorm2d(h), nn.ReLU(),
            nn.Conv2d(h, h, 3, stride, 1, groups=h, bias=False), nn.BatchNorm2d(h), nn.ReLU(),
            nn.Conv2d(h, oup, 1, 1, 0, bias=False), nn.BatchNorm2d(oup),
        )

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class DoubleDW(nn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.double_conv = nn.Sequential(IR(inp, oup, stride, False), IR(oup, oup, 1, True))

    def forward(self, x):
        return self.double_conv(x)


class _Wrap(nn.Module):
    """Gives a child the attribute name the reference uses."""

    def __init__(self, attr, mod):
        super().__init__()
        setattr(self, attr, mod)
        self._attr = attr

    def forward(self, x):
        return getattr(self, self._attr)(x)


class UpBlock(nn.Module):
    def __init__(self, inp, oup):
        super().__init__()
        self.conv = DoubleDW(inp, oup, 1)

    def forward(self, x1, x2):
        x1 = F.interpolate(x1, scale_factor=2, mode="bilinear", align_corners=True)
        return self.conv(torch.cat([x1, x2], dim=1))


class AudioBranch(nn.Module):
    def __init__(self):
        super().__init__()
        ch = [32, 64, 128, 256, 512]
        self.conv1 = IR(16, ch[1], 1, False)
        self.conv2 = IR(ch[1], ch[2], 1, False)
        self.conv3 = nn.Conv2d(ch[2], ch[3], 3, 2, 1)
        self.bn3 = nn.BatchNorm2d(ch[3])
        self.conv4 = IR(ch[3], ch[3], 1, True)
        self.conv5 = nn.Conv2d(ch[3], ch[4], 3, 2, 3)
        self.bn5 = nn.BatchNorm2d(ch[4])
        self.conv6 = IR(ch[4], ch[4], 1, True)
        self.conv7 = IR(ch[4], ch[4], 1, True)

    def forward(self, x):
        x = self.conv2(self.conv1(x))
        x = torch.relu(self.bn3(self.conv3(x)))
        x = self.conv4(x)
        x = torch.relu(self.bn5(self.conv5(x)))
        return self.conv7(self.conv6(x))


class TorchUltralight(nn.Module):
    def __init__(self):
        super().__init__()
        ch = [32, 64, 128, 256, 512]
        self.inc = _Wrap("inconv", nn.Sequential(IR(6, ch[0], 1, False)))
        self.down1 = _Wrap("maxpool_conv", nn.Sequential(DoubleDW(ch[0], ch[1], 2)))
        self.down2 = _Wrap("maxpool_conv", nn.Sequential(DoubleDW(ch[1], ch[2], 2)))
        self.down3 = _Wrap("maxpool_conv", nn.Sequential(DoubleDW(ch[2], ch[3], 2)))
        self.down4 = _Wrap("maxpool_conv", nn.Sequential(DoubleDW(ch[3], ch[4], 2)))
        self.audio_model = AudioBranch()
        self.fuse_conv = nn.Sequential(DoubleDW(ch[4] * 2, ch[4], 1), DoubleDW(ch[4], ch[3], 1))
        self.up1 = UpBlock(ch[4], ch[3] // 2)
        self.up2 = UpBlock(ch[3], ch[2] // 2)
        self.up3 = UpBlock(ch[2], ch[1] // 2)
        self.up4 = UpBlock(ch[1], ch[0])
        self.outc = _Wrap("conv", nn.Conv2d(ch[0], 3, 1))

    def forward(self, x, audio):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        a = self.audio_model(audio)
        x5 = self.fuse_conv(torch.cat([x5, a], dim=1))
        x = self.up1(x5, x4)
        x = self.up2(x, x3)
        x = self.up3(x, x2)
        x = self.up4(x, x1)
        return torch.sigmoid(self.outc(x))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(3)
    m = TorchUltralight()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0, 0.2)
    return m.eval()


def test_forward_parity(torch_model):
    params = ul.convert_torch_state_dict(torch_model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    B = 2
    face = rng.random((B, 160, 160, 6)).astype(np.float32)
    audio = rng.standard_normal((B, 16, 32, 32)).astype(np.float32) * 0.5

    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(face.transpose(0, 3, 1, 2)),
            torch.from_numpy(audio),
        ).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(
        ul.apply(params, jnp.asarray(face), jnp.asarray(audio.transpose(0, 2, 3, 1)))
    )
    assert got.shape == want.shape == (B, 160, 160, 3)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_fused_step_matches_reference_prep(torch_model):
    import cv2

    params = ul.convert_torch_state_dict(torch_model.state_dict(), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    N, B = 3, 2
    cycle = rng.integers(0, 256, (N, 168, 168, 3), dtype=np.uint8)
    idxs = np.array([0, 2], np.int32)
    audio = rng.standard_normal((B, 16, 32, 32)).astype(np.float32) * 0.5

    step = ul.make_infer_fn(B, dtype=jnp.float32)
    got = np.asarray(step(params, jnp.asarray(cycle), jnp.asarray(idxs), jnp.asarray(audio)))

    # reference host-side prep (avatars/ultralight_avatar.py:150-160)
    batch = []
    for i in idxs:
        crop = cycle[i]
        real = crop[4:164, 4:164].copy()
        masked = cv2.rectangle(real.copy(), (5, 5, 150, 145), (0, 0, 0), -1)
        x = np.concatenate([real.transpose(2, 0, 1), masked.transpose(2, 0, 1)]) / 255.0
        batch.append(x.astype(np.float32))
    with torch.no_grad():
        want = torch_model(torch.from_numpy(np.stack(batch)), torch.from_numpy(audio))
    want_u8 = np.clip(want.numpy().transpose(0, 2, 3, 1) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(got.astype(int) - want_u8.astype(int)).max() <= 1


def test_param_count_sanity():
    import jax

    params = ul.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    n = ul.count_params(params)
    assert 1e6 < n < 20e6  # lightweight by design


def test_grouped_infer_matches_per_avatar_steps():
    """make_grouped_infer_fn (stacked per-avatar weights + slot select +
    vmap over session blocks) produces exactly the frames each avatar's
    own make_infer_fn produces — the numerical basis for ultralight
    cross-session coalescing (VERDICT r4 item 5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from livetalking_tpu.models import ultralight as ul

    rng = np.random.default_rng(0)
    B, n_frames = 2, 3
    p_a = ul.init_params(jax.random.PRNGKey(1), jnp.float32)
    p_b = ul.init_params(jax.random.PRNGKey(2), jnp.float32)

    # two avatars' crop cycles packed back to back (AvatarStore layout)
    cyc_a = rng.integers(0, 255, (n_frames, 168, 168, 3)).astype(np.uint8)
    cyc_b = rng.integers(0, 255, (n_frames, 168, 168, 3)).astype(np.uint8)
    buffer = jnp.asarray(np.concatenate([cyc_a, cyc_b]))
    audio = rng.standard_normal((2 * B, 16, 32, 32)).astype(np.float32)

    idxs_a = np.arange(B, dtype=np.int32) % n_frames
    idxs_b = n_frames + (np.arange(B, dtype=np.int32) % n_frames)

    solo = ul.make_infer_fn(B, jnp.float32)
    want_a = np.asarray(solo(p_a, jnp.asarray(cyc_a), jnp.asarray(idxs_a),
                             jnp.asarray(audio[:B])))
    want_b = np.asarray(solo(p_b, jnp.asarray(cyc_b),
                             jnp.asarray(idxs_b - n_frames),
                             jnp.asarray(audio[B:])))

    stacked = ul.stack_params([p_a])
    stacked = ul.append_stacked(stacked, p_b)
    grouped = ul.make_grouped_infer_fn(2, B, jnp.float32)
    got = np.asarray(grouped(
        stacked, buffer, jnp.asarray(np.concatenate([idxs_a, idxs_b])),
        jnp.asarray(np.asarray([0, 1], np.int32)), jnp.asarray(audio)))

    # vmap changes fusion/accumulation order: allow 1 uint8 lsb
    assert np.abs(got[:B].astype(np.int32) - want_a.astype(np.int32)).max() <= 1
    assert np.abs(got[B:].astype(np.int32) - want_b.astype(np.int32)).max() <= 1
