"""PFLD-GhostOne (models/pfld.py): the converter must fold the
train-time MobileOne branches (N conv+BN branches + 1x1 scale + skip BN)
into plain convs that reproduce the torch eval forward exactly
(reference avatars/ultralight/face_detect_utils/base_module.py:193-298,
pfld_mobileone.py:12-134)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from livetalking_tpu.models import pfld  # noqa: E402

NB = pfld.N_BRANCHES


def conv_block(cin, cout, k, s, p, group=1, has_bn=True, is_linear=False):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, p, groups=group, bias=False),
        nn.BatchNorm2d(cout) if has_bn else nn.Sequential(),
        nn.ReLU(inplace=True) if not is_linear else nn.Sequential())


class _ConvBN(nn.Module):
    """Named conv+bn children — the reference's ``_conv_bn`` key layout
    (``...conv.weight`` / ``...bn.*``, reference base_module.py:402-419),
    NOT an indexed Sequential (a mismatch the r3 weight validator caught:
    the converter saw zero branches against the real module)."""

    def __init__(self, cin, cout, k, s, p, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, p, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class MobileOneBlock(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, groups=1,
                 is_linear=False):
        super().__init__()
        self.groups, self.stride, self.padding = groups, stride, padding
        self.activation = nn.Identity() if is_linear else nn.ReLU()
        self.rbr_skip = (nn.BatchNorm2d(cin)
                         if cout == cin and stride == 1 else None)
        self.rbr_conv = nn.ModuleList([
            _ConvBN(cin, cout, k, stride, padding, groups=groups)
            for _ in range(NB)])
        self.rbr_scale = None
        if k > 1:
            self.rbr_scale = _ConvBN(cin, cout, 1, stride, 0, groups=groups)

    def forward(self, x):
        out = 0 if self.rbr_skip is None else self.rbr_skip(x)
        if self.rbr_scale is not None:
            out = out + self.rbr_scale(x)
        for branch in self.rbr_conv:
            out = out + branch(x)
        return self.activation(out)


class GhostOneModule(nn.Module):
    def __init__(self, cin, cout, is_linear=False):
        super().__init__()
        half = math.ceil(cout / 2)
        self.primary_conv = MobileOneBlock(cin, half, 1, is_linear=is_linear)
        self.cheap_operation = MobileOneBlock(half, half, 3, padding=1,
                                              groups=half, is_linear=is_linear)

    def forward(self, x):
        x1 = self.primary_conv(x)
        return torch.cat([x1, self.cheap_operation(x1)], dim=1)


class GhostOneBottleneck(nn.Module):
    def __init__(self, cin, hid, cout, stride):
        super().__init__()
        hh = math.ceil(hid / 2)
        self.ghost_conv = nn.Sequential(
            GhostOneModule(cin, hid),
            MobileOneBlock(2 * hh, 2 * hh, 3, stride, 1, groups=2 * hh,
                           is_linear=True) if stride == 2 else nn.Sequential(),
            GhostOneModule(2 * hh, cout, is_linear=True))

    def forward(self, x):
        return self.ghost_conv(x)


class TorchPFLD(nn.Module):
    def __init__(self):
        super().__init__()
        c = pfld._c
        self.conv1 = MobileOneBlock(3, c(64), 3, 2, 1)
        self.conv2 = MobileOneBlock(c(64), c(64), 3, 1, 1, groups=c(64))
        for name, cin, hid, cout, stride in pfld._GHOSTS:
            setattr(self, name, GhostOneBottleneck(cin, hid, cout, stride))
        self.conv7 = MobileOneBlock(c(16), c(32), 3, 1, 1)
        self.conv8 = conv_block(c(32), c(128), pfld.INPUT_SIZE // 16, 1, 0,
                                has_bn=False)
        self.conv_out = nn.Conv2d(c(512), 2 * pfld.N_LANDMARKS, 1)

    def forward(self, x):
        x = self.conv2(self.conv1(x))
        x1 = F.avg_pool2d(x, x.shape[-1])
        for name, *_ in pfld._GHOSTS[:3]:
            x = getattr(self, name)(x)
        x2 = F.avg_pool2d(x, x.shape[-1])
        for name, *_ in pfld._GHOSTS[3:6]:
            x = getattr(self, name)(x)
        x3 = F.avg_pool2d(x, x.shape[-1])
        for name, *_ in pfld._GHOSTS[6:10]:
            x = getattr(self, name)(x)
        x4 = F.avg_pool2d(x, x.shape[-1])
        x = self.conv6(x)
        x = self.conv7(x)
        x5 = self.conv8(x)
        ms = torch.cat([x1, x2, x3, x4, x5], dim=1)
        return self.conv_out(ms).reshape(x.shape[0], -1)


def _randomize(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.Conv2d):
                fan = int(np.prod(mod.weight.shape[1:]))
                mod.weight.normal_(0.0, 0.6 / fan**0.5, generator=g)
                if mod.bias is not None:
                    mod.bias.normal_(0.0, 0.05, generator=g)
            elif isinstance(mod, nn.BatchNorm2d):
                mod.weight.normal_(1.0, 0.1, generator=g)
                mod.bias.normal_(0.0, 0.1, generator=g)
                mod.running_mean.normal_(0.0, 0.2, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
    return m


def test_mobileone_fold_matches_eval_forward(rng):
    """Single block: folded conv == multi-branch eval forward, incl. the
    skip-BN and 1x1-scale branches."""
    m = _randomize(MobileOneBlock(8, 8, 3, 1, 1, groups=1)).eval()
    sd = {"blk." + k: v for k, v in m.state_dict().items()}
    p = pfld._fold_mobileone(sd, "blk", 8, 8, 3, 1, jnp.float32)
    x = rng.standard_normal((2, 10, 10, 8)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(pfld._conv(p, jnp.asarray(x), padding=1, relu=True))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_full_pfld_converter_matches_torch(rng):
    m = _randomize(TorchPFLD(), seed=1).eval()
    sd = {"pfld_backbone": dict(m.state_dict())}
    params = pfld.convert_torch_state_dict(sd)

    x = rng.random((1, 192, 192, 3)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(pfld.apply(params, jnp.asarray(x)))
    assert got.shape == (1, 220)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_landmarker_maps_to_frame_coords(rng):
    params = pfld.init_params(jax.random.PRNGKey(0))
    mean = np.tile(np.asarray([0.5, 0.5], np.float32), pfld.N_LANDMARKS)
    lk = pfld.PFLDLandmarker(params, mean)
    frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
    lm = lk.landmarks(frame, (100, 60, 220, 180))
    assert lm.shape == (pfld.N_LANDMARKS, 2)
    # offsets are tiny at random init: landmarks sit near the crop center
    assert np.abs(lm[:, 0] - 160).max() < 120
    assert np.abs(lm[:, 1] - 120).max() < 120
