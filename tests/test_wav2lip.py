"""Numeric parity of the JAX Wav2Lip against a torch oracle.

The oracle is an independent torch implementation assembled from the same
architecture tables (spec: reference avatars/wav2lip/models/wav2lip_v2.py),
with randomized BatchNorm running stats so the BN-folding conversion path
is genuinely exercised. state_dict key layout matches the reference
checkpoint format so ``convert_torch_state_dict`` is tested against real
key names (including the ``module.`` prefix variant).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from livetalking_tpu.models import wav2lip as w2l  # noqa: E402
from livetalking_tpu.models.layers import ConvSpec  # noqa: E402


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class _Layer(nn.Module):
    """conv/tconv + optional BN, residual add, activation — torch oracle."""

    def __init__(self, s: ConvSpec):
        super().__init__()
        if s.transpose:
            conv = nn.ConvTranspose2d(s.cin, s.cout, _pair(s.kernel), _pair(s.stride),
                                      _pair(s.padding), _pair(s.output_padding))
        else:
            conv = nn.Conv2d(s.cin, s.cout, _pair(s.kernel), _pair(s.stride), _pair(s.padding))
        if s.bn:
            self.conv_block = nn.Sequential(conv, nn.BatchNorm2d(s.cout))
        else:
            self.plain = conv
        self.s = s

    def forward(self, x):
        y = self.conv_block(x) if self.s.bn else self.plain(x)
        if self.s.residual:
            y = y + x
        if self.s.act == "relu":
            y = torch.relu(y)
        elif self.s.act == "sigmoid":
            y = torch.sigmoid(y)
        return y


class _TorchWav2Lip(nn.Module):
    def __init__(self):
        super().__init__()
        self.face_encoder_blocks = nn.ModuleList(
            [nn.Sequential(*[_Layer(s) for s in blk]) for blk in w2l.FACE_ENCODER])
        self.audio_encoder = nn.Sequential(*[_Layer(s) for s in w2l.AUDIO_ENCODER])
        self.face_decoder_blocks = nn.ModuleList(
            [nn.Sequential(*[_Layer(s) for s in blk]) for blk in w2l.FACE_DECODER])
        self.output_block = nn.Sequential(
            _Layer(w2l.OUTPUT_BLOCK[0]), _Layer(w2l.OUTPUT_BLOCK[1]))

    def forward(self, mel, face):
        feats = []
        x = face
        for f in self.face_encoder_blocks:
            x = f(x)
            feats.append(x)
        x = self.audio_encoder(mel)
        for f in self.face_decoder_blocks:
            x = f(x)
            x = torch.cat((x, feats.pop()), dim=1)
        return self.output_block(x)


def _flatten_output_block_keys(sd):
    """Reference ckpt names the final plain conv output_block.1.weight;
    the oracle's _Layer wraps it as output_block.1.plain.weight — rename."""
    out = {}
    for k, v in sd.items():
        out[k.replace(".plain.", ".")] = v
    return out


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = _TorchWav2Lip()
    # randomize BN stats so folding is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0, 0.2)
    return m.eval()


def test_forward_parity_with_torch(torch_model):
    sd = _flatten_output_block_keys(torch_model.state_dict())
    # exercise the module.-prefix strip path too
    sd = {f"module.{k}": v for k, v in sd.items()}
    params = w2l.convert_torch_state_dict(sd, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    B = 2
    mel = rng.standard_normal((B, 80, 16)).astype(np.float32)
    face = rng.random((B, 256, 256, 6)).astype(np.float32)

    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(mel[:, None]),  # (B, 1, 80, 16)
            torch.from_numpy(face.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(w2l.apply(params, jnp.asarray(mel[..., None]), jnp.asarray(face)))
    assert got.shape == want.shape == (B, 256, 256, 3)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_infer_fn_end_to_end(torch_model):
    """Fused step: gather + mask + forward + uint8, vs the torch oracle fed
    the reference's host-side batch prep (avatars/wav2lip_avatar.py:116-139)."""
    sd = _flatten_output_block_keys(torch_model.state_dict())
    params = w2l.convert_torch_state_dict(sd, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    N, S, B = 5, 256, 4
    cycle = rng.integers(0, 256, (N, S, S, 3), dtype=np.uint8)
    idxs = np.array([0, 2, 4, 1], np.int32)
    mel = rng.standard_normal((B, 80, 16)).astype(np.float32)

    step = w2l.make_infer_fn(B, S, dtype=jnp.float32)
    got = np.asarray(step(params, jnp.asarray(cycle), jnp.asarray(idxs), jnp.asarray(mel)))

    faces = cycle[idxs].astype(np.float32)
    masked = faces.copy()
    masked[:, S // 2:] = 0
    x = np.concatenate([masked, faces], axis=3) / 255.0
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(mel[:, None]),
            torch.from_numpy(x.transpose(0, 3, 1, 2)).float(),
        ).numpy().transpose(0, 2, 3, 1)
    want_u8 = np.clip(want * 255.0 + 0.5, 0, 255).astype(np.uint8)

    assert got.dtype == np.uint8 and got.shape == (B, S, S, 3)
    # uint8 after a sigmoid: allow off-by-one from rounding
    assert np.abs(got.astype(int) - want_u8.astype(int)).max() <= 1


def test_init_params_shapes():
    params = w2l.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    n = w2l.count_params(params)
    # this architecture table folds to ~53.6M params
    assert 45e6 < n < 60e6
    out = w2l.apply(
        params,
        jnp.zeros((1, 80, 16, 1), jnp.float32),
        jnp.zeros((1, 256, 256, 6), jnp.float32),
    )
    assert out.shape == (1, 256, 256, 3)
    assert bool(jnp.all((out >= 0) & (out <= 1)))
