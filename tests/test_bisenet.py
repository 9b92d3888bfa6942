"""BiSeNet face parser (models/bisenet.py): output contract, mask
semantics, and the genavatar parsed-mask path (random init — geometry
only; weight parity needs the published checkpoint)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livetalking_tpu.models import bisenet

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def params():
    return bisenet.init_params(jax.random.PRNGKey(0))


def test_logit_shape_and_classmap(params):
    x = jnp.asarray(RNG.standard_normal((1, 128, 128, 3)).astype(np.float32))
    logits = bisenet.apply(params, x)
    assert logits.shape == (1, 128, 128, bisenet.N_CLASSES)
    parse = bisenet.make_parse_fn(size=128)
    face = RNG.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
    cm = np.asarray(parse(params, jnp.asarray(face)))
    assert cm.shape == (1, 128, 128)
    assert cm.min() >= 0 and cm.max() < bisenet.N_CLASSES


def test_mouth_mask_semantics():
    cm = np.zeros((8, 8), np.int32)
    cm[2, 2] = 12   # upper lip
    cm[3, 3] = 11   # mouth interior
    cm[4, 4] = 1    # skin
    cm[5, 5] = 17   # hair - never in mask
    m = bisenet.mouth_mask(cm, mode="raw")
    assert m[2, 2] == 255 and m[3, 3] == 255
    assert m[4, 4] == 0 and m[5, 5] == 0
    mj = bisenet.mouth_mask(cm, mode="jaw")
    assert mj[4, 4] == 255  # jaw mode includes skin
    assert mj[5, 5] == 0


def test_parsed_mask_geometry(params, monkeypatch, tmp_path):
    """_parsed_mask places the parsed mouth mask inside the crop box and
    feathers it; outside the bbox the mask must be (near) zero."""
    from livetalking_tpu.genavatar import pipeline

    frame = RNG.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    box = (100, 80, 200, 180)
    crop_box = (90, 70, 210, 190)

    fn = bisenet.make_parse_fn(512)
    parse = lambda face: np.asarray(fn(params, jnp.asarray(face[None])))[0]
    mask = pipeline._parsed_mask(parse, frame, box, crop_box, blur=7)
    assert mask.shape == (120, 120, 3)
    assert mask.dtype == np.uint8
    # margin rows (outside bbox + feather reach) stay dark
    assert mask[:3].max() <= 32 and mask[-3:].max() <= 32


def test_converter_roundtrip_shapes():
    """convert_torch_state_dict consumes a synthetic checkpoint with the
    standard face-parsing naming and produces params that run."""
    torch = pytest.importorskip("torch")

    sd = {}

    def conv_bn(prefix, cin, cout, k, bn_prefix=None):
        sd[prefix + ".weight"] = torch.randn(cout, cin, k, k)
        bp = bn_prefix or prefix.rsplit(".", 1)[0] + ".bn"
        for suffix, shape in (("weight", cout), ("bias", cout),
                              ("running_mean", cout), ("running_var", cout)):
            sd[f"{bp}.{suffix}"] = (torch.rand(shape) + 0.5 if "var" in suffix
                                    else torch.randn(shape))

    rn = "cp.resnet"
    conv_bn(f"{rn}.conv1", 3, 64, 7, f"{rn}.bn1")
    chans = [(64, 64, False), (64, 128, True), (128, 256, True), (256, 512, True)]
    for li, (cin, cout, down) in enumerate(chans, start=1):
        for bi in range(2):
            pref = f"{rn}.layer{li}.{bi}"
            conv_bn(f"{pref}.conv1", cin if bi == 0 else cout, cout, 3, f"{pref}.bn1")
            conv_bn(f"{pref}.conv2", cout, cout, 3, f"{pref}.bn2")
            if bi == 0 and down:
                conv_bn(f"{pref}.downsample.0", cin, cout, 1, f"{pref}.downsample.1")
    conv_bn("cp.arm16.conv.conv", 256, 128, 3, "cp.arm16.conv.bn")
    sd["cp.arm16.conv_atten.weight"] = torch.randn(128, 128, 1, 1)
    conv_bn("cp.arm16.conv_atten", 128, 128, 1, "cp.arm16.bn_atten")
    conv_bn("cp.arm32.conv.conv", 512, 128, 3, "cp.arm32.conv.bn")
    conv_bn("cp.arm32.conv_atten", 128, 128, 1, "cp.arm32.bn_atten")
    conv_bn("cp.conv_avg.conv", 512, 128, 1, "cp.conv_avg.bn")
    conv_bn("cp.conv_head32.conv", 128, 128, 3, "cp.conv_head32.bn")
    conv_bn("cp.conv_head16.conv", 128, 128, 3, "cp.conv_head16.bn")
    conv_bn("ffm.convblk.conv", 256, 256, 1, "ffm.convblk.bn")
    sd["ffm.conv1.weight"] = torch.randn(64, 256, 1, 1)
    sd["ffm.conv1.bias"] = torch.randn(64)
    sd["ffm.conv2.weight"] = torch.randn(256, 64, 1, 1)
    sd["ffm.conv2.bias"] = torch.randn(256)
    conv_bn("conv_out.conv.conv", 256, 256, 3, "conv_out.conv.bn")
    sd["conv_out.conv_out.weight"] = torch.randn(19, 256, 1, 1)
    sd["conv_out.conv_out.bias"] = torch.randn(19)

    params = bisenet.convert_torch_state_dict(sd)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    logits = bisenet.apply(params, x)
    assert logits.shape == (1, 64, 64, 19)
    assert np.isfinite(np.asarray(logits)).all()
