"""S3FD detector (models/s3fd.py): torch-parity of the conv tower +
heads via the converter, vectorized anchor decode vs the reference's
per-location loop semantics, NMS, and the batch detector contract.

The torch recomposition mirrors the reference module exactly (reference
avatars/wav2lip/face_detection/detection/sfd/net_s3fd.py:22-130) so
``state_dict()`` produces the ``s3fd.pth`` key layout."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from livetalking_tpu.models import s3fd  # noqa: E402


class L2Norm(nn.Module):
    def __init__(self, c, scale):
        super().__init__()
        self.weight = nn.Parameter(torch.full((c,), float(scale)))

    def forward(self, x):
        n = x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
        return x / n * self.weight.view(1, -1, 1, 1)


class TorchS3FD(nn.Module):
    def __init__(self):
        super().__init__()
        for name, cout, k, s, p in s3fd._TOWER:
            cin = {"conv1_1": 3}.get(name, None)
            if cin is None:
                idx = [t[0] for t in s3fd._TOWER].index(name)
                cin = s3fd._TOWER[idx - 1][1]
            setattr(self, name, nn.Conv2d(cin, cout, k, s, p))
        self.conv3_3_norm = L2Norm(256, 10)
        self.conv4_3_norm = L2Norm(512, 8)
        self.conv5_3_norm = L2Norm(512, 5)
        src_ch = {"conv3_3": 256, "conv4_3": 512, "conv5_3": 512,
                  "fc7": 1024, "conv6_2": 512, "conv7_2": 256}
        for src, l2, conf in s3fd._HEADS:
            c = src_ch[src]
            prefix = f"{src}_norm" if l2 is not None else src
            setattr(self, f"{prefix}_mbox_conf", nn.Conv2d(c, conf, 3, 1, 1))
            setattr(self, f"{prefix}_mbox_loc", nn.Conv2d(c, 4, 3, 1, 1))

    def forward(self, x):
        h = x
        feats = {}
        for name, *_ in s3fd._TOWER:
            h = F.relu(getattr(self, name)(h))
            feats[name] = h
            if name in ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"):
                h = F.max_pool2d(h, 2, 2)
        outs = []
        for src, l2, conf in s3fd._HEADS:
            f = feats[src]
            prefix = src
            if l2 is not None:
                f = getattr(self, f"{src}_norm")(f)
                prefix = f"{src}_norm"
            cls = getattr(self, f"{prefix}_mbox_conf")(f)
            reg = getattr(self, f"{prefix}_mbox_loc")(f)
            if conf == 4:  # max-out background label
                chunk = torch.chunk(cls, 4, 1)
                bmax = torch.max(torch.max(chunk[0], chunk[1]), chunk[2])
                cls = torch.cat([bmax, chunk[3]], dim=1)
            outs.append((F.softmax(cls, dim=1), reg))
        return outs


def _init(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.Conv2d):
                fan = int(np.prod(mod.weight.shape[1:]))
                mod.weight.normal_(0.0, 0.5 / fan**0.5, generator=g)
                mod.bias.normal_(0.0, 0.02, generator=g)
    return m


def test_converter_and_tower_match_torch(rng):
    m = _init(TorchS3FD()).eval()
    params = s3fd.convert_torch_state_dict(dict(m.state_dict()))

    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32) * 30
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = s3fd.apply(params, jnp.asarray(x))
    assert len(got) == 6
    for i, ((cls_j, reg_j), (cls_t, reg_t)) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(cls_j), cls_t.numpy().transpose(0, 2, 3, 1),
            atol=1e-4, err_msg=f"cls scale {i}")
        np.testing.assert_allclose(
            np.asarray(reg_j), reg_t.numpy().transpose(0, 2, 3, 1),
            atol=1e-3, err_msg=f"reg scale {i}")


def test_decode_matches_reference_semantics(rng):
    """The vectorized on-device decode equals the reference's python
    per-location decode (detect.py:38-50 + bbox.py decode)."""
    h, w, stride = 4, 5, 8
    cls = rng.random((1, h, w, 2)).astype(np.float32)
    reg = rng.standard_normal((1, h, w, 4)).astype(np.float32) * 0.3
    got = np.asarray(s3fd._decode_scale(
        jnp.asarray(cls), jnp.asarray(reg), stride))[0]

    k = 0
    for hi in range(h):
        for wi in range(w):
            axc = stride / 2 + wi * stride
            ayc = stride / 2 + hi * stride
            aww = ahh = stride * 4
            dx, dy, dw, dh = reg[0, hi, wi]
            cx, cy = dx * 0.1 * aww + axc, dy * 0.1 * ahh + ayc
            ww, hh = aww * np.exp(dw * 0.2), ahh * np.exp(dh * 0.2)
            want = [cx - ww / 2, cy - hh / 2, cx + ww / 2, cy + hh / 2,
                    cls[0, hi, wi, 1]]
            np.testing.assert_allclose(got[k], want, rtol=1e-4, atol=1e-4)
            k += 1


def test_nms_suppresses_overlaps():
    boxes = np.array([
        [10, 10, 50, 50, 0.9],
        [12, 12, 52, 52, 0.8],   # heavy overlap with #0 -> suppressed
        [100, 100, 140, 140, 0.7],
    ], np.float32)
    keep = s3fd.nms(boxes, 0.3)
    assert list(keep) == [0, 2]


def test_detector_batch_contract(rng):
    """S3FDDetector pads to 128 multiples, returns per-frame (N,5) arrays
    with boxes clipped to the original frame."""
    params = s3fd.init_params(__import__("jax").random.PRNGKey(0))
    det = s3fd.S3FDDetector(params, score_thresh=0.0)
    frames = rng.integers(0, 255, (2, 96, 130, 3), np.uint8)
    out = det.detect_batch(frames)
    assert len(out) == 2
    for dets in out:
        assert dets.ndim == 2 and dets.shape[1] == 5
        if len(dets):
            assert (dets[:, 0] >= 0).all() and (dets[:, 2] <= 130).all()
            assert (dets[:, 1] >= 0).all() and (dets[:, 3] <= 96).all()


def test_detector_chunking_and_oom_fallback(rng):
    """Long-video path: frames are processed in max_batch chunks (tail
    zero-padded onto the same compiled program) and a device OOM halves
    the chunk size and retries — reference genavatar.py:98-104 recovery
    semantics (VERDICT r4 'missing' item 4)."""
    params = s3fd.init_params(__import__("jax").random.PRNGKey(0))
    det = s3fd.S3FDDetector(params, score_thresh=0.0, max_batch=4)
    frames = rng.integers(0, 255, (7, 96, 130, 3), np.uint8)

    calls = []
    real = det._detect_chunk

    def spy(block):
        calls.append(block.shape[0])
        return real(block)

    det._detect_chunk = spy
    out = det.detect_batch(frames)
    assert len(out) == 7
    assert calls == [4, 4]  # 4 + padded tail of 3 on the same program

    # chunk-vs-whole parity for the unpadded frames
    det2 = s3fd.S3FDDetector(params, score_thresh=0.0, max_batch=16)
    whole = det2.detect_batch(frames)
    for a, b in zip(out, whole):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)

    # OOM path: first call at chunk 4 raises RESOURCE_EXHAUSTED, the
    # retry at 2 succeeds
    det3 = s3fd.S3FDDetector(params, score_thresh=0.0, max_batch=4)
    state = {"raised": False}

    def oom_once(block):
        if block.shape[0] == 4 and not state["raised"]:
            state["raised"] = True
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory on TPU")
        return real(block)

    det3._detect_chunk = oom_once
    out3 = det3.detect_batch(frames[:5])
    assert len(out3) == 5 and state["raised"]
