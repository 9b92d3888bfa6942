"""S3FD face detector in functional JAX — the genavatar face-detection
backbone (parity with the reference's torch S3FD, reference
avatars/wav2lip/face_detection/detection/sfd/net_s3fd.py:22-130 and
sfd_detector.py:41-47; the reference downloads the same ``s3fd.pth``
checkpoint this module's converter loads).

TPU-native split: the VGG16-style conv tower + the per-scale anchor
decode are ONE jitted program (all anchors decoded vectorized on device —
the reference loops a python ``np.where`` per location,
detect.py:31-51); only thresholding + NMS run host-side on the compact
(N_anchors, 5) result. Images are padded (not resized) to a multiple of
128 so one compile serves a whole video.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

MEAN_BGR = (104.0, 117.0, 123.0)  # reference detect.py:20 image mean
VARIANCES = (0.1, 0.2)  # SSD box-encoding variances (detect.py:46)

# (name, out_ch, kernel, stride, pad) of the VGG tower in forward order;
# pools sit between the stages exactly as reference net_s3fd.py:71-105
_TOWER = [
    ("conv1_1", 64, 3, 1, 1), ("conv1_2", 64, 3, 1, 1),
    ("conv2_1", 128, 3, 1, 1), ("conv2_2", 128, 3, 1, 1),
    ("conv3_1", 256, 3, 1, 1), ("conv3_2", 256, 3, 1, 1), ("conv3_3", 256, 3, 1, 1),
    ("conv4_1", 512, 3, 1, 1), ("conv4_2", 512, 3, 1, 1), ("conv4_3", 512, 3, 1, 1),
    ("conv5_1", 512, 3, 1, 1), ("conv5_2", 512, 3, 1, 1), ("conv5_3", 512, 3, 1, 1),
    ("fc6", 1024, 3, 1, 3), ("fc7", 1024, 1, 1, 0),
    ("conv6_1", 256, 1, 1, 0), ("conv6_2", 512, 3, 2, 1),
    ("conv7_1", 128, 1, 1, 0), ("conv7_2", 256, 3, 2, 1),
]

# detection heads: (source feature, L2Norm scale or None, conf_ch)
_HEADS = [
    ("conv3_3", 10.0, 4),   # maxout background at stride 4
    ("conv4_3", 8.0, 2),
    ("conv5_3", 5.0, 2),
    ("fc7", None, 2),
    ("conv6_2", None, 2),
    ("conv7_2", None, 2),
]


def _conv(p: Params, x: jnp.ndarray, stride: int, pad: int) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _l2norm(p: Params, x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                         keepdims=True)) + eps
    return (x.astype(jnp.float32) / n * p["g"].astype(jnp.float32)).astype(x.dtype)


def apply(params: Params, x: jnp.ndarray) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """x (B, H, W, 3) BGR mean-subtracted. Returns per-scale
    (cls (B,h,w,2) softmaxed, reg (B,h,w,4)) — strides 4..128."""
    feats = {}
    h = x
    relu = jax.nn.relu
    for name, *_spec in _TOWER:
        _, _, stride, pad = _spec
        h = relu(_conv(params[name], h, stride, pad))
        feats[name] = h
        if name in ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"):
            h = _maxpool2(h)

    outs = []
    for src, l2scale, conf_ch in _HEADS:
        f = feats[src]
        if l2scale is not None:
            f = _l2norm(params[f"{src}_norm"], f)
        cls = _conv(params[f"{src}_norm_mbox_conf" if l2scale is not None
                           else f"{src}_mbox_conf"], f, 1, 1)
        reg = _conv(params[f"{src}_norm_mbox_loc" if l2scale is not None
                           else f"{src}_mbox_loc"], f, 1, 1)
        if conf_ch == 4:  # max-out background label (net_s3fd.py:125-128)
            bmax = jnp.max(cls[..., :3], axis=-1, keepdims=True)
            cls = jnp.concatenate([bmax, cls[..., 3:4]], axis=-1)
        cls = jax.nn.softmax(cls.astype(jnp.float32), axis=-1)
        outs.append((cls, reg.astype(jnp.float32)))
    return outs


def _decode_scale(cls, reg, stride: int):
    """Vectorized SSD decode for one scale: anchors are stride*4 squares
    centered at stride/2 + i*stride (reference detect.py:38-50,
    bbox.py decode). Returns (B, h*w, 5) [x1,y1,x2,y2,score]."""
    B, h, w, _ = cls.shape
    ax = stride / 2 + jnp.arange(w, dtype=jnp.float32) * stride
    ay = stride / 2 + jnp.arange(h, dtype=jnp.float32) * stride
    axc = jnp.broadcast_to(ax[None, :], (h, w))
    ayc = jnp.broadcast_to(ay[:, None], (h, w))
    aww = ahh = float(stride * 4)
    v0, v1 = VARIANCES
    cx = reg[..., 0] * v0 * aww + axc
    cy = reg[..., 1] * v0 * ahh + ayc
    ww = jnp.exp(reg[..., 2] * v1) * aww
    hh = jnp.exp(reg[..., 3] * v1) * ahh
    boxes = jnp.stack([cx - ww / 2, cy - hh / 2, cx + ww / 2, cy + hh / 2,
                       cls[..., 1]], axis=-1)
    return boxes.reshape(B, h * w, 5)


def make_detect_fn(params: Params):
    """Fused jitted detector: (B, H, W, 3) float32 BGR (raw pixels) ->
    (B, N_anchors, 5) decoded candidates. One device program per input
    shape; thresholding/NMS stay host-side on the compact output."""

    def fn(params, imgs):
        x = imgs - jnp.asarray(MEAN_BGR, jnp.float32)
        outs = apply(params, x)
        allb = [_decode_scale(cls, reg, 2 ** (i + 2))
                for i, (cls, reg) in enumerate(outs)]
        return jnp.concatenate(allb, axis=1)

    jfn = jax.jit(fn)
    return lambda imgs: jfn(params, imgs)


def nms(boxes: np.ndarray, thresh: float = 0.3) -> np.ndarray:
    """Plain numpy NMS (reference bbox.py nms semantics). boxes (N, 5)
    sorted internally by score desc; returns kept indices."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    x1, y1, x2, y2, s = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(s)[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-12)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


class S3FDDetector:
    """Batch face detector with the reference's serving contract
    (sfd_detector.py detect_from_batch): BGR uint8 frames in, per-frame
    [(x1, y1, x2, y2, score), ...] out. Pads to a 128 multiple so every
    same-size video reuses one compiled program."""

    def __init__(self, params: Params, score_thresh: float = 0.5,
                 nms_thresh: float = 0.3, max_batch: int = 16):
        self.params = params
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.max_batch = max_batch  # device-OOM halving floor is 1
        self._fn = make_detect_fn(params)  # jit caches per input shape

    def detect_batch(self, frames_bgr: np.ndarray) -> List[np.ndarray]:
        """Chunked batch detection for arbitrarily long videos: frames go
        to the device in ``max_batch`` chunks (the final partial chunk is
        zero-padded so one program per (chunk, H, W) shape serves the
        whole video), and a device OOM halves the chunk size and retries
        — the reference's recovery policy
        (reference avatars/wav2lip/genavatar.py:98-104), applied to the
        one-jitted-program TPU path."""
        from livetalking_tpu.utils.logger import logger

        out: List[np.ndarray] = []
        i, chunk = 0, max(1, min(self.max_batch, len(frames_bgr)))
        while i < len(frames_bgr):
            n = min(chunk, len(frames_bgr) - i)
            block = frames_bgr[i : i + n]
            if n < chunk:  # pad the tail: reuse the compiled program
                pad = np.zeros((chunk - n,) + tuple(block.shape[1:]),
                               block.dtype)
                block = np.concatenate([block, pad], axis=0)
            try:
                out.extend(self._detect_chunk(block)[:n])
                i += n
            except Exception as e:  # jaxlib raises backend-specific types
                msg = str(e)
                oom = ("RESOURCE_EXHAUSTED" in msg
                       or "out of memory" in msg.lower()
                       or "Out of memory" in msg)
                if not oom or chunk == 1:
                    raise
                chunk = max(1, chunk // 2)
                logger.warning(
                    "s3fd: device OOM at batch %d - retrying at %d",
                    chunk * 2, chunk)
        return out

    def _detect_chunk(self, frames_bgr: np.ndarray) -> List[np.ndarray]:
        B, H, W = frames_bgr.shape[:3]
        Hp = (H + 127) // 128 * 128
        Wp = (W + 127) // 128 * 128
        imgs = np.zeros((B, Hp, Wp, 3), np.float32)
        imgs[:, :H, :W] = frames_bgr.astype(np.float32)
        cand = np.asarray(self._fn(jnp.asarray(imgs)))
        out = []
        for b in range(B):
            c = cand[b]
            c = c[c[:, 4] > 0.05]  # reference anchor prefilter
            keep = nms(c, self.nms_thresh)
            c = c[keep]
            c = c[c[:, 4] > self.score_thresh]
            # clip the padding region away
            c[:, [0, 2]] = np.clip(c[:, [0, 2]], 0, W)
            c[:, [1, 3]] = np.clip(c[:, [1, 3]], 0, H)
            out.append(c)
        return out


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64))
    p: Params = {}
    cin = 3
    for name, cout, k, _s, _pad in _TOWER:
        w = jax.random.normal(next(keys), (k, k, cin, cout), jnp.float32)
        p[name] = {"w": (w * (0.2 / np.sqrt(k * k * cin))).astype(dtype),
                   "b": jnp.zeros((cout,), dtype)}
        cin = cout
    src_ch = {"conv3_3": 256, "conv4_3": 512, "conv5_3": 512,
              "fc7": 1024, "conv6_2": 512, "conv7_2": 256}
    for src, l2scale, conf_ch in _HEADS:
        c = src_ch[src]
        prefix = f"{src}_norm" if l2scale is not None else src
        if l2scale is not None:
            p[f"{src}_norm"] = {"g": jnp.full((c,), l2scale, dtype)}
        for head, co in ((f"{prefix}_mbox_conf", conf_ch),
                         (f"{prefix}_mbox_loc", 4)):
            w = jax.random.normal(next(keys), (3, 3, c, co), jnp.float32)
            p[head] = {"w": (w * (0.2 / np.sqrt(9 * c))).astype(dtype),
                       "b": jnp.zeros((co,), dtype)}
    return p


def convert_torch_state_dict(sd: Dict[str, Any], dtype=jnp.float32) -> Params:
    """``s3fd.pth`` layout: flat ``conv1_1.weight`` ... plus L2Norm scale
    vectors ``conv{3,4,5}_3_norm.weight`` (net_s3fd.py:22-68)."""
    from livetalking_tpu.models.layers import to_numpy as _np

    def conv(prefix):
        return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"])
                                 .transpose(2, 3, 1, 0).astype(np.float32), dtype),
                "b": jnp.asarray(_np(sd[f"{prefix}.bias"]).astype(np.float32), dtype)}

    p: Params = {name: conv(name) for name, *_ in _TOWER}
    for src, l2scale, _conf in _HEADS:
        if l2scale is not None:
            p[f"{src}_norm"] = {
                "g": jnp.asarray(_np(sd[f"{src}_norm.weight"])
                                 .astype(np.float32), dtype)}
            p[f"{src}_norm_mbox_conf"] = conv(f"{src}_norm_mbox_conf")
            p[f"{src}_norm_mbox_loc"] = conv(f"{src}_norm_mbox_loc")
        else:
            p[f"{src}_mbox_conf"] = conv(f"{src}_mbox_conf")
            p[f"{src}_mbox_loc"] = conv(f"{src}_mbox_loc")
    return p
