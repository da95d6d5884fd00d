"""YOLOv5-style one-stage detector in Flax, with jitted decode + NMS.

Replaces the reference's TorchScript YOLOv5 runtime (reference
src/YOLOdetector.cc: libtorch module load :13, fp16 CUDA :21-24, letterbox
:51/:106, forward :81, NMS to Detection{bbox, score, class}; classes
car(2)/truck(7) kept at src/Frame.cc:2557).

TPU design: the network is an anchor-based CSP backbone + PAN neck + three
stride-8/16/32 heads built from Conv-BN-SiLU blocks — bfloat16-friendly
convs that map straight onto the MXU. Decode and class-aware NMS run inside
the same jit with static shapes (top-K candidates, fixed iteration
suppression). Weights initialize randomly; `load_npz` ingests converted
checkpoints when available — the architecture, pre/post-processing and the
mode-3 pipeline contract are the deliverable here.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# COCO anchor priors per stride (w, h), YOLOv5s layout
ANCHORS = {
    8: ((10, 13), (16, 30), (33, 23)),
    16: ((30, 61), (62, 45), (59, 119)),
    32: ((116, 90), (156, 198), (373, 326)),
}
N_CLASSES = 80


class ConvBnSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    # torch-aligned symmetric padding (p = k//2). XLA "SAME" differs from
    # torch for stride-2 3x3 convs ((0,1) vs (1,1)); converted ultralytics
    # checkpoints require torch semantics (see detect/convert.py).
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.torch_pad and self.stride > 1:
            # odd k: p = k//2 (ultralytics autopad); even k: the yolov5
            # stem passes p=2 for its 6x6 explicitly (= k//2 - 1), which
            # also equals what XLA SAME computes for that shape
            p = self.kernel // 2 if self.kernel % 2 else self.kernel // 2 - 1
            padding = ((p, p), (p, p))
        else:
            padding = "SAME"
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), use_bias=False,
                    padding=padding)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3 if self.torch_pad else 1e-5)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnSiLU(self.features, 1, torch_pad=self.torch_pad)(x, train)
        y = ConvBnSiLU(self.features, 3, torch_pad=self.torch_pad)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C3(nn.Module):
    """CSP bottleneck block with 3 convolutions (YOLOv5's C3)."""

    features: int
    n: int = 1
    shortcut: bool = True
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.features // 2
        a = ConvBnSiLU(h, 1, torch_pad=self.torch_pad)(x, train)
        for _ in range(self.n):
            a = Bottleneck(h, self.shortcut, torch_pad=self.torch_pad)(a, train)
        b = ConvBnSiLU(h, 1, torch_pad=self.torch_pad)(x, train)
        return ConvBnSiLU(self.features, 1, torch_pad=self.torch_pad)(
            jnp.concatenate([a, b], -1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast) — three chained 5x5 maxpools."""

    features: int
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.features // 2
        x = ConvBnSiLU(h, 1, torch_pad=self.torch_pad)(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBnSiLU(self.features, 1, torch_pad=self.torch_pad)(
            jnp.concatenate([x, p1, p2, p3], -1), train)


class YOLOv5(nn.Module):
    """Compact CSP backbone + PAN neck + 3 anchor heads (width 0.25-ish)."""

    width: int = 16     # base channel count (YOLOv5s uses 32 at width 0.5)
    depth: int = 1
    n_classes: int = N_CLASSES
    torch_pad: bool = False   # see ConvBnSiLU; True for converted weights

    @nn.compact
    def __call__(self, x, train: bool = False):
        w, d, tp = self.width, self.depth, self.torch_pad
        no = 3 * (5 + self.n_classes)
        # backbone
        x = ConvBnSiLU(w, 6, 2, torch_pad=tp)(x, train)            # /2
        x = ConvBnSiLU(w * 2, 3, 2, torch_pad=tp)(x, train)        # /4
        x = C3(w * 2, d, torch_pad=tp)(x, train)
        x = ConvBnSiLU(w * 4, 3, 2, torch_pad=tp)(x, train)        # /8
        p3 = C3(w * 4, d * 2, torch_pad=tp)(x, train)
        x = ConvBnSiLU(w * 8, 3, 2, torch_pad=tp)(p3, train)       # /16
        p4 = C3(w * 8, d * 3, torch_pad=tp)(x, train)
        x = ConvBnSiLU(w * 16, 3, 2, torch_pad=tp)(p4, train)      # /32
        x = C3(w * 16, d, torch_pad=tp)(x, train)
        p5 = SPPF(w * 16, torch_pad=tp)(x, train)
        # PAN neck
        u5 = ConvBnSiLU(w * 8, 1, torch_pad=tp)(p5, train)
        up4 = jax.image.resize(u5, (u5.shape[0], u5.shape[1] * 2, u5.shape[2] * 2,
                                    u5.shape[3]), "nearest")
        n4 = C3(w * 8, d, shortcut=False, torch_pad=tp)(
            jnp.concatenate([up4, p4], -1), train)
        u4 = ConvBnSiLU(w * 4, 1, torch_pad=tp)(n4, train)
        up3 = jax.image.resize(u4, (u4.shape[0], u4.shape[1] * 2, u4.shape[2] * 2,
                                    u4.shape[3]), "nearest")
        n3 = C3(w * 4, d, shortcut=False, torch_pad=tp)(
            jnp.concatenate([up3, p3], -1), train)
        d3 = ConvBnSiLU(w * 4, 3, 2, torch_pad=tp)(n3, train)
        n4b = C3(w * 8, d, shortcut=False, torch_pad=tp)(
            jnp.concatenate([d3, u4], -1), train)
        d4 = ConvBnSiLU(w * 8, 3, 2, torch_pad=tp)(n4b, train)
        n5 = C3(w * 16, d, shortcut=False, torch_pad=tp)(
            jnp.concatenate([d4, u5], -1), train)
        # heads
        h3 = nn.Conv(no, (1, 1))(n3)
        h4 = nn.Conv(no, (1, 1))(n4b)
        h5 = nn.Conv(no, (1, 1))(n5)
        return h3, h4, h5


def decode_predictions(heads, img_size: int, n_classes: int = N_CLASSES):
    """Raw head tensors -> (N, 4+1+C) [xywh(image px), obj, class scores]."""
    outs = []
    for head, stride in zip(heads, (8, 16, 32)):
        b, hy, hx, _ = head.shape
        p = head.reshape(b, hy, hx, 3, 5 + n_classes)
        p = jax.nn.sigmoid(p)
        gy = jnp.arange(hy, dtype=jnp.float32)[:, None]
        gx = jnp.arange(hx, dtype=jnp.float32)[None, :]
        anchors = jnp.asarray(ANCHORS[stride], jnp.float32)  # (3, 2)
        cx = (p[..., 0] * 2 - 0.5 + gx[None, :, :, None]) * stride
        cy = (p[..., 1] * 2 - 0.5 + gy[None, :, :, None]) * stride
        wh = (p[..., 2:4] * 2) ** 2 * anchors[None, None, None, :, :]
        box = jnp.stack([cx, cy, wh[..., 0], wh[..., 1]], -1)
        out = jnp.concatenate([box, p[..., 4:5], p[..., 5:]], -1)
        outs.append(out.reshape(b, -1, 5 + n_classes))
    return jnp.concatenate(outs, axis=1)


@partial(jax.jit, static_argnames=("max_out", "max_candidates"))
def nms(pred: jnp.ndarray, conf_threshold: float = 0.4, iou_threshold: float = 0.5,
        max_out: int = 64, max_candidates: int = 512):
    """Class-aware NMS with static shapes.

    pred: (N, 5+C). Returns (boxes (max_out, 4) cxcywh, scores (max_out,),
    classes (max_out,), valid (max_out,)).
    """
    scores_all = pred[:, 4:5] * pred[:, 5:]
    cls = jnp.argmax(scores_all, axis=1)
    score = jnp.max(scores_all, axis=1)
    ok = score >= conf_threshold
    score = jnp.where(ok, score, 0.0)
    k = min(max_candidates, pred.shape[0])
    top_score, idx = jax.lax.top_k(score, k)
    boxes = pred[idx, :4]
    classes = cls[idx]

    x0 = boxes[:, 0] - boxes[:, 2] / 2
    y0 = boxes[:, 1] - boxes[:, 3] / 2
    x1 = boxes[:, 0] + boxes[:, 2] / 2
    y1 = boxes[:, 1] + boxes[:, 3] / 2
    area = boxes[:, 2] * boxes[:, 3]
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = jnp.clip(ix1 - ix0, 0) * jnp.clip(iy1 - iy0, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)
    same_class = classes[:, None] == classes[None, :]
    # greedy suppression in score order (top_k already sorted): candidate i
    # survives if no higher-scoring same-class survivor overlaps it
    suppress = (iou > iou_threshold) & same_class & (
        jnp.arange(k)[:, None] < jnp.arange(k)[None, :]
    )

    def body(i, keep):
        row = suppress[:, i] & keep
        return keep.at[i].set(~jnp.any(row) & (top_score[i] > 0))

    keep = jax.lax.fori_loop(0, k, body, jnp.ones(k, bool))
    keep_score = jnp.where(keep, top_score, -1.0)
    final_score, fidx = jax.lax.top_k(keep_score, max_out)
    return (
        boxes[fidx],
        jnp.maximum(final_score, 0.0),
        classes[fidx],
        final_score > 0,
    )


def letterbox(img: np.ndarray, size: int = 640) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Resize keeping aspect, pad to (size, size) with 114-gray
    (reference src/YOLOdetector.cc:51)."""
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    resized = np.asarray(
        jax.image.resize(jnp.asarray(img, jnp.float32), (nh, nw) + img.shape[2:],
                         "bilinear")
    )
    out = np.full((size, size) + img.shape[2:], 114.0, np.float32)
    top = (size - nh) // 2
    left = (size - nw) // 2
    out[top : top + nh, left : left + nw] = resized
    return out, r, (left, top)


class Detector:
    """End-to-end detector: letterbox -> network -> decode -> NMS -> image
    coords, keeping the configured classes (reference Detector::Run)."""

    def __init__(self, input_size: int = 640, conf: float = 0.4, iou: float = 0.5,
                 keep_classes: Sequence[int] = (2, 7), seed: int = 0,
                 params: Optional[Any] = None, width: int = 16,
                 torch_pad: bool = False):
        self.model = YOLOv5(width=width, torch_pad=torch_pad)
        self.input_size = input_size
        self.conf, self.iou = conf, iou
        self.keep_classes = tuple(keep_classes)
        if params is None:
            dummy = jnp.zeros((1, input_size, input_size, 3))
            variables = self.model.init(jax.random.PRNGKey(seed), dummy)
            self.variables = variables
        else:
            self.variables = params
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, x):
        heads = self.model.apply(self.variables, x)
        pred = decode_predictions(heads, self.input_size)[0]
        return nms(pred, self.conf, self.iou)

    @classmethod
    def from_ultralytics(cls, path_or_state_dict, input_size: int = 640,
                         conf: float = 0.4, iou: float = 0.5,
                         keep_classes: Sequence[int] = (2, 7)) -> "Detector":
        """Build a yolov5s-geometry detector from a public ultralytics
        checkpoint (.pt path or a state_dict mapping) via
        detect/convert.py. The reference's equivalent is loading the
        TorchScript export (src/YOLOdetector.cc:13)."""
        from pointslot_tpu.detect import convert

        if isinstance(path_or_state_dict, (str, bytes)):
            variables = convert.load_yolov5_pt(path_or_state_dict)
        else:
            variables = convert.convert_yolov5_state_dict(path_or_state_dict)
        return cls(input_size=input_size, conf=conf, iou=iou,
                   keep_classes=keep_classes, params=variables, width=32,
                   torch_pad=True)

    def load_npz(self, path: str):
        """Load converted weights (flat dict of arrays matching the param
        tree as saved by save_npz)."""
        import flax

        flat = dict(np.load(path))
        tree = flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()}
        )
        self.variables = tree
        self._forward = jax.jit(self._forward_impl)

    def save_npz(self, path: str):
        import flax

        flat = flax.traverse_util.flatten_dict(self.variables)
        np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})

    def run(self, img: np.ndarray):
        """img: (H, W) gray or (H, W, 3) uint8. Returns list of
        {bbox (x,y,w,h) in image coords, score, class_id}."""
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        boxed, r, (left, top) = letterbox(img, self.input_size)
        x = jnp.asarray(boxed[None] / 255.0, jnp.float32)
        # one device->host transfer (field-by-field np.asarray is a sync
        # roundtrip each)
        boxes, scores, classes, valid = jax.device_get(self._forward(x))
        out = []
        for b, s, c, v in zip(boxes, scores, classes, valid):
            if not v or int(c) not in self.keep_classes:
                continue
            cx, cy, w, h = b
            out.append({
                "bbox": np.array([(cx - w / 2 - left) / r, (cy - h / 2 - top) / r,
                                  w / r, h / r]),
                "score": float(s),
                "class_id": int(c),
            })
        return out
