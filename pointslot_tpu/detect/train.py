"""YOLO training: anchor assignment + composite detection loss + train step.

The reference consumes pre-trained TorchScript/TensorRT engines and cannot
train anything. Here the detector is a Flax module, so the training loop is
first-class: a YOLOv5-style loss (CIoU box regression + BCE objectness with
IoU-aware targets + BCE classification, per-level balance) and an optax
train step — enough to fit the compact network on labeled data (e.g. the
synthetic box scenes) or fine-tune converted weights.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointslot_tpu.detect.yolo import ANCHORS, N_CLASSES, YOLOv5

STRIDES = (8, 16, 32)
LEVEL_BALANCE = (4.0, 1.0, 0.4)   # objectness weight per level (YOLOv5)


def build_targets(boxes: np.ndarray, classes: np.ndarray, n_boxes: int,
                  img_size: int):
    """Host-side anchor assignment.

    boxes: (B, M, 4) cxcywh in image px (zero rows beyond n_boxes[b]);
    classes: (B, M) int; n_boxes: (B,).
    Returns per level: (B, H, W, 3, 6) targets [tx, ty, tw, th, obj, class]
    with the YOLOv5 wh-ratio anchor match (ratio < 4).
    """
    B, M, _ = boxes.shape
    out = []
    for stride, lvl_anchors in zip(STRIDES, (ANCHORS[8], ANCHORS[16], ANCHORS[32])):
        gs = img_size // stride
        t = np.zeros((B, gs, gs, 3, 6), np.float32)
        for b in range(B):
            for m in range(int(n_boxes[b])):
                cx, cy, w, h = boxes[b, m]
                if w <= 2 or h <= 2:
                    continue
                gi = int(np.clip(cx / stride, 0, gs - 1))
                gj = int(np.clip(cy / stride, 0, gs - 1))
                for a, (aw, ah) in enumerate(lvl_anchors):
                    r = np.array([w / aw, h / ah])
                    if np.max(np.maximum(r, 1 / r)) < 4.0:
                        t[b, gj, gi, a] = [cx, cy, w, h, 1.0, classes[b, m]]
        out.append(t)
    return out


def detection_loss(heads, targets: Sequence[jnp.ndarray], n_classes: int = N_CLASSES,
                   box_gain: float = 0.5):
    """Composite YOLO loss from raw head tensors + assigned targets."""
    total_box = 0.0
    total_obj = 0.0
    total_cls = 0.0
    for head, tgt, stride, balance in zip(heads, targets, STRIDES, LEVEL_BALANCE):
        B, gh, gw, _ = head.shape
        p = head.reshape(B, gh, gw, 3, 5 + n_classes)
        ps = jax.nn.sigmoid(p)
        gy = jnp.arange(gh, dtype=jnp.float32)[None, :, None, None]
        gx = jnp.arange(gw, dtype=jnp.float32)[None, None, :, None]
        anchors = jnp.asarray(ANCHORS[stride], jnp.float32)
        pred_cx = (ps[..., 0] * 2 - 0.5 + gx) * stride
        pred_cy = (ps[..., 1] * 2 - 0.5 + gy) * stride
        pred_wh = (ps[..., 2:4] * 2) ** 2 * anchors[None, None, None]

        obj_mask = tgt[..., 4] > 0.5
        t_box = tgt[..., :4]

        # CIoU between predicted and target boxes (positive cells only)
        px0 = pred_cx - pred_wh[..., 0] / 2
        py0 = pred_cy - pred_wh[..., 1] / 2
        px1 = pred_cx + pred_wh[..., 0] / 2
        py1 = pred_cy + pred_wh[..., 1] / 2
        tx0 = t_box[..., 0] - t_box[..., 2] / 2
        ty0 = t_box[..., 1] - t_box[..., 3] / 2
        tx1 = t_box[..., 0] + t_box[..., 2] / 2
        ty1 = t_box[..., 1] + t_box[..., 3] / 2
        iw = jnp.clip(jnp.minimum(px1, tx1) - jnp.maximum(px0, tx0), 0)
        ih = jnp.clip(jnp.minimum(py1, ty1) - jnp.maximum(py0, ty0), 0)
        inter = iw * ih
        area_p = jnp.clip(px1 - px0, 0) * jnp.clip(py1 - py0, 0)
        area_t = jnp.clip(tx1 - tx0, 0) * jnp.clip(ty1 - ty0, 0)
        union = jnp.maximum(area_p + area_t - inter, 1e-9)
        iou = inter / union
        # center distance / enclosing diagonal (DIoU term)
        cw = jnp.maximum(px1, tx1) - jnp.minimum(px0, tx0)
        ch = jnp.maximum(py1, ty1) - jnp.minimum(py0, ty0)
        c2 = cw ** 2 + ch ** 2 + 1e-9
        rho2 = (pred_cx - t_box[..., 0]) ** 2 + (pred_cy - t_box[..., 1]) ** 2
        diou = iou - rho2 / c2
        box_loss = jnp.where(obj_mask, 1.0 - diou, 0.0)
        n_pos = jnp.maximum(jnp.sum(obj_mask), 1)
        total_box += jnp.sum(box_loss) / n_pos

        # objectness: IoU-aware target at positives, 0 elsewhere
        obj_target = jnp.where(obj_mask, jnp.clip(jax.lax.stop_gradient(iou), 0, 1), 0.0)
        obj_logit = p[..., 4]
        obj_bce = optax.sigmoid_binary_cross_entropy(obj_logit, obj_target)
        total_obj += balance * jnp.mean(obj_bce)

        # classification at positives
        cls_target = jax.nn.one_hot(tgt[..., 5].astype(jnp.int32), n_classes)
        cls_bce = optax.sigmoid_binary_cross_entropy(p[..., 5:], cls_target)
        total_cls += jnp.sum(jnp.where(obj_mask[..., None], cls_bce, 0.0)) / n_pos

    return box_gain * total_box + 1.0 * total_obj + 0.3 * total_cls, {
        "box": total_box, "obj": total_obj, "cls": total_cls,
    }


class YoloTrainer:
    def __init__(self, input_size: int = 320, width: int = 8, lr: float = 1e-3,
                 seed: int = 0):
        self.model = YOLOv5(width=width)
        self.input_size = input_size
        dummy = jnp.zeros((1, input_size, input_size, 3))
        self.variables = self.model.init(jax.random.PRNGKey(seed), dummy, train=True)
        self.tx = optax.adamw(lr, weight_decay=1e-4)
        params = self.variables["params"]
        self.opt_state = self.tx.init(params)
        self._step = jax.jit(self._step_impl)

    def _step_impl(self, variables, opt_state, images, targets):
        def loss_fn(params):
            heads, new_vars = self.model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, train=True, mutable=["batch_stats"],
            )
            loss, aux = detection_loss(heads, targets)
            return loss, (aux, new_vars)

        (loss, (aux, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(variables["params"])
        updates, opt_state = self.tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return (
            {"params": params, "batch_stats": new_vars["batch_stats"]},
            opt_state, loss, aux,
        )

    def step(self, images: np.ndarray, boxes: np.ndarray, classes: np.ndarray,
             n_boxes: np.ndarray):
        """One optimization step. images (B, S, S, 3) in [0, 1]."""
        targets = [jnp.asarray(t) for t in
                   build_targets(boxes, classes, n_boxes, self.input_size)]
        self.variables, self.opt_state, loss, aux = self._step(
            self.variables, self.opt_state, jnp.asarray(images, jnp.float32),
            targets,
        )
        return float(loss), {k: float(v) for k, v in aux.items()}
