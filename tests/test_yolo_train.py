"""YOLO training loop: anchor assignment + loss decreases on a tiny batch."""

import numpy as np

from pointslot_tpu.detect.train import YoloTrainer, build_targets


def make_batch(rng, size=320, batch=2):
    imgs = rng.uniform(0.1, 0.3, size=(batch, size, size, 3)).astype(np.float32)
    boxes = np.zeros((batch, 4, 4), np.float32)
    classes = np.full((batch, 4), 2, np.int64)
    n_boxes = np.zeros(batch, np.int64)
    for b in range(batch):
        n = 2
        n_boxes[b] = n
        for m in range(n):
            w, h = rng.uniform(40, 120), rng.uniform(30, 90)
            cx = rng.uniform(w / 2 + 4, size - w / 2 - 4)
            cy = rng.uniform(h / 2 + 4, size - h / 2 - 4)
            boxes[b, m] = [cx, cy, w, h]
            x0, y0 = int(cx - w / 2), int(cy - h / 2)
            imgs[b, y0 : int(cy + h / 2), x0 : int(cx + w / 2)] = rng.uniform(
                0.6, 0.9
            )
    return imgs, boxes, classes, n_boxes


def test_build_targets_assigns_anchors(rng):
    imgs, boxes, classes, n_boxes = make_batch(rng)
    targets = build_targets(boxes, classes, n_boxes, 320)
    total_pos = sum(int((t[..., 4] > 0.5).sum()) for t in targets)
    assert total_pos >= 4, "no anchors assigned"
    # assigned cells carry the box center
    for t, stride in zip(targets, (8, 16, 32)):
        pos = np.nonzero(t[..., 4] > 0.5)
        for b, gj, gi, a in zip(*pos):
            cx, cy = t[b, gj, gi, a, 0], t[b, gj, gi, a, 1]
            assert abs(cx / stride - gi) < 1.5
            assert abs(cy / stride - gj) < 1.5


def test_training_reduces_loss(rng):
    trainer = YoloTrainer(input_size=320, width=8, lr=2e-3)
    imgs, boxes, classes, n_boxes = make_batch(rng)
    losses = []
    for _ in range(12):
        loss, aux = trainer.step(imgs, boxes, classes, n_boxes)
        losses.append(loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, f"loss did not decrease: {losses}"
