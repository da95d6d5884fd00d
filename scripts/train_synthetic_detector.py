"""Train the compact YOLO on synthetic scenes and save weights.

Produces pointslot_tpu/detect/weights/synthetic_yolo_w8.npz — a detector
that finds the synthetic textured boxes, letting SLOT mode 3 run fully
online (network + DeepSORT + object pipeline) without an oracle.

Usage: python scripts/train_synthetic_detector.py [--steps 300]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def letterbox_boxes(boxes_xywh, r, pad):
    out = boxes_xywh.copy()
    out[:, 0] = boxes_xywh[:, 0] * r + pad[0]
    out[:, 1] = boxes_xywh[:, 1] * r + pad[1]
    out[:, 2:] = boxes_xywh[:, 2:] * r
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--out", default="pointslot_tpu/detect/weights/synthetic_yolo_w8.npz")
    args = ap.parse_args()

    from pointslot_tpu.datasets.synthetic import (
        SyntheticRenderer, make_scene, offline_detection_rows,
    )
    from pointslot_tpu.detect.train import YoloTrainer
    from pointslot_tpu.detect.yolo import letterbox

    # build a training set from several scenes
    frames = []
    for seed in range(201, 213):
        scene = make_scene(n_frames=8, n_objects=2, seed=seed, forward_speed=0.8)
        renderer = SyntheticRenderer(scene)
        rows = offline_detection_rows(scene)
        for i in range(scene.n_frames):
            left, _, _ = renderer.render(i)
            frame_rows = rows[(rows[:, 0] == i) & (rows[:, 1] >= 0)]
            if len(frame_rows) == 0:
                continue
            img3 = np.stack([left] * 3, axis=-1)
            boxed, r, pad = letterbox(img3, args.size)
            bb = frame_rows[:, 5:9].copy()
            bb[:, 0] += bb[:, 2] / 2   # xywh -> cxcywh
            bb[:, 1] += bb[:, 3] / 2
            bb = letterbox_boxes(bb, r, pad)
            frames.append((boxed / 255.0, bb))
    print(f"training frames: {len(frames)}")

    trainer = YoloTrainer(input_size=args.size, width=8, lr=2e-3)
    rng = np.random.default_rng(0)
    B = 4
    M = 8

    # stage the whole training set on device once (per-step uploads
    # serialize badly through the dev tunnel)
    import jax
    import jax.numpy as jnp
    from pointslot_tpu.detect.train import build_targets

    all_imgs = jax.device_put(
        np.stack([f[0] for f in frames]).astype(np.float32)
    )

    import jax.numpy as _jnp

    def flip_batch(imgs):
        return imgs[:, :, ::-1, :]

    flip_fn = jax.jit(flip_batch)

    for step in range(args.steps):
        sel = rng.choice(len(frames), B)
        imgs = all_imgs[jnp.asarray(sel)]
        boxes = np.zeros((B, M, 4), np.float32)
        classes = np.full((B, M), 2, np.int64)
        n_boxes = np.zeros(B, np.int64)
        for bi, s in enumerate(sel):
            bb = frames[s][1][:M]
            boxes[bi, : len(bb)] = bb
            n_boxes[bi] = len(bb)
        if rng.uniform() < 0.5:  # horizontal flip augmentation
            imgs = flip_fn(imgs)
            for bi in range(B):
                boxes[bi, : n_boxes[bi], 0] = args.size - boxes[bi, : n_boxes[bi], 0]
        targets = [jnp.asarray(t) for t in
                   build_targets(boxes, classes, n_boxes, args.size)]
        trainer.variables, trainer.opt_state, loss, aux = trainer._step(
            trainer.variables, trainer.opt_state, imgs, targets)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"box {float(aux['box']):.3f} obj {float(aux['obj']):.4f} "
                  f"cls {float(aux['cls']):.4f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    import flax

    flat = flax.traverse_util.flatten_dict(trainer.variables)
    np.savez(args.out, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
