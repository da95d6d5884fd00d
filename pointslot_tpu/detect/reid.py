"""ReID appearance-embedding network (Flax) for DeepSORT.

Replaces the reference's TensorRT engine (reference
deepsort/src/featuretensor.cpp: loadEngine/doInference producing per-crop
appearance features; engine built from ONNX by deepsortenginegenerator.cpp).

A small conv net embedding 64x128 crops to a normalized feature vector;
crops are gathered and resized on-device and embedded in ONE batched
forward pass (the reference batches at 128, deepsort instantiation
src/Tracking.cc:218).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CROP_H, CROP_W = 128, 64


class ReIDNet(nn.Module):
    features: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        for ch in (32, 64, 128):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.97)(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.97)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.features)(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


class ReIDEmbedder:
    def __init__(self, feature_dim: int = 128, max_batch: int = 64, seed: int = 0,
                 params: Optional[Any] = None):
        self.model = ReIDNet(features=feature_dim)
        self.max_batch = max_batch
        if params is None:
            dummy = jnp.zeros((1, CROP_H, CROP_W, 1))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.variables = params
        self._forward = jax.jit(lambda x: self.model.apply(self.variables, x))

    def load_npz(self, path: str):
        """Load trained weights (flat tree as written by
        detect/train_reid.save_npz)."""
        from pointslot_tpu.detect.train_reid import load_npz

        self.variables = load_npz(path)
        self._forward = jax.jit(lambda x: self.model.apply(self.variables, x))

    @staticmethod
    def bundled_weights_path():
        """Path of the shipped synthetic-identity weights (or None)."""
        import os

        p = os.path.join(os.path.dirname(__file__), "weights",
                         "synthetic_reid.npz")
        return p if os.path.isfile(p) else None

    def __call__(self, image: np.ndarray, bboxes: np.ndarray) -> np.ndarray:
        """image (H, W) or (H, W, 3); bboxes (N, 4) xywh -> (N, D) features.

        Crop resizing happens on the HOST (PIL): the previous per-crop
        jax.image.resize was one device dispatch + sync roundtrip per
        crop AND a fresh compile per unique crop geometry — the device
        sees exactly one fixed-shape forward per frame now."""
        from PIL import Image

        if image.ndim == 3:
            image = image.mean(axis=-1)
        H, W = image.shape
        crops = np.zeros((self.max_batch, CROP_H, CROP_W, 1), np.float32)
        n = min(len(bboxes), self.max_batch)
        for i in range(n):
            x, y, w, h = bboxes[i]
            x0 = int(np.clip(x, 0, W - 2))
            y0 = int(np.clip(y, 0, H - 2))
            x1 = int(np.clip(x + w, x0 + 1, W))
            y1 = int(np.clip(y + h, y0 + 1, H))
            crop = Image.fromarray(image[y0:y1, x0:x1].astype(np.float32))
            crops[i, :, :, 0] = np.asarray(
                crop.resize((CROP_W, CROP_H), Image.BILINEAR),
                np.float32) / 255.0
        feats = np.asarray(self._forward(jnp.asarray(crops)))
        return feats[: len(bboxes)]
