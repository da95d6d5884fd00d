"""2D template tracking for SLOT mode 2 (manual ROIs) and DynaSLAM mode.

Replaces the reference's OpenCV CSRT MultiTracker use
(reference src/Frame.cc:1529-1574 Online2DObjectTracking, cv::selectROIs at
:1537, DynaSLAM CSRT trackers src/Tracking.cc:127-139).

A normalized-cross-correlation tracker: the template is matched over a
search window around the last position (one jitted correlation per track),
with exponential template adaptation. Not CSRT-grade, but the same system
role: carry user-selected ROIs (or detector boxes) across frames without a
detector in the loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

TEMPLATE = 48         # template side (resampled)
SEARCH = 96           # search window side


@partial(jax.jit, static_argnames=())
def _ncc_match(template: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """template (T, T), window (S, S) -> (S-T+1, S-T+1) NCC scores."""
    T = template.shape[0]
    S = window.shape[0]
    t = template - jnp.mean(template)
    tn = jnp.sqrt(jnp.maximum(jnp.sum(t * t), 1e-9))
    patches = jnp.stack(
        [
            jax.lax.dynamic_slice(window, (dy, 0), (T, S))
            for dy in range(S - T + 1)
        ],
        axis=0,
    )  # (S-T+1, T, S)

    def corr_row(row_patches):
        cols = jnp.stack(
            [
                jax.lax.dynamic_slice(row_patches, (0, dx), (T, T))
                for dx in range(S - T + 1)
            ],
            axis=0,
        )
        c = cols - jnp.mean(cols, axis=(1, 2), keepdims=True)
        cn = jnp.sqrt(jnp.maximum(jnp.sum(c * c, axis=(1, 2)), 1e-9))
        return jnp.sum(c * t[None], axis=(1, 2)) / (cn * tn)

    return jax.vmap(corr_row)(patches)


@dataclass
class Track2D:
    track_id: int
    bbox: np.ndarray          # (4,) x, y, w, h
    template: np.ndarray      # (T, T) float32
    confidence: float = 1.0
    alive: bool = True


class MultiTracker2D:
    def __init__(self, adapt: float = 0.05, min_confidence: float = 0.25):
        self.tracks: List[Track2D] = []
        self.adapt = adapt
        self.min_confidence = min_confidence
        self._next_id = 0

    @staticmethod
    def _extract_template(img: np.ndarray, bbox: np.ndarray) -> np.ndarray:
        x, y, w, h = bbox
        H, W = img.shape
        x0, y0 = int(max(x, 0)), int(max(y, 0))
        x1, y1 = int(min(x + w, W)), int(min(y + h, H))
        patch = img[y0:y1, x0:x1].astype(np.float32)
        if patch.size == 0:
            patch = np.zeros((8, 8), np.float32)
        return np.asarray(
            jax.image.resize(jnp.asarray(patch), (TEMPLATE, TEMPLATE), "bilinear")
        )

    def add(self, img: np.ndarray, bbox) -> int:
        bbox = np.asarray(bbox, np.float64)
        t = Track2D(
            track_id=self._next_id, bbox=bbox,
            template=self._extract_template(img, bbox),
        )
        self.tracks.append(t)
        self._next_id += 1
        return t.track_id

    def update(self, img: np.ndarray) -> List[Track2D]:
        H, W = img.shape
        for t in self.tracks:
            if not t.alive:
                continue
            x, y, w, h = t.bbox
            cx, cy = x + w / 2, y + h / 2
            # search region = 2x the bbox, resampled so the object appears at
            # TEMPLATE scale; the peak offset maps back through the scale
            sw, sh = 2.0 * w, 2.0 * h
            sx0 = float(np.clip(cx - sw / 2, 0, max(W - sw, 0)))
            sy0 = float(np.clip(cy - sh / 2, 0, max(H - sh, 0)))
            sx1 = min(sx0 + sw, W)
            sy1 = min(sy0 + sh, H)
            crop = img[int(sy0) : int(sy1), int(sx0) : int(sx1)].astype(np.float32)
            if crop.shape[0] < 8 or crop.shape[1] < 8:
                t.alive = False
                continue
            window = np.asarray(
                jax.image.resize(jnp.asarray(crop), (SEARCH, SEARCH), "bilinear")
            )
            scores = np.asarray(
                _ncc_match(jnp.asarray(t.template), jnp.asarray(window))
            )
            iy, ix = np.unravel_index(np.argmax(scores), scores.shape)
            best = float(scores[iy, ix])
            t.confidence = best
            if best < self.min_confidence:
                t.alive = False
                continue
            # template center in window coords -> image coords
            ucx = ix + TEMPLATE / 2
            ucy = iy + TEMPLATE / 2
            new_cx = sx0 + ucx * crop.shape[1] / SEARCH
            new_cy = sy0 + ucy * crop.shape[0] / SEARCH
            t.bbox = np.array([new_cx - w / 2, new_cy - h / 2, w, h])
            fresh = self._extract_template(img, t.bbox)
            t.template = (1 - self.adapt) * t.template + self.adapt * fresh
        return [t for t in self.tracks if t.alive]
