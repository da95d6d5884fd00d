"""TPU-native ORB feature extraction.

Replaces the reference's ORBextractor (reference src/ORBextractor.cc:1043
operator(), pyramid :1107, per-cell FAST :765-852, quadtree distribution
:539, IC_Angle :77, rBRIEF :108) with a fully-batched jitted pipeline:

  pyramid -> dense FAST score map -> 3x3 NMS -> per-cell argmax (the
  spatial-uniformity role of the quadtree) -> per-level top-k by score ->
  patch-gather orientation (intensity centroid) -> Gaussian blur ->
  steered-BRIEF sampling -> bit packing.

Outputs fixed-capacity SoA arrays with a validity mask — no dynamic shapes.

Note on the BRIEF pattern: the reference uses OpenCV's learned 256-pair
table. We generate our pattern from a seeded isotropic Gaussian (the
original BRIEF construction) — descriptors are self-consistent within this
framework (matching, BoW, loop closure all use them), which is what matters
for a standalone system; no byte-compatibility with OpenCV descriptors is
claimed.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointslot_tpu.config import ORBConfig
from pointslot_tpu.ops import fast as fast_ops
from pointslot_tpu.ops import pyramid as pyr_ops

HALF_PATCH = 15          # orientation patch radius (31x31 patch)
EDGE_MARGIN = 16         # no keypoints closer than this to a level border
PATTERN_BITS = 256


class FeatureSet(NamedTuple):
    """SoA feature batch; all arrays have leading dim N = capacity."""

    xy: jnp.ndarray        # (N, 2) float32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # (N,) float32 FAST score
    angle: jnp.ndarray     # (N,) float32 radians
    level: jnp.ndarray     # (N,) int32 pyramid level
    desc: jnp.ndarray      # (N, 8) uint32 packed 256-bit descriptors
    valid: jnp.ndarray     # (N,) bool

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


@functools.lru_cache(maxsize=4)
def brief_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 4) int32 sample-pair offsets (xa, ya, xb, yb), radius <= 13."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, 31.0 / 5.0, size=(PATTERN_BITS * 2, 2))
    r = np.linalg.norm(pts, axis=1)
    scale = np.minimum(1.0, 13.0 / np.maximum(r, 1e-6))
    pts = np.round(pts * scale[:, None]).astype(np.int32)
    return np.concatenate([pts[:PATTERN_BITS], pts[PATTERN_BITS:]], axis=1)


def level_budgets(n_features: int, n_levels: int, scale_factor: float) -> List[int]:
    """Per-level keypoint budget (geometric split, same policy as the
    reference extractor ctor)."""
    inv = 1.0 / scale_factor
    first = n_features * (1 - inv) / (1 - inv ** n_levels)
    budgets = []
    acc = 0
    for lvl in range(n_levels - 1):
        k = int(round(first * inv ** lvl))
        budgets.append(k)
        acc += k
    budgets.append(max(n_features - acc, 0))
    return budgets


def _orientation_offsets() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flattened circular-patch offsets and moment weights."""
    ys, xs = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
    mask = (xs ** 2 + ys ** 2) <= (HALF_PATCH + 0.5) ** 2
    return (
        ys[mask].astype(np.int32),
        xs[mask].astype(np.int32),
        mask,
    )


class ORBExtractor:
    """Jitted ORB extraction at fixed image geometry.

    One instance per (height, width, config); the jitted function is traced
    once and cached. Call with a uint8/float image and an optional boolean
    gate mask (True = allowed region) to restrict detection (used for the
    dynamic-region masking of SLOT mode 1 and object-region extraction).
    """

    def __init__(self, height: int, width: int, config: Optional[ORBConfig] = None,
                 capacity: Optional[int] = None, cell_size: int = 16):
        self.config = config or ORBConfig()
        cfg = self.config
        self.height, self.width = height, width
        self.shapes = pyr_ops.level_shapes(height, width, cfg.n_levels, cfg.scale_factor)
        self.budgets = level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)
        if capacity is not None:
            # scale budgets to the requested total capacity
            f = capacity / max(sum(self.budgets), 1)
            self.budgets = [max(int(round(b * f)), 8) for b in self.budgets]
            self.budgets[-1] += capacity - sum(self.budgets)
        self.capacity = sum(self.budgets)
        self.cell_size = cell_size
        pat = brief_pattern()
        self._pat_a = jnp.asarray(pat[:, 0:2], jnp.float32)  # (256, 2) x, y
        self._pat_b = jnp.asarray(pat[:, 2:4], jnp.float32)
        oy, ox, _ = _orientation_offsets()
        self._ori_dy = jnp.asarray(oy)
        self._ori_dx = jnp.asarray(ox)
        self._extract = jax.jit(self._extract_impl)
        self._extract_masked = jax.jit(self._extract_masked_impl)

    # ------------------------------------------------------------------
    def __call__(self, img: jnp.ndarray, gate: Optional[jnp.ndarray] = None) -> FeatureSet:
        img = jnp.asarray(img, jnp.float32)
        if gate is None:
            return FeatureSet(*self._extract(img))
        return FeatureSet(*self._extract_masked(img, jnp.asarray(gate, bool)))

    # ------------------------------------------------------------------
    def _select_cells(self, score: jnp.ndarray, k: int):
        """Per-cell argmax then top-k by score. Returns (score, y, x) arrays
        of length k (invalid entries have score 0)."""
        cs = self.cell_size
        h, w = score.shape
        hc, wc = -(-h // cs), -(-w // cs)
        padded = jnp.pad(score, ((0, hc * cs - h), (0, wc * cs - w)))
        cells = padded.reshape(hc, cs, wc, cs).transpose(0, 2, 1, 3).reshape(hc, wc, cs * cs)
        idx = jnp.argmax(cells, axis=-1)                      # (hc, wc)
        best = jnp.take_along_axis(cells, idx[..., None], axis=-1)[..., 0]
        cy = idx // cs + jnp.arange(hc)[:, None] * cs
        cx = idx % cs + jnp.arange(wc)[None, :] * cs
        flat_scores = best.reshape(-1)
        flat_y = cy.reshape(-1)
        flat_x = cx.reshape(-1)
        k = min(k, flat_scores.shape[0])
        top, ti = jax.lax.top_k(flat_scores, k)
        return top, jnp.take(flat_y, ti), jnp.take(flat_x, ti)

    def _orientation(self, img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
        """Intensity-centroid angle for keypoints at integer (ys, xs)."""
        h, w = img.shape
        gy = jnp.clip(ys[:, None] + self._ori_dy[None, :], 0, h - 1)
        gx = jnp.clip(xs[:, None] + self._ori_dx[None, :], 0, w - 1)
        patch = img[gy, gx]                                    # (k, P)
        m10 = jnp.sum(patch * self._ori_dx[None, :], axis=1)
        m01 = jnp.sum(patch * self._ori_dy[None, :], axis=1)
        return jnp.arctan2(m01, m10)

    def _descriptors(self, blurred: jnp.ndarray, ys, xs, angles):
        """Steered BRIEF: sample rotated pattern on the blurred image."""
        h, w = blurred.shape
        ca, sa = jnp.cos(angles), jnp.sin(angles)              # (k,)

        def rotate(p):                                         # p: (256, 2) x, y
            rx = ca[:, None] * p[None, :, 0] - sa[:, None] * p[None, :, 1]
            ry = sa[:, None] * p[None, :, 0] + ca[:, None] * p[None, :, 1]
            return rx, ry                                      # (k, 256)

        ax, ay = rotate(self._pat_a)
        bx, by = rotate(self._pat_b)

        def sample(px, py):
            gx = jnp.clip(jnp.round(xs[:, None] + px).astype(jnp.int32), 0, w - 1)
            gy = jnp.clip(jnp.round(ys[:, None] + py).astype(jnp.int32), 0, h - 1)
            return blurred[gy, gx]                             # (k, 256)

        bits = (sample(ax, ay) < sample(bx, by))               # (k, 256) bool
        powers = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        packed = jnp.sum(
            bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32) * powers[None, None, :],
            axis=-1,
            dtype=jnp.uint32,
        )
        return packed                                          # (k, 8) uint32

    def _extract_from_scores(self, levels: List[jnp.ndarray], scores: List[jnp.ndarray]):
        cfg = self.config
        out_xy, out_resp, out_ang, out_lvl, out_desc, out_valid = [], [], [], [], [], []
        for lvl, (img_l, score) in enumerate(zip(levels, scores)):
            h, w = self.shapes[lvl]
            # border suppression
            m = EDGE_MARGIN
            border = jnp.zeros((h, w), score.dtype).at[m : h - m, m : w - m].set(1.0)
            score = score * border
            score = fast_ops.nms3x3(score)
            k = self.budgets[lvl]
            top, ys, xs = self._select_cells(score, k)
            valid = top > 0.0
            angle = self._orientation(img_l, ys, xs)
            blurred = pyr_ops.gaussian_blur(img_l)
            desc = self._descriptors(blurred, ys, xs, angle)
            scale = jnp.float32(cfg.scale_factor ** lvl)
            xy0 = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], -1) * scale
            out_xy.append(xy0)
            out_resp.append(top)
            out_ang.append(angle)
            out_lvl.append(jnp.full((top.shape[0],), lvl, jnp.int32))
            out_desc.append(desc)
            out_valid.append(valid)
        return (
            jnp.concatenate(out_xy),
            jnp.concatenate(out_resp),
            jnp.concatenate(out_ang),
            jnp.concatenate(out_lvl),
            jnp.concatenate(out_desc),
            jnp.concatenate(out_valid),
        )

    def _extract_impl(self, img: jnp.ndarray):
        cfg = self.config
        levels = pyr_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        scores = [fast_ops.fast_score_map(l, cfg.min_th_fast) for l in levels]
        return self._extract_from_scores(levels, scores)

    def _extract_masked_impl(self, img: jnp.ndarray, gate: jnp.ndarray):
        cfg = self.config
        levels = pyr_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        scores = []
        for lvl, l_img in enumerate(levels):
            s = fast_ops.fast_score_map(l_img, cfg.min_th_fast)
            g = jax.image.resize(gate.astype(jnp.float32), l_img.shape, "nearest")
            scores.append(s * g)
        return self._extract_from_scores(levels, scores)
