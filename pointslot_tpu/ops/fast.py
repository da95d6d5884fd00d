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

    Formulation: the 16 ring differences are lazy slices of a 3px-padded
    image (XLA fuses slices into consumers — no materialized (16, H, W)
    roll stack), and the min/max over every circular arc of 9 is built by
    DOUBLING (m2 -> m4 -> m8 -> m9): 64 elementwise min ops per side
    instead of the 128 of the unrolled window scan. bf16 on accelerators —
    level-0 intensities (integers <= 255) are exact in bf16; interpolated
    coarse-level values round by <= 0.5, immaterial against the FAST
    thresholds (5/20). CPU (the oracle-test backend) keeps f32.
    """
    import functools as _ft

    import jax

    dt = jnp.bfloat16 if jax.default_backend() not in ("cpu",) else jnp.float32
    h, w = img.shape[-2:]
    lead = img.ndim - 2  # leading batch dims (stacked L+R and/or vmap batch)
    imgb = img.astype(dt)
    padded = jnp.pad(imgb, [(0, 0)] * lead + [(3, 3), (3, 3)])
    # d[k][y, x] = img[y + dy_k, x + dx_k] - img[y, x]; border wraps/zeros
    # differ from the roll version only inside the 3px frame zeroed below.
    d = [padded[..., 3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w] - imgb
         for dy, dx in CIRCLE]

    def _rot(xs, s):
        return xs[s:] + xs[:s]

    # bright side: score = max over the 16 arcs of (min of d over the arc)
    mn2 = [jnp.minimum(a, b) for a, b in zip(d, _rot(d, 1))]
    mn4 = [jnp.minimum(a, b) for a, b in zip(mn2, _rot(mn2, 2))]
    mn8 = [jnp.minimum(a, b) for a, b in zip(mn4, _rot(mn4, 4))]
    mn9 = [jnp.minimum(a, b) for a, b in zip(mn8, _rot(d, 8))]
    bright = _ft.reduce(jnp.maximum, mn9)
    # dark side: max over arcs of min(-d) = -(min over arcs of max(d))
    mx2 = [jnp.maximum(a, b) for a, b in zip(d, _rot(d, 1))]
    mx4 = [jnp.maximum(a, b) for a, b in zip(mx2, _rot(mx2, 2))]
    mx8 = [jnp.maximum(a, b) for a, b in zip(mx4, _rot(mx4, 4))]
    mx9 = [jnp.maximum(a, b) for a, b in zip(mx8, _rot(d, 8))]
    dark = -_ft.reduce(jnp.minimum, mx9)
    score = jnp.maximum(bright, dark).astype(jnp.float32)
    score = jnp.where(score > threshold, score, 0.0)

    # zero the 3px border (ring wraps around edges there)
    score = score.at[..., :3, :].set(0.0).at[..., -3:, :].set(0.0)
    score = score.at[..., :, :3].set(0.0).at[..., :, -3:].set(0.0)
    return score


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only local maxima in a 3x3 neighborhood (ties broken toward the
    top-left pixel, matching raster-order NMS). Supports leading batch
    dims (stacked L+R images share one fused program)."""
    h, w = score.shape[-2:]
    lead = score.ndim - 2
    padded = jnp.pad(score, [(0, 0)] * lead + [(1, 1), (1, 1)],
                     constant_values=-1.0)
    strictly_greater = jnp.ones(score.shape, bool)
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            n = padded[..., dy : dy + h, dx : dx + w]
            if dy < 1 or (dy == 1 and dx < 1):
                # earlier in raster order: must be strictly greater than them
                strictly_greater &= score > n
            else:
                strictly_greater &= score >= n
    return jnp.where(strictly_greater, score, 0.0)
