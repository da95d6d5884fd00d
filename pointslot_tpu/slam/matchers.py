"""Jitted matching kernels used by the tracking/mapping state machines.

These replace ORBmatcher's per-keypoint grid scans with full masked distance
tables (the Hamming table is an MXU matmul / popcount — see ops/hamming.py):

- project_and_match: map-points -> frame association by projection window
  (replaces ORBmatcher::SearchByProjection vs local map src/ORBmatcher.cc:68,
  vs last frame :1613, and the per-object variant :157 — all are the same
  computation over different point sets).
- brute_match: descriptor-table matching with Lowe ratio + rotation
  histogram (replaces SearchByBoW :280/:646 for our BoW-free tracking
  fallback, and SearchByBruceMatching :2043 for object points).

Conflict resolution (two points claiming one feature) is a segment-min over
the feature axis; everything is fixed-shape and masked.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointslot_tpu.ops.hamming import hamming_table_popcount

TH_LOW = 50
TH_HIGH = 100
HISTO_LENGTH = 30


class ProjMatchResult(NamedTuple):
    point_for_feature: jnp.ndarray  # (N,) int32 map-point index or -1
    n_matches: jnp.ndarray          # () int32
    proj_uv: jnp.ndarray            # (M, 3) projected (u, v, uR) per point
    visible: jnp.ndarray            # (M,) bool point projected into image


@partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "bf", "width", "height", "th_desc"),
)
def project_and_match(
    pts_w: jnp.ndarray,        # (M, 3) points in world
    pt_desc: jnp.ndarray,      # (M, 8) uint32
    pt_valid: jnp.ndarray,     # (M,) bool
    T_cw: jnp.ndarray,         # (4, 4)
    feat_xy: jnp.ndarray,      # (N, 2)
    feat_level: jnp.ndarray,   # (N,) int32
    feat_desc: jnp.ndarray,    # (N, 8) uint32
    feat_valid: jnp.ndarray,   # (N,) bool
    radius: jnp.ndarray,       # (M,) float32 search radius in px (level-0)
    scale_factors: jnp.ndarray,  # (n_levels,)
    pred_level: jnp.ndarray,   # (M,) int32 predicted octave per point
    fx: float, fy: float, cx: float, cy: float, bf: float,
    width: int, height: int,
    th_desc: int = TH_HIGH,
    level_window: jnp.ndarray = None,  # () or (M,) allowed |level - pred|
) -> ProjMatchResult:
    M = pts_w.shape[0]
    N = feat_xy.shape[0]
    if level_window is None:
        level_window = jnp.int32(1)

    R, t = T_cw[:3, :3], T_cw[:3, 3]
    pc = pts_w @ R.T + t
    z = pc[:, 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    u = fx * pc[:, 0] * zi + cx
    v = fy * pc[:, 1] * zi + cy
    ur = u - bf * zi
    visible = (
        pt_valid
        & (z > 0.1)
        & (u >= 0) & (u < width)
        & (v >= 0) & (v < height)
    )

    # search radius scaled by the point's predicted octave
    r_px = radius * scale_factors[jnp.clip(pred_level, 0, scale_factors.shape[0] - 1)]

    du = u[:, None] - feat_xy[None, :, 0]
    dv = v[:, None] - feat_xy[None, :, 1]
    in_window = (jnp.abs(du) <= r_px[:, None]) & (jnp.abs(dv) <= r_px[:, None])
    lvl_ok = jnp.abs(feat_level[None, :] - pred_level[:, None]) <= level_window
    mask = visible[:, None] & feat_valid[None, :] & in_window & lvl_ok

    dist = hamming_table_popcount(pt_desc, feat_desc)        # (M, N)
    dist = jnp.where(mask, dist, 1 << 20)

    best_feat = jnp.argmin(dist, axis=1).astype(jnp.int32)   # (M,)
    best_dist = jnp.take_along_axis(dist, best_feat[:, None], axis=1)[:, 0]
    matched = best_dist <= th_desc

    # resolve feature conflicts: keep the best point per feature
    # score = dist * M + point_idx (stable); invalid -> huge
    key = jnp.where(matched, best_dist, 1 << 20)
    per_feat_best = jax.ops.segment_min(key, best_feat, num_segments=N)
    winner = matched & (key == per_feat_best[best_feat])
    # among ties pick lowest point index
    pid = jnp.arange(M, dtype=jnp.int32)
    tie_key = jnp.where(winner, pid, M + 1)
    per_feat_pid = jax.ops.segment_min(tie_key, best_feat, num_segments=N)
    winner = winner & (pid == per_feat_pid[best_feat])

    point_for_feature = jnp.full((N,), -1, jnp.int32)
    point_for_feature = point_for_feature.at[
        jnp.where(winner, best_feat, N)
    ].set(jnp.where(winner, pid, -1), mode="drop")
    n = jnp.sum(winner.astype(jnp.int32))
    return ProjMatchResult(
        point_for_feature=point_for_feature,
        n_matches=n,
        proj_uv=jnp.stack([u, v, ur], axis=1),
        visible=visible,
    )


class BruteMatchResult(NamedTuple):
    idx_b_for_a: jnp.ndarray   # (NA,) int32 match in B or -1
    n_matches: jnp.ndarray     # ()


@partial(jax.jit, static_argnames=("th_desc", "check_rotation"))
def brute_match(
    desc_a: jnp.ndarray, angle_a: jnp.ndarray, valid_a: jnp.ndarray,
    desc_b: jnp.ndarray, angle_b: jnp.ndarray, valid_b: jnp.ndarray,
    nn_ratio: float = 0.9,
    th_desc: int = TH_LOW,
    check_rotation: bool = True,
) -> BruteMatchResult:
    """Mutual-best descriptor matching with Lowe ratio and rotation-histogram
    filtering (keep the 3 dominant relative-orientation bins)."""
    NA, NB = desc_a.shape[0], desc_b.shape[0]
    dist = hamming_table_popcount(desc_a, desc_b)
    dist = jnp.where(valid_a[:, None] & valid_b[None, :], dist, 1 << 20)

    # two smallest per row
    best = jnp.argmin(dist, axis=1).astype(jnp.int32)
    d1 = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
    dist2 = dist.at[jnp.arange(NA), best].set(1 << 20)
    d2 = jnp.min(dist2, axis=1)
    ok = (d1 <= th_desc) & (d1.astype(jnp.float32) < nn_ratio * d2.astype(jnp.float32))

    # mutual check: best of column must be this row
    col_best = jnp.argmin(dist, axis=0).astype(jnp.int32)
    ok = ok & (col_best[best] == jnp.arange(NA, dtype=jnp.int32))

    if check_rotation:
        two_pi = 2.0 * jnp.pi
        rot = (angle_a - angle_b[best]) % two_pi
        bins = jnp.clip(
            (rot * (HISTO_LENGTH / two_pi)).astype(jnp.int32), 0, HISTO_LENGTH - 1
        )
        hist = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[
            jnp.where(ok, bins, HISTO_LENGTH)
        ].add(1, mode="drop")
        top3 = jax.lax.top_k(hist, 3)[0]
        keep_bin = hist >= jnp.maximum(top3[2], 1)
        ok = ok & keep_bin[bins]

    out = jnp.where(ok, best, -1)
    return BruteMatchResult(idx_b_for_a=out, n_matches=jnp.sum(ok.astype(jnp.int32)))


class GuidedMatchResult(NamedTuple):
    point_for_feature: jnp.ndarray  # (N,) int32 point row or -1
    n_matches: jnp.ndarray          # () int32


@partial(jax.jit, static_argnames=("th_desc",))
def guided_match(
    pred_xy: jnp.ndarray,     # (M, 2) predicted pixel position per point
    pred_ok: jnp.ndarray,     # (M,) bool prediction available
    pt_desc: jnp.ndarray,     # (M, 8) uint32
    feat_xy: jnp.ndarray,     # (N, 2)
    feat_desc: jnp.ndarray,   # (N, 8) uint32
    feat_valid: jnp.ndarray,  # (N,) bool
    radius: float = 5.0,
    th_desc: int = 130,
) -> GuidedMatchResult:
    """Position-guided point->feature matching: each point carries an
    externally predicted pixel position (offline optical flow warp of its
    last observation); candidates are features within `radius` px across
    ALL pyramid levels, scored by Hamming distance.

    Replaces ORBmatcher::SearchByOfflineOpticalFlowTracking's per-keypoint
    grid scan (reference src/ORBmatcher.cc:2236-2369: flow lookup ->
    GetObjectFeaturesInArea(RADIUS_FORDYNAMIC=5, octaves 0-7) -> best
    descriptor <= TH_HIGH_FORDYNAMIC=130) with one masked distance table;
    the reference's subsequent PnP-RANSAC inlier gate is the caller's
    batched pose LM (object_system stage solves)."""
    M = pred_xy.shape[0]
    N = feat_xy.shape[0]
    du = pred_xy[:, 0][:, None] - feat_xy[None, :, 0]
    dv = pred_xy[:, 1][:, None] - feat_xy[None, :, 1]
    in_window = (jnp.abs(du) <= radius) & (jnp.abs(dv) <= radius)
    mask = pred_ok[:, None] & feat_valid[None, :] & in_window

    dist = hamming_table_popcount(pt_desc, feat_desc)
    dist = jnp.where(mask, dist, 1 << 20)

    best_feat = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best_dist = jnp.take_along_axis(dist, best_feat[:, None], axis=1)[:, 0]
    matched = best_dist <= th_desc

    # conflict resolution: best point per feature, ties to the lowest row
    key = jnp.where(matched, best_dist, 1 << 20)
    per_feat_best = jax.ops.segment_min(key, best_feat, num_segments=N)
    winner = matched & (key == per_feat_best[best_feat])
    pid = jnp.arange(M, dtype=jnp.int32)
    tie_key = jnp.where(winner, pid, M + 1)
    per_feat_pid = jax.ops.segment_min(tie_key, best_feat, num_segments=N)
    winner = winner & (pid == per_feat_pid[best_feat])

    point_for_feature = jnp.full((N,), -1, jnp.int32)
    point_for_feature = point_for_feature.at[
        jnp.where(winner, best_feat, N)
    ].set(jnp.where(winner, pid, -1), mode="drop")
    return GuidedMatchResult(
        point_for_feature=point_for_feature,
        n_matches=jnp.sum(winner.astype(jnp.int32)),
    )
