"""Stereo keypoint matching: batched Hamming + SAD sub-pixel refinement.

Replaces the reference's per-keypoint row-bucketed scan
(Frame::ComputeStereoMatches, reference src/Frame.cc:2142-2316; the
per-object twin ComputeObjStereoMatches :2318-2503 is the same computation on
object feature sets — here both are one function because feature sets are
just arrays).

Pipeline (all one jit, static shapes):
  1. full (NL, NR) Hamming table (popcount kernel) masked by epipolar row
     window (|yL − yR| ≤ 2·scale^octaveR), octave window (±1 level) and
     disparity range [0, fx) — masked argmin per left keypoint;
  2. SAD refinement: 11×11 patches on the matched pyramid level, slid ±5 px,
     center-normalized, parabolic interpolation of the minimum;
  3. median-based outlier rejection (1.5·1.4·median of SAD scores).

Returns (u_right, depth, valid) per left keypoint.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pointslot_tpu.ops.hamming import hamming_table_popcount

_W = 5          # SAD half-window (11x11 patch)
_L = 5          # max slide in pixels
TH_ORB_STEREO = 75  # (TH_HIGH + TH_LOW) / 2, reference src/Frame.cc:2151


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray   # (NL,) float32, refined right-image u (level 0); -1 invalid
    depth: jnp.ndarray     # (NL,) float32; -1 invalid
    valid: jnp.ndarray     # (NL,) bool
    right_idx: jnp.ndarray  # (NL,) int32 matched right keypoint (pre-refine)


def _gather_patches(stack, lvl, vc, uc, dy, dx):
    """stack (L, H, W); per-kp level lvl, center (vc, uc) in level coords.
    dy (P,), dx (Q,) offsets -> (N, P, Q) patches (indices clamped)."""
    H, W = stack.shape[1], stack.shape[2]
    rows = jnp.clip(vc[:, None] + dy[None, :], 0, H - 1)          # (N, P)
    cols = jnp.clip(uc[:, None] + dx[None, :], 0, W - 1)          # (N, Q)
    return stack[lvl[:, None, None], rows[:, :, None], cols[:, None, :]]


def stereo_candidates(
    xy_l, level_l, desc_l, valid_l,
    xy_r, level_r, desc_r, valid_r,
    scale_factors, fx: float,
    th_orb: int = TH_ORB_STEREO,
):
    """Stage 1: masked Hamming argmin. Returns (best_idx, matched)."""
    max_d = fx
    dist = hamming_table_popcount(desc_l, desc_r)                  # (NL, NR)
    yl, yr = xy_l[:, 1], xy_r[:, 1]
    ul, ur = xy_l[:, 0], xy_r[:, 0]
    r_window = 2.0 * scale_factors[level_r]                        # (NR,)
    ok = (
        valid_l[:, None]
        & valid_r[None, :]
        & (jnp.abs(yl[:, None] - yr[None, :]) <= r_window[None, :])
        & (jnp.abs(level_l[:, None] - level_r[None, :]) <= 1)
        & (ur[None, :] <= ul[:, None])
        & (ur[None, :] >= ul[:, None] - max_d)
    )
    dist = jnp.where(ok, dist, 1 << 20)
    best_idx = jnp.argmin(dist, axis=1).astype(jnp.int32)          # (NL,)
    best_dist = jnp.take_along_axis(dist, best_idx[:, None], axis=1)[:, 0]
    return best_idx, best_dist < th_orb


def sad_refine_from_patches(
    patch_l, patch_r,            # (N, P, P) patches centered at the scaled
    #                              left kp / right candidate positions
    scaled_ul, scaled_vl, scaled_ur,  # (N,) int32 level coords
    ul, matched, in_bounds,      # level-0 left u, hamming ok, bounds ok
    scale,                       # (N,) per-kp scale factor
    fx: float, bf: float,
):
    """Stages 2+3: SAD scan over +-5 px with parabolic sub-pixel fit and the
    median-based outlier filter, computed from pre-fetched patches (static
    slices — no gathers)."""
    P = patch_l.shape[1]
    c = P // 2
    max_d = fx
    lw = patch_l[:, c - _W : c + _W + 1, c - _W : c + _W + 1]
    center_l = lw[:, _W, _W][:, None, None]
    norm_l = lw - center_l
    sads = []
    for k in range(2 * _L + 1):
        off = k - _L
        win = patch_r[:, c - _W : c + _W + 1, c - _W + off : c + _W + 1 + off]
        win = win - win[:, _W, _W][:, None, None]
        sads.append(jnp.sum(jnp.abs(norm_l - win), axis=(1, 2)))
    sads = jnp.stack(sads, axis=1)                                  # (N, 11)
    best_k = jnp.argmin(sads, axis=1)
    best_sad = jnp.take_along_axis(sads, best_k[:, None], axis=1)[:, 0]
    interior = (best_k > 0) & (best_k < 2 * _L)
    km = jnp.clip(best_k - 1, 0, 2 * _L)
    kp_ = jnp.clip(best_k + 1, 0, 2 * _L)
    s_m = jnp.take_along_axis(sads, km[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sads, kp_[:, None], axis=1)[:, 0]
    denom = s_m + s_p - 2.0 * best_sad
    delta = jnp.where(jnp.abs(denom) > 1e-6, (s_m - s_p) / (2.0 * denom), 0.0)
    delta_ok = (delta > -1.0) & (delta < 1.0)

    u_right = scale * (
        scaled_ur.astype(jnp.float32) + (best_k - _L).astype(jnp.float32) + delta
    )
    disparity = ul - u_right
    disparity = jnp.where(disparity <= 0.0, 0.01, disparity)
    disp_ok = disparity < max_d

    valid = matched & in_bounds & interior & delta_ok & disp_ok
    sad_for_median = jnp.where(valid, best_sad, jnp.nan)
    med = jnp.nanmedian(sad_for_median)
    valid = valid & (best_sad <= 1.5 * 1.4 * med)
    depth = jnp.where(valid, bf / disparity, -1.0)
    u_right = jnp.where(valid, u_right, -1.0)
    return u_right, depth, valid


def _gather_windows(img, vc, uc, dy, dx):
    """img (H, W); centers (vc, uc) int32. dy (P,), dx (Q,) -> (N, P, Q)."""
    H, W = img.shape
    rows = jnp.clip(vc[:, None] + dy[None, :], 0, H - 1)
    cols = jnp.clip(uc[:, None] + dx[None, :], 0, W - 1)
    return img[rows[:, :, None], cols[:, None, :]]


def fine_refine_from_patches(
    patch_l, patch_r,            # (N, P, P) level-0 windows centered at the
    #                              rounded left kp / right candidate coords
    ul,                          # (N,) float32 left keypoint u, level-0
    u_right, depth, valid,       # coarse (octave-level) SAD results
    bf: float,
):
    """fine_refine with the windows pre-fetched by the patch-DMA kernel
    (extract_patches custom call) — on TPU the dynamic window gathers of
    fine_refine lower to slow fusions + index copies (~1 ms/frame traced);
    the DMA kernel fetches the same windows in ~0.05 ms."""
    P = patch_l.shape[1]
    c = P // 2
    u0 = jnp.round(u_right).astype(jnp.int32)

    lw = patch_l[:, c - _W : c + _W + 1, c - _W : c + _W + 1]
    wide_r = patch_r[:, c - _W : c + _W + 1, c - _W - _L : c + _W + _L + 1]
    norm_l = lw - lw[:, _W, _W][:, None, None]
    sads = []
    for k in range(2 * _L + 1):
        win = wide_r[:, :, k : k + 2 * _W + 1]
        win = win - win[:, _W, _W][:, None, None]
        sads.append(jnp.sum(jnp.abs(norm_l - win), axis=(1, 2)))
    sads = jnp.stack(sads, axis=1)
    best_k = jnp.argmin(sads, axis=1)
    best_sad = jnp.take_along_axis(sads, best_k[:, None], axis=1)[:, 0]
    interior = (best_k > 0) & (best_k < 2 * _L)
    km = jnp.clip(best_k - 1, 0, 2 * _L)
    kp_ = jnp.clip(best_k + 1, 0, 2 * _L)
    s_m = jnp.take_along_axis(sads, km[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sads, kp_[:, None], axis=1)[:, 0]
    denom = s_m + s_p - 2.0 * best_sad
    delta = jnp.where(jnp.abs(denom) > 1e-6, (s_m - s_p) / (2.0 * denom), 0.0)
    delta_ok = (delta > -1.0) & (delta < 1.0)

    u_fine = u0.astype(jnp.float32) + (best_k - _L).astype(jnp.float32) + delta
    disparity = ul - u_fine
    accept = (
        valid & interior & delta_ok
        & (disparity > 0.0)
        & (jnp.abs(u_fine - u_right) <= float(_L))
    )
    u_out = jnp.where(accept, u_fine, u_right)
    d_out = jnp.where(accept, bf / jnp.maximum(disparity, 1e-3), depth)
    return u_out, d_out, valid


def fine_refine(
    img_l, img_r,                # full-resolution (level-0) images
    ul, vl,                      # (N,) float32 left keypoint, level-0 coords
    u_right, depth, valid,       # coarse (octave-level) SAD results
    bf: float,
    level=None,                  # (N,) int32 keypoint octave
    min_level: int = 6,
):
    """Full-resolution disparity refinement for coarse-octave keypoints.

    The octave-level SAD refine (the reference's ComputeStereoMatches
    protocol, src/Frame.cc:2142-2316) measures disparity at the keypoint's
    pyramid level, so its error scales with 1.2^octave — measured on the
    synthetic oracle, levels 6-7 carry >10% depth error on ~35% of their
    points. This second pass re-runs the same +-5 px SAD parabola at LEVEL
    0 around the coarse estimate for keypoints at octave >= min_level,
    cutting their error to level-0 sub-pixel (bad-depth fraction drops to
    ~0.13-0.20 on the same oracle). Finer octaves keep the octave-level
    result: their smoothed pyramid windows are already sub-pixel accurate,
    and the raw level-0 texture is noisier than their octave image. (The
    reference stops at the octave level for all keypoints; this pass is a
    strict accuracy improvement, not a parity deviation.) Falls back to the
    coarse result wherever the fine window leaves the image or the parabola
    is degenerate."""
    H, W = img_l.shape
    u0 = jnp.round(u_right).astype(jnp.int32)
    v0 = jnp.round(vl).astype(jnp.int32)
    ulr = jnp.round(ul).astype(jnp.int32)

    dy = jnp.arange(-_W, _W + 1)
    dxl = jnp.arange(-_W, _W + 1)
    dxr = jnp.arange(-_W - _L, _W + _L + 1)
    patch_l = _gather_windows(img_l, v0, ulr, dy, dxl)          # (N, 11, 11)
    wide_r = _gather_windows(img_r, v0, u0, dy, dxr)            # (N, 11, 21)

    in_bounds = (
        (v0 - _W >= 0) & (v0 + _W < H)
        & (ulr - _W >= 0) & (ulr + _W < W)
        & (u0 - _W - _L >= 0) & (u0 + _W + _L < W)
    )

    norm_l = patch_l - patch_l[:, _W, _W][:, None, None]
    sads = []
    for k in range(2 * _L + 1):
        win = wide_r[:, :, k : k + 2 * _W + 1]
        win = win - win[:, _W, _W][:, None, None]
        sads.append(jnp.sum(jnp.abs(norm_l - win), axis=(1, 2)))
    sads = jnp.stack(sads, axis=1)
    best_k = jnp.argmin(sads, axis=1)
    best_sad = jnp.take_along_axis(sads, best_k[:, None], axis=1)[:, 0]
    interior = (best_k > 0) & (best_k < 2 * _L)
    km = jnp.clip(best_k - 1, 0, 2 * _L)
    kp_ = jnp.clip(best_k + 1, 0, 2 * _L)
    s_m = jnp.take_along_axis(sads, km[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sads, kp_[:, None], axis=1)[:, 0]
    denom = s_m + s_p - 2.0 * best_sad
    delta = jnp.where(jnp.abs(denom) > 1e-6, (s_m - s_p) / (2.0 * denom), 0.0)
    delta_ok = (delta > -1.0) & (delta < 1.0)

    u_fine = u0.astype(jnp.float32) + (best_k - _L).astype(jnp.float32) + delta
    disparity = ul - u_fine
    accept = (
        valid & in_bounds & interior & delta_ok
        & (disparity > 0.0)
        & (jnp.abs(u_fine - u_right) <= float(_L))
    )
    if level is not None:
        accept = accept & (level >= min_level)
    u_out = jnp.where(accept, u_fine, u_right)
    d_out = jnp.where(accept, bf / jnp.maximum(disparity, 1e-3), depth)
    return u_out, d_out, valid


def stereo_match(
    xy_l, level_l, desc_l, valid_l,
    xy_r, level_r, desc_r, valid_r,
    stack_l, stack_r,           # (n_levels, H0, W0) padded pyramid stacks
    level_shapes,               # (n_levels, 2) int32 per-level (h, w)
    scale_factors,              # (n_levels,) float32
    fx: float, bf: float,
    th_orb: int = TH_ORB_STEREO,
) -> StereoMatches:
    NL = xy_l.shape[0]
    max_d = fx  # bf / min_depth with min_depth = baseline

    best_idx, matched = stereo_candidates(
        xy_l, level_l, desc_l, valid_l, xy_r, level_r, desc_r, valid_r,
        scale_factors, fx, th_orb,
    )
    ul, yl = xy_l[:, 0], xy_l[:, 1]

    # ---- stage 2: SAD sub-pixel refinement ---------------------------
    lvl = level_l
    inv_scale = 1.0 / scale_factors[lvl]
    u0r = jnp.take(xy_r[:, 0], best_idx)                           # matched uR, level 0
    scaled_ul = jnp.round(ul * inv_scale).astype(jnp.int32)
    scaled_vl = jnp.round(yl * inv_scale).astype(jnp.int32)
    scaled_ur = jnp.round(u0r * inv_scale).astype(jnp.int32)

    dy = jnp.arange(-_W, _W + 1)
    dxl = jnp.arange(-_W, _W + 1)
    dxr = jnp.arange(-_W - _L, _W + _L + 1)
    patch_l = _gather_patches(stack_l, lvl, scaled_vl, scaled_ul, dy, dxl)  # (N,11,11)
    wide_r = _gather_patches(stack_r, lvl, scaled_vl, scaled_ur, dy, dxr)   # (N,11,21)

    # bounds check: windows must be inside the level image
    lh = level_shapes[lvl, 0]
    lw = level_shapes[lvl, 1]
    in_bounds = (
        (scaled_vl - _W >= 0) & (scaled_vl + _W < lh)
        & (scaled_ul - _W >= 0) & (scaled_ul + _W < lw)
        & (scaled_ur - _W - _L >= 0) & (scaled_ur + _W + _L < lw)
    )

    center_l = patch_l[:, _W, _W][:, None, None]
    norm_l = patch_l - center_l
    sads = []
    for k in range(2 * _L + 1):
        win = wide_r[:, :, k : k + 2 * _W + 1]
        win = win - win[:, _W, _W][:, None, None]
        sads.append(jnp.sum(jnp.abs(norm_l - win), axis=(1, 2)))
    sads = jnp.stack(sads, axis=1)                                  # (N, 11)
    best_k = jnp.argmin(sads, axis=1)
    best_sad = jnp.take_along_axis(sads, best_k[:, None], axis=1)[:, 0]
    interior = (best_k > 0) & (best_k < 2 * _L)
    km = jnp.clip(best_k - 1, 0, 2 * _L)
    kp_ = jnp.clip(best_k + 1, 0, 2 * _L)
    s_m = jnp.take_along_axis(sads, km[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sads, kp_[:, None], axis=1)[:, 0]
    denom = s_m + s_p - 2.0 * best_sad
    delta = jnp.where(jnp.abs(denom) > 1e-6, (s_m - s_p) / (2.0 * denom), 0.0)
    delta_ok = (delta > -1.0) & (delta < 1.0)

    scale = scale_factors[lvl]
    u_right = scale * (scaled_ur.astype(jnp.float32) + (best_k - _L).astype(jnp.float32) + delta)
    disparity = ul - u_right
    disparity = jnp.where(disparity <= 0.0, 0.01, disparity)  # reference src/Frame.cc:2290
    disp_ok = disparity < max_d

    valid = matched & in_bounds & interior & delta_ok & disp_ok

    # ---- stage 3: median SAD outlier filter --------------------------
    sad_for_median = jnp.where(valid, best_sad, jnp.nan)
    med = jnp.nanmedian(sad_for_median)
    th_sad = 1.5 * 1.4 * med
    valid = valid & (best_sad <= th_sad)

    depth = jnp.where(valid, bf / disparity, -1.0)
    u_right = jnp.where(valid, u_right, -1.0)
    return StereoMatches(u_right=u_right, depth=depth, valid=valid, right_idx=best_idx)


def pad_pyramid_stack(levels) -> jnp.ndarray:
    """List of per-level (h, w) images -> (L, H0, W0) zero-padded stack."""
    H, W = levels[0].shape
    out = []
    for img in levels:
        h, w = img.shape
        out.append(jnp.pad(img, ((0, H - h), (0, W - w))))
    return jnp.stack(out, axis=0)
