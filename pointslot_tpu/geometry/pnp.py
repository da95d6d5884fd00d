"""PnP (2D-3D) and rigid 3D-3D alignment with vmapped RANSAC.

Replaces the reference's EPnP+RANSAC relocalization solver
(reference src/PnPsolver.cc, `iterate` include/PnPsolver.h:75) and its
cv::solvePnPRansac use for object tracking
(ORBmatcher::ForObjectPnPRANSAC, reference src/ORBmatcher.cc:2161-2233).

TPU design: RANSAC = draw K minimal index sets with jax.random, solve all
hypotheses in parallel (vmap over a closed-form DLT), score all points
against all hypotheses with one (K, N) reprojection table, argmax inliers.
No data-dependent loop; K is static.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import se3


def _orthogonalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto SO(3) via SVD."""
    u, _, vt = jnp.linalg.svd(R)
    d = jnp.linalg.det(u @ vt)
    fix = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    return (u * fix[..., None, :]) @ vt


def pnp_dlt(pts: jnp.ndarray, uv_norm: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted linear PnP from >= 6 correspondences.

    pts: (N, 3) 3D points; uv_norm: (N, 2) NORMALIZED image coords
    ((u-cx)/fx, (v-cy)/fy); weights: (N,) selection weights (0/1 masks ok).
    Returns T (4, 4) with the rotation projected onto SO(3).
    """
    N = pts.shape[0]
    zeros = jnp.zeros((N, 4))
    Ph = jnp.concatenate([pts, jnp.ones((N, 1))], axis=1)     # (N, 4)
    r1 = jnp.concatenate([Ph, zeros, -uv_norm[:, 0:1] * Ph], axis=1)
    r2 = jnp.concatenate([zeros, Ph, -uv_norm[:, 1:2] * Ph], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)                      # (2N, 12)
    w = jnp.concatenate([weights, weights])[:, None]
    AtA = (A * w).T @ A
    _, v = jnp.linalg.eigh(AtA)
    p = v[:, 0].reshape(3, 4)
    # fix sign: points must be in front (positive depth for the weighted mean)
    mean_pt = jnp.sum(pts * weights[:, None], axis=0) / jnp.maximum(jnp.sum(weights), 1.0)
    depth = p[2, :3] @ mean_pt + p[2, 3]
    p = p * jnp.where(depth < 0, -1.0, 1.0)
    # scale so that R has unit determinant-ish: normalize by norm of third row
    scale = jnp.linalg.norm(p[2, :3])
    p = p / jnp.maximum(scale, 1e-12)
    R = _orthogonalize(p[:, :3])
    t = p[:, 3]
    return se3.rt_to_mat(R, t)


class RansacResult(NamedTuple):
    T: jnp.ndarray          # (4, 4) best pose
    inliers: jnp.ndarray    # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray         # () bool — enough inliers found


@partial(jax.jit, static_argnames=("n_hypotheses", "min_set", "min_inliers"))
def pnp_ransac(
    pts: jnp.ndarray,            # (N, 3)
    uv: jnp.ndarray,             # (N, 2) pixel coords
    valid: jnp.ndarray,          # (N,) bool
    key: jax.Array,
    fx: float, fy: float, cx: float, cy: float,
    reproj_threshold: float = 5.991 ** 0.5 * 2.0,
    n_hypotheses: int = 128,
    min_set: int = 6,
    min_inliers: int = 10,
) -> RansacResult:
    N = pts.shape[0]
    uv_norm = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=1)

    # weighted sampling restricted to valid entries
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)
    idx = jax.vmap(
        lambda k: jax.random.categorical(k, logits, shape=(min_set,))
    )(keys)                                                     # (K, min_set)

    def solve_one(sel):
        w = jnp.zeros((N,)).at[sel].set(1.0) * valid.astype(jnp.float32)
        return pnp_dlt(pts, uv_norm, w)

    Ts = jax.vmap(solve_one)(idx)                               # (K, 4, 4)

    # score: reprojection error of all points under all hypotheses
    pc = jnp.einsum("kij,nj->kni", Ts[:, :3, :3], pts) + Ts[:, None, :3, 3]
    z = jnp.maximum(pc[..., 2], 1e-6)
    du = fx * pc[..., 0] / z + cx - uv[None, :, 0]
    dv = fy * pc[..., 1] / z + cy - uv[None, :, 1]
    err2 = du * du + dv * dv
    inl = (err2 < reproj_threshold ** 2) & (pc[..., 2] > 0.05) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=1)             # (K,)
    best = jnp.argmax(scores)
    best_T = Ts[best]
    best_inl = inl[best]
    n = scores[best]

    # refine with one weighted DLT on the full inlier set
    refined = pnp_dlt(pts, uv_norm, best_inl.astype(jnp.float32))
    pc = se3.transform_points(refined, pts)
    z = jnp.maximum(pc[:, 2], 1e-6)
    du = fx * pc[:, 0] / z + cx - uv[:, 0]
    dv = fy * pc[:, 1] / z + cy - uv[:, 1]
    inl_ref = (du * du + dv * dv < reproj_threshold ** 2) & (pc[:, 2] > 0.05) & valid
    n_ref = jnp.sum(inl_ref.astype(jnp.int32))
    use_refined = n_ref >= n
    T_out = jnp.where(use_refined, refined, best_T)
    inl_out = jnp.where(use_refined, inl_ref, best_inl)
    n_out = jnp.maximum(n_ref, n)
    return RansacResult(T=T_out, inliers=inl_out, n_inliers=n_out,
                        ok=n_out >= min_inliers)


@partial(jax.jit, static_argnames=("n_hypotheses", "with_scale", "min_inliers"))
def rigid_ransac(
    src: jnp.ndarray,            # (N, 3)
    dst: jnp.ndarray,            # (N, 3)
    valid: jnp.ndarray,          # (N,) bool
    key: jax.Array,
    inlier_threshold: float = 0.3,
    n_hypotheses: int = 64,
    with_scale: bool = False,
    min_inliers: int = 12,
):
    """3-point Horn RANSAC for rigid (or Sim3) 3D-3D alignment — the
    reference's Sim3Solver::iterate (src/Sim3Solver.cc) with hypotheses
    solved in parallel via vmap. Returns RansacResult with T = [sR | t].
    """
    N = src.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)
    idx = jax.vmap(lambda k: jax.random.categorical(k, logits, shape=(3,)))(keys)

    def solve_one(sel):
        w = jnp.zeros((N,)).at[sel].set(1.0) * valid.astype(jnp.float32)
        s, R, t = umeyama(src, dst, w, with_scale=with_scale)
        return se3.rt_to_mat(s * R, t)

    Ts = jax.vmap(solve_one)(idx)                              # (K, 4, 4)
    pred = jnp.einsum("kij,nj->kni", Ts[:, :3, :3], src) + Ts[:, None, :3, 3]
    err = jnp.linalg.norm(pred - dst[None], axis=-1)
    inl = (err < inlier_threshold) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(scores)

    # refine on the best inlier set
    s, R, t = umeyama(src, dst, inl[best].astype(jnp.float32), with_scale=with_scale)
    T_ref = se3.rt_to_mat(s * R, t)
    pred = src @ (s * R).T + t
    inl_ref = (jnp.linalg.norm(pred - dst, axis=-1) < inlier_threshold) & valid
    n_ref = jnp.sum(inl_ref.astype(jnp.int32))
    use_ref = n_ref >= scores[best]
    T_out = jnp.where(use_ref, T_ref, Ts[best])
    inl_out = jnp.where(use_ref, inl_ref, inl[best])
    n_out = jnp.maximum(n_ref, scores[best])
    return RansacResult(T=T_out, inliers=inl_out, n_inliers=n_out,
                        ok=n_out >= min_inliers)


@partial(jax.jit, static_argnames=("n_iters", "with_scale"))
def rigid_refine(
    src: jnp.ndarray,            # (N, 3)
    dst: jnp.ndarray,            # (N, 3)
    valid: jnp.ndarray,          # (N,) bool — the RANSAC inlier set
    T0: jnp.ndarray,             # (4, 4) initial estimate
    huber_delta: float = 0.15,
    n_iters: int = 4,
    with_scale: bool = False,
) -> jnp.ndarray:
    """Inlier-weighted IRLS refinement of a rigid (or Sim3) alignment.

    The reference refines its RANSAC loop transform with a g2o
    Sim3 optimization over the inlier correspondences
    (Optimizer::OptimizeSim3, reference src/Optimizer.cc:1684). Here the
    same role is filled by iteratively-reweighted closed-form Horn solves:
    each round re-solves the weighted alignment with Huber weights on the
    current 3D residuals, which downweights borderline inliers that a
    single unweighted solve treats as exact.
    """
    def body(_, T):
        pred = src @ T[:3, :3].T + T[:3, 3]
        r = jnp.linalg.norm(pred - dst, axis=-1)
        w_huber = jnp.where(r > huber_delta, huber_delta / jnp.maximum(r, 1e-9), 1.0)
        w = w_huber * valid.astype(jnp.float32)
        s, R, t = umeyama(src, dst, w, with_scale=with_scale)
        return se3.rt_to_mat(s * R, t)

    return jax.lax.fori_loop(0, n_iters, body, T0)


def umeyama(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray, with_scale: bool = False
):
    """Weighted Horn/Umeyama closed-form alignment: finds (s, R, t) minimizing
    sum w_i |dst_i - (s R src_i + t)|^2.

    Replaces the reference's Sim3Solver internals (src/Sim3Solver.cc
    ComputeSim3) and serves the object-pose 3D-3D initialization.
    Returns (scale (), R (3,3), t (3,)). with_scale=False pins s=1 (stereo).
    """
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.sum(src * weights[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * weights[:, None], axis=0) / wsum
    xs = src - mu_s
    xd = dst - mu_d
    cov = (xd * weights[:, None]).T @ xs / wsum                 # (3, 3)
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.linalg.det(u) * jnp.linalg.det(vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.where(d < 0, -1.0, 1.0))
    R = u @ S @ vt
    if with_scale:
        var_s = jnp.sum(weights[:, None] * xs * xs) / wsum
        scale = jnp.sum(s * jnp.diag(S)) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.float32(1.0)
    t = mu_d - scale * R @ mu_s
    return scale, R, t
