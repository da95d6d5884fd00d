"""Monocular two-view reconstruction: H/F model selection + triangulation.

Replaces the reference's Initializer / TwoViewReconstruction
(reference src/Initializer.cc, src/TwoViewReconstruction.cc: parallel
homography + fundamental RANSAC, SH/(SH+SF) model selection, E and H
decomposition with cheirality checks). Dead code in the reference's
stereo-only build (System asserts STEREO, src/System.cc:61-62) but part of
the surface — and live here for any future monocular configuration.

TPU design: both models' RANSAC hypotheses are vmapped batches; scoring is
one (K, N) symmetric-transfer-error table per model; decomposition
candidates are cheirality-scored in parallel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import se3


def _dlt_homography(p1, p2, w):
    """Weighted DLT: p1, p2 (N, 2) normalized coords, w (N,) -> H (3, 3)."""
    N = p1.shape[0]
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros(N)
    o = jnp.ones(N)
    r1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], 1)
    r2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], 1)
    A = jnp.concatenate([r1, r2], 0)
    ww = jnp.concatenate([w, w])[:, None]
    AtA = (A * ww).T @ A
    _, v = jnp.linalg.eigh(AtA)
    return v[:, 0].reshape(3, 3)


def _eight_point_F(p1, p2, w):
    """Weighted 8-point fundamental/essential on normalized coords."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], 1)
    AtA = (A * w[:, None]).T @ A
    _, v = jnp.linalg.eigh(AtA)
    F = v[:, 0].reshape(3, 3)
    # enforce rank 2 (and unit singular values for E)
    u, s, vt = jnp.linalg.svd(F)
    return u @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ vt


def _sym_transfer_err_H(H, p1, p2):
    def transfer(H, a, b):
        q = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], 1) @ H.T
        q = q[:, :2] / jnp.where(jnp.abs(q[:, 2:3]) > 1e-9, q[:, 2:3], 1e-9)
        return jnp.sum((q - b) ** 2, axis=1)

    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    return transfer(H, p1, p2) + transfer(Hinv, p2, p1)


def _epipolar_err_F(F, p1, p2):
    h1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], 1)
    h2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], 1)
    Fx1 = h1 @ F.T
    Ftx2 = h2 @ F
    x2Fx1 = jnp.sum(h2 * Fx1, axis=1)
    d = x2Fx1 ** 2 * (
        1.0 / jnp.maximum(Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2, 1e-12)
        + 1.0 / jnp.maximum(Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2, 1e-12)
    )
    return d


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # () bool
    T21: jnp.ndarray         # (4, 4) pose of view 2 wrt view 1 (unit baseline)
    points: jnp.ndarray      # (N, 3) triangulated in view-1 frame
    inliers: jnp.ndarray     # (N,) bool
    used_homography: jnp.ndarray  # () bool


@partial(jax.jit, static_argnames=("n_hypotheses",))
def reconstruct_two_view(
    p1: jnp.ndarray,          # (N, 2) NORMALIZED image coords view 1
    p2: jnp.ndarray,          # (N, 2) view 2
    valid: jnp.ndarray,       # (N,) bool
    key: jax.Array,
    n_hypotheses: int = 128,
    err_threshold: float = 4e-5,   # in normalized-coordinate units^2
) -> TwoViewResult:
    N = p1.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)

    def sample_w(k, n_pts):
        sel = jax.random.categorical(k, logits, shape=(n_pts,))
        return jnp.zeros((N,)).at[sel].set(1.0) * valid.astype(jnp.float32)

    # --- homography RANSAC ------------------------------------------------
    H_all = jax.vmap(lambda k: _dlt_homography(p1, p2, sample_w(k, 4)))(keys)
    errH = jax.vmap(lambda H: _sym_transfer_err_H(H, p1, p2))(H_all)
    inlH = (errH < err_threshold) & valid[None, :]
    scoreH = jnp.sum(inlH, axis=1)
    bestH = jnp.argmax(scoreH)

    # --- fundamental RANSAC ----------------------------------------------
    F_all = jax.vmap(lambda k: _eight_point_F(p1, p2, sample_w(k, 8)))(keys)
    errF = jax.vmap(lambda F: _epipolar_err_F(F, p1, p2))(F_all)
    inlF = (errF < err_threshold) & valid[None, :]
    scoreF = jnp.sum(inlF, axis=1)
    bestF = jnp.argmax(scoreF)

    # model selection (reference uses SH/(SH+SF) > 0.40 -> H)
    ratio = scoreH[bestH] / jnp.maximum(scoreH[bestH] + scoreF[bestF], 1)
    use_H = ratio > 0.45

    # --- decompose E (normalized coords -> F IS E) ------------------------
    E = _eight_point_F(p1, p2, inlF[bestF].astype(jnp.float32))
    u, _, vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = u[:, 2]
    candidates = jnp.stack([
        se3.rt_to_mat(R1, t), se3.rt_to_mat(R1, -t),
        se3.rt_to_mat(R2, t), se3.rt_to_mat(R2, -t),
    ])

    def triangulate_all(T21):
        P1m = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
        P2m = T21[:3, :4]
        rows = []
        for Pm, uv in ((P1m, p1), (P2m, p2)):
            rows.append(uv[:, 0:1] * Pm[2] - Pm[0])
            rows.append(uv[:, 1:2] * Pm[2] - Pm[1])
        A = jnp.stack(rows, axis=1)                      # (N, 4, 4)
        AtA = jnp.swapaxes(A, 1, 2) @ A
        _, v = jnp.linalg.eigh(AtA)
        X = v[..., :, 0]
        pts = X[:, :3] / jnp.where(jnp.abs(X[:, 3:4]) > 1e-9, X[:, 3:4], 1e-9)
        z1 = pts[:, 2]
        pc2 = pts @ T21[:3, :3].T + T21[:3, 3]
        z2 = pc2[:, 2]
        good = (z1 > 0) & (z2 > 0) & valid
        return pts, good

    all_pts, all_good = jax.vmap(triangulate_all)(candidates)
    cheirality = jnp.sum(all_good, axis=1)
    best_cand = jnp.argmax(cheirality)
    T21 = candidates[best_cand]
    points = all_pts[best_cand]
    inliers = all_good[best_cand] & inlF[bestF]

    n_inl = jnp.sum(inliers)
    ok = (n_inl >= 30) & (cheirality[best_cand] > 0.7 * jnp.maximum(scoreF[bestF], 1))
    return TwoViewResult(
        ok=ok, T21=T21, points=points, inliers=inliers, used_homography=use_H,
    )
