"""Batched two-view linear triangulation.

Replaces the reference's per-point cv::SVD triangulation in
LocalMapping::CreateNewMapPoints (reference src/LocalMapping.cc:414) and the
Initializer's Triangulate (reference src/TwoViewReconstruction.cc). DLT on
the 4x4 system, solved for all candidate pairs at once via eigh of AtA
(faster and batch-friendlier on TPU than SVD of A).
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate(P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray):
    """DLT triangulation.

    P1, P2: (..., 3, 4) projection matrices (K [R|t]).
    uv1, uv2: (..., 2) pixel observations.
    Returns (..., 3) world points and (...,) condition flag (True = well-posed).
    """
    rows = []
    for P, uv in ((P1, uv1), (P2, uv2)):
        rows.append(uv[..., 0:1] * P[..., 2, :] - P[..., 0, :])
        rows.append(uv[..., 1:2] * P[..., 2, :] - P[..., 1, :])
    A = jnp.stack(rows, axis=-2)                       # (..., 4, 4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, v = jnp.linalg.eigh(AtA)                        # ascending eigenvalues
    X = v[..., :, 0]                                   # smallest eigenvector
    w_ok = jnp.abs(X[..., 3]) > 1e-8
    pts = X[..., :3] / jnp.where(w_ok, X[..., 3], 1.0)[..., None]
    return pts, w_ok


def projection_matrix(K: jnp.ndarray, T_cw: jnp.ndarray) -> jnp.ndarray:
    """K (3,3) @ [R|t] from T_cw (..., 4, 4) -> (..., 3, 4)."""
    return K @ T_cw[..., :3, :4]
