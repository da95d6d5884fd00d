"""Pose-graph optimization over SE(3) relative-pose constraints.

Replaces the reference's Optimizer::OptimizeEssentialGraph
(reference src/Optimizer.cc:1419: g2o Sim3 pose graph over spanning-tree +
covisibility + loop edges; scale fixed for stereo, so effectively SE(3)).

TPU design: per-edge 6-vector residuals r = log(M_ij * T_j * T_i^-1) with
autodiff Jacobians (vmapped jacfwd at zero — exact, batched), normal
equations assembled by segment scatter, damped dense solve (6K x 6K; K <=
256 keyframes -> 1.5k dims, trivial on the MXU), fixed iteration count.
A CG path (matvec via the edge list + psum) drops in for multi-host scale.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import se3


class PoseGraphProblem(NamedTuple):
    poses: jnp.ndarray       # (K, 4, 4) initial T (any consistent convention)
    fixed: jnp.ndarray       # (K,) bool
    valid: jnp.ndarray       # (K,) bool
    e_i: jnp.ndarray         # (E,) int32 edge endpoints
    e_j: jnp.ndarray         # (E,)
    e_meas: jnp.ndarray      # (E, 4, 4) measured T_i @ inv(T_j)
    e_weight: jnp.ndarray    # (E,) float32 information scale
    e_valid: jnp.ndarray     # (E,) bool


def _edge_residual(Ti, Tj, Mij):
    """r = log( inv(Mij @ Tj) @ Ti ) — zero when Ti = Mij @ Tj."""
    return se3.se3_log(jnp.linalg.solve(Mij @ Tj, Ti))


def _edge_res_jac(Ti, Tj, Mij):
    def r_of(xi):
        xi_i, xi_j = xi[:6], xi[6:]
        return _edge_residual(
            se3.se3_retract(Ti, xi_i), se3.se3_retract(Tj, xi_j), Mij
        )

    r = r_of(jnp.zeros(12))
    J = jax.jacfwd(r_of)(jnp.zeros(12))     # (6, 12)
    return r, J[:, :6], J[:, 6:]


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20,
                        damping: float = 1e-6):
    K = prob.poses.shape[0]

    def gn_iter(_, poses):
        Ti = poses[prob.e_i]
        Tj = poses[prob.e_j]
        r, Ji, Jj = jax.vmap(_edge_res_jac)(Ti, Tj, prob.e_meas)
        w = jnp.where(prob.e_valid, prob.e_weight, 0.0)
        rw = r * w[:, None]

        # assemble H (K, K, 6, 6) sparse-by-scatter, b (K, 6)
        Hii = jnp.einsum("eij,eik,e->ejk", Ji, Ji, w)
        Hjj = jnp.einsum("eij,eik,e->ejk", Jj, Jj, w)
        Hij = jnp.einsum("eij,eik,e->ejk", Ji, Jj, w)
        bi = jnp.einsum("eij,ei->ej", Ji, rw)
        bj = jnp.einsum("eij,ei->ej", Jj, rw)

        H = jnp.zeros((K, K, 6, 6))
        H = H.at[prob.e_i, prob.e_i].add(Hii)
        H = H.at[prob.e_j, prob.e_j].add(Hjj)
        H = H.at[prob.e_i, prob.e_j].add(Hij)
        H = H.at[prob.e_j, prob.e_i].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 6)).at[prob.e_i].add(bi).at[prob.e_j].add(bj)

        free = (prob.valid & ~prob.fixed)[:, None].repeat(6, 1).reshape(-1)
        H_flat = H.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        H_flat = jnp.where(free[:, None] & free[None, :], H_flat, 0.0)
        diag = jnp.diagonal(H_flat)
        H_flat = H_flat + jnp.diag(
            jnp.where(free, damping * jnp.maximum(diag, 1.0), 1.0)
        )
        b_flat = jnp.where(free, b.reshape(-1), 0.0)
        dx = -jnp.linalg.solve(H_flat, b_flat).reshape(K, 6)
        new_poses = jax.vmap(se3.se3_retract)(poses, dx)
        return jnp.where(
            (prob.fixed | ~prob.valid)[:, None, None], poses, new_poses
        )

    return jax.lax.fori_loop(0, n_iters, gn_iter, prob.poses)
