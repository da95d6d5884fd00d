"""Windowed bundle adjustment with explicit Schur complement — batched LM.

Replaces the reference's g2o-based BA family with one engine:

- Optimizer::LocalBundleAdjustment (reference src/Optimizer.cc:1077):
  covisibility-window camera BA, points marginalized
  (setMarginalized(true) at :883), 5 + 10 iterations with an outlier pass
  between stages.
- Optimizer::ObjectLocalBundleAdjustment (reference src/Optimizer.cc:755):
  per-object windowed BA over ObjectKeyFrames with roll/pitch frozen
  (VertexSE3Fix oplus, reference include/g2o_Object.h:127-147) — handled
  here by a per-pose 6-dof mask on the tangent update.
- Optimizer::[Global]BundleAdjustment (reference src/Optimizer.cc:51/:59):
  same engine at larger capacity.

TPU design: the point-block marginalization is EXPLICIT — batched 3x3
inverses of the point Hessian blocks, dense (P, P, 6, 6) reduced camera
system assembled with one einsum over a dense (P, L, 6, 3) coupling tensor
(P <= 32 poses, L <= 8k points: ~19 MB — comfortably HBM-resident, and the
einsum is MXU work). The reduced system is solved densely; point updates
back-substitute in a batch. Iteration counts are static; validity is
masking.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem. P poses, L points, E edges."""

    poses: jnp.ndarray        # (P, 4, 4) T_cw initial
    pose_fixed: jnp.ndarray   # (P,) bool — held constant
    pose_valid: jnp.ndarray   # (P,) bool
    dof_mask: jnp.ndarray     # (P, 6) float — 1 = free, 0 = frozen dof
    points: jnp.ndarray       # (L, 3) world points initial
    point_valid: jnp.ndarray  # (L,) bool
    e_pose: jnp.ndarray       # (E,) int32 pose index per edge
    e_point: jnp.ndarray      # (E,) int32 point index per edge
    e_obs: jnp.ndarray        # (E, 3) (u, v, uR)
    e_stereo: jnp.ndarray     # (E,) bool
    e_inv_sigma2: jnp.ndarray  # (E,)
    e_valid: jnp.ndarray      # (E,) bool


class BAResult(NamedTuple):
    poses: jnp.ndarray        # (P, 4, 4)
    points: jnp.ndarray       # (L, 3)
    edge_inlier: jnp.ndarray  # (E,) bool
    cost: jnp.ndarray         # () final robust cost


def _gather_poses(poses, e_pose):
    """poses (P, 4, 4) indexed by (E,) — as a one-hot matmul (P is small and
    TPU gathers are slow; one (E, P) x (P, 16) contraction is exact and
    bandwidth-bound)."""
    P = poses.shape[0]
    onehot = (
        e_pose[:, None] == jnp.arange(P, dtype=e_pose.dtype)[None, :]
    ).astype(poses.dtype)
    return jax.lax.dot_general(
        onehot, poses.reshape(P, 16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, 4, 4)


def _edge_points_cam(poses, points, prob, fx, fy, cx, cy, bf):
    T = _gather_poses(poses, prob.e_pose)                   # (E, 4, 4)
    X = points[prob.e_point]                                # (E, 3)
    return se3.transform_points(T, X), T


def _edge_residuals_only(poses, points, prob: BAProblem, fx, fy, cx, cy, bf):
    """Residuals (E, 3) + behind mask, no Jacobians (for LM cost checks)."""
    pc, _ = _edge_points_cam(poses, points, prob, fx, fy, cx, cy, bf)
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = fx * pc[..., 0] / z + cx
    v = fy * pc[..., 1] / z + cy
    res = jnp.stack([u, v, u - bf / z], axis=-1) - prob.e_obs
    return res, pc[..., 2] <= 0.05


def _edge_residuals(poses, points, prob: BAProblem, fx, fy, cx, cy, bf):
    """Residuals (E, 3), pose Jacobians (E, 3, 6), point Jacobians (E, 3, 3)."""
    pc, T = _edge_points_cam(poses, points, prob, fx, fy, cx, cy, bf)
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz
    res = jnp.stack([u, v, ur], axis=-1) - prob.e_obs

    du_dp = jnp.stack([fx * iz, jnp.zeros_like(z), -fx * x * iz2], axis=-1)
    dv_dp = jnp.stack([jnp.zeros_like(z), fy * iz, -fy * y * iz2], axis=-1)
    dur_dp = du_dp + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), bf * iz2], axis=-1
    )
    J_p = jnp.stack([du_dp, dv_dp, dur_dp], axis=-2)        # (E, 3, 3) d res/d pc
    dpc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3)),
         -se3.hat(pc)],
        axis=-1,
    )                                                        # (E, 3, 6)
    J_pose = J_p @ dpc_dxi                                   # (E, 3, 6)
    J_point = J_p @ T[..., :3, :3]                           # (E, 3, 3)
    behind = pc[..., 2] <= 0.05
    return res, J_pose, J_point, behind


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det) — the batched
    jnp.linalg.inv lowers to a generic LU path on TPU."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def _edge_chi2(res, stereo, inv_sigma2):
    r2 = res[..., 0] ** 2 + res[..., 1] ** 2 + jnp.where(stereo, res[..., 2] ** 2, 0.0)
    return r2 * inv_sigma2


def _robust_cost(chi2, delta2):
    """Huber-robustified total cost."""
    lin = 2.0 * jnp.sqrt(jnp.maximum(chi2 * delta2, 0.0)) - delta2
    return jnp.where(chi2 <= delta2, chi2, lin)


@partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "bf", "stage_iters", "use_huber_stages"),
)
def bundle_adjust(
    prob: BAProblem,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    stage_iters: tuple = (5, 10),
    use_huber_stages: tuple = (True, False),
) -> BAResult:
    """Two-stage LM Schur BA with an outlier pass between stages, mirroring
    the reference's 5+10-iteration protocol (src/Optimizer.cc:996-1035)."""
    P = prob.poses.shape[0]
    L = prob.points.shape[0]

    delta_mono = jnp.float32(CHI2_MONO)
    delta_stereo = jnp.float32(CHI2_STEREO)
    delta2 = jnp.where(prob.e_stereo, delta_stereo, delta_mono)

    def total_cost(poses, points, active, robust):
        res, behind = _edge_residuals_only(poses, points, prob, fx, fy, cx, cy, bf)
        chi2 = _edge_chi2(res, prob.e_stereo, prob.e_inv_sigma2)
        per_edge = _robust_cost(chi2, delta2) if robust else chi2
        return jnp.sum(jnp.where(active & ~behind, per_edge, 0.0))

    def lm_iterations(poses, points, active, n_iters, robust):
        def body(_, carry):
            poses, points, lam, cost = carry
            res, J_pose, J_point, behind = _edge_residuals(
                poses, points, prob, fx, fy, cx, cy, bf
            )
            ok = active & ~behind
            chi2 = _edge_chi2(res, prob.e_stereo, prob.e_inv_sigma2)
            r_norm2 = jnp.maximum(chi2, 1e-12)
            huber_w = (
                jnp.where(r_norm2 > delta2, jnp.sqrt(delta2 / r_norm2), 1.0)
                if robust
                else jnp.ones_like(chi2)
            )
            w = jnp.where(ok, prob.e_inv_sigma2 * huber_w, 0.0)  # (E,)
            row_mask = jnp.stack(
                [jnp.ones_like(w), jnp.ones_like(w), prob.e_stereo.astype(w.dtype)],
                axis=-1,
            )                                                    # (E, 3)
            # apply per-pose dof mask to pose Jacobian columns
            J_pose_m = J_pose * prob.dof_mask[prob.e_pose][:, None, :]
            Jw_pose = J_pose_m * (w[:, None, None] * row_mask[:, :, None])
            Jw_point = J_point * (w[:, None, None] * row_mask[:, :, None])

            # block accumulations
            Hpp = jax.ops.segment_sum(
                jnp.einsum("eij,eik->ejk", Jw_pose, J_pose_m), prob.e_pose, P
            )                                                    # (P, 6, 6)
            Hll = jax.ops.segment_sum(
                jnp.einsum("eij,eik->ejk", Jw_point, J_point), prob.e_point, L
            )                                                    # (L, 3, 3)
            bp = jax.ops.segment_sum(
                jnp.einsum("eij,ei->ej", Jw_pose, res), prob.e_pose, P
            )                                                    # (P, 6)
            bl = jax.ops.segment_sum(
                jnp.einsum("eij,ei->ej", Jw_point, res), prob.e_point, L
            )                                                    # (L, 3)
            Wc = jnp.zeros((P, L, 6, 3), res.dtype).at[prob.e_pose, prob.e_point].add(
                jnp.einsum("eij,eik->ejk", Jw_pose, J_point)
            )                                                    # (P, L, 6, 3)

            # damp + invert point blocks (marginalization)
            Hll_d = Hll + (lam * jnp.eye(3)[None] * jnp.maximum(
                jnp.diagonal(Hll, axis1=1, axis2=2), 1e-6
            )[:, :, None] * jnp.eye(3)[None])
            Hll_d = Hll_d + 1e-9 * jnp.eye(3)[None]
            Hll_inv = _inv3x3(Hll_d)
            Hll_inv = jnp.where(
                prob.point_valid[:, None, None], Hll_inv, jnp.zeros_like(Hll_inv)
            )

            # reduced camera system
            W2 = jnp.einsum("plij,ljk->plik", Wc, Hll_inv)       # (P, L, 6, 3)
            S_cross = jnp.einsum("alik,bljk->abij", W2, Wc)      # (P, P, 6, 6)
            Hpp_d = Hpp + lam * jnp.eye(6)[None] * jnp.maximum(
                jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6
            )[:, :, None] * jnp.eye(6)[None]
            S = -S_cross
            S = S.at[jnp.arange(P), jnp.arange(P)].add(Hpp_d)
            b_red = bp - jnp.einsum("plij,lj->pi", W2, bl)       # (P, 6)

            # flatten to (6P, 6P), pin fixed/invalid poses to identity rows
            free = (
                prob.pose_valid & ~prob.pose_fixed
            )[:, None].repeat(6, 1).reshape(-1) & (
                prob.dof_mask.reshape(-1) > 0.5
            )
            S_flat = S.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)
            S_flat = jnp.where(free[:, None] & free[None, :], S_flat, 0.0)
            S_flat = S_flat + jnp.diag(jnp.where(free, 0.0, 1.0) + 1e-9)
            b_flat = jnp.where(free, b_red.reshape(-1), 0.0)
            dx_p = -jnp.linalg.solve(S_flat, b_flat).reshape(P, 6)
            dx_p = dx_p * prob.dof_mask

            # back-substitute points
            rhs = bl + jnp.einsum("plij,pi->lj", Wc, dx_p)
            dx_l = -jnp.einsum("lij,lj->li", Hll_inv, rhs)

            poses_new = jax.vmap(se3.se3_retract)(poses, dx_p)
            poses_new = jnp.where(
                (prob.pose_fixed | ~prob.pose_valid)[:, None, None], poses, poses_new
            )
            points_new = jnp.where(
                prob.point_valid[:, None], points + dx_l, points
            )
            new_cost = total_cost(poses_new, points_new, active, robust)
            accept = new_cost < cost
            poses = jnp.where(accept, poses_new, poses)
            points = jnp.where(accept, points_new, points)
            lam = jnp.where(accept, lam * 0.5, lam * 5.0)
            cost = jnp.where(accept, new_cost, cost)
            return poses, points, lam, cost

        cost0 = total_cost(poses, points, active, robust)
        poses, points, _, cost = jax.lax.fori_loop(
            0, n_iters, body, (poses, points, jnp.float32(1e-4), cost0)
        )
        return poses, points, cost

    active = prob.e_valid
    poses, points = prob.poses, prob.points
    cost = jnp.float32(0.0)
    for iters, robust in zip(stage_iters, use_huber_stages):
        poses, points, cost = lm_iterations(poses, points, active, iters, robust)
        # outlier pass (reference drops chi2 > gate or depth<=0 between stages)
        res, _, _, behind = _edge_residuals(poses, points, prob, fx, fy, cx, cy, bf)
        chi2 = _edge_chi2(res, prob.e_stereo, prob.e_inv_sigma2)
        gate = jnp.where(prob.e_stereo, CHI2_STEREO, CHI2_MONO)
        active = prob.e_valid & (chi2 <= gate) & ~behind

    return BAResult(poses=poses, points=points, edge_inlier=active, cost=cost)
