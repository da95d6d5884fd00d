"""Motion-only pose optimization: batched Levenberg-Marquardt on SE(3).

Replaces the reference's g2o solves that optimize a single pose against
fixed 3D points:

- Optimizer::PoseOptimization (reference src/Optimizer.cc:249-477): camera
  pose vs. map points, 4 stages x 10 LM iterations, Huber on the first two
  stages, chi2 re-gating between stages (5.991 mono / 7.815 stereo).
- Optimizer::CFSE3ObjStateOptimization (reference src/Optimizer.cc:479-753):
  per-object camera-frame pose vs. object points, same structure plus a
  translation prior pinning the estimate near the detection-derived init
  (EdgeTransConstraintFromDetction, info = 50*I, reference :551-563).

TPU design: ONE batched solver. All poses of a frame (1 camera + up to 50
objects) are independent 6-dof problems over masked edge sets -> vmap the
whole LM loop and solve every pose in a single jit call. 6x6 normal
equations are solved in closed form; iteration counts are static.

Jacobians are hand-derived for the left-multiplicative update
T <- exp(xi) * T with xi = [upsilon, omega] (validated against finite
differences in tests; the reference's analytic Jacobians at
src/g2o_Object.cc:337-396 are the same quantities).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PoseObs(NamedTuple):
    """Edge set for one pose problem (padded, masked)."""

    pts: jnp.ndarray        # (M, 3) 3D points in the FIXED frame (world /
    #                         object frame) that the pose maps into the camera
    obs: jnp.ndarray        # (M, 3) measurements (u, v, u_right)
    is_stereo: jnp.ndarray  # (M,) bool — use the u_right residual row
    inv_sigma2: jnp.ndarray  # (M,) per-edge information scale (1/scale^2lvl)
    valid: jnp.ndarray      # (M,) bool


class PoseOptResult(NamedTuple):
    T: jnp.ndarray          # (4, 4) optimized pose
    inliers: jnp.ndarray    # (M,) bool final inlier set
    n_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray       # (M,) final per-edge chi2 (unrobust)


def _residuals_and_jac(T, pts, obs, is_stereo, fx, fy, cx, cy, bf):
    """Per-edge 3-residual [du, dv, duR] and (3, 6) Jacobian wrt left-mult xi.

    The mono case zeroes the third row via is_stereo masking downstream.
    """
    pc = se3.transform_points(T, pts)                     # (M, 3)
    x, y, z = pc[..., 0], pc[..., 1], jnp.maximum(pc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz
    pred = jnp.stack([u, v, ur], axis=-1)
    res = pred - obs                                      # (M, 3)

    # d(pc)/d(xi) = [I | -hat(pc)]  (left perturbation)
    # du/dpc, dv/dpc, dur/dpc:
    du_dp = jnp.stack([fx * iz, jnp.zeros_like(z), -fx * x * iz2], axis=-1)
    dv_dp = jnp.stack([jnp.zeros_like(z), fy * iz, -fy * y * iz2], axis=-1)
    dur_dp = du_dp + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), bf * iz2], axis=-1
    )
    J_p = jnp.stack([du_dp, dv_dp, dur_dp], axis=-2)      # (M, 3, 3)
    dpc_dxi = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3)),
            -se3.hat(pc),
        ],
        axis=-1,
    )                                                      # (M, 3, 6)
    J = J_p @ dpc_dxi                                      # (M, 3, 6)
    behind = pc[..., 2] <= 0.05
    return res, J, behind


def _edge_chi2(res, is_stereo, inv_sigma2):
    r2 = res[..., 0] ** 2 + res[..., 1] ** 2 + jnp.where(is_stereo, res[..., 2] ** 2, 0.0)
    return r2 * inv_sigma2


@partial(
    jax.jit,
    static_argnames=(
        "fx", "fy", "cx", "cy", "bf", "stages", "iters_per_stage",
        "trans_prior_weight",
    ),
)
def pose_optimize(
    T_init: jnp.ndarray,
    edges: PoseObs,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    stages: int = 4,
    iters_per_stage: int = 10,
    chi2_mono: float = CHI2_MONO,
    chi2_stereo: float = CHI2_STEREO,
    trans_prior: Optional[jnp.ndarray] = None,
    trans_prior_weight: float = 0.0,
) -> PoseOptResult:
    """Single-pose LM solve. For batches, use pose_optimize_batched.

    trans_prior: optional (3,) translation the solution is pinned to with an
    isotropic information of trans_prior_weight (the reference object
    optimizer uses 50, src/Optimizer.cc:551-563).
    """
    delta_mono = jnp.sqrt(chi2_mono)
    delta_stereo = jnp.sqrt(chi2_stereo)

    def compute_cost(T, active):
        res, _, behind = _residuals_and_jac(
            T, edges.pts, edges.obs, edges.is_stereo, fx, fy, cx, cy, bf
        )
        chi2 = _edge_chi2(res, edges.is_stereo, edges.inv_sigma2)
        cost = jnp.sum(jnp.where(active & ~behind, chi2, 0.0))
        if trans_prior is not None and trans_prior_weight > 0.0:
            dt = T[:3, 3] - trans_prior
            cost = cost + trans_prior_weight * jnp.sum(dt * dt)
        return cost

    def lm_stage(T, active, use_huber):
        delta_th = jnp.where(edges.is_stereo, delta_stereo, delta_mono)

        def iter_body(_, carry):
            T, lam, cost = carry
            res, J, behind = _residuals_and_jac(
                T, edges.pts, edges.obs, edges.is_stereo, fx, fy, cx, cy, bf
            )
            ok = active & ~behind & edges.valid
            # whitened residual norm for Huber
            w_info = edges.inv_sigma2
            r_norm = jnp.sqrt(jnp.maximum(_edge_chi2(res, edges.is_stereo, w_info), 1e-12))
            huber_w = jnp.where(
                use_huber & (r_norm > delta_th), delta_th / r_norm, 1.0
            )
            w = jnp.where(ok, w_info * huber_w, 0.0)       # (M,)
            # zero the uR row for mono edges
            row_mask = jnp.stack(
                [
                    jnp.ones_like(r_norm),
                    jnp.ones_like(r_norm),
                    edges.is_stereo.astype(res.dtype),
                ],
                axis=-1,
            )
            Jw = J * (w[:, None, None] * row_mask[:, :, None])
            H = jnp.einsum("mij,mik->jk", Jw, J)           # (6, 6)
            b = jnp.einsum("mij,mi->j", Jw, res)           # (6,)
            if trans_prior is not None and trans_prior_weight > 0.0:
                # residual t(T) - prior; d t/d xi = [I | -hat(t)]
                t = T[:3, 3]
                rp = t - trans_prior
                Jp = jnp.concatenate([jnp.eye(3), -se3.hat(t)], axis=-1)  # (3,6)
                H = H + trans_prior_weight * (Jp.T @ Jp)
                b = b + trans_prior_weight * (Jp.T @ rp)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            dx = -jnp.linalg.solve(Hd, b)
            T_new = se3.se3_retract(T, dx)
            new_cost = compute_cost(T_new, ok)
            accept = new_cost < cost
            T = jnp.where(accept, T_new, T)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return (T, lam, cost)

        cost0 = compute_cost(T, active & edges.valid)
        T, _, _ = jax.lax.fori_loop(
            0, iters_per_stage, iter_body, (T, jnp.float32(1e-4), cost0)
        )
        return T

    # staged solve with chi2 re-gating (reference does 4 stages, Huber on the
    # first two, marking outliers between stages and re-admitting them if
    # their error drops back under the gate)
    active = edges.valid
    T = T_init
    for s in range(stages):
        T = lm_stage(T, active, use_huber=(s < 2))
        res, _, behind = _residuals_and_jac(
            T, edges.pts, edges.obs, edges.is_stereo, fx, fy, cx, cy, bf
        )
        chi2 = _edge_chi2(res, edges.is_stereo, edges.inv_sigma2)
        gate = jnp.where(edges.is_stereo, chi2_stereo, chi2_mono)
        active = edges.valid & (chi2 <= gate) & ~behind

    res, _, behind = _residuals_and_jac(
        T, edges.pts, edges.obs, edges.is_stereo, fx, fy, cx, cy, bf
    )
    chi2 = _edge_chi2(res, edges.is_stereo, edges.inv_sigma2)
    return PoseOptResult(
        T=T,
        inliers=active,
        n_inliers=jnp.sum(active.astype(jnp.int32)),
        chi2=chi2,
    )


@partial(
    jax.jit,
    static_argnames=(
        "fx", "fy", "cx", "cy", "bf", "stages", "iters_per_stage",
        "use_trans_prior", "trans_prior_weight",
    ),
)
def pose_optimize_batched(
    T_init: jnp.ndarray,            # (B, 4, 4)
    edges: PoseObs,                 # leading dim B on every field
    fx: float, fy: float, cx: float, cy: float, bf: float,
    stages: int = 4,
    iters_per_stage: int = 10,
    trans_priors: Optional[jnp.ndarray] = None,   # (B, 3)
    use_trans_prior: bool = False,
    trans_prior_weight: float = 50.0,
) -> PoseOptResult:
    """Solve B independent pose problems in one program (e.g. every object of
    a frame — the reference loops objects serially, src/Tracking.cc:2288-2466)."""

    if use_trans_prior:
        def solve(T0, e, tp):
            return pose_optimize(
                T0, e, fx, fy, cx, cy, bf,
                stages=stages, iters_per_stage=iters_per_stage,
                trans_prior=tp, trans_prior_weight=trans_prior_weight,
            )

        return jax.vmap(solve)(T_init, edges, trans_priors)

    def solve(T0, e):
        return pose_optimize(
            T0, e, fx, fy, cx, cy, bf,
            stages=stages, iters_per_stage=iters_per_stage,
        )

    return jax.vmap(solve)(T_init, edges)
