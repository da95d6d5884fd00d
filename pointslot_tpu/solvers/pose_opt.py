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
    delta_th = jnp.where(edges.is_stereo, delta_stereo, delta_mono)
    # M-minor (lane-major) layout: all per-edge quantities live as (M,)
    # lanes and the Jacobian as six (M,) columns. The naive (M, 3, 6) edge
    # tensors pad their minor dims onto TPU (8, 128) tiles -- measured 23
    # of the 33 us/LM-iteration -- while this layout keeps every
    # intermediate dense and builds H via three (6, M) @ (M, 6) MXU
    # contractions.
    ptsT = jnp.swapaxes(edges.pts, -1, -2)                 # (3, M)
    obsT = jnp.swapaxes(edges.obs, -1, -2)                 # (3, M)

    def full_pass(T, active, use_huber):
        """ONE residual+Jacobian evaluation at T -> (cost, H, b, chi2,
        behind). The LM loop is the latency-bound part of the per-frame
        hot path (40 sequential small iterations), so each iteration
        touches the edge set exactly once: cost, normal equations, Huber
        weights and the behind-camera mask all come from this pass."""
        R, t = T[:3, :3], T[:3, 3]
        pc = jnp.dot(R, ptsT, precision=jax.lax.Precision.HIGHEST) + t[:, None]
        x, y = pc[0], pc[1]
        behind = pc[2] <= 0.05
        z = jnp.maximum(pc[2], 1e-6)
        iz = 1.0 / z
        iz2 = iz * iz
        u = fx * x * iz + cx
        v = fy * y * iz + cy
        du = u - obsT[0]
        dv = v - obsT[1]
        dur = (u - bf * iz) - obsT[2]
        chi2 = (du * du + dv * dv
                + jnp.where(edges.is_stereo, dur * dur, 0.0)) * edges.inv_sigma2
        ok = active & ~behind & edges.valid
        cost = jnp.sum(jnp.where(ok, chi2, 0.0))
        r_norm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        huber_w = jnp.where(
            use_huber & (r_norm > delta_th), delta_th / r_norm, 1.0
        )
        w = jnp.where(ok, edges.inv_sigma2 * huber_w, 0.0)
        sw = jnp.sqrt(w)
        sw_r = jnp.where(edges.is_stereo, sw, 0.0)         # u_right row
        # Jacobian of [du, dv, dur] wrt left-mult xi, columns j as (M,)
        # lanes; rotation block is J_p @ (-hat(pc)) expanded by hand
        # (validated against the (M, 3, 6) form in tests).
        a = fx * iz
        b2 = fy * iz
        c = -fx * x * iz2
        d = -fy * y * iz2
        e3 = c + bf * iz2
        zero = jnp.zeros_like(a)
        A0 = jnp.stack([a, zero, c, c * y, a * z - c * x, -a * y]) * sw
        A1 = jnp.stack([zero, b2, d, -b2 * z + d * y, -d * x, b2 * x]) * sw
        A2 = jnp.stack([a, zero, e3, e3 * y, a * z - e3 * x, -a * y]) * sw_r
        r0, r1, r2 = du * sw, dv * sw, dur * sw_r
        hp = jax.lax.Precision.HIGHEST
        AT = jnp.swapaxes(jnp.stack([A0, A1, A2]), -1, -2)  # (3, M, 6)
        H = (jnp.dot(A0, AT[0], precision=hp)
             + jnp.dot(A1, AT[1], precision=hp)
             + jnp.dot(A2, AT[2], precision=hp))            # (6, 6)
        b = (jnp.dot(A0, r0, precision=hp)
             + jnp.dot(A1, r1, precision=hp)
             + jnp.dot(A2, r2, precision=hp))               # (6,)
        if trans_prior is not None and trans_prior_weight > 0.0:
            # residual t(T) - prior; d t/d xi = [I | -hat(t)]
            rp = t - trans_prior
            Jp = jnp.concatenate([jnp.eye(3), -se3.hat(t)], axis=-1)  # (3,6)
            H = H + trans_prior_weight * (Jp.T @ Jp)
            b = b + trans_prior_weight * (Jp.T @ rp)
            cost = cost + trans_prior_weight * jnp.sum(rp * rp)
        return cost, H, b, chi2, behind

    def lm_stage(T, active, use_huber, boundary):
        """One LM stage. `boundary` = (cost, H, b) already evaluated at T
        with this stage's active mask (the stage-boundary pass doubles as
        the first iteration's linearization, so accepted candidates are
        linearized exactly once).

        Early exit: the 4x10 sequential LM iterations are the
        latency-bound half of the per-frame hot path, and stages 2-4
        start from the previous stage's already-converged pose — so the
        loop is a while_loop that stops once an ACCEPTED step improves
        cost by < 1e-4 relative or the step itself is negligible (g2o's
        own LM terminates on the same criteria). Shapes stay static; the
        saved iterations are real wall-clock because the loop is
        sequential. Under vmap (batched objects) the loop runs until
        every lane converges."""

        def iter_cond(carry):
            done, it = carry[-1], carry[-2]
            return (it < iters_per_stage) & jnp.logical_not(done)

        def iter_body(carry):
            T_best, cost_best, H, b, chi2, behind, lam, it, done = carry
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            # NOTE: jnp.linalg.solve (LU custom call, ~6 us) beats an
            # unrolled 6x6 Cholesky here — the scalar graph blew TPU
            # compile time to minutes AND ran slower (measured r4).
            dx = -jnp.linalg.solve(Hd, b)
            T_cand = se3.se3_retract(T_best, dx)
            cost_cand, H_cand, b_cand, chi2_cand, behind_cand = full_pass(
                T_cand, active, use_huber
            )
            accept = cost_cand < cost_best
            improve = cost_best - cost_cand
            done = (accept & (improve <= 1e-4 * cost_best)) | (
                jnp.sum(dx * dx) < 1e-12
            )
            T_best = jnp.where(accept, T_cand, T_best)
            cost_best = jnp.where(accept, cost_cand, cost_best)
            H = jnp.where(accept, H_cand, H)
            b = jnp.where(accept, b_cand, b)
            chi2 = jnp.where(accept, chi2_cand, chi2)
            behind = jnp.where(accept, behind_cand, behind)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return (T_best, cost_best, H, b, chi2, behind, lam, it + 1, done)

        cost0, H0, b0, chi2_0, behind_0 = boundary
        out = jax.lax.while_loop(
            iter_cond, iter_body,
            (T, cost0, H0, b0, chi2_0, behind_0, jnp.float32(1e-4),
             jnp.int32(0), jnp.asarray(False)),
        )
        # chi2/behind ride the carry: they are mask-independent per-edge
        # quantities, so the last ACCEPTED pass's values are exactly what a
        # post-stage re-evaluation at T_best would recompute — the third
        # full_pass per stage is gone.
        return out[0], out[4], out[5]

    # staged solve with chi2 re-gating (reference does 4 stages, Huber on the
    # first two, marking outliers between stages and re-admitting them if
    # their error drops back under the gate). Each stage boundary is ONE
    # shared pass: it re-gates the active set, seeds the accept test AND
    # linearizes for the next stage's first iteration.
    active = edges.valid
    T = T_init
    chi2 = behind = None
    for s in range(stages):
        use_huber = s < 2
        if s > 0:
            gate = jnp.where(edges.is_stereo, chi2_stereo, chi2_mono)
            active = edges.valid & (chi2 <= gate) & ~behind
        boundary = full_pass(T, active, use_huber)
        T, chi2, behind = lm_stage(T, active, use_huber, boundary)
    gate = jnp.where(edges.is_stereo, chi2_stereo, chi2_mono)
    active = edges.valid & (chi2 <= gate) & ~behind
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
