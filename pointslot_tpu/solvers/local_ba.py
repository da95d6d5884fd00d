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
  same engine at larger capacity, optionally sharded over a device mesh
  (pass ``axis_name``; see parallel/dist_ba.py).

TPU design: observations live in a POINT-MAJOR (L, K) slot layout — row l
holds up to K observations of point l. Every Hessian-block reduction is
then a dense einsum (slots of one point are adjacent; pose coupling goes
through a one-hot contraction on the MXU): zero scatters, zero segment
sums anywhere in the iteration. The point-block marginalization is
explicit — batched closed-form 3x3 inverses, a dense (L, P, 6, 3)
coupling tensor, and a dense (P, P, 6, 6) reduced camera system.
Iteration counts are static; validity is masking.

Distribution: the SAME solver body runs sharded — shard the L axis over a
mesh and pass ``axis_name``; the four pose-coupled reductions (Hpp, bp,
S_cross, the b_red correction) and the LM cost check get a psum, point
blocks stay shard-local. Single-chip and distributed solves are therefore
the same algorithm to within reduction order.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointslot_tpu.geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem. P poses, L points, K obs slots per point."""

    poses: jnp.ndarray           # (P, 4, 4) T_cw initial
    pose_fixed: jnp.ndarray      # (P,) bool — held constant
    pose_valid: jnp.ndarray      # (P,) bool
    dof_mask: jnp.ndarray        # (P, 6) float — 1 = free, 0 = frozen dof
    points: jnp.ndarray          # (L, 3) world points initial
    point_valid: jnp.ndarray     # (L,) bool
    obs_pose: jnp.ndarray        # (L, K) int32 pose index per slot
    obs_uvr: jnp.ndarray         # (L, K, 3) (u, v, uR)
    obs_stereo: jnp.ndarray      # (L, K) bool
    obs_inv_sigma2: jnp.ndarray  # (L, K)
    obs_valid: jnp.ndarray       # (L, K) bool


class BAResult(NamedTuple):
    poses: jnp.ndarray       # (P, 4, 4)
    points: jnp.ndarray      # (L, 3)
    obs_inlier: jnp.ndarray  # (L, K) bool
    cost: jnp.ndarray        # () final robust cost


class MotionPriors(NamedTuple):
    """Optional SE(3) relative-pose factors between pose pairs — the live
    form of the reference's motion-model/smoothness edges (EdgeMotionModel /
    EdgeSmoothTerm, reference include/g2o_Object.h:361-405): pose j is
    predicted from pose i by T_rel (e.g. the object's constant-velocity
    model), residual = log(T_j (T_rel T_i)^-1), weight = information scale.
    """

    idx: jnp.ndarray     # (R, 2) int32 (i_prev, j_cur) pose indices
    T_rel: jnp.ndarray   # (R, 4, 4) predicted T_j<-i
    weight: jnp.ndarray  # (R,) information scale (per-factor)
    valid: jnp.ndarray   # (R,) bool


def build_motion_priors(idx: np.ndarray, T_rel: np.ndarray,
                        weight: np.ndarray, R_cap: int) -> MotionPriors:
    """Pad flat prior arrays to a fixed capacity."""
    idx = np.asarray(idx, np.int32).reshape(-1, 2)
    n = min(len(idx), R_cap)
    pidx = np.zeros((R_cap, 2), np.int32)
    pT = np.tile(np.eye(4, dtype=np.float32), (R_cap, 1, 1))
    pw = np.zeros(R_cap, np.float32)
    pv = np.zeros(R_cap, bool)
    pidx[:n] = idx[:n]
    pT[:n] = np.asarray(T_rel, np.float32).reshape(-1, 4, 4)[:n]
    pw[:n] = np.asarray(weight, np.float32).reshape(-1)[:n]
    pv[:n] = True
    return MotionPriors(jnp.asarray(pidx), jnp.asarray(pT),
                        jnp.asarray(pw), jnp.asarray(pv))


# ---------------------------------------------------------------------------
# host-side problem builder: flat edge lists -> point-major slots
# ---------------------------------------------------------------------------

def build_problem(
    poses: np.ndarray,          # (n, 4, 4)
    pose_fixed,                 # (n,) bool-like
    points: np.ndarray,         # (m, 3)
    e_pose: np.ndarray,         # (E,) int
    e_point: np.ndarray,        # (E,) int
    e_obs: np.ndarray,          # (E, 3)
    e_stereo: np.ndarray,       # (E,) bool
    e_inv_sigma2: np.ndarray,   # (E,)
    P_cap: int,
    L_cap: int,
    K: int,
    dof_mask: Optional[np.ndarray] = None,
) -> Tuple[BAProblem, np.ndarray]:
    """Pack flat edge arrays into the point-major layout.

    Returns (problem, slot_edge) where slot_edge (L_cap, K) maps each
    observation slot back to its row in the input edge arrays (-1 = empty),
    so callers can push per-slot inlier flags back onto their own indices.
    Edges beyond K per point or beyond the caps are dropped.
    """
    n = len(poses)
    m = len(points)
    assert n <= P_cap and m <= L_cap, (n, P_cap, m, L_cap)
    e_pose = np.asarray(e_pose, np.int64)
    e_point = np.asarray(e_point, np.int64)
    keep = (e_pose >= 0) & (e_pose < n) & (e_point >= 0) & (e_point < m)
    eidx = np.nonzero(keep)[0]

    order = eidx[np.argsort(e_point[eidx], kind="stable")]
    sp = e_point[order]
    first = np.searchsorted(sp, sp, side="left")
    slot = np.arange(len(sp)) - first
    sel = slot < K
    order, sp, slot = order[sel], sp[sel], slot[sel]

    obs_pose = np.zeros((L_cap, K), np.int32)
    obs_uvr = np.zeros((L_cap, K, 3), np.float32)
    obs_stereo = np.zeros((L_cap, K), bool)
    obs_inv2 = np.ones((L_cap, K), np.float32)
    obs_valid = np.zeros((L_cap, K), bool)
    slot_edge = np.full((L_cap, K), -1, np.int64)

    obs_pose[sp, slot] = e_pose[order].astype(np.int32)
    obs_uvr[sp, slot] = np.asarray(e_obs, np.float32)[order]
    obs_stereo[sp, slot] = np.asarray(e_stereo, bool)[order]
    obs_inv2[sp, slot] = np.asarray(e_inv_sigma2, np.float32)[order]
    obs_valid[sp, slot] = True
    slot_edge[sp, slot] = order

    def pad(a, cap, fill=0):
        a = np.asarray(a)
        out = np.full((cap,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a[:cap]
        return out

    if dof_mask is None:
        dof = np.ones((P_cap, 6), np.float32)
    else:
        dof = pad(np.asarray(dof_mask, np.float32), P_cap, 1.0)

    prob = BAProblem(
        poses=jnp.asarray(pad(np.asarray(poses, np.float32), P_cap)),
        pose_fixed=jnp.asarray(pad(np.asarray(pose_fixed, bool), P_cap, True)),
        pose_valid=jnp.asarray(pad(np.ones(n, bool), P_cap, False)),
        dof_mask=jnp.asarray(dof),
        points=jnp.asarray(pad(np.asarray(points, np.float32), L_cap)),
        point_valid=jnp.asarray(pad(np.ones(m, bool), L_cap, False)),
        obs_pose=jnp.asarray(obs_pose),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_stereo=jnp.asarray(obs_stereo),
        obs_inv_sigma2=jnp.asarray(obs_inv2),
        obs_valid=jnp.asarray(obs_valid),
    )
    return prob, slot_edge


# ---------------------------------------------------------------------------
# device-side pieces
# ---------------------------------------------------------------------------

def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (P, ...) gathered by integer idx of any shape.

    Small tables (P <= 64) use a one-hot MXU contraction (TPU gathers are
    slow, the one-hot is exact); larger tables fall back to take, where the
    one-hot operand would dominate memory.
    """
    P = table.shape[0]
    flat = table.reshape(P, -1)
    if P <= 64:
        oh = (
            idx.reshape(-1)[:, None] == jnp.arange(P, dtype=idx.dtype)[None, :]
        ).astype(flat.dtype)
        out = jax.lax.dot_general(
            oh, flat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        out = jnp.take(flat, idx.reshape(-1), axis=0)
    return out.reshape(idx.shape + table.shape[1:])


def _pose_onehot(obs_pose: jnp.ndarray, P: int) -> jnp.ndarray:
    """(L, K) int32 -> (L, K, P) f32 one-hot."""
    return (
        obs_pose[..., None] == jnp.arange(P, dtype=obs_pose.dtype)
    ).astype(jnp.float32)


def _residuals_only(poses, points, prob: BAProblem, fx, fy, cx, cy, bf):
    """Residuals (L, K, 3) + behind-camera mask, no Jacobians."""
    T = _gather_rows(poses, prob.obs_pose)                  # (L, K, 4, 4)
    pc = jnp.einsum("lkij,lj->lki", T[..., :3, :3], points) + T[..., :3, 3]
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = fx * pc[..., 0] / z + cx
    v = fy * pc[..., 1] / z + cy
    res = jnp.stack([u, v, u - bf / z], axis=-1) - prob.obs_uvr
    return res, pc[..., 2] <= 0.05


def _residuals_jac(poses, points, prob: BAProblem, fx, fy, cx, cy, bf):
    """Residuals (L, K, 3), pose Jac (L, K, 3, 6), point Jac (L, K, 3, 3)."""
    T = _gather_rows(poses, prob.obs_pose)                  # (L, K, 4, 4)
    pc = jnp.einsum("lkij,lj->lki", T[..., :3, :3], points) + T[..., :3, 3]
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz
    res = jnp.stack([u, v, ur], axis=-1) - prob.obs_uvr

    zero = jnp.zeros_like(z)
    du_dp = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    dv_dp = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    dur_dp = du_dp + jnp.stack([zero, zero, bf * iz2], axis=-1)
    J_p = jnp.stack([du_dp, dv_dp, dur_dp], axis=-2)        # (L, K, 3, 3)
    dpc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3)),
         -se3.hat(pc)],
        axis=-1,
    )                                                        # (L, K, 3, 6)
    J_pose = J_p @ dpc_dxi                                   # (L, K, 3, 6)
    J_point = J_p @ T[..., :3, :3]                           # (L, K, 3, 3)
    return res, J_pose, J_point, pc[..., 2] <= 0.05


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


def _chi2(res, stereo, inv_sigma2):
    r2 = res[..., 0] ** 2 + res[..., 1] ** 2 + jnp.where(stereo, res[..., 2] ** 2, 0.0)
    return r2 * inv_sigma2


def _robust_cost(chi2, delta2):
    """Huber-robustified total cost."""
    lin = 2.0 * jnp.sqrt(jnp.maximum(chi2 * delta2, 0.0)) - delta2
    return jnp.where(chi2 <= delta2, chi2, lin)


def empty_motion_priors(R_cap: int = 32) -> MotionPriors:
    """All-invalid priors (zero weight) — the batching filler."""
    return MotionPriors(
        idx=jnp.zeros((R_cap, 2), jnp.int32),
        T_rel=jnp.tile(jnp.eye(4, dtype=jnp.float32), (R_cap, 1, 1)),
        weight=jnp.zeros(R_cap, jnp.float32),
        valid=jnp.zeros(R_cap, bool),
    )


def stack_problems(probs):
    """Stack same-shape BAProblems (or MotionPriors) along a new leading
    axis for bundle_adjust_batched."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *probs)


_BATCH_SOLVERS = {}


def bundle_adjust_batched(
    probs: BAProblem,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    priors: Optional[MotionPriors] = None,
    stage_iters: tuple = (5, 10),
    use_huber_stages: tuple = (True, False),
) -> BAResult:
    """Solve a STACK of same-shape BA problems in one vmapped dispatch —
    object-parallel BA (the EP axis of SURVEY §2d at the windowed-solver
    level: where the reference serializes per-object BA on its mapping
    thread, all pending objects solve together on the MXU). ``probs`` (and
    ``priors`` if given) carry a leading batch axis."""
    key = (fx, fy, cx, cy, bf, stage_iters, use_huber_stages,
           priors is not None)
    fn = _BATCH_SOLVERS.get(key)
    if fn is None:
        def base(p, pr):
            return bundle_adjust(
                p, fx, fy, cx, cy, bf, stage_iters=stage_iters,
                use_huber_stages=use_huber_stages, priors=pr,
            )

        if priors is None:
            fn = jax.jit(jax.vmap(lambda p: base(p, None)))
        else:
            fn = jax.jit(jax.vmap(base))
        _BATCH_SOLVERS[key] = fn
    return fn(probs) if priors is None else fn(probs, priors)


def _prior_residual(poses, priors: MotionPriors):
    """(R, 6) residuals log(T_j (T_rel T_i)^-1) of the motion priors."""
    Ti = _gather_rows(poses, priors.idx[:, 0])
    Tj = _gather_rows(poses, priors.idx[:, 1])
    pred = priors.T_rel @ Ti
    err = Tj @ jax.vmap(se3.se3_inverse)(pred)
    return jax.vmap(se3.se3_log)(err)


def _prior_terms(poses, priors: MotionPriors, P: int):
    """Gauss-Newton pieces of the motion priors: per-factor residuals r,
    Jacobians (J_i, J_j) wrt the two poses' tangent updates, weights."""

    def one(Ti, Tj, Trel):
        def r_of(xi):
            xi_i, xi_j = xi[:6], xi[6:]
            pred = Trel @ se3.se3_retract(Ti, xi_i)
            return se3.se3_log(
                se3.se3_retract(Tj, xi_j) @ se3.se3_inverse(pred)
            )

        J = jax.jacfwd(r_of)(jnp.zeros(12, jnp.float32))    # (6, 12)
        return r_of(jnp.zeros(12, jnp.float32)), J[:, :6], J[:, 6:]

    Ti = _gather_rows(poses, priors.idx[:, 0])
    Tj = _gather_rows(poses, priors.idx[:, 1])
    r, Ji, Jj = jax.vmap(one)(Ti, Tj, priors.T_rel)
    w = jnp.where(priors.valid, priors.weight, 0.0)
    return r, Ji, Jj, w


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "bf", "stage_iters",
                     "use_huber_stages", "axis_name"),
)
def bundle_adjust(
    prob: BAProblem,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    stage_iters: tuple = (5, 10),
    use_huber_stages: tuple = (True, False),
    axis_name=None,
    priors: Optional[MotionPriors] = None,
) -> BAResult:
    """Two-stage LM Schur BA with an outlier pass between stages, mirroring
    the reference's 5+10-iteration protocol (src/Optimizer.cc:996-1035).

    With ``axis_name`` set (running inside shard_map with the L axis
    sharded), pose-coupled reductions are psum'd over that axis and the
    solve is the distributed engine — same math, same staging, same gates.

    ``priors`` adds SE(3) relative-pose motion factors between pose pairs
    (reference EdgeMotionModel/EdgeSmoothTerm) into the reduced camera
    system. In distributed mode the priors are replicated on every shard
    and added outside the psum (no double counting).
    """
    P = prob.poses.shape[0]
    L = prob.points.shape[0]

    def ps(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    delta2 = jnp.where(prob.obs_stereo, jnp.float32(CHI2_STEREO),
                       jnp.float32(CHI2_MONO))

    def total_cost(poses, points, active, robust):
        res, behind = _residuals_only(poses, points, prob, fx, fy, cx, cy, bf)
        chi2 = _chi2(res, prob.obs_stereo, prob.obs_inv_sigma2)
        per = _robust_cost(chi2, delta2) if robust else chi2
        cost = ps(jnp.sum(jnp.where(active & ~behind, per, 0.0)))
        if priors is not None:
            r = _prior_residual(poses, priors)
            w = jnp.where(priors.valid, priors.weight, 0.0)
            cost = cost + jnp.sum(w * jnp.sum(r * r, axis=-1))
        return cost

    def lm_iterations(poses, points, active, n_iters, robust):
        def body(_, carry):
            poses, points, lam, cost = carry
            res, J_pose, J_point, behind = _residuals_jac(
                poses, points, prob, fx, fy, cx, cy, bf
            )
            ok = active & ~behind
            chi2 = _chi2(res, prob.obs_stereo, prob.obs_inv_sigma2)
            r_norm2 = jnp.maximum(chi2, 1e-12)
            huber_w = (
                jnp.where(r_norm2 > delta2, jnp.sqrt(delta2 / r_norm2), 1.0)
                if robust
                else jnp.ones_like(chi2)
            )
            w = jnp.where(ok, prob.obs_inv_sigma2 * huber_w, 0.0)   # (L, K)
            row_mask = jnp.stack(
                [jnp.ones_like(w), jnp.ones_like(w),
                 prob.obs_stereo.astype(w.dtype)], axis=-1,
            )                                                        # (L, K, 3)
            dofg = _gather_rows(prob.dof_mask, prob.obs_pose)        # (L, K, 6)
            J_pose_m = J_pose * dofg[..., None, :]
            wr = w[..., None] * row_mask                             # (L, K, 3)
            Jw_pose = J_pose_m * wr[..., None]
            Jw_point = J_point * wr[..., None]

            onehot = _pose_onehot(prob.obs_pose, P)                  # (L, K, P)
            # pose blocks: contract (l, k) on the MXU
            JJ = jnp.einsum("lkri,lkrj->lkij", Jw_pose, J_pose_m)
            Hpp = ps(jnp.einsum("lkp,lkij->pij", onehot, JJ))        # (P, 6, 6)
            Jr = jnp.einsum("lkri,lkr->lki", Jw_pose, res)
            bp = ps(jnp.einsum("lkp,lki->pi", onehot, Jr))           # (P, 6)
            # point blocks: dense per-row reductions
            Hll = jnp.einsum("lkri,lkrj->lij", Jw_point, J_point)    # (L, 3, 3)
            bl = jnp.einsum("lkri,lkr->li", Jw_point, res)           # (L, 3)
            # coupling: one-hot over the pose axis, contract k
            G = jnp.einsum("lkri,lkrj->lkij", Jw_pose, J_point)      # (L, K, 6, 3)
            U = jnp.einsum("lkp,lkij->lpij", onehot, G)              # (L, P, 6, 3)

            # damp + invert point blocks (marginalization)
            Hll_d = Hll + (lam * jnp.eye(3)[None] * jnp.maximum(
                jnp.diagonal(Hll, axis1=1, axis2=2), 1e-6
            )[:, :, None] * jnp.eye(3)[None])
            Hll_d = Hll_d + 1e-9 * jnp.eye(3)[None]
            Hll_inv = _inv3x3(Hll_d)
            Hll_inv = jnp.where(
                prob.point_valid[:, None, None], Hll_inv, jnp.zeros_like(Hll_inv)
            )

            # motion priors: pose-pose factors straight into the reduced
            # system (diag blocks into Hpp so damping sees them)
            if priors is not None:
                pr, Ji, Jj, pw = _prior_terms(poses, priors, P)
                dof_i = _gather_rows(prob.dof_mask, priors.idx[:, 0])
                dof_j = _gather_rows(prob.dof_mask, priors.idx[:, 1])
                Ji = Ji * dof_i[:, None, :]
                Jj = Jj * dof_j[:, None, :]
                Jiw = Ji * pw[:, None, None]
                Jjw = Jj * pw[:, None, None]
                ii, jj = priors.idx[:, 0], priors.idx[:, 1]
                Hpp = Hpp.at[ii].add(jnp.einsum("rki,rkj->rij", Jiw, Ji))
                Hpp = Hpp.at[jj].add(jnp.einsum("rki,rkj->rij", Jjw, Jj))
                bp = bp.at[ii].add(jnp.einsum("rki,rk->ri", Jiw, pr))
                bp = bp.at[jj].add(jnp.einsum("rki,rk->ri", Jjw, pr))
                H_ij = jnp.einsum("rki,rkj->rij", Jiw, Jj)           # (R, 6, 6)

            # reduced camera system
            W2 = jnp.einsum("lpij,ljk->lpik", U, Hll_inv)            # (L, P, 6, 3)
            S_cross = ps(jnp.einsum("laik,lbjk->abij", W2, U))       # (P, P, 6, 6)
            Hpp_d = Hpp + lam * jnp.eye(6)[None] * jnp.maximum(
                jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6
            )[:, :, None] * jnp.eye(6)[None]
            S = -S_cross
            S = S.at[jnp.arange(P), jnp.arange(P)].add(Hpp_d)
            b_red = bp - ps(jnp.einsum("lpij,lj->pi", W2, bl))       # (P, 6)
            if priors is not None:
                S = S.at[ii, jj].add(H_ij)
                S = S.at[jj, ii].add(jnp.swapaxes(H_ij, -1, -2))

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
            rhs = bl + jnp.einsum("lpij,pi->lj", U, dx_p)
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

    active = prob.obs_valid
    poses, points = prob.poses, prob.points
    cost = jnp.float32(0.0)
    for iters, robust in zip(stage_iters, use_huber_stages):
        poses, points, cost = lm_iterations(poses, points, active, iters, robust)
        # outlier pass (reference drops chi2 > gate or depth<=0 between stages)
        res, behind = _residuals_only(poses, points, prob, fx, fy, cx, cy, bf)
        chi2 = _chi2(res, prob.obs_stereo, prob.obs_inv_sigma2)
        gate = jnp.where(prob.obs_stereo, CHI2_STEREO, CHI2_MONO)
        active = prob.obs_valid & (chi2 <= gate) & ~behind

    return BAResult(poses=poses, points=points, obs_inlier=active, cost=cost)
