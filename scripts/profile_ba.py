"""Ablation profile of ONE windowed-BA LM iteration (solvers/local_ba.py).

ba_lm_iter is ~100x off speed-of-light and flat across rounds; this
script times fused PREFIXES of the iteration body at the bench caps
(P=32, L=4096, K=8) so successive deltas localize the cost:

  resjac    — gather poses + residuals + pose/point Jacobians
  blocks    — + Hpp/bp (pose blocks) and Hll/bl (point blocks)
  coupling  — + the dense (L, P, 6, 3) U tensor
  schur     — + point-block inverses, W2, S_cross (P, P, 6, 6), assembly
  solve     — + the (6P, 6P) dense solve
  full_iter — + back-substitution, retract, cost re-evaluation

Usage: python scripts/profile_ba.py [P L K]

Round-5 findings from this profile (measured on the chip, chained
protocol — see ROUND_NOTES):
- the honest per-iteration cost of the shipped solver is ~2.0 ms, not
  the ~3.7 ms bench.py reported through round 4 (the unchained
  block_until_ready loop folded a fixed ~25 ms tunnel roundtrip into
  every solve; bench now uses the chained protocol);
- a full lane-major rewrite of the body (edge lanes + component planes +
  one-matmul reductions, mirroring pose_opt) measured FASTER standalone
  (1.54 vs 2.02 ms/iter prefix) but 2.5x SLOWER inside the fori_loop
  (58 vs 31 ms per 15-iter solve), numerically identical — XLA's loop
  layout assignment penalizes that form. The rewrite was reverted;
  negative result kept here so it is not re-attempted blind.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_problem(P, L, K):
    import numpy as np

    from pointslot_tpu.solvers import local_ba

    FX, FY, CX, CY, BF = 721.5, 721.5, 609.6, 172.9, 384.4
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    poses[:, 2, 3] = -0.6 * np.arange(P)
    pts = rng.uniform([-15, -4, 4], [15, 4, 60], size=(L, 3)).astype(np.float32)
    e_pose = np.repeat(np.arange(L) % (P - 3), 4) % P
    e_pose = (e_pose + np.tile(np.arange(4), L)).astype(np.int64) % P
    e_point = np.repeat(np.arange(L), 4)
    T = poses[e_pose]
    pc = np.einsum("eij,ej->ei", T[:, :3, :3], pts[e_point]) + T[:, :3, 3]
    keep = pc[:, 2] > 0.5
    e_pose, e_point, pc = e_pose[keep], e_point[keep], pc[keep]
    u = FX * pc[:, 0] / pc[:, 2] + CX + rng.normal(size=len(pc)) * 0.3
    v = FY * pc[:, 1] / pc[:, 2] + CY + rng.normal(size=len(pc)) * 0.3
    e_obs = np.stack([u, v, u - BF / pc[:, 2]], axis=1).astype(np.float32)
    prob, _ = local_ba.build_problem(
        poses=poses, pose_fixed=[True] + [False] * (P - 1), points=pts,
        e_pose=e_pose, e_point=e_point, e_obs=e_obs,
        e_stereo=np.ones(len(e_pose), bool),
        e_inv_sigma2=np.ones(len(e_pose), np.float32),
        P_cap=P, L_cap=L, K=K,
    )
    cam = dict(fx=FX, fy=FY, cx=CX, cy=CY, bf=BF)
    return prob, cam


def main():
    from pointslot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from pointslot_tpu.geometry import se3
    from pointslot_tpu.solvers import local_ba as lb
    from pointslot_tpu.utils.stagebench import timeit_ms

    args = [int(a) for a in sys.argv[1:4]]
    P, L, K = (args + [32, 4096, 8])[:3] if args else (32, 4096, 8)
    prob, cam = build_problem(P, L, K)
    delta2 = jnp.where(prob.obs_stereo, jnp.float32(lb.CHI2_STEREO),
                       jnp.float32(lb.CHI2_MONO))
    lam = jnp.float32(1e-4)

    def body(poses, points, upto):
        acc = jnp.float32(0)
        res, J_pose, J_point, behind = lb._residuals_jac(
            poses, points, prob, **cam)
        if upto == 0:
            return acc + jnp.sum(res) + jnp.sum(J_pose) + jnp.sum(J_point)
        ok = prob.obs_valid & ~behind
        chi2 = lb._chi2(res, prob.obs_stereo, prob.obs_inv_sigma2)
        r_norm2 = jnp.maximum(chi2, 1e-12)
        huber_w = jnp.where(r_norm2 > delta2, jnp.sqrt(delta2 / r_norm2), 1.0)
        w = jnp.where(ok, prob.obs_inv_sigma2 * huber_w, 0.0)
        row_mask = jnp.stack(
            [jnp.ones_like(w), jnp.ones_like(w),
             prob.obs_stereo.astype(w.dtype)], axis=-1)
        dofg = lb._gather_rows(prob.dof_mask, prob.obs_pose)
        J_pose_m = J_pose * dofg[..., None, :]
        wr = w[..., None] * row_mask
        Jw_pose = J_pose_m * wr[..., None]
        Jw_point = J_point * wr[..., None]
        onehot = lb._pose_onehot(prob.obs_pose, P)
        JJ = jnp.einsum("lkri,lkrj->lkij", Jw_pose, J_pose_m)
        Hpp = jnp.einsum("lkp,lkij->pij", onehot, JJ)
        Jr = jnp.einsum("lkri,lkr->lki", Jw_pose, res)
        bp = jnp.einsum("lkp,lki->pi", onehot, Jr)
        Hll = jnp.einsum("lkri,lkrj->lij", Jw_point, J_point)
        bl = jnp.einsum("lkri,lkr->li", Jw_point, res)
        if upto == 1:
            return (acc + jnp.sum(Hpp) + jnp.sum(bp) + jnp.sum(Hll)
                    + jnp.sum(bl))
        G = jnp.einsum("lkri,lkrj->lkij", Jw_pose, J_point)
        U = jnp.einsum("lkp,lkij->lpij", onehot, G)
        if upto == 2:
            return acc + jnp.sum(U) + jnp.sum(Hpp) + jnp.sum(bp) + jnp.sum(bl)
        Hll_d = Hll + (lam * jnp.eye(3)[None] * jnp.maximum(
            jnp.diagonal(Hll, axis1=1, axis2=2), 1e-6
        )[:, :, None] * jnp.eye(3)[None])
        Hll_d = Hll_d + 1e-9 * jnp.eye(3)[None]
        Hll_inv = lb._inv3x3(Hll_d)
        Hll_inv = jnp.where(prob.point_valid[:, None, None], Hll_inv,
                            jnp.zeros_like(Hll_inv))
        W2 = jnp.einsum("lpij,ljk->lpik", U, Hll_inv)
        S_cross = jnp.einsum("laik,lbjk->abij", W2, U)
        Hpp_d = Hpp + lam * jnp.eye(6)[None] * jnp.maximum(
            jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-6
        )[:, :, None] * jnp.eye(6)[None]
        S = -S_cross
        S = S.at[jnp.arange(P), jnp.arange(P)].add(Hpp_d)
        b_red = bp - jnp.einsum("lpij,lj->pi", W2, bl)
        free = (
            prob.pose_valid & ~prob.pose_fixed
        )[:, None].repeat(6, 1).reshape(-1) & (prob.dof_mask.reshape(-1) > 0.5)
        S_flat = S.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)
        S_flat = jnp.where(free[:, None] & free[None, :], S_flat, 0.0)
        S_flat = S_flat + jnp.diag(jnp.where(free, 0.0, 1.0) + 1e-9)
        b_flat = jnp.where(free, b_red.reshape(-1), 0.0)
        if upto == 3:
            return acc + jnp.sum(S_flat) + jnp.sum(b_flat)
        dx_p = -jnp.linalg.solve(S_flat, b_flat).reshape(P, 6)
        dx_p = dx_p * prob.dof_mask
        if upto == 4:
            return acc + jnp.sum(dx_p)
        rhs = bl + jnp.einsum("lpij,pi->lj", U, dx_p)
        dx_l = -jnp.einsum("lij,lj->li", Hll_inv, rhs)
        poses_new = jax.vmap(se3.se3_retract)(poses, dx_p)
        points_new = points + dx_l
        res2, behind2 = lb._residuals_only(poses_new, points_new, prob, **cam)
        chi2n = lb._chi2(res2, prob.obs_stereo, prob.obs_inv_sigma2)
        cost = jnp.sum(jnp.where(prob.obs_valid & ~behind2,
                                 lb._robust_cost(chi2n, delta2), 0.0))
        return acc + cost + jnp.sum(poses_new)

    names = ["resjac", "blocks", "coupling", "schur", "solve", "full_iter"]
    absolute = {}
    for i, name in enumerate(names):
        absolute[name] = timeit_ms(
            lambda ps, pt, i=i: body(ps, pt, i),
            prob.poses, prob.points, n=20)
    out = {names[0]: absolute[names[0]]}
    for a, b in zip(names, names[1:]):
        out[b] = absolute[b] - absolute[a]
    print(json.dumps({"P": P, "L": L, "K": K,
                      "marginal_ms": {k: round(v, 4) for k, v in out.items()},
                      "absolute_ms": {k: round(v, 4) for k, v in
                                      absolute.items()}}, indent=1))


if __name__ == "__main__":
    main()
