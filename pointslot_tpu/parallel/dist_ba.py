"""Distributed bundle adjustment: edge-sharded Schur reduction over psum.

The net-new multi-chip design (nothing to port — the reference is
single-process): observations (edges) are sharded across the whole mesh;
every device accumulates partial pose/point Hessian blocks and coupling
terms from its local edge shard; one ``psum`` over both mesh axes combines
them; the (small) reduced camera system is then solved identically on every
device. This is the standard data-parallel Gauss-Newton with an explicit
Schur complement — collectives ride ICI, host stays out of the loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pointslot_tpu.geometry import se3
from pointslot_tpu.solvers.local_ba import BAProblem, _edge_residuals, _inv3x3


def distributed_bundle_adjust(
    prob: BAProblem,
    mesh,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    n_iters: int = 10,
    damping: float = 1e-4,
):
    """Gauss-Newton with fixed damping; edges sharded over all mesh axes.

    The edge arrays' leading dim must be divisible by the total device count.
    Returns (poses, points) like the single-chip engine.
    """
    axes = tuple(mesh.axis_names)
    Pn = prob.poses.shape[0]
    L = prob.points.shape[0]

    edge_spec = P(axes)          # shard leading edge axis over all devices
    rep = P()                    # replicated

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep,
                  edge_spec, edge_spec, edge_spec, edge_spec, edge_spec, edge_spec),
        out_specs=(rep, rep),
        check_vma=False,
    )
    def solve(poses, pose_fixed, pose_valid, dof_mask, points, point_valid,
              e_pose, e_point, e_obs, e_stereo, e_inv_sigma2, e_valid):
        local = BAProblem(
            poses=poses, pose_fixed=pose_fixed, pose_valid=pose_valid,
            dof_mask=dof_mask, points=points, point_valid=point_valid,
            e_pose=e_pose, e_point=e_point, e_obs=e_obs, e_stereo=e_stereo,
            e_inv_sigma2=e_inv_sigma2, e_valid=e_valid,
        )

        def gn_iter(_, carry):
            poses, points = carry
            res, J_pose, J_point, behind = _edge_residuals(
                poses, points, local, fx, fy, cx, cy, bf
            )
            ok = e_valid & ~behind
            w = jnp.where(ok, e_inv_sigma2, 0.0)
            row_mask = jnp.stack(
                [jnp.ones_like(w), jnp.ones_like(w), e_stereo.astype(w.dtype)],
                axis=-1,
            )
            J_pose_m = J_pose * dof_mask[e_pose][:, None, :]
            Jw_pose = J_pose_m * (w[:, None, None] * row_mask[:, :, None])
            Jw_point = J_point * (w[:, None, None] * row_mask[:, :, None])

            # local partials -> global via psum over the whole mesh
            Hpp = jax.ops.segment_sum(
                jnp.einsum("eij,eik->ejk", Jw_pose, J_pose_m), e_pose, Pn
            )
            Hll = jax.ops.segment_sum(
                jnp.einsum("eij,eik->ejk", Jw_point, J_point), e_point, L
            )
            bp = jax.ops.segment_sum(jnp.einsum("eij,ei->ej", Jw_pose, res), e_pose, Pn)
            bl = jax.ops.segment_sum(jnp.einsum("eij,ei->ej", Jw_point, res), e_point, L)
            Wc = jnp.zeros((Pn, L, 6, 3), res.dtype).at[e_pose, e_point].add(
                jnp.einsum("eij,eik->ejk", Jw_pose, J_point)
            )
            for ax in axes:
                Hpp = jax.lax.psum(Hpp, ax)
                Hll = jax.lax.psum(Hll, ax)
                bp = jax.lax.psum(bp, ax)
                bl = jax.lax.psum(bl, ax)
                Wc = jax.lax.psum(Wc, ax)

            # replicated Schur solve (identical on every device)
            Hll_d = Hll + damping * jnp.eye(3)[None] + 1e-9 * jnp.eye(3)[None]
            Hll_inv = _inv3x3(Hll_d)
            Hll_inv = jnp.where(point_valid[:, None, None], Hll_inv, 0.0)
            W2 = jnp.einsum("plij,ljk->plik", Wc, Hll_inv)
            S = -jnp.einsum("alik,bljk->abij", W2, Wc)
            Hpp_d = Hpp + damping * jnp.eye(6)[None]
            S = S.at[jnp.arange(Pn), jnp.arange(Pn)].add(Hpp_d)
            b_red = bp - jnp.einsum("plij,lj->pi", W2, bl)

            free = (pose_valid & ~pose_fixed)[:, None].repeat(6, 1).reshape(-1) & (
                dof_mask.reshape(-1) > 0.5
            )
            S_flat = S.transpose(0, 2, 1, 3).reshape(6 * Pn, 6 * Pn)
            S_flat = jnp.where(free[:, None] & free[None, :], S_flat, 0.0)
            S_flat = S_flat + jnp.diag(jnp.where(free, 0.0, 1.0) + 1e-9)
            b_flat = jnp.where(free, b_red.reshape(-1), 0.0)
            dx_p = -jnp.linalg.solve(S_flat, b_flat).reshape(Pn, 6) * dof_mask

            rhs = bl + jnp.einsum("plij,pi->lj", Wc, dx_p)
            dx_l = -jnp.einsum("lij,lj->li", Hll_inv, rhs)

            poses_new = jax.vmap(se3.se3_retract)(poses, dx_p)
            poses_new = jnp.where(
                (pose_fixed | ~pose_valid)[:, None, None], poses, poses_new
            )
            points_new = jnp.where(point_valid[:, None], points + dx_l, points)
            return poses_new, points_new

        return jax.lax.fori_loop(0, n_iters, gn_iter, (poses, points))

    return solve(
        prob.poses, prob.pose_fixed, prob.pose_valid, prob.dof_mask,
        prob.points, prob.point_valid,
        prob.e_pose, prob.e_point, prob.e_obs, prob.e_stereo,
        prob.e_inv_sigma2, prob.e_valid,
    )
