"""Distributed bundle adjustment: point-sharded Schur reduction over psum.

The net-new multi-chip design (nothing to port — the reference is
single-process): the point axis (L) of the point-major BA problem is
sharded over the whole mesh. Each device assembles the Hessian blocks of
its own points and back-substitutes them locally; only the pose-coupled
reductions — Hpp, bp, the (P, P, 6, 6) Schur cross term and the reduced
rhs — plus the LM cost check cross devices, as psums riding ICI. The
(small) reduced camera system is then solved identically on every device.

Semantics are identical to the single-chip engine because it IS the
single-chip engine: ``solvers.local_ba.bundle_adjust`` runs inside
shard_map with ``axis_name`` set — same Huber staging, same LM
accept/reject, same between-stage outlier gates (tests/test_parallel.py
asserts pose-level equivalence).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pointslot_tpu.solvers.local_ba import BAProblem, BAResult, bundle_adjust

_AXIS = "ba_shard"


def distributed_bundle_adjust(
    prob: BAProblem,
    mesh,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    stage_iters: tuple = (5, 10),
    use_huber_stages: tuple = (True, False),
) -> BAResult:
    """The full two-stage LM Schur solve, point-sharded over every device
    of ``mesh``. L must be divisible by the total device count (callers pad
    to power-of-two caps). Returns the same BAResult as the local engine
    (points and obs_inlier are gathered back to full size).
    """
    axes = tuple(mesh.axis_names)
    # point axis sharded over all mesh axes flattened; pose tables replicated
    lspec = P(axes)
    rep = P()
    in_specs = BAProblem(
        poses=rep, pose_fixed=rep, pose_valid=rep, dof_mask=rep,
        points=lspec, point_valid=lspec,
        obs_pose=lspec, obs_uvr=lspec, obs_stereo=lspec,
        obs_inv_sigma2=lspec, obs_valid=lspec,
    )
    out_specs = BAResult(poses=rep, points=lspec, obs_inlier=lspec, cost=rep)

    @jax.jit
    @partial(
        shard_map, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False,
    )
    def solve(local: BAProblem) -> BAResult:
        return bundle_adjust(
            local, fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
            stage_iters=stage_iters, use_huber_stages=use_huber_stages,
            axis_name=axes,
        )

    return solve(prob)
