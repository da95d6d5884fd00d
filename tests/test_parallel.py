"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointslot_tpu.parallel.mesh import make_mesh


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["ep"] == 8


def test_distributed_ba_matches_problem(rng):
    """Distributed GN must reduce reprojection error like the local engine."""
    from pointslot_tpu.parallel.dist_ba import distributed_bundle_adjust
    from pointslot_tpu.parallel.step import make_example_inputs
    from pointslot_tpu.solvers.local_ba import _edge_residuals, _edge_chi2

    mesh = make_mesh(8)
    _, _, _, _, prob = make_example_inputs(mesh, 96, 128)
    cam = dict(fx=160.0, fy=160.0, cx=64.0, cy=48.0, bf=16.0)

    # perturb poses and points
    poses = np.asarray(prob.poses).copy()
    poses[1:, :3, 3] += rng.normal(scale=0.05, size=(poses.shape[0] - 1, 3))
    points = np.asarray(prob.points) + rng.normal(scale=0.05, size=prob.points.shape).astype(np.float32)
    prob_pert = prob._replace(poses=jnp.asarray(poses), points=jnp.asarray(points))

    def cost(p):
        res, _, _, behind = _edge_residuals(p.poses, p.points, p, **cam)
        chi2 = _edge_chi2(res, p.e_stereo, p.e_inv_sigma2)
        return float(jnp.sum(jnp.where(p.e_valid & ~behind, chi2, 0.0)))

    c0 = cost(prob_pert)
    new_poses, new_points = distributed_bundle_adjust(prob_pert, mesh, **cam, n_iters=10)
    c1 = cost(prob_pert._replace(poses=new_poses, points=new_points))
    assert c1 < c0 * 1e-2, f"cost {c0} -> {c1}"


def test_dryrun_multichip_entrypoint():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
