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
    """Distributed LM must reduce reprojection cost like the local engine."""
    from pointslot_tpu.parallel.dist_ba import distributed_bundle_adjust
    from pointslot_tpu.parallel.step import make_example_inputs
    from pointslot_tpu.solvers.local_ba import _residuals_only, _chi2

    mesh = make_mesh(8)
    _, _, _, _, prob = make_example_inputs(mesh, 96, 128)
    cam = dict(fx=160.0, fy=160.0, cx=64.0, cy=48.0, bf=16.0)

    # perturb poses and points
    poses = np.asarray(prob.poses).copy()
    poses[1:, :3, 3] += rng.normal(scale=0.05, size=(poses.shape[0] - 1, 3))
    points = np.asarray(prob.points) + rng.normal(scale=0.05, size=prob.points.shape).astype(np.float32)
    prob_pert = prob._replace(poses=jnp.asarray(poses), points=jnp.asarray(points))

    def cost(p):
        res, behind = _residuals_only(p.poses, p.points, p, **cam)
        chi2 = _chi2(res, p.obs_stereo, p.obs_inv_sigma2)
        return float(jnp.sum(jnp.where(p.obs_valid & ~behind, chi2, 0.0)))

    c0 = cost(prob_pert)
    result = distributed_bundle_adjust(
        prob_pert, mesh, **cam, stage_iters=(10,), use_huber_stages=(False,)
    )
    c1 = cost(prob_pert._replace(poses=result.poses, points=result.points))
    assert c1 < c0 * 1e-2, f"cost {c0} -> {c1}"


def test_distributed_ba_equivalent_to_local(rng):
    """The distributed solve IS the single-chip engine inside shard_map
    (same Huber staging, LM accept/reject, outlier gates) — on the same
    BAProblem the two must agree to reduction-order tolerance
    (VERDICT r1 item 2; reference protocol src/Optimizer.cc:996-1035)."""
    from pointslot_tpu.parallel.dist_ba import distributed_bundle_adjust
    from pointslot_tpu.parallel.step import make_example_inputs
    from pointslot_tpu.solvers.local_ba import bundle_adjust

    mesh = make_mesh(8)
    _, _, _, _, prob = make_example_inputs(mesh, 96, 128)
    cam = dict(fx=160.0, fy=160.0, cx=64.0, cy=48.0, bf=16.0)

    poses = np.asarray(prob.poses).copy()
    poses[1:, :3, 3] += rng.normal(scale=0.05, size=(poses.shape[0] - 1, 3))
    points = np.asarray(prob.points) + rng.normal(
        scale=0.05, size=prob.points.shape
    ).astype(np.float32)
    # corrupt a few observations so the Huber stages + outlier gates are
    # actually exercised by the equivalence check
    uvr = np.asarray(prob.obs_uvr).copy()
    valid = np.asarray(prob.obs_valid)
    ls, ks = np.nonzero(valid)
    sel = rng.choice(len(ls), max(len(ls) // 20, 1), replace=False)
    uvr[ls[sel], ks[sel], :2] += rng.uniform(30, 60, size=(len(sel), 2))
    prob_pert = prob._replace(
        poses=jnp.asarray(poses), points=jnp.asarray(points),
        obs_uvr=jnp.asarray(uvr),
    )

    local = bundle_adjust(prob_pert, **cam)
    dist = distributed_bundle_adjust(prob_pert, mesh, **cam)

    pose_diff = np.abs(np.asarray(local.poses) - np.asarray(dist.poses)).max()
    assert pose_diff < 1e-3, f"pose divergence {pose_diff}"
    pv = np.asarray(prob.point_valid)
    pt_diff = np.abs(
        np.asarray(local.points)[pv] - np.asarray(dist.points)[pv]
    ).max()
    assert pt_diff < 5e-3, f"point divergence {pt_diff}"
    inl_l = np.asarray(local.obs_inlier)[valid]
    inl_d = np.asarray(dist.obs_inlier)[valid]
    assert (inl_l == inl_d).mean() > 0.99, "inlier sets diverged"


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
