"""Distributed CG pose graph vs the dense single-chip solver."""

import numpy as np
import jax.numpy as jnp

from pointslot_tpu.parallel.dist_pg import distributed_pose_graph
from pointslot_tpu.parallel.mesh import make_mesh
from pointslot_tpu.solvers import posegraph


def test_distributed_pg_matches_dense(rng):
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from test_loop_components import make_loop_problem

    prob, poses_true, poses_noisy = make_loop_problem(rng, K=16)
    # pad edges to a multiple of 8 devices
    E = len(np.asarray(prob.e_i))
    pad = (-E) % 8
    if pad:
        prob = posegraph.PoseGraphProblem(
            poses=prob.poses, fixed=prob.fixed, valid=prob.valid,
            e_i=jnp.concatenate([prob.e_i, jnp.zeros(pad, jnp.int32)]),
            e_j=jnp.concatenate([prob.e_j, jnp.zeros(pad, jnp.int32)]),
            e_meas=jnp.concatenate(
                [prob.e_meas, jnp.tile(jnp.eye(4, dtype=jnp.float32), (pad, 1, 1))]
            ),
            e_weight=jnp.concatenate([prob.e_weight, jnp.zeros(pad)]),
            e_valid=jnp.concatenate([prob.e_valid, jnp.zeros(pad, bool)]),
        )

    mesh = make_mesh(8)
    out_dist = np.asarray(distributed_pose_graph(prob, mesh, n_gn_iters=15,
                                                 n_cg_iters=50))
    out_dense = np.asarray(posegraph.optimize_pose_graph(prob, n_iters=15))

    def cost(poses):
        from pointslot_tpu.geometry import se3

        total = 0.0
        for k in range(len(np.asarray(prob.e_i))):
            if not bool(prob.e_valid[k]):
                continue
            Ti = poses[int(prob.e_i[k])]
            Tj = poses[int(prob.e_j[k])]
            M = np.asarray(prob.e_meas[k])
            r = np.asarray(se3.se3_log(
                jnp.asarray(np.linalg.solve(M @ Tj, Ti), jnp.float32)))
            total += float(prob.e_weight[k]) * float(np.sum(r ** 2))
        return total

    c_noisy = cost(np.asarray(prob.poses))
    c_dist = cost(out_dist)
    c_dense = cost(out_dense)
    assert c_dist < c_noisy * 0.1
    assert c_dist < c_dense * 3.0 + 1e-4, f"{c_dist=} {c_dense=}"
