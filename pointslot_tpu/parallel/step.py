"""The multi-chip SLOT step: every parallel axis exercised in ONE jit.

Composes the three distributed phases of the per-frame pipeline over a
('dp', 'ep') mesh:

1. frame-parallel stereo frontend — batches of stereo pairs sharded over
   ``dp`` (replicated over ``ep``); the reference's fork-join extraction
   threads (src/Frame.cc:539-545) become sharded batch work;
2. object-parallel pose optimization — the per-object LM solves sharded
   over ``ep`` (the reference loops objects serially,
   src/Tracking.cc:2288-2466);
3. distributed bundle adjustment — edges sharded over BOTH axes flattened
   (the keyframe/observation axis is the sequence-parallel analog), partial
   Hessian blocks combined by psum (parallel/dist_ba.py).

This function is what `__graft_entry__.dryrun_multichip` compiles and runs
on a virtual device mesh, and what a pod-slice deployment jits for real.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pointslot_tpu.config import ORBConfig
from pointslot_tpu.ops.frontend import StereoFrontend
from pointslot_tpu.parallel.dist_ba import distributed_bundle_adjust
from pointslot_tpu.solvers.local_ba import BAProblem
from pointslot_tpu.solvers import pose_opt


class DistributedSlotStep:
    """Builds a jitted multi-device step at fixed geometry/capacities."""

    def __init__(self, mesh, height, width, fx=160.0, fy=160.0, cx=None, cy=None,
                 bf=16.0, orb_config: ORBConfig = None):
        self.mesh = mesh
        self.cam = dict(
            fx=float(fx), fy=float(fy),
            cx=float(cx if cx is not None else width / 2),
            cy=float(cy if cy is not None else height / 2),
            bf=float(bf),
        )
        cfg = orb_config or ORBConfig(n_features=128, n_levels=2)
        self.frontend = StereoFrontend(
            height, width, self.cam["fx"], self.cam["bf"], cfg
        )
        self._step = jax.jit(self._step_impl)

    # ------------------------------------------------------------------
    def _step_impl(self, lefts, rights, obj_T_init, obj_edges: pose_opt.PoseObs,
                   ba_prob: BAProblem):
        mesh = self.mesh
        cam = self.cam

        # ---- phase 1: dp frontend ------------------------------------
        batched_frontend = jax.vmap(lambda l, r: self.frontend._run_impl(l, r))
        fe = shard_map(
            batched_frontend,
            mesh=mesh,
            in_specs=(P("dp"), P("dp")),
            out_specs=P("dp"),
            check_vma=False,
        )
        frames = fe(lefts, rights)

        # ---- phase 2: ep object pose solves --------------------------
        def solve_objects(T0, edges):
            return pose_opt.pose_optimize_batched(
                T0, edges, **cam, stages=2, iters_per_stage=5
            )

        obj = shard_map(
            solve_objects,
            mesh=mesh,
            in_specs=(P("ep"), P("ep")),
            out_specs=P("ep"),
            check_vma=False,
        )(obj_T_init, obj_edges)

        # ---- phase 3: distributed Schur BA over dp x ep --------------
        ba_res = distributed_bundle_adjust(
            ba_prob, mesh, **cam, stage_iters=(3,), use_huber_stages=(False,)
        )
        return frames, obj, (ba_res.poses, ba_res.points)

    def __call__(self, lefts, rights, obj_T_init, obj_edges, ba_prob):
        return self._step(lefts, rights, obj_T_init, obj_edges, ba_prob)


def make_example_inputs(mesh, height, width, n_frames=None, n_objects=None,
                        P_cap=4, L_cap=64, E_cap=None, seed=0):
    """Tiny well-posed example inputs sized to the mesh (shapes divisible by
    the relevant axis sizes)."""
    import numpy as np

    dp = mesh.shape["dp"]
    ep = mesh.shape["ep"]
    n_dev = dp * ep
    B = n_frames or dp
    O = n_objects or ep
    E_cap = E_cap or (64 * n_dev)
    rng = np.random.default_rng(seed)

    lefts = rng.uniform(0, 255, size=(B, height, width)).astype(np.float32)
    rights = np.roll(lefts, -3, axis=2)  # uniform disparity stand-in

    # object pose problems: identity init, points in front, exact obs
    fx, fy = 160.0, 160.0
    cx, cy, bf = width / 2, height / 2, 16.0
    M = 32
    pts = np.stack(
        [rng.uniform(-2, 2, (O, M)), rng.uniform(-2, 2, (O, M)),
         rng.uniform(4, 10, (O, M))], axis=-1
    ).astype(np.float32)
    z = pts[..., 2]
    obs = np.stack(
        [fx * pts[..., 0] / z + cx, fy * pts[..., 1] / z + cy,
         fx * pts[..., 0] / z + cx - bf / z], axis=-1
    ).astype(np.float32)
    obj_edges = pose_opt.PoseObs(
        pts=jnp.asarray(pts),
        obs=jnp.asarray(obs),
        is_stereo=jnp.ones((O, M), bool),
        inv_sigma2=jnp.ones((O, M), jnp.float32),
        valid=jnp.ones((O, M), bool),
    )
    obj_T = jnp.tile(jnp.eye(4, dtype=jnp.float32), (O, 1, 1))

    # BA problem: P_cap poses, L_cap points (flat edges packed point-major)
    from pointslot_tpu.solvers.local_ba import build_problem

    poses = np.tile(np.eye(4, dtype=np.float32), (P_cap, 1, 1))
    for i in range(P_cap):
        poses[i, 2, 3] = -0.5 * i
    points = np.stack(
        [rng.uniform(-3, 3, L_cap), rng.uniform(-2, 2, L_cap),
         rng.uniform(5, 12, L_cap)], axis=1
    ).astype(np.float32)
    e_pose = rng.integers(0, P_cap, E_cap).astype(np.int32)
    e_point = rng.integers(0, L_cap, E_cap).astype(np.int32)
    pc = np.einsum("eij,ej->ei", poses[e_pose, :3, :3], points[e_point]) + poses[
        e_pose, :3, 3
    ]
    z = np.maximum(pc[:, 2], 1e-3)
    e_obs = np.stack(
        [fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy,
         fx * pc[:, 0] / z + cx - bf / z], axis=1
    ).astype(np.float32)
    sel = z > 0.5
    ba_prob, _ = build_problem(
        poses=poses, pose_fixed=np.arange(P_cap) == 0, points=points,
        e_pose=e_pose[sel], e_point=e_point[sel], e_obs=e_obs[sel],
        e_stereo=np.ones(sel.sum(), bool),
        e_inv_sigma2=np.ones(sel.sum(), np.float32),
        P_cap=P_cap, L_cap=L_cap, K=max(8, E_cap // L_cap * 2),
    )
    return lefts, rights, obj_T, obj_edges, ba_prob
