import numpy as np
import jax.numpy as jnp

from pointslot_tpu.geometry import se3
from pointslot_tpu.solvers import local_ba

FX, FY, CX, CY, BF = 721.5, 721.5, 609.6, 172.9, 384.4


def make_problem(rng, n_poses=6, n_points=300, pose_noise=0.02, point_noise=0.05,
                 obs_noise=0.2, P_cap=8, L_cap=512, K=8,
                 freeze_first=True, dof_mask=None, corrupt_frac=0.0):
    # ground truth: camera moves forward, points in front
    poses_true = []
    T = np.eye(4)
    for i in range(n_poses):
        poses_true.append(T.copy())
        step = np.asarray(se3.se3_exp(jnp.asarray(
            [0.02 * rng.normal(), 0.02 * rng.normal(), -1.0, 0, 0.01 * rng.normal(), 0],
            jnp.float32)))
        T = step @ T
    pts_true = np.stack(
        [rng.uniform(-10, 10, n_points), rng.uniform(-3, 2, n_points),
         rng.uniform(5, 30 + n_poses, n_points)], axis=1).astype(np.float32)

    e_pose, e_point, e_obs, e_stereo = [], [], [], []
    for p, Tcw in enumerate(poses_true):
        pc = (Tcw[:3, :3] @ pts_true.T).T + Tcw[:3, 3]
        z = pc[:, 2]
        u = FX * pc[:, 0] / z + CX
        v = FY * pc[:, 1] / z + CY
        ok = (z > 1) & (u > 0) & (u < 1242) & (v > 0) & (v < 375)
        for l in np.nonzero(ok)[0]:
            obs = np.array([u[l], v[l], u[l] - BF / z[l]])
            obs[:2] += rng.normal(size=2) * obs_noise
            e_pose.append(p); e_point.append(l)
            e_obs.append(obs); e_stereo.append(True)
    E = len(e_pose)
    e_obs = np.stack(e_obs)
    bad = np.asarray([], np.int64)
    if corrupt_frac > 0:
        bad = rng.choice(E, int(E * corrupt_frac), replace=False)
        e_obs[bad, :2] += rng.uniform(20, 60, size=(len(bad), 2))

    # perturbed initial values
    poses_init = []
    for i, Tt in enumerate(poses_true):
        if freeze_first and i == 0:
            poses_init.append(Tt)
        else:
            xi = rng.normal(size=6).astype(np.float32) * pose_noise
            poses_init.append(np.asarray(se3.se3_exp(jnp.asarray(xi))) @ Tt)
    pts_init = pts_true + rng.normal(size=pts_true.shape).astype(np.float32) * point_noise

    prob, slot_edge = local_ba.build_problem(
        poses=np.stack(poses_init).astype(np.float32),
        pose_fixed=[freeze_first] + [False] * (n_poses - 1),
        points=pts_init,
        e_pose=e_pose, e_point=e_point, e_obs=e_obs,
        e_stereo=e_stereo, e_inv_sigma2=np.ones(E, np.float32),
        P_cap=P_cap, L_cap=L_cap, K=K, dof_mask=dof_mask,
    )
    return prob, slot_edge, np.stack(poses_true), pts_true, n_poses, n_points, bad


def pose_rmse(poses_est, poses_true, n):
    errs = []
    for i in range(n):
        dT = np.asarray(poses_est[i]) @ np.linalg.inv(poses_true[i])
        errs.append(np.linalg.norm(np.asarray(se3.se3_log(jnp.asarray(dT, jnp.float32)))))
    return float(np.sqrt(np.mean(np.square(errs))))


def test_build_problem_roundtrip(rng):
    """The point-major packer must keep every edge (below capacity) exactly
    once, on the right point row, with the right payload."""
    prob, slot_edge, _, _, P, L = make_problem(rng)[:6]
    kept = slot_edge[slot_edge >= 0]
    assert len(kept) == len(np.unique(kept))
    # spot-check payload: each filled slot's pose/point matches its edge
    ls, ks = np.nonzero(slot_edge >= 0)
    assert np.asarray(prob.obs_valid)[ls, ks].all()
    assert (~np.asarray(prob.obs_valid)[slot_edge < 0]).all()


def test_ba_converges(rng):
    prob, _, poses_true, pts_true, P, L, _ = make_problem(rng)
    before = pose_rmse(prob.poses, poses_true, P)
    result = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    after = pose_rmse(result.poses, poses_true, P)
    assert after < before * 0.2, f"{before=} {after=}"
    assert after < 2e-3
    pt_err = np.linalg.norm(np.asarray(result.points[:L]) - pts_true, axis=1)
    assert np.median(pt_err) < 0.05


def test_ba_respects_fixed_pose(rng):
    prob, _, poses_true, _, P, _, _ = make_problem(rng)
    result = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    np.testing.assert_array_equal(np.asarray(result.poses[0]), np.asarray(prob.poses[0]))


def test_ba_with_outliers(rng):
    prob, slot_edge, poses_true, pts_true, P, L, bad = make_problem(
        rng, corrupt_frac=0.1)
    result = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    after = pose_rmse(result.poses, poses_true, P)
    assert after < 5e-3, f"{after=}"
    # outliers should be flagged: map slot inliers back to flat edge ids
    inl = np.asarray(result.obs_inlier)
    E = slot_edge.max() + 1
    inl_flat = np.zeros(E, bool)
    sel = slot_edge >= 0
    inl_flat[slot_edge[sel]] = inl[sel]
    packed = np.zeros(E, bool)
    packed[slot_edge[sel]] = True
    bad_in = bad[packed[bad]]
    good_in = np.setdiff1d(np.nonzero(packed)[0], bad)
    assert inl_flat[bad_in].mean() < 0.2
    assert inl_flat[good_in].mean() > 0.9


def test_ba_dof_mask_freezes_rotation(rng):
    dof = np.ones((8, 6), np.float32)
    dof[:, 3] = 0.0  # freeze omega_x (roll-ish) for all poses
    dof[:, 5] = 0.0  # freeze omega_z
    prob, _, poses_true, _, P, _, _ = make_problem(
        rng, dof_mask=dof, pose_noise=0.0, point_noise=0.02)
    result = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    # updates must not introduce roll/pitch relative to init
    for i in range(1, P):
        dT = np.asarray(result.poses[i]) @ np.linalg.inv(np.asarray(prob.poses[i]))
        xi = np.asarray(se3.se3_log(jnp.asarray(dT, jnp.float32)))
        assert abs(xi[3]) < 1e-5 and abs(xi[5]) < 1e-5


def test_distributed_matches_local(rng):
    """The mesh-sharded engine is the SAME solver (Huber stages, LM
    accept/reject, outlier gates): poses must agree with the local solve to
    reduction-order tolerance on an outlier-bearing problem."""
    from pointslot_tpu.parallel.dist_ba import distributed_bundle_adjust
    from pointslot_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    prob, _, poses_true, _, P, L, _ = make_problem(rng, corrupt_frac=0.1)
    local = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    dist = distributed_bundle_adjust(prob, mesh, FX, FY, CX, CY, BF)
    # both engines converge to the same optimum
    np.testing.assert_allclose(
        np.asarray(dist.poses[:P]), np.asarray(local.poses[:P]),
        rtol=1e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(dist.points[:L]), np.asarray(local.points[:L]),
        rtol=1e-2, atol=5e-3,
    )
    # and the distributed result is actually good
    assert pose_rmse(dist.poses, poses_true, P) < 5e-3
    # inlier classification agrees almost everywhere
    agree = (np.asarray(dist.obs_inlier) == np.asarray(local.obs_inlier)).mean()
    assert agree > 0.99


def test_inv3x3_matches_linalg(rng):
    from pointslot_tpu.solvers.local_ba import _inv3x3

    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(3)  # well-conditioned SPD
    got = np.asarray(_inv3x3(jnp.asarray(A)))
    ref = np.linalg.inv(A)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_motion_priors_constrain_unobserved_pose(rng):
    """An observation-less pose in the chain is recovered through SE(3)
    motion priors alone (reference EdgeMotionModel/EdgeSmoothTerm role,
    include/g2o_Object.h:361-405): priors (0->1), (1->2) with the true
    relative motion pull the perturbed middle pose back to GT."""
    poses_true = []
    T = np.eye(4, dtype=np.float32)
    step = np.asarray(se3.se3_exp(jnp.asarray([0.1, 0, -0.8, 0, 0.02, 0],
                                              jnp.float32)))
    for _ in range(3):
        poses_true.append(T.copy())
        T = step @ T
    pts = np.stack([rng.uniform(-8, 8, 200), rng.uniform(-2, 2, 200),
                    rng.uniform(6, 25, 200)], axis=1).astype(np.float32)

    e_pose, e_point, e_obs, e_st = [], [], [], []
    for p in (0, 2):  # middle pose observes NOTHING
        Tcw = poses_true[p]
        pc = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
        z = pc[:, 2]
        u = FX * pc[:, 0] / z + CX
        v = FY * pc[:, 1] / z + CY
        for l in np.nonzero(z > 1)[0]:
            e_pose.append(p); e_point.append(l)
            e_obs.append([u[l], v[l], u[l] - BF / z[l]]); e_st.append(True)

    xi = rng.normal(size=6).astype(np.float32) * 0.1
    poses_init = [poses_true[0],
                  np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses_true[1],
                  poses_true[2]]
    prob, _ = local_ba.build_problem(
        poses=np.stack(poses_init).astype(np.float32),
        pose_fixed=[True, False, True],
        points=pts, e_pose=e_pose, e_point=e_point,
        e_obs=np.asarray(e_obs, np.float32), e_stereo=e_st,
        e_inv_sigma2=np.ones(len(e_pose), np.float32),
        P_cap=4, L_cap=256, K=4,
    )
    T10 = poses_true[1] @ np.linalg.inv(poses_true[0])
    T21 = poses_true[2] @ np.linalg.inv(poses_true[1])
    priors = local_ba.build_motion_priors(
        idx=[[0, 1], [1, 2]], T_rel=np.stack([T10, T21]),
        weight=[100.0, 100.0], R_cap=4,
    )
    # without priors the middle pose has no signal and keeps its perturbation
    r0 = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    err0 = np.linalg.norm(np.asarray(r0.poses[1])[:3, 3] - poses_true[1][:3, 3])
    r1 = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF, priors=priors)
    err1 = np.linalg.norm(np.asarray(r1.poses[1])[:3, 3] - poses_true[1][:3, 3])
    assert err1 < 0.01, (err0, err1)
    assert err1 < err0 * 0.25, (err0, err1)


def test_batched_bundle_adjust_matches_individual(rng):
    """bundle_adjust_batched (vmapped multi-problem solve) reproduces the
    per-problem results exactly."""
    probs = []
    for s in range(3):
        prob = make_problem(
            np.random.default_rng(40 + s), n_poses=4, n_points=120,
            P_cap=4, L_cap=128, K=4,
        )[0]
        probs.append(prob)
    stacked = local_ba.stack_problems(probs)
    batched = local_ba.bundle_adjust_batched(stacked, FX, FY, CX, CY, BF)
    for i, prob in enumerate(probs):
        single = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
        np.testing.assert_allclose(np.asarray(batched.poses[i]),
                                   np.asarray(single.poses), atol=1e-4)
        np.testing.assert_allclose(np.asarray(batched.cost[i]),
                                   np.asarray(single.cost), rtol=1e-4)

    # with priors: fillers (zero weight) leave prior-less problems unchanged
    pri = local_ba.build_motion_priors(
        idx=[[0, 1]], T_rel=np.eye(4)[None], weight=[10.0], R_cap=32)
    pris = local_ba.stack_problems(
        [pri, local_ba.empty_motion_priors(), local_ba.empty_motion_priors()])
    batched_p = local_ba.bundle_adjust_batched(
        stacked, FX, FY, CX, CY, BF, priors=pris)
    single_1 = local_ba.bundle_adjust(probs[1], FX, FY, CX, CY, BF)
    np.testing.assert_allclose(np.asarray(batched_p.poses[1]),
                               np.asarray(single_1.poses), atol=1e-4)
