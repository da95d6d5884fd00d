import numpy as np
import jax.numpy as jnp

from pointslot_tpu.geometry import se3
from pointslot_tpu.solvers import local_ba

FX, FY, CX, CY, BF = 721.5, 721.5, 609.6, 172.9, 384.4


def build_problem(rng, n_poses=6, n_points=300, pose_noise=0.02, point_noise=0.05,
                  obs_noise=0.2, P_cap=8, L_cap=512, E_cap=4096,
                  freeze_first=True, dof_mask=None):
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
    assert E <= E_cap

    def pad(arr, cap, fill=0):
        arr = np.asarray(arr)
        out = np.full((cap,) + arr.shape[1:], fill, arr.dtype)
        out[: len(arr)] = arr
        return out

    # perturbed initial values
    poses_init = []
    for i, Tt in enumerate(poses_true):
        if freeze_first and i == 0:
            poses_init.append(Tt)
        else:
            xi = rng.normal(size=6).astype(np.float32) * pose_noise
            poses_init.append(np.asarray(se3.se3_exp(jnp.asarray(xi))) @ Tt)
    pts_init = pts_true + rng.normal(size=pts_true.shape).astype(np.float32) * point_noise

    dof = np.ones((P_cap, 6), np.float32) if dof_mask is None else dof_mask
    prob = local_ba.BAProblem(
        poses=jnp.asarray(pad(np.stack(poses_init), P_cap), jnp.float32),
        pose_fixed=jnp.asarray(pad([freeze_first] + [False] * (n_poses - 1), P_cap, True)),
        pose_valid=jnp.asarray(pad([True] * n_poses, P_cap, False)),
        dof_mask=jnp.asarray(dof),
        points=jnp.asarray(pad(pts_init, L_cap), jnp.float32),
        point_valid=jnp.asarray(pad([True] * n_points, L_cap, False)),
        e_pose=jnp.asarray(pad(e_pose, E_cap), jnp.int32),
        e_point=jnp.asarray(pad(e_point, E_cap), jnp.int32),
        e_obs=jnp.asarray(pad(np.stack(e_obs), E_cap), jnp.float32),
        e_stereo=jnp.asarray(pad(e_stereo, E_cap, False)),
        e_inv_sigma2=jnp.asarray(pad([1.0] * E, E_cap), jnp.float32),
        e_valid=jnp.asarray(pad([True] * E, E_cap, False)),
    )
    return prob, np.stack(poses_true), pts_true, n_poses, n_points


def pose_rmse(poses_est, poses_true, n):
    errs = []
    for i in range(n):
        dT = np.asarray(poses_est[i]) @ np.linalg.inv(poses_true[i])
        errs.append(np.linalg.norm(np.asarray(se3.se3_log(jnp.asarray(dT, jnp.float32)))))
    return float(np.sqrt(np.mean(np.square(errs))))


def test_ba_converges(rng):
    prob, poses_true, pts_true, P, L = build_problem(rng)
    before = pose_rmse(prob.poses, poses_true, P)
    result = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    after = pose_rmse(result.poses, poses_true, P)
    assert after < before * 0.2, f"{before=} {after=}"
    assert after < 2e-3
    pt_err = np.linalg.norm(np.asarray(result.points[:L]) - pts_true, axis=1)
    assert np.median(pt_err) < 0.05


def test_ba_respects_fixed_pose(rng):
    prob, poses_true, _, P, _ = build_problem(rng)
    result = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    np.testing.assert_array_equal(np.asarray(result.poses[0]), np.asarray(prob.poses[0]))


def test_ba_with_outliers(rng):
    prob, poses_true, pts_true, P, L = build_problem(rng)
    # corrupt 10% of edges
    obs = np.asarray(prob.e_obs).copy()
    valid = np.asarray(prob.e_valid)
    n_valid = valid.sum()
    bad = rng.choice(np.nonzero(valid)[0], n_valid // 10, replace=False)
    obs[bad, :2] += rng.uniform(20, 60, size=(len(bad), 2))
    prob = prob._replace(e_obs=jnp.asarray(obs))
    result = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    after = pose_rmse(result.poses, poses_true, P)
    assert after < 5e-3, f"{after=}"
    # outliers should be flagged
    inl = np.asarray(result.edge_inlier)
    assert inl[bad].mean() < 0.2
    assert inl[np.setdiff1d(np.nonzero(valid)[0], bad)].mean() > 0.9


def test_ba_dof_mask_freezes_rotation(rng):
    dof = np.ones((8, 6), np.float32)
    dof[:, 3] = 0.0  # freeze omega_x (roll-ish) for all poses
    dof[:, 5] = 0.0  # freeze omega_z
    prob, poses_true, _, P, _ = build_problem(rng, dof_mask=dof, pose_noise=0.0,
                                              point_noise=0.02)
    result = local_ba.bundle_adjust(prob, FX, FY, CX, CY, BF)
    # updates must not introduce roll/pitch relative to init
    for i in range(1, P):
        dT = np.asarray(result.poses[i]) @ np.linalg.inv(np.asarray(prob.poses[i]))
        xi = np.asarray(se3.se3_log(jnp.asarray(dT, jnp.float32)))
        assert abs(xi[3]) < 1e-5 and abs(xi[5]) < 1e-5


def test_sorted_segment_sum_matches(rng):
    from pointslot_tpu.solvers.segsum import sorted_segment_sum
    import jax

    E, D, L = 3000, 7, 500
    seg = np.sort(rng.integers(0, L, E)).astype(np.int32)
    vals = rng.normal(size=(E, D)).astype(np.float32)
    ref = np.asarray(jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(seg), L))
    got = np.asarray(sorted_segment_sum(jnp.asarray(vals), jnp.asarray(seg), L,
                                        chunk=256))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # degenerate cases: all one segment / empty tail segments
    seg2 = np.zeros(E, np.int32)
    got2 = np.asarray(sorted_segment_sum(jnp.asarray(vals), jnp.asarray(seg2), L,
                                         chunk=256))
    np.testing.assert_allclose(got2[0], vals.sum(0), rtol=1e-5)
    np.testing.assert_allclose(got2[1:], 0.0, atol=1e-6)


def test_inv3x3_matches_linalg(rng):
    from pointslot_tpu.solvers.local_ba import _inv3x3

    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(3)  # well-conditioned SPD
    got = np.asarray(_inv3x3(jnp.asarray(A)))
    ref = np.linalg.inv(A)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
