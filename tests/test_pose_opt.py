import numpy as np
import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import se3
from pointslot_tpu.solvers import pose_opt


FX, FY, CX, CY, BF = 721.5, 721.5, 609.6, 172.9, 384.4


def make_problem(rng, n_pts=200, noise=0.3, n_outliers=0, xi_scale=0.1):
    pts = np.stack(
        [
            rng.uniform(-10, 10, n_pts),
            rng.uniform(-3, 2, n_pts),
            rng.uniform(4, 40, n_pts),
        ],
        axis=1,
    ).astype(np.float32)
    xi_true = rng.normal(size=6).astype(np.float32) * xi_scale
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi_true)))
    pc = (T_true[:3, :3] @ pts.T).T + T_true[:3, 3]
    obs = np.asarray(
        se3.project_stereo(jnp.asarray(pc), FX, FY, CX, CY, BF)
    ) + rng.normal(size=(n_pts, 3)).astype(np.float32) * noise
    if n_outliers:
        idx = rng.choice(n_pts, n_outliers, replace=False)
        obs[idx, :2] += rng.uniform(30, 80, size=(n_outliers, 2)) * np.sign(
            rng.normal(size=(n_outliers, 2))
        )
    edges = pose_opt.PoseObs(
        pts=jnp.asarray(pts),
        obs=jnp.asarray(obs),
        is_stereo=jnp.ones(n_pts, bool),
        inv_sigma2=jnp.ones(n_pts, jnp.float32),
        valid=jnp.ones(n_pts, bool),
    )
    return T_true, edges


def pose_error(T_est, T_true):
    dT = np.asarray(T_est) @ np.linalg.inv(T_true)
    dxi = np.asarray(se3.se3_log(jnp.asarray(dT, jnp.float32)))
    return np.linalg.norm(dxi)


def test_jacobian_matches_finite_difference(rng):
    pts = jnp.asarray(rng.uniform(1, 10, size=(5, 3)), jnp.float32)
    obs = jnp.zeros((5, 3))
    T = se3.se3_exp(jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32))
    _, J, _ = pose_opt._residuals_and_jac(
        T, pts, obs, jnp.ones(5, bool), FX, FY, CX, CY, BF
    )

    def res_of_xi(xi):
        Tp = se3.se3_retract(T, xi)
        r, _, _ = pose_opt._residuals_and_jac(
            Tp, pts, obs, jnp.ones(5, bool), FX, FY, CX, CY, BF
        )
        return r

    J_auto = jax.jacfwd(res_of_xi)(jnp.zeros(6))  # (5, 3, 6)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), rtol=1e-3, atol=1e-3)


def test_converges_from_perturbed_init(rng):
    T_true, edges = make_problem(rng, noise=0.0)
    xi0 = rng.normal(size=6).astype(np.float32) * 0.05
    T0 = np.asarray(se3.se3_exp(jnp.asarray(xi0))) @ T_true
    result = pose_opt.pose_optimize(jnp.asarray(T0, jnp.float32), edges,
                                    FX, FY, CX, CY, BF)
    assert pose_error(result.T, T_true) < 1e-3
    assert int(result.n_inliers) == edges.pts.shape[0]


def test_robust_to_outliers(rng):
    T_true, edges = make_problem(rng, n_pts=300, noise=0.3, n_outliers=60)
    xi0 = rng.normal(size=6).astype(np.float32) * 0.03
    T0 = np.asarray(se3.se3_exp(jnp.asarray(xi0))) @ T_true
    result = pose_opt.pose_optimize(jnp.asarray(T0, jnp.float32), edges,
                                    FX, FY, CX, CY, BF)
    assert pose_error(result.T, T_true) < 5e-3
    n_in = int(result.n_inliers)
    assert 200 <= n_in <= 260  # outliers rejected, inliers kept


def test_translation_prior_pins_solution(rng):
    T_true, edges = make_problem(rng, n_pts=50, noise=0.5)
    prior_t = T_true[:3, 3] + np.array([0.5, 0, 0], np.float32)
    result = pose_opt.pose_optimize(
        jnp.asarray(T_true, jnp.float32), edges, FX, FY, CX, CY, BF,
        trans_prior=jnp.asarray(prior_t), trans_prior_weight=1e6,
    )
    # huge prior weight should drag translation toward the prior
    assert np.linalg.norm(np.asarray(result.T[:3, 3]) - prior_t) < 0.05


def test_batched_matches_single(rng):
    problems = [make_problem(rng, n_pts=100, noise=0.2) for _ in range(4)]
    T0s, edge_list = [], []
    for T_true, edges in problems:
        xi0 = rng.normal(size=6).astype(np.float32) * 0.03
        T0s.append(np.asarray(se3.se3_exp(jnp.asarray(xi0))) @ T_true)
        edge_list.append(edges)
    batched_edges = pose_opt.PoseObs(
        *[jnp.stack([getattr(e, f) for e in edge_list]) for f in pose_opt.PoseObs._fields]
    )
    batched = pose_opt.pose_optimize_batched(
        jnp.asarray(np.stack(T0s), jnp.float32), batched_edges, FX, FY, CX, CY, BF
    )
    for i, (T_true, edges) in enumerate(problems):
        single = pose_opt.pose_optimize(
            jnp.asarray(T0s[i], jnp.float32), edges, FX, FY, CX, CY, BF
        )
        np.testing.assert_allclose(
            np.asarray(batched.T[i]), np.asarray(single.T), atol=1e-4
        )
        assert pose_error(batched.T[i], T_true) < 5e-3


def test_mono_edges_ignore_ur(rng):
    T_true, edges = make_problem(rng, n_pts=150, noise=0.1)
    # corrupt uR wildly but mark edges mono: solution must be unaffected
    bad_obs = np.asarray(edges.obs).copy()
    bad_obs[:, 2] += 500.0
    mono_edges = edges._replace(
        obs=jnp.asarray(bad_obs), is_stereo=jnp.zeros(150, bool)
    )
    result = pose_opt.pose_optimize(
        jnp.asarray(T_true, jnp.float32), mono_edges, FX, FY, CX, CY, BF
    )
    assert pose_error(result.T, T_true) < 5e-3


def test_optimize_pose_over_edge_cap():
    """More than 1500 bound features must not crash the motion-only solve
    (regression: the capped inlier mask was applied to the uncapped
    feature-selection array)."""
    import numpy as np

    from pointslot_tpu.config import SystemConfig
    from pointslot_tpu.slam.map_state import MapState
    from pointslot_tpu.slam.tracking import CameraTracker, FrameRecord

    rng = np.random.default_rng(0)
    cfg = SystemConfig()
    N = 1700
    m = MapState()
    pts = np.stack([rng.uniform(-12, 12, N), rng.uniform(-3, 3, N),
                    rng.uniform(5, 40, N)], axis=1)
    m.pt_pos[:N] = pts
    m.pt_valid[:N] = True

    c = cfg.camera
    z = pts[:, 2]
    u = c.fx * pts[:, 0] / z + c.cx
    v = c.fy * pts[:, 1] / z + c.cy
    frame = FrameRecord(
        frame_id=0,
        xy=np.stack([u + rng.normal(size=N) * 0.3,
                     v + rng.normal(size=N) * 0.3], axis=1).astype(np.float32),
        level=np.zeros(N, np.int32),
        desc=np.zeros((N, 8), np.uint32),
        angle=np.zeros(N, np.float32),
        depth=z.astype(np.float32),
        u_right=(u - c.bf / z).astype(np.float32),
        valid=np.ones(N, bool),
        point_idx=np.arange(N, dtype=np.int64),
    )
    tracker = CameraTracker(cfg, m)
    n_inl = tracker._optimize_pose(frame, np.eye(4, dtype=np.float32))
    assert n_inl > 1000
    assert frame.T_cw is not None
    assert np.linalg.norm(frame.T_cw[:3, 3]) < 0.1
