import numpy as np
import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import pnp, se3, triangulation


FX, FY, CX, CY = 721.5, 721.5, 609.6, 172.9
K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]], np.float32)


def make_cloud(rng, n):
    return np.stack(
        [rng.uniform(-8, 8, n), rng.uniform(-2, 2, n), rng.uniform(5, 30, n)], axis=1
    ).astype(np.float32)


def project(T, pts):
    pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
    return np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], axis=1
    ), pc[:, 2]


def test_triangulation_exact(rng):
    pts = make_cloud(rng, 50)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.5, 0, 0, 0, 0.02, 0], jnp.float32)))
    uv1, _ = project(T1, pts)
    uv2, _ = project(T2, pts)
    P1 = triangulation.projection_matrix(jnp.asarray(K), jnp.asarray(T1))
    P2 = triangulation.projection_matrix(jnp.asarray(K), jnp.asarray(T2))
    X, ok = triangulation.triangulate(
        jnp.broadcast_to(P1, (50, 3, 4)), jnp.broadcast_to(P2, (50, 3, 4)),
        jnp.asarray(uv1), jnp.asarray(uv2),
    )
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_allclose(np.asarray(X), pts, atol=0.05, rtol=0.01)


def test_pnp_dlt_exact(rng):
    pts = make_cloud(rng, 30)
    T = np.asarray(se3.se3_exp(jnp.asarray(rng.normal(size=6) * 0.2, jnp.float32)))
    uv, _ = project(T, pts)
    uv_norm = (uv - [CX, CY]) / [FX, FY]
    T_est = pnp.pnp_dlt(
        jnp.asarray(pts), jnp.asarray(uv_norm, jnp.float32), jnp.ones(30)
    )
    dxi = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T) @ np.asarray(T_est), jnp.float32)))
    assert np.linalg.norm(dxi) < 1e-3


def test_pnp_ransac_with_outliers(rng):
    pts = make_cloud(rng, 120)
    T = np.asarray(se3.se3_exp(jnp.asarray(rng.normal(size=6) * 0.2, jnp.float32)))
    uv, _ = project(T, pts)
    uv[rng.choice(120, 40, replace=False)] += rng.uniform(40, 120, size=(40, 2))
    result = pnp.pnp_ransac(
        jnp.asarray(pts), jnp.asarray(uv, jnp.float32), jnp.ones(120, bool),
        jax.random.PRNGKey(0), FX, FY, CX, CY,
    )
    assert bool(result.ok)
    assert int(result.n_inliers) >= 70
    dxi = np.asarray(
        se3.se3_log(jnp.asarray(np.linalg.inv(T) @ np.asarray(result.T), jnp.float32))
    )
    assert np.linalg.norm(dxi) < 0.02


def test_umeyama_rigid(rng):
    src = make_cloud(rng, 40)
    R_true = np.asarray(se3.so3_exp(jnp.asarray(rng.normal(size=3) * 0.5, jnp.float32)))
    t_true = rng.normal(size=3).astype(np.float32) * 5
    dst = (R_true @ src.T).T + t_true
    s, R, t = pnp.umeyama(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(40), with_scale=False
    )
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)
    assert float(s) == 1.0


def test_umeyama_with_scale(rng):
    src = make_cloud(rng, 40)
    R_true = np.asarray(se3.so3_exp(jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32)))
    t_true = rng.normal(size=3).astype(np.float32)
    s_true = 2.7
    dst = s_true * (R_true @ src.T).T + t_true
    s, R, t = pnp.umeyama(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(40), with_scale=True
    )
    np.testing.assert_allclose(float(s), s_true, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)


def test_umeyama_weighted_ignores_outliers(rng):
    src = make_cloud(rng, 50)
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.1, 0.2, -0.1], jnp.float32)))
    t_true = np.array([1.0, -2.0, 0.5], np.float32)
    dst = (R_true @ src.T).T + t_true
    dst[:10] += 100.0  # corrupted
    w = np.ones(50, np.float32)
    w[:10] = 0.0
    s, R, t = pnp.umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)


def test_undistort_points_roundtrip():
    """undistort inverts the radial-tangential forward model to sub-0.01px
    (Frame::UndistortKeyPoints role for non-rectified calibrations)."""
    import jax.numpy as jnp

    from pointslot_tpu.geometry.camera import distort_normalized, undistort_points

    rng = np.random.default_rng(3)
    fx, fy, cx, cy = 450.0, 452.0, 320.0, 240.0
    k1, k2, p1, p2 = -0.28, 0.07, 1e-3, -5e-4
    xy_true = np.stack([rng.uniform(40, 600, 300),
                        rng.uniform(40, 440, 300)], axis=1)
    xn = jnp.stack([(xy_true[:, 0] - cx) / fx, (xy_true[:, 1] - cy) / fy], -1)
    xd = distort_normalized(xn, k1, k2, p1, p2)
    xy_dist = np.stack([np.asarray(xd[:, 0]) * fx + cx,
                        np.asarray(xd[:, 1]) * fy + cy], axis=1)
    out = np.asarray(undistort_points(
        jnp.asarray(xy_dist, jnp.float32), fx, fy, cx, cy, k1, k2, p1, p2))
    err = np.abs(out - xy_true).max()
    assert err < 0.05, err  # f32 fixed-point; feature noise is ~0.3 px
    # zero coefficients: exact identity
    out0 = np.asarray(undistort_points(
        jnp.asarray(xy_true, jnp.float32), fx, fy, cx, cy, 0.0, 0.0, 0.0, 0.0))
    np.testing.assert_allclose(out0, xy_true, atol=1e-3)
