import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointslot_tpu.geometry import se3


def random_rotations(rng, n):
    """Uniform-ish random rotations via QR of Gaussians."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q


def test_so3_exp_log_roundtrip(rng):
    # exp/log roundtrip only holds on the canonical chart |omega| < pi
    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    omega = axes * rng.uniform(0.0, 3.0, size=(64, 1))
    R = se3.so3_exp(jnp.asarray(omega, jnp.float32))
    omega2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(omega2), omega, atol=2e-4)


def test_so3_log_small_angle(rng):
    omega = rng.normal(size=(16, 3)) * 1e-6
    R = se3.so3_exp(jnp.asarray(omega, jnp.float32))
    omega2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(omega2), omega, atol=1e-6)


def test_so3_log_near_pi(rng):
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = np.pi - rng.uniform(1e-5, 1e-3, size=(32, 1))
    omega = axes * angles
    R = se3.so3_exp(jnp.asarray(omega, jnp.float32))
    omega2 = np.asarray(se3.so3_log(R))
    # log may return the equivalent rotation -axis*(2pi-theta); compare rotations
    R2 = np.asarray(se3.so3_exp(jnp.asarray(omega2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6)).astype(np.float32)
    xi[:, 3:] *= 0.5  # keep |omega| safely under pi
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=2e-4)


def test_se3_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    T = se3.se3_exp(xi)
    TinvT = se3.se3_inverse(T) @ T
    np.testing.assert_allclose(
        np.asarray(TinvT), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
    )


def test_transform_points(rng):
    xi = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    T = se3.se3_exp(xi)
    pts = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    out = se3.transform_points(T, pts)
    expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_quat_roundtrip(rng):
    R = jnp.asarray(random_rotations(rng, 32), jnp.float32)
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_euler_zyx_roundtrip(rng):
    roll = jnp.asarray(rng.uniform(-1.4, 1.4, size=(16,)), jnp.float32)
    pitch = jnp.asarray(rng.uniform(-1.4, 1.4, size=(16,)), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-3.0, 3.0, size=(16,)), jnp.float32)
    R = se3.euler_zyx_to_rot(roll, pitch, yaw)
    r2, p2, y2 = se3.rot_to_euler_zyx(R)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(roll), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pitch), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(yaw), atol=1e-5)


def test_stereo_projection_roundtrip(rng):
    fx, fy, cx, cy, bf = 721.5, 721.5, 609.6, 172.9, 384.4
    pts = np.abs(rng.normal(size=(100, 3))) * np.array([5, 2, 20]) + np.array([0, 0, 2])
    obs = se3.project_stereo(jnp.asarray(pts, jnp.float32), fx, fy, cx, cy, bf)
    obs = np.asarray(obs)
    disparity = obs[:, 0] - obs[:, 2]
    back = se3.backproject_stereo(
        jnp.asarray(obs[:, 0]), jnp.asarray(obs[:, 1]), jnp.asarray(disparity),
        fx, fy, cx, cy, bf,
    )
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-3)


def test_jit_and_vmap():
    xi = jnp.ones((4, 6)) * 0.1
    f = jax.jit(se3.se3_exp)
    T = f(xi)
    assert T.shape == (4, 4, 4)
    g = jax.vmap(se3.se3_log)
    out = g(T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xi), atol=1e-5)


def test_retract_matches_g2o_convention():
    # exp(xi) * T, so retract at identity with pure translation moves t
    T = jnp.eye(4)
    xi = jnp.array([1.0, 2.0, 3.0, 0, 0, 0])
    T2 = se3.se3_retract(T, xi)
    np.testing.assert_allclose(np.asarray(T2[:3, 3]), [1, 2, 3], atol=1e-6)
