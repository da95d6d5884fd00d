import numpy as np
import jax.numpy as jnp

from pointslot_tpu.geometry import se3
from pointslot_tpu.solvers import object_factors as of

FX, FY, CX, CY = 721.5, 721.5, 609.6, 172.9


def test_cuboid_corners():
    c = np.asarray(of.cuboid_corners(jnp.asarray([2.0, 4.0, 6.0])))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(np.abs(c), np.tile([1.0, 2.0, 3.0], (8, 1)))


def test_bbox_residual_zero_at_truth():
    dims = jnp.asarray([1.6, 1.5, 3.5])
    T = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.0, 0.5, 10.0]))
    bbox4 = np.asarray(of.project_cuboid_bbox(T, dims, FX, FY, CX, CY))
    det = jnp.asarray([bbox4[0], bbox4[1], bbox4[2] - bbox4[0], bbox4[3] - bbox4[1]])
    r = np.asarray(of.bbox_residual(T, dims, det, FX, FY, CX, CY))
    np.testing.assert_allclose(r, 0.0, atol=1e-5)


def test_motion_model_residual_zero_for_constant_velocity():
    V = np.asarray(se3.se3_exp(jnp.asarray([0.0, 0, 1.0, 0, 0.05, 0], jnp.float32)))
    T0 = np.eye(4)
    T1 = V @ T0
    r = np.asarray(of.motion_model_residual(jnp.asarray(T0, jnp.float32),
                                            jnp.asarray(T1, jnp.float32),
                                            jnp.asarray(V, jnp.float32)))
    np.testing.assert_allclose(r, 0.0, atol=1e-5)
    # deviation shows up in the residual
    T1b = np.asarray(se3.se3_exp(jnp.asarray([0.3, 0, 0, 0, 0, 0], jnp.float32))) @ T1
    r2 = np.asarray(of.motion_model_residual(jnp.asarray(T0, jnp.float32),
                                             jnp.asarray(T1b, jnp.float32),
                                             jnp.asarray(V, jnp.float32)))
    assert np.linalg.norm(r2) > 0.2


def test_smoothness_upweights_rotation():
    Va = np.asarray(se3.se3_exp(jnp.asarray([0, 0, 1, 0, 0, 0], jnp.float32)))
    Vb_rot = np.asarray(se3.se3_exp(jnp.asarray([0, 0, 1, 0, 0.1, 0], jnp.float32)))
    Vb_lin = np.asarray(se3.se3_exp(jnp.asarray([0, 0, 1.1, 0, 0, 0], jnp.float32)))
    r_rot = np.asarray(of.smoothness_residual(jnp.asarray(Va), jnp.asarray(Vb_rot)))
    r_lin = np.asarray(of.smoothness_residual(jnp.asarray(Va), jnp.asarray(Vb_lin)))
    assert np.linalg.norm(r_rot) > np.linalg.norm(r_lin)


def test_planar_velocity_straight_and_turning():
    V = np.asarray(of.planar_velocity_to_se2(jnp.float32(2.0), jnp.float32(0.0)))
    np.testing.assert_allclose(V[:3, 3], [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(V[:3, :3], np.eye(3), atol=1e-6)
    Vt = np.asarray(of.planar_velocity_to_se2(jnp.float32(1.0), jnp.float32(0.1)))
    yaw = np.arctan2(Vt[0, 2], Vt[2, 2])
    assert abs(yaw) > 0.1  # turning


def test_fine_tune_recovers_translation(rng):
    dims = jnp.asarray([1.6, 1.5, 3.5])
    T_true = jnp.eye(4).at[:3, 3].set(jnp.asarray([2.0, 0.8, 12.0]))
    bbox4 = np.asarray(of.project_cuboid_bbox(T_true, dims, FX, FY, CX, CY))
    det = jnp.asarray([bbox4[0], bbox4[1], bbox4[2] - bbox4[0], bbox4[3] - bbox4[1]])
    T0 = jnp.asarray(np.asarray(T_true)).at[:3, 3].add(
        jnp.asarray([0.5, -0.2, 1.5])
    )
    T_est = of.fine_tune_with_bbox(T0, dims, det, FX, FY, CX, CY, n_iters=25)
    r = np.asarray(of.bbox_residual(T_est, dims, det, FX, FY, CX, CY))
    assert np.abs(r).max() < 1.0, f"bbox residual after fine-tune: {r}"
