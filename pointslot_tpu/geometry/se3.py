"""Batched SO(3)/SE(3) Lie-group operations in JAX.

Replaces the reference's g2o::SE3Quat + cv::Mat + Eigen conversion soup
(reference src/Converter.cc, Thirdparty/g2o se3quat.h) with pure-functional
batched operations. All functions accept arbitrary leading batch dimensions
and are jit/vmap/grad-safe (Taylor fallbacks at the small-angle limit).

Conventions:
- Poses are 4x4 homogeneous matrices ``T`` mapping points FROM world/source
  frame TO camera/target frame (T_cw convention, same as the reference).
- Tangent vectors are 6-vectors ``[upsilon, omega]`` (translation first,
  rotation second) matching g2o's SE3Quat::log ordering.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew matrices."""
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with Taylor fallback: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    use_taylor = theta2 < _EPS
    # sin(t)/t and (1-cos(t))/t^2 with series fallback
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map: (..., 3, 3) -> (..., 3).

    Via the (pivot-selected, hence pi-safe) quaternion: omega =
    2 atan2(|q_v|, q_w) q_v / |q_v|, with a Taylor fallback at q_v -> 0.
    """
    q = rot_to_quat(R)
    qv, qw = q[..., :3], q[..., 3]
    nv2 = jnp.sum(qv * qv, axis=-1)
    small = nv2 < 1e-12
    # double-where: the singular branch must see a safe input, or its
    # NaN *gradient* at nv -> 0 leaks through the where under autodiff
    nv_safe = jnp.sqrt(jnp.where(small, 1.0, nv2))
    theta = 2.0 * jnp.arctan2(nv_safe, qw)
    # scale = theta / sin(theta/2); as nv -> 0, theta -> 0, scale -> 2
    scale = jnp.where(small, 2.0 + nv2 * (2.0 / 3.0), theta / nv_safe)
    return scale[..., None] * qv


def _left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(omega): (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    use_taylor = theta2 < _EPS
    # double-where: feed the singular branch a safe theta so its gradient
    # at theta -> 0 stays finite under autodiff
    theta2_safe = jnp.where(use_taylor, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    b = jnp.where(
        use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe
    )
    c = jnp.where(
        use_taylor,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )
    W = hat(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def _left_jacobian_inv(omega: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(omega * omega, axis=-1)
    use_taylor = theta2 < _EPS
    # double-where (see _left_jacobian): safe input for the singular branch
    theta2_safe = jnp.where(use_taylor, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    cot = jnp.where(
        use_taylor,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS))
        / theta2_safe,
    )
    W = hat(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * (W @ W)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exp: tangent (..., 6) [upsilon, omega] -> (..., 4, 4)."""
    upsilon, omega = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(omega), upsilon)
    return rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log: (..., 4, 4) -> (..., 6) [upsilon, omega]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    omega = so3_log(R)
    upsilon = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(omega), t)
    return jnp.concatenate([upsilon, omega], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    if pts.ndim >= 2 and pts.shape[-2:] != (3,) and pts.shape[-1] == 3 and pts.ndim > T.ndim - 1:
        return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, pts) + t


def se3_retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction exp(xi) * T (g2o oplus convention for
    VertexSE3Expmap, matching the reference's pose-update semantics)."""
    return se3_exp(xi) @ T


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [x, y, z, w] -> rotation matrix (...,3,3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion [x, y, z, w], w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22
    # four candidate constructions, pick numerically best via max pivot
    qw0 = jnp.sqrt(jnp.clip(1.0 + trace, _EPS, None)) * 0.5
    q0 = jnp.stack(
        [(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    q1 = jnp.stack(
        [qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    q2 = jnp.stack(
        [(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    q3 = jnp.stack(
        [(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)],
        axis=-1,
    )
    pivots = jnp.stack([trace, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    choice = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, choice[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return jnp.where(q[..., 3:4] < 0, -q, q)


def euler_zyx_to_rot(roll: jnp.ndarray, pitch: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """R = Rz(yaw) Ry(pitch) Rx(roll), matching the reference's
    zyx_euler_to_quat (src/matrix_utils.cc)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
            jnp.stack([-sp, cp * sr, cp * cr], -1),
        ],
        axis=-2,
    )


def rot_to_euler_zyx(R: jnp.ndarray):
    """Inverse of euler_zyx_to_rot -> (roll, pitch, yaw).

    Matches g2o SE3Quat::toXYZPRYVector() used by the object-pose export
    (reference src/System.cc:449-451)."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def project_stereo(
    pts_cam: jnp.ndarray, fx: float, fy: float, cx: float, cy: float, bf: float
) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> stereo observations (..., 3) =
    (u_left, v, u_right) with u_r = u_l - bf/z (reference stereo model)."""
    z = jnp.maximum(pts_cam[..., 2], 1e-6)
    u = fx * pts_cam[..., 0] / z + cx
    v = fy * pts_cam[..., 1] / z + cy
    ur = u - bf / z
    return jnp.stack([u, v, ur], axis=-1)


def backproject_stereo(
    u: jnp.ndarray, v: jnp.ndarray, disparity: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float, bf: float,
) -> jnp.ndarray:
    """Pixel + disparity -> camera-frame 3D point (UnprojectStereo,
    reference src/Frame.cc:2505)."""
    z = bf / jnp.maximum(disparity, 1e-6)
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)
