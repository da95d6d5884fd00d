"""Object-state factors beyond point reprojection.

Replaces the reference's custom g2o cuboid/motion machinery
(reference include/g2o_Object.h): the ObjectState cuboid helpers
(compute3D_BoxCorner :100, projectOntoImageBbox :172), the bbox-projection
edges (EdgeSE3CuboidFixScaleProj :245 — 4D bbox residual), the motion-model
edges (EdgeCurrentObjectMotion :361, EdgeSmoothTerm :379, EdgeMotionModel
:396) and the planar-velocity parameterization (VelocityPlanarVelocity
:202 — [v, steer] bicycle model), plus Tracking::FineTuningUsing2dBox
(src/Tracking.cc:1704-1786: iterative alignment of the projected cuboid to
the detected 2D box — here a jitted Gauss-Newton on the translation instead
of its 400-step coordinate descent).

All residuals are plain jax functions — Jacobians come from autodiff, and
any of them can be appended to the LM solvers as extra terms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointslot_tpu.geometry import se3


def cuboid_corners(dims: jnp.ndarray) -> jnp.ndarray:
    """(3,) full extents -> (8, 3) corners in the object frame
    (ObjectState::compute3D_BoxCorner analog)."""
    h = dims / 2.0
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32,
    )
    return signs * h[None, :]


def project_cuboid_bbox(T_co: jnp.ndarray, dims: jnp.ndarray,
                        fx: float, fy: float, cx: float, cy: float) -> jnp.ndarray:
    """Projected axis-aligned bbox (xmin, ymin, xmax, ymax) of the cuboid
    (ObjectState::projectOntoImageRectFromCamera analog)."""
    pc = se3.transform_points(T_co, cuboid_corners(dims))
    z = jnp.maximum(pc[:, 2], 0.1)
    u = fx * pc[:, 0] / z + cx
    v = fy * pc[:, 1] / z + cy
    return jnp.asarray([u.min(), v.min(), u.max(), v.max()])


def bbox_residual(T_co, dims, det_bbox_xywh, fx, fy, cx, cy) -> jnp.ndarray:
    """4D residual projected-bbox minus detected bbox
    (EdgeSE3CuboidFixScaleProj measurement model)."""
    x, y, w, h = det_bbox_xywh
    det = jnp.asarray([x, y, x + w, y + h])
    return project_cuboid_bbox(T_co, dims, fx, fy, cx, cy) - det


def motion_model_residual(T_wo_prev, T_wo_cur, velocity_T, dt: float = 1.0):
    """6D residual: current pose vs constant-velocity prediction
    (EdgeCurrentObjectMotion / EdgeMotionModel role). velocity_T is the
    per-frame motion as an SE(3) matrix; prediction = V^dt * T_prev."""
    pred = velocity_T @ T_wo_prev
    return se3.se3_log(jnp.linalg.solve(pred, T_wo_cur))


def smoothness_residual(vel_prev_T, vel_cur_T, angular_weight: float = 2.0):
    """6D residual between consecutive velocities (EdgeSmoothTerm role),
    with the angular part up-weighted like the reference's
    EdAngularVelThanLinearVelBAWeightTimes."""
    r = se3.se3_log(jnp.linalg.solve(vel_prev_T, vel_cur_T))
    return r * jnp.asarray([1.0, 1.0, 1.0, angular_weight, angular_weight,
                            angular_weight])


def planar_velocity_to_se2(v: jnp.ndarray, steer: jnp.ndarray,
                           axle: float = 0.15, dt: float = 1.0):
    """Bicycle-model planar motion (VelocityPlanarVelocity analog): forward
    speed v + steering angle -> per-frame SE(3) in the object's x-z plane
    (y is down; yaw about y)."""
    yaw_rate = v * jnp.tan(steer) / jnp.maximum(axle, 1e-6)
    dyaw = yaw_rate * dt
    c, s = jnp.cos(dyaw), jnp.sin(dyaw)
    R = jnp.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    t = jnp.asarray([0.0, 0.0, v * dt])
    return se3.rt_to_mat(R, t)


@partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "n_iters", "optimize_yaw"))
def fine_tune_with_bbox(
    T_init: jnp.ndarray,
    dims: jnp.ndarray,
    det_bbox_xywh: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    n_iters: int = 12,
    optimize_yaw: bool = False,
    damping: float = 1e-3,
) -> jnp.ndarray:
    """Gauss-Newton alignment of the projected cuboid to the detected box
    over the translation (optionally + yaw) — the role of the reference's
    <=400-step coordinate descent (Tracking::FineTuningUsing2dBox)."""
    n_dof = 4 if optimize_yaw else 3

    def residual(params, T):
        dt = params[:3]
        T2 = T.at[:3, 3].add(dt)
        if optimize_yaw:
            c, s = jnp.cos(params[3]), jnp.sin(params[3])
            Ry = jnp.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
            T2 = T2.at[:3, :3].set(Ry @ T[:3, :3])
        return bbox_residual(T2, dims, det_bbox_xywh, fx, fy, cx, cy)

    def body(_, T):
        p0 = jnp.zeros(n_dof)
        r = residual(p0, T)
        J = jax.jacfwd(residual)(p0, T)              # (4, n_dof)
        H = J.T @ J + damping * jnp.eye(n_dof)
        dp = -jnp.linalg.solve(H, J.T @ r)
        T = T.at[:3, 3].add(dp[:3])
        if optimize_yaw:
            c, s = jnp.cos(dp[3]), jnp.sin(dp[3])
            Ry = jnp.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
            T = T.at[:3, :3].set(Ry @ T[:3, :3])
        return T

    return jax.lax.fori_loop(0, n_iters, body, T_init)
