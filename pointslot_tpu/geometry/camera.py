"""Camera distortion model (radial-tangential, OpenCV convention).

The reference undistorts keypoints when the calibration carries distortion
(Frame::UndistortKeyPoints via cv::undistortPoints; a no-op on rectified
KITTI where mDistCoef(0) == 0, reference src/Frame.cc). Same here: the
System applies `undistort_points` to frame keypoints only when a
coefficient is nonzero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distort_normalized(xn: jnp.ndarray, k1: float, k2: float,
                       p1: float, p2: float) -> jnp.ndarray:
    """Forward radial-tangential model on normalized coords (N, 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


@jax.jit
def undistort_points(xy: jnp.ndarray, fx: float, fy: float,
                     cx: float, cy: float, k1: float, k2: float,
                     p1: float, p2: float, iters: int = 8) -> jnp.ndarray:
    """Pixel coords (N, 2) on the distorted image -> undistorted pixel
    coords. Fixed-point inversion of the distortion model (the standard
    cv::undistortPoints iteration), fixed iteration count for jit."""
    xd = jnp.stack([(xy[..., 0] - cx) / fx, (xy[..., 1] - cy) / fy], axis=-1)

    def body(_, xn):
        d = distort_normalized(xn, k1, k2, p1, p2) - xn
        return xd - d

    xn = jax.lax.fori_loop(0, iters, body, xd)
    return jnp.stack(
        [xn[..., 0] * fx + cx, xn[..., 1] * fy + cy], axis=-1
    )
