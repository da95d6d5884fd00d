"""End-to-end tracking on a DISTORTED stereo sequence: the keypoint
undistortion path (reference Frame::UndistortKeyPoints, a no-op on
rectified KITTI) must be load-bearing, not just unit-exercised."""

import numpy as np

from pointslot_tpu.config import CameraConfig, SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.slam.system import System
from pointslot_tpu.slam.tracking import TrackingState

K1 = -0.05  # barrel distortion, strong enough to bias pose if uncorrected
N = 12


def _distort_image(img: np.ndarray, cam: CameraConfig, k1: float) -> np.ndarray:
    """Render through a distorting lens: sample the pinhole image at the
    UNDISTORTED position of every output pixel, so a scene point whose
    pinhole projection is u_p appears at u_d with undistort(u_d) = u_p."""
    from scipy.ndimage import map_coordinates

    h, w = img.shape
    v, u = np.mgrid[0:h, 0:w].astype(np.float64)
    xn = (u - cam.cx) / cam.fx
    yn = (v - cam.cy) / cam.fy
    r2 = xn * xn + yn * yn
    # fixed-point inverse of the radial model (mild k1: 5 iters suffice)
    xu, yu = xn.copy(), yn.copy()
    for _ in range(5):
        rad = 1.0 + k1 * (xu * xu + yu * yu)
        xu = xn / rad
        yu = yn / rad
    us = xu * cam.fx + cam.cx
    vs = yu * cam.fy + cam.cy
    out = map_coordinates(img.astype(np.float32), [vs, us], order=1,
                          mode="nearest")
    return out.astype(np.uint8)


def _run(calibrated: bool):
    cam = CameraConfig(width=512, height=256, fx=300.0, fy=300.0,
                       cx=256.0, cy=128.0, bf=60.0,
                       k1=K1 if calibrated else 0.0)
    # render with the PINHOLE camera, then warp through the lens
    pin = CameraConfig(width=512, height=256, fx=300.0, fy=300.0,
                       cx=256.0, cy=128.0, bf=60.0)
    scene = make_scene(n_frames=N, n_objects=0, seed=21, camera=pin,
                       forward_speed=0.5, yaw_rate=0.03)
    renderer = SyntheticRenderer(scene)
    cfg = SystemConfig()
    cfg = cfg.replace(
        camera=cam,
        tracking=cfg.tracking.__class__(
            **{**cfg.tracking.__dict__, "min_init_stereo_features": 150}),
        loop=cfg.loop.__class__(**{**cfg.loop.__dict__, "enabled": False}),
    )
    system = System(cfg)
    for i in range(N):
        left, right, _ = renderer.render(i)
        ld = _distort_image(left, pin, K1)
        rd = _distort_image(right, pin, K1)
        system.track_stereo(ld, rd, i * 0.1, i)
    traj = system.camera_trajectory()
    errs = [
        np.linalg.norm(np.linalg.inv(T)[:3, 3] - scene.poses_world[f][:3, 3])
        for f, T, lost in traj if not lost
    ]
    ate = float(np.sqrt(np.mean(np.square(errs)))) if errs else np.inf
    return system, ate, len(errs)


def test_distorted_sequence_with_calibration():
    system, ate, n_ok = _run(calibrated=True)
    assert system.tracker.state == TrackingState.OK
    assert n_ok >= N - 1, "tracking lost frames on the distorted sequence"
    assert ate < 0.10, f"calibrated ATE {ate:.3f} m"

    # the same distorted imagery WITHOUT calibration must be measurably
    # worse — i.e. the undistortion path is doing real work
    _, ate_raw, _ = _run(calibrated=False)
    assert ate_raw > 1.5 * ate, (
        f"undistortion not load-bearing: {ate:.3f} vs uncalibrated {ate_raw:.3f}"
    )
