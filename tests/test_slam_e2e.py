"""End-to-end stereo odometry (SLOT mode 0) on the synthetic scene."""

import numpy as np
import pytest

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.slam.system import System
from pointslot_tpu.slam.tracking import TrackingState


N_FRAMES = 12


@pytest.fixture(scope="module")
def slam_run():
    scene = make_scene(n_frames=N_FRAMES, n_points=2500, n_objects=0, seed=21,
                       forward_speed=0.8)
    renderer = SyntheticRenderer(scene)
    system = System(SystemConfig())
    frames = []
    for i in range(N_FRAMES):
        left, right, _ = renderer.render(i)
        frames.append(system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i))
    return scene, system, frames


def test_tracking_stays_ok(slam_run):
    scene, system, frames = slam_run
    assert system.tracking_state == TrackingState.OK
    lost = [e for e in system.tracker.trajectory if e.lost]
    assert len(lost) == 0


def test_trajectory_ate(slam_run):
    scene, system, frames = slam_run
    traj = system.camera_trajectory()
    assert len(traj) == N_FRAMES
    errs = []
    for frame_id, T_cw, _ in traj:
        T_wc = np.linalg.inv(T_cw)
        gt = scene.poses_world[frame_id]
        errs.append(np.linalg.norm(T_wc[:3, 3] - gt[:3, 3]))
    ate = np.sqrt(np.mean(np.square(errs)))
    total_len = 0.8 * N_FRAMES
    assert ate < 0.02 * total_len, f"ATE {ate:.3f} m over {total_len:.0f} m"


def test_map_grows_and_culls(slam_run):
    _, system, _ = slam_run
    assert system.map.n_keyframes() >= 1
    assert system.map.n_points() > 300


def test_trajectory_export(tmp_path, slam_run):
    _, system, _ = slam_run
    path = tmp_path / "CameraTrajectory.txt"
    system.save_trajectory_kitti(str(path))
    from pointslot_tpu.io.writers import read_trajectory_kitti

    poses = read_trajectory_kitti(str(path))
    assert poses.shape == (N_FRAMES, 4, 4)
    # first pose ~ identity
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
