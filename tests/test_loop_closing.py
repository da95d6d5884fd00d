"""Integration: loop closing on a circular trajectory + relocalization."""

import numpy as np
import pytest

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.datasets.synthetic import (
    SyntheticRenderer, make_loop_scene, make_scene,
)
from pointslot_tpu.slam.system import System
from pointslot_tpu.slam.tracking import TrackingState


def test_loop_detected_on_circular_trajectory():
    scene = make_loop_scene(n_frames=48, seed=41, radius=7.0)
    renderer = SyntheticRenderer(scene)
    system = System(SystemConfig())
    for i in range(scene.n_frames):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i)
    assert system.tracker.state == TrackingState.OK
    assert system.loop_closer is not None
    assert system.loop_closer.loops_closed >= 1, "no loop closure fired"
    # trajectory must be globally consistent after correction (est world is
    # anchored at the init frame; align there)
    traj = system.camera_trajectory()
    f0 = traj[0][0]
    A = scene.poses_world[f0]
    errs = [
        np.linalg.norm((A @ np.linalg.inv(T))[:3, 3] - scene.poses_world[f][:3, 3])
        for f, T, _ in traj
    ]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.2, f"ATE after loop closure {ate:.3f} m"
    assert errs[-1] < 0.2, f"end-point error after loop closure: {errs[-1]:.3f} m"
    # global BA ran (on by default, reference src/LoopClosing.cc:648) and
    # improved the map: robust reprojection cost of the same observation
    # set must drop across the joint solve
    stats = system.loop_closer.last_gba_stats
    assert stats is not None, "global BA did not run"
    assert stats["cost_after"] < stats["cost_before"], stats
    assert stats["n_kfs"] == len(system.map.keyframe_ids())


def test_relocalization_after_blackout():
    scene = make_scene(n_frames=10, n_points=2500, n_objects=0, seed=43,
                       forward_speed=0.6)
    renderer = SyntheticRenderer(scene)
    system = System(SystemConfig())
    rendered = []
    for i in range(10):
        left, right, _ = renderer.render(i)
        rendered.append((left, right))
        system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i)
    assert system.tracker.state == TrackingState.OK
    pose_at_5 = None
    for f, T, _ in system.camera_trajectory():
        if f == 5:
            pose_at_5 = T.copy()

    # blackout: featureless frames -> tracking lost
    black = np.zeros_like(rendered[0][0])
    for j in range(3):
        system.track_stereo(black, black, timestamp=1.0 + j * 0.1, frame_id=10 + j)
    assert system.tracker.state == TrackingState.LOST

    # revisit frame 5's view -> relocalize close to the original pose
    left, right = rendered[5]
    frame = system.track_stereo(left, right, timestamp=1.4, frame_id=13)
    assert system.tracker.state == TrackingState.OK, "relocalization failed"
    err = np.linalg.norm(frame.T_cw[:3, 3] - pose_at_5[:3, 3])
    assert err < 0.3, f"relocalized pose error {err:.3f} m"
