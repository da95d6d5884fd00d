"""Async mapping pipeline (the reference's thread topology) vs synchronous."""

import numpy as np

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.slam.system import System
from pointslot_tpu.slam.tracking import TrackingState

N = 10


def run(async_mapping: bool):
    scene = make_scene(n_frames=N, n_objects=0, seed=91, forward_speed=0.7)
    renderer = SyntheticRenderer(scene)
    cfg = SystemConfig()
    cfg = cfg.replace(runtime=cfg.runtime.__class__(
        **{**cfg.runtime.__dict__, "async_mapping": async_mapping}))
    system = System(cfg)
    for i in range(N):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, i * 0.1, i)
    system.wait_for_mapping()
    traj = system.camera_trajectory()
    stats = system.shutdown()
    return scene, system, traj, stats


def test_async_mapping_tracks_ok():
    scene, system, traj, stats = run(async_mapping=True)
    assert system.tracker.state == TrackingState.OK
    assert stats["n_keyframes"] >= 2
    errs = []
    for f, T, _ in traj:
        gt = scene.poses_world[f]
        errs.append(np.linalg.norm(np.linalg.inv(T)[:3, 3] - gt[:3, 3]))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.15, f"async ATE {ate:.3f}"


def test_async_close_to_sync():
    _, _, traj_a, _ = run(async_mapping=True)
    _, _, traj_s, _ = run(async_mapping=False)
    # same frames tracked; trajectories close (mapping timing differs)
    fa = {f for f, _, _ in traj_a}
    fs = {f for f, _, _ in traj_s}
    assert len(fa & fs) >= N - 2
    pa = {f: np.linalg.inv(T)[:3, 3] for f, T, _ in traj_a}
    ps = {f: np.linalg.inv(T)[:3, 3] for f, T, _ in traj_s}
    diffs = [np.linalg.norm(pa[f] - ps[f]) for f in fa & fs]
    assert np.median(diffs) < 0.1
