"""Device-resident tracking fast path (slam/fast_path.py): the fused
per-frame dispatch inside the System facade, vs the host tracker."""

import numpy as np
import pytest

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.slam.system import System

N = 12


def run(device_tracking: bool):
    scene = make_scene(n_frames=N, n_objects=0, seed=91, forward_speed=0.7)
    renderer = SyntheticRenderer(scene)
    cfg = SystemConfig()
    cfg = cfg.replace(runtime=cfg.runtime.__class__(
        **{**cfg.runtime.__dict__,
           "device_resident_tracking": device_tracking}))
    system = System(cfg)
    for i in range(N):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, i * 0.1, i)
    system.wait_for_mapping()
    traj = system.camera_trajectory()
    stats = system.shutdown()
    return scene, system, traj, stats


@pytest.fixture(scope="module")
def paired():
    return run(True), run(False)


def test_fast_path_used_and_accurate(paired):
    (scene, system, traj, stats), _ = paired
    from pointslot_tpu.utils.profiling import PROFILER

    assert len(traj) >= N - 2
    errs = []
    for f, T, _ in traj:
        gt = scene.poses_world[f]
        errs.append(np.linalg.norm(np.linalg.inv(T)[:3, 3] - gt[:3, 3]))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.15, f"fast-path ATE {ate:.3f}"
    # the fast path actually carried frames (not everything fell back)
    assert system._fast_frames >= N // 2, system._fast_frames
    assert stats["n_keyframes"] >= 2


def test_fast_matches_host_tracker(paired):
    (_, _, traj_f, _), (_, _, traj_h, _) = paired
    pf = {f: np.linalg.inv(T)[:3, 3] for f, T, _ in traj_f}
    ph = {f: np.linalg.inv(T)[:3, 3] for f, T, _ in traj_h}
    common = set(pf) & set(ph)
    assert len(common) >= N - 3
    diffs = [np.linalg.norm(pf[f] - ph[f]) for f in common]
    assert np.median(diffs) < 0.1, f"median divergence {np.median(diffs):.3f}"


def test_fast_path_keyframes_support_relocalization(paired):
    """KFs created from materialized fused frames carry full features."""
    (_, system, _, _), _ = paired
    m = system.map
    kfs = m.keyframe_ids()
    assert len(kfs) >= 2
    for kf in kfs:
        assert m.kf_feat_valid[kf].sum() > 100
        assert (m.kf_point_idx[kf] >= 0).sum() > 30
