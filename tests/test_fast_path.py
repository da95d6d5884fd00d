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


def test_fast_path_mode4_with_objects():
    """Device tracking with the gated fused step under the full mode-4
    object pipeline: objects still tracked, camera accurate."""
    from pointslot_tpu.config import SLOTMode
    from pointslot_tpu.datasets.synthetic import offline_detection_rows
    from pointslot_tpu.slam.objects import Detection

    scene = make_scene(n_frames=10, n_points=2500, n_objects=2, seed=31,
                       forward_speed=0.8)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)
    cfg = SystemConfig(slot_mode=SLOTMode.OFFLINE)
    cfg = cfg.replace(
        objects=cfg.objects.__class__(
            **{**cfg.objects.__dict__, "init_min_features": 10,
               "init_min_map_points": 8, "min_tracked_points": 8,
               "track_min_features": 10, "set_init_position_by_points": False}),
        tracking=cfg.tracking.__class__(
            **{**cfg.tracking.__dict__, "min_init_stereo_features": 350}),
        runtime=cfg.runtime.__class__(
            **{**cfg.runtime.__dict__, "device_resident_tracking": True}),
        loop=cfg.loop.__class__(**{**cfg.loop.__dict__, "enabled": False}),
    )
    system = System(cfg)
    for i in range(10):
        left, right, inst = renderer.render(i)
        frame_rows = rows[(rows[:, 0] == i) & (rows[:, 1] >= 0)]
        dets = [Detection.from_row24(r, mask_value=int(r[1]) + 1)
                for r in frame_rows]
        system.track_stereo(left, right, i * 0.1, i, detections=dets,
                            instance_mask=inst)
    system.shutdown()
    assert system._fast_frames >= 4, system._fast_frames
    objsys = system._object_system
    assert len(objsys.all_tracks) >= 1
    best = max(objsys.all_tracks, key=lambda t: len(t.poses_cf))
    assert len(best.poses_cf) >= 5
    errs = []
    for track in objsys.all_tracks:
        gt_obj = next(o for o in scene.objects if o.track_id == track.track_id)
        for f, T_co in track.poses_cf.items():
            T_cw = np.linalg.inv(scene.poses_world[f])
            gt_T_co = T_cw @ gt_obj.poses_world[f]
            errs.append(np.linalg.norm(T_co[:3, 3] - gt_T_co[:3, 3]))
    assert float(np.median(errs)) < 0.5
