"""Integration tests for SLOT modes 1 (dynamic SLAM), 2 (manual ROI) and
3 (online detector + MOT)."""

import numpy as np
import pytest

from pointslot_tpu.config import SLOTMode, SystemConfig
from pointslot_tpu.datasets.synthetic import (
    SyntheticRenderer, make_scene, offline_detection_rows,
)
from pointslot_tpu.slam.system import System
from pointslot_tpu.slam.tracking import TrackingState

N_FRAMES = 8


def _scene():
    return make_scene(n_frames=N_FRAMES, n_objects=1, seed=61, forward_speed=0.7)


def _slot_cfg(mode):
    cfg = SystemConfig(slot_mode=mode)
    return cfg.replace(
        objects=cfg.objects.__class__(
            **{**cfg.objects.__dict__, "init_min_features": 10,
               "init_min_map_points": 8, "min_tracked_points": 8,
               "track_min_features": 10}),
        tracking=cfg.tracking.__class__(
            **{**cfg.tracking.__dict__, "min_init_stereo_features": 350}),
    )


class OracleDetector:
    """Stands in for the YOLO network in mode 3: emits GT boxes WITHOUT ids
    (id assignment is DeepSORT's job, which is what the test exercises)."""

    def __init__(self, rows):
        self.rows = rows
        self.frame = 0

    def run(self, img):
        out = []
        for r in self.rows[(self.rows[:, 0] == self.frame) & (self.rows[:, 1] >= 0)]:
            out.append({"bbox": r[5:9].copy(), "score": 0.9, "class_id": 2})
        self.frame += 1
        return out


def test_mode1_dynamic_slam_masks_features():
    scene = _scene()
    renderer = SyntheticRenderer(scene)
    cfg = _slot_cfg(SLOTMode.DYNAMIC_SLAM)
    system = System(cfg)
    for i in range(N_FRAMES):
        left, right, inst = renderer.render(i)
        frame = system.track_stereo(left, right, i * 0.1, i, instance_mask=inst)
    assert system.tracker.state == TrackingState.OK
    # no features inside masked (dynamic) regions
    left, right, inst = renderer.render(N_FRAMES - 1)
    v = frame.valid
    xy = frame.xy[v]
    mask_vals = inst[
        np.clip(np.round(xy[:, 1]).astype(int), 0, inst.shape[0] - 1),
        np.clip(np.round(xy[:, 0]).astype(int), 0, inst.shape[1] - 1),
    ]
    assert (mask_vals != 0).mean() < 0.02


def test_mode2_manual_roi_tracking():
    scene = _scene()
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)
    cfg = _slot_cfg(SLOTMode.MANUAL_TRACKING)
    system = System(cfg)
    first_bbox = None
    for i in range(N_FRAMES):
        left, right, _ = renderer.render(i)
        if i == 0:
            r0 = rows[(rows[:, 0] == 0) & (rows[:, 1] >= 0)][0]
            first_bbox = r0[5:9]
            system.select_rois(left, [tuple(first_bbox)])
        system.track_stereo(left, right, i * 0.1, i)
    objsys = system._object_system
    assert objsys is not None
    assert len(objsys.all_tracks) >= 1, "manual ROI produced no object track"
    best = max(objsys.all_tracks, key=lambda t: len(t.poses_cf))
    assert len(best.poses_cf) >= N_FRAMES // 2


def test_mode3_online_pipeline():
    scene = _scene()
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)
    cfg = _slot_cfg(SLOTMode.AUTONOMOUS_DRIVING)
    system = System(cfg)
    system.detector = OracleDetector(rows)  # oracle network; MOT is real
    for i in range(N_FRAMES):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, i * 0.1, i)
    assert system.tracker.state == TrackingState.OK
    objsys = system._object_system
    # DeepSORT needs n_init frames to confirm; then the object pipeline runs
    assert len(objsys.all_tracks) >= 1, "online pipeline produced no track"
    best = max(objsys.all_tracks, key=lambda t: len(t.poses_cf))
    assert len(best.poses_cf) >= 3


def test_mode3_with_trained_network():
    """Fully-online mode 3: the TRAINED synthetic detector (no oracle) +
    DeepSORT + the object pipeline produce tracks."""
    import os

    weights = "pointslot_tpu/detect/weights/synthetic_yolo_w8.npz"
    if not os.path.isfile(weights):
        import pytest

        pytest.skip("synthetic detector weights not built")
    # train-distribution scene (seeds 201-212 were used for training)
    scene = make_scene(n_frames=6, n_objects=2, seed=205, forward_speed=0.8)
    renderer = SyntheticRenderer(scene)
    cfg = _slot_cfg(SLOTMode.AUTONOMOUS_DRIVING)
    cfg = cfg.replace(detector=cfg.detector.__class__(
        **{**cfg.detector.__dict__, "weights_path": weights,
           "input_size": 320, "network_width": 8, "conf_threshold": 0.3}))
    system = System(cfg)
    for i in range(6):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, i * 0.1, i)
    assert system.tracker.state == TrackingState.OK
    # DeepSORT needs n_init=3 confirmations; expect at least one object track
    objsys = system._object_system
    assert len(objsys.all_tracks) >= 1, "online network produced no SLOT track"
