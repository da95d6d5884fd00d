"""Many-object capacity stress (reference Max_OBJ_NUM=50 per-frame surface,
include/Frame.h:42): 14 simultaneously-visible moving objects through the
batched object pipeline, asserting track coverage AND bounded kernel
recompilation (the O_pad power-of-two bucketing)."""

import numpy as np
import pytest

from pointslot_tpu.config import CameraConfig, SLOTMode, SystemConfig
from pointslot_tpu.datasets.synthetic import (
    SyntheticRenderer, make_crowd_scene, offline_detection_rows,
)
from pointslot_tpu.slam.objects import Detection
from pointslot_tpu.slam.system import System

N_OBJECTS = 14
N_FRAMES = 10


@pytest.mark.slow
def test_fourteen_simultaneous_objects():
    cam = CameraConfig(width=768, height=384, fx=450.0, fy=450.0,
                       cx=384.0, cy=192.0, bf=90.0)
    scene = make_crowd_scene(n_frames=N_FRAMES, n_objects=N_OBJECTS,
                             seed=5, camera=cam)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)
    # every object visible in every frame
    for i in range(N_FRAMES):
        assert ((rows[:, 0] == i) & (rows[:, 1] >= 0)).sum() == N_OBJECTS

    cfg = SystemConfig(slot_mode=SLOTMode.OFFLINE)
    cfg = cfg.replace(
        camera=cam,
        objects=cfg.objects.__class__(**{
            **cfg.objects.__dict__,
            "init_min_features": 10, "init_min_map_points": 8,
            "min_tracked_points": 8, "track_min_features": 10}),
        tracking=cfg.tracking.__class__(**{
            **cfg.tracking.__dict__, "min_init_stereo_features": 200}),
    )
    system = System(cfg)
    for i in range(scene.n_frames):
        left, right, inst = renderer.render(i)
        fr = rows[(rows[:, 0] == i) & (rows[:, 1] >= 0)]
        dets = [Detection.from_row24(r, mask_value=int(r[1]) + 1)
                for r in fr]
        system.track_stereo(left, right, i * 0.1, i,
                            detections=dets, instance_mask=inst)

    o = system._object_system
    spans = sorted(len(t.poses_cf) for t in o.all_tracks)
    assert len(o.all_tracks) == N_OBJECTS, (
        f"only {len(o.all_tracks)} of {N_OBJECTS} objects ever initialized"
    )
    well_tracked = sum(s >= int(N_FRAMES * 0.8) for s in spans)
    assert well_tracked >= 10, f"spans too short: {spans}"

    # bounded recompilation: the object axis is padded to powers of two, so
    # a whole 14-object run must fit in O(1) traced shapes per kernel
    assert o._brute_batched._cache_size() <= 2
    assert o._solve_batched._cache_size() <= 2
    assert o._proj_batched._cache_size() <= 2

    # object-pose accuracy across the crowd: median center error of
    # well-tracked objects stays bounded
    errs = []
    for t in o.all_tracks:
        if len(t.poses_cf) < N_FRAMES * 0.8:
            continue
        gt = scene.objects[t.track_id]
        for f, T_co in t.poses_cf.items():
            T_cw = np.linalg.inv(scene.poses_world[f])
            T_co_gt = T_cw @ gt.poses_world[f]
            errs.append(np.linalg.norm(T_co[:3, 3] - T_co_gt[:3, 3]))
    assert np.median(errs) < 0.5, f"median center error {np.median(errs):.3f}"
