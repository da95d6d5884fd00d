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


def run_objects(async_mapping: bool):
    from pointslot_tpu.config import SLOTMode
    from pointslot_tpu.datasets.synthetic import offline_detection_rows
    from pointslot_tpu.slam.objects import Detection

    scene = make_scene(n_frames=N, n_points=2500, n_objects=2, seed=31,
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
            **{**cfg.runtime.__dict__, "async_mapping": async_mapping}),
    )
    system = System(cfg)
    for i in range(N):
        left, right, inst = renderer.render(i)
        frame_rows = rows[(rows[:, 0] == i) & (rows[:, 1] >= 0)]
        dets = [Detection.from_row24(r, mask_value=int(r[1]) + 1)
                for r in frame_rows]
        system.track_stereo(left, right, i * 0.1, i,
                            detections=dets, instance_mask=inst)
        # bounded-backlog backpressure: the equivalence claim under test
        # is async-vs-sync agreement when the worker roughly keeps up
        # (the reference's real-time operating regime). On a loaded CI
        # box tracking can outrun the mapping worker by many keyframes,
        # and then BOTH systems legitimately diverge (late BA, and the
        # InterruptBA gate skips solves under deep backlog — reference
        # src/LocalMapping.cc:219 behaves the same).
        if system._mapping_thread is not None:
            import time as _time

            for _ in range(2000):
                if system._mapping_queue.qsize() <= 1:
                    break
                _time.sleep(0.005)
    system.wait_for_mapping()
    objsys = system._object_system
    system.shutdown()
    return scene, objsys


def test_object_mapping_off_tracking_thread():
    """Reference runs object fuse/cull/BA on its own thread
    (src/ObjectLocalMapping.cpp:356); with async_mapping the object BA must
    never execute on the tracking (main) thread, and results must match the
    synchronous path."""
    import threading

    scene_a, objsys_a = run_objects(async_mapping=True)
    assert objsys_a.ba_calls >= 1, "object BA never fired"
    main = threading.main_thread().ident
    assert main not in objsys_a.ba_threads, "object BA ran on tracking thread"

    scene_s, objsys_s = run_objects(async_mapping=False)
    assert objsys_s.ba_calls >= 1
    # same-object queue gate may coalesce some solves, never add more
    assert objsys_a.ba_calls <= objsys_s.ba_calls

    # The two SCHEDULES legitimately differ (the async mapper runs BA
    # later, and skips it for a keyframe when another is already queued —
    # the reference's CheckNewKeyFrames/InterruptBA gate,
    # src/LocalMapping.cc:219, behaves identically), so poses are not
    # frame-for-frame comparable. The invariant that must hold is
    # ACCURACY: async object-pose error vs scene GT stays within a
    # relative factor of the sync run's.
    def object_err(scene, objsys):
        errs = []
        for tr in objsys.tracks.values():
            gt_obj = next(
                (o for o in scene.objects if o.track_id == tr.track_id),
                None)
            if gt_obj is None:
                continue
            for f, T_co in tr.poses_cf.items():
                T_cw = np.linalg.inv(scene.poses_world[f])
                gt_T_co = T_cw @ gt_obj.poses_world[f]
                errs.append(np.linalg.norm(T_co[:3, 3] - gt_T_co[:3, 3]))
        return float(np.median(errs)) if errs else np.inf

    err_a = object_err(scene_a, objsys_a)
    err_s = object_err(scene_s, objsys_s)
    print(f"object center err: async {err_a:.3f} sync {err_s:.3f}")
    assert np.isfinite(err_a) and np.isfinite(err_s)
    assert err_a <= 1.5 * err_s + 0.1, (err_a, err_s)


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


def test_worker_drain_ordering_and_shutdown_stress():
    """Ordering/stress for the mapping-worker drain (system.py worker):
    randomized high-rate interleavings of camera and object items must be
    processed exactly once, camera keyframes in FIFO order, and the
    drained-shutdown-sentinel re-arm must terminate the worker cleanly
    even when the sentinel lands inside an object batch."""
    import random
    import time

    from pointslot_tpu.config import SLOTMode

    rng = random.Random(7)
    for trial in range(6):
        cfg = SystemConfig(slot_mode=SLOTMode.OFFLINE)
        cfg = cfg.replace(runtime=cfg.runtime.__class__(
            **{**cfg.runtime.__dict__, "async_mapping": True}))
        system = System(cfg)
        processed = []

        def fake_cam(kf, _rec=processed):
            _rec.append(("camera", kf))
            time.sleep(0.0005)

        def fake_obj(batch, _rec=processed):
            for tid, det in batch:
                _rec.append(("object", tid))
            time.sleep(0.001)

        system._process_keyframe_sync = fake_cam
        system._object_system.process_object_tasks = fake_obj

        # randomized interleaving, bursts of objects to trigger the drain
        sent = []
        cam_id = 0
        for _ in range(rng.randint(20, 60)):
            if rng.random() < 0.4:
                system._mapping_queue.put(("camera", cam_id))
                sent.append(("camera", cam_id))
                cam_id += 1
            else:
                for _ in range(rng.randint(1, 12)):
                    tid = rng.randint(0, 99)
                    system._mapping_queue.put(("object", tid, None))
                    sent.append(("object", tid))
            if rng.random() < 0.2:
                time.sleep(0.002)
        # shutdown immediately — the sentinel may land mid-burst
        stats = system.shutdown()
        assert system._mapping_thread is None
        assert system._mapping_queue.unfinished_tasks == 0, (
            f"trial {trial}: task_done bookkeeping leaked"
        )

        # exactly-once processing
        assert sorted(processed) == sorted(sent), f"trial {trial}"
        # camera keyframes strictly in FIFO order
        cams = [k for tag, k in processed if tag == "camera"]
        assert cams == sorted(cams), f"trial {trial}: camera order {cams}"
