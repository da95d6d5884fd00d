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
    system.loop_closer.wait_for_gba()  # background GBA merge must land
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


def test_background_gba_keeps_tracking_responsive():
    """The GBA solve runs on a detached thread outside the map lock
    (reference LoopClosing::RunGlobalBundleAdjustment + mbStopGBA,
    src/LoopClosing.cc:648-752): with the solve artificially slowed,
    tracking frame times while GBA is in flight stay bounded, and the
    merge-back still lands."""
    import time

    scene = make_loop_scene(n_frames=48, seed=41, radius=7.0)
    renderer = SyntheticRenderer(scene)
    cfg = SystemConfig()
    # the reference's thread topology: mapping + loop closing off the
    # tracking thread (the CLI default); GBA additionally leaves the
    # mapping worker for its own detached thread
    cfg = cfg.replace(runtime=cfg.runtime.__class__(
        **{**cfg.runtime.__dict__, "async_mapping": True}))

    import threading

    class TimedLock:
        """RLock proxy recording how long the tracking thread waited to
        acquire the map lock while a GBA solve was in flight — the claim
        under test is 'the solve holds no lock', and on small CI boxes
        wall-clock frame times also absorb CPU contention with the solve's
        own compute, which is not lock blocking."""

        def __init__(self, inner, lc_ref):
            self._l = inner
            self._lc = lc_ref
            self.max_wait_during_gba = 0.0
            self._main = threading.get_ident()

        def __enter__(self):
            in_flight = self._lc[0] is not None and self._lc[0].gba_running
            t0 = time.perf_counter()
            self._l.acquire()
            if in_flight and threading.get_ident() == self._main:
                self.max_wait_during_gba = max(
                    self.max_wait_during_gba, time.perf_counter() - t0)
            return self

        def __exit__(self, *exc):
            self._l.release()

        def acquire(self, *a, **k):
            return self._l.acquire(*a, **k)

        def release(self):
            self._l.release()

    def run_once(slow: bool):
        system = System(cfg)
        lc = system.loop_closer
        lock = TimedLock(system.map_lock, [lc])
        system.map_lock = lock
        system.loop_closer.map_lock = lock
        system.local_mapper.lock = lock
        if slow:
            orig_solve = lc._gba_solve

            def slow_solve(snap):
                time.sleep(1.5)  # make the background window span frames
                return orig_solve(snap)

            lc._gba_solve = slow_solve
        frame_s, during_gba = [], []

        def track(i, left, right):
            in_flight = lc.gba_running
            t0 = time.perf_counter()
            system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i)
            dt = time.perf_counter() - t0
            frame_s.append(dt)
            # count frames that STARTED while the solve was in flight —
            # the loop-closure frame itself waits on the essential-graph/
            # fuse critical section exactly as the reference's tracking
            # waits on mMutexMapUpdate during CorrectLoop
            if in_flight:
                during_gba.append(dt)

        for i in range(scene.n_frames):
            left, right, _ = renderer.render(i)
            track(i, left, right)
        # the loop closes near the sequence end; keep the camera running
        # (stationary on the final view) so frames overlap the solve window
        for j in range(12):
            if not (lc.gba_running or lc.loops_closed == 0):
                break
            track(scene.n_frames + j, left, right)
        system.wait_for_mapping()
        lc.wait_for_gba()
        system.shutdown()
        return system, lc, frame_s, during_gba, lock

    # pass 1 warms every kernel (incl. the GBA solve at this problem
    # shape) — the in-process jit cache carries to the timed pass, so the
    # measurement sees steady-state latency, not one-time compiles
    run_once(slow=False)
    system, lc, frame_s, during_gba, lock = run_once(slow=True)

    assert lc.loops_closed >= 1, "no loop closure fired"
    assert len(during_gba) >= 1, "GBA never overlapped with tracking"
    assert lc.last_gba_stats is not None, "background GBA merge never landed"

    # frames tracked WHILE the slowed GBA solve was in flight must not
    # BLOCK on the map lock (the solve holds no lock; only the brief
    # merge does). Measured directly at the lock: wall-clock frame time
    # also absorbs CPU contention with the solve's own device compute on
    # small CI boxes, which is scheduler fairness, not a locking bug.
    assert lock.max_wait_during_gba < 0.75, (
        f"tracking blocked {lock.max_wait_during_gba:.3f}s on the map "
        "lock while the GBA solve was in flight"
    )
    # loose wall sanity bound: a frame taking >10x median + 1s during the
    # solve window would mean tracking is effectively serialized behind it
    med = float(np.median(frame_s[8:]))
    worst = float(np.max(during_gba))
    assert worst < 10.0 * med + 1.0, (
        f"tracking stalled during GBA: worst {worst:.3f}s vs median {med:.3f}s"
    )

    # and the map is still globally consistent after the async merge
    traj = system.camera_trajectory()
    f0 = traj[0][0]
    A = scene.poses_world[f0]
    errs = [
        np.linalg.norm((A @ np.linalg.inv(T))[:3, 3]
                       - scene.poses_world[f][:3, 3])
        for f, T, _ in traj if f < scene.n_frames
    ]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.25, f"ATE after background GBA {ate:.3f} m"


def test_gba_merge_seam_keyframe_follows_spanning_tree():
    """A keyframe created DURING a background GBA whose parent (tracking
    reference at creation, e.g. after relocalization) sits on the OLD side
    of the loop seam must take the old side's correction — spanning-tree
    propagation (reference src/LoopClosing.cc:686-745) — even though its
    frame id is adjacent to the new side."""
    system = System(SystemConfig())
    m = system.map
    lc = system.loop_closer

    # five solved keyframes: 0-2 old side (frame ids 0-2), 3-4 new side
    # (frame ids 100-101)
    kfs = [m.alloc_keyframe() for _ in range(5)]
    fids = [0, 1, 2, 100, 101]
    for k, f in zip(kfs, fids):
        m.kf_frame_id[k] = f
        m.kf_pose[k] = np.eye(4, dtype=np.float32)
        m.kf_pose[k][:3, 3] = [0.1 * f, 0, 0]

    # the mid-solve keyframe: newest frame id (102, nearest new side),
    # but its parent is OLD-side kf 1 (a relocalization)
    seam = m.alloc_keyframe()
    m.kf_frame_id[seam] = 102
    m.kf_pose[seam] = np.eye(4, dtype=np.float32)
    m.kf_pose[seam][:3, 3] = [0.15, 0, 0]
    m.kf_parent[seam] = kfs[1]

    snap = dict(
        kf_ids=kfs,
        kf_row={int(k): i for i, k in enumerate(kfs)},
        fixed_flags=[False] * 5,
        kf_uid=m.kf_uid[kfs].copy(),
        old_kf_poses=m.kf_pose[kfs].astype(np.float64).copy(),
        pts=np.array([], np.int64),
        pt_first_kf=np.array([], np.int32),
        n_kfs=5,
    )
    # GBA result: old side shifted by +1 in y, new side by +1 in z
    new_poses = m.kf_pose[kfs].astype(np.float64).copy()
    new_poses[:3, 1, 3] += 1.0
    new_poses[3:, 2, 3] += 1.0

    import types

    T_seam_old = m.kf_pose[seam].astype(np.float64).copy()
    T_parent_old = snap["old_kf_poses"][1]
    lc._gba_merge(snap, types.SimpleNamespace(
        poses=new_poses, points=np.zeros((0, 3))))

    expected = (T_seam_old @ np.linalg.inv(T_parent_old)) @ new_poses[1]
    np.testing.assert_allclose(m.kf_pose[seam], expected, atol=1e-5)
    # i.e. the OLD side's +y correction, not the new side's +z
    assert abs(m.kf_pose[seam][1, 3] - (T_seam_old[1, 3] + 1.0)) < 1e-5
    assert abs(m.kf_pose[seam][2, 3] - T_seam_old[2, 3]) < 1e-5


def test_gba_merge_unparented_keyframe_falls_back_to_nearest_fid():
    """Without a parent chain into the solved set, the merge falls back to
    the nearest-frame-id solved keyframe's delta (bounded heuristic)."""
    system = System(SystemConfig())
    m = system.map
    lc = system.loop_closer

    kfs = [m.alloc_keyframe() for _ in range(3)]
    for k, f in zip(kfs, [0, 1, 50]):
        m.kf_frame_id[k] = f
        m.kf_pose[k] = np.eye(4, dtype=np.float32)

    orphan = m.alloc_keyframe()
    m.kf_frame_id[orphan] = 51
    m.kf_pose[orphan] = np.eye(4, dtype=np.float32)
    assert m.kf_parent[orphan] == -1

    snap = dict(
        kf_ids=kfs, kf_row={int(k): i for i, k in enumerate(kfs)},
        fixed_flags=[False] * 3, kf_uid=m.kf_uid[kfs].copy(),
        old_kf_poses=m.kf_pose[kfs].astype(np.float64).copy(),
        pts=np.array([], np.int64), pt_first_kf=np.array([], np.int32),
        n_kfs=3,
    )
    new_poses = m.kf_pose[kfs].astype(np.float64).copy()
    new_poses[2, 0, 3] += 2.0  # only the fid-50 keyframe moves

    import types

    lc._gba_merge(snap, types.SimpleNamespace(
        poses=new_poses, points=np.zeros((0, 3))))
    assert abs(m.kf_pose[orphan][0, 3] - 2.0) < 1e-5
