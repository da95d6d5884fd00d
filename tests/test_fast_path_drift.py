"""Sequence-scale equivalence of the device fast path vs the host tracker
(slam/fast_path.py:99-162), plus the reject -> host-fallback -> resume
episode. Per-frame equivalence lives in test_fused_track; these tests pin
DRIFT-level agreement over 100+ frames — the serving configuration must
not diverge from the reference implementation it fronts.

Bounds are RELATIVE (fast vs host on the same sequence), not absolute
magic numbers: the host tracker is the stronger in-repo baseline.
"""

import numpy as np
import pytest

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.slam.system import System

N = 100


def _cfg(device_tracking: bool, profile: bool = False) -> SystemConfig:
    cfg = SystemConfig()
    return cfg.replace(
        runtime=cfg.runtime.__class__(
            **{**cfg.runtime.__dict__,
               "device_resident_tracking": device_tracking,
               "profile": profile}),
        loop=cfg.loop.__class__(**{**cfg.loop.__dict__, "enabled": False}),
    )


def _run(scene, renderer, device_tracking: bool, n=N):
    system = System(_cfg(device_tracking))
    for i in range(n):
        left, right, _ = renderer.render(i)
        system.track_stereo(left, right, i * 0.1, i)
    system.wait_for_mapping()
    traj = {f: np.linalg.inv(T)[:3, 3] for f, T, _ in
            system.camera_trajectory()}
    stats = system.shutdown()
    return system, traj, stats


@pytest.fixture(scope="module")
def long_paired():
    scene = make_scene(n_frames=N, n_objects=0, seed=17, forward_speed=0.5,
                       yaw_rate=0.003)
    renderer = SyntheticRenderer(scene)
    fast = _run(scene, renderer, True)
    host = _run(scene, renderer, False)
    return scene, fast, host


def _ate(scene, traj):
    errs = [np.linalg.norm(p - scene.poses_world[f][:3, 3])
            for f, p in traj.items()]
    return float(np.sqrt(np.mean(np.square(errs))))


def test_drift_equivalence_100_frames(long_paired):
    """Fast-path and host-tracker trajectories agree at sequence scale:
    per-frame divergence and final-pose divergence are small fractions of
    the distance traveled, and the fast path's ATE is within a relative
    factor of the host tracker's (not an absolute bound)."""
    scene, (sys_f, traj_f, _), (_, traj_h, _) = long_paired
    assert sys_f._fast_frames >= N * 2 // 3, sys_f._fast_frames
    common = sorted(set(traj_f) & set(traj_h))
    assert len(common) >= N - 3

    dist = np.linalg.norm(
        scene.poses_world[N - 1][:3, 3] - scene.poses_world[0][:3, 3])
    diffs = np.asarray([np.linalg.norm(traj_f[f] - traj_h[f])
                        for f in common])
    med = float(np.median(diffs))
    final = float(np.linalg.norm(traj_f[common[-1]] - traj_h[common[-1]]))
    print(f"median divergence {med:.4f} m, final {final:.4f} m "
          f"over {dist:.1f} m traveled")
    assert med < 0.02 * dist, (med, dist)
    assert final < 0.05 * dist, (final, dist)

    ate_f, ate_h = _ate(scene, traj_f), _ate(scene, traj_h)
    print(f"ATE fast {ate_f:.4f} host {ate_h:.4f}")
    assert ate_f < 1.5 * ate_h + 0.02, (ate_f, ate_h)


def test_reject_fallback_resume():
    """A fast-path reject mid-sequence falls back to the host tracker on
    the SAME frame (fallback_frame) and the fast path resumes afterwards,
    without a trajectory discontinuity (fast_path.py:119-124 reject gate,
    system.py fallback order)."""
    from pointslot_tpu.utils.profiling import PROFILER

    n = 60
    reject_at = 30
    scene = make_scene(n_frames=n, n_objects=0, seed=23, forward_speed=0.5)
    renderer = SyntheticRenderer(scene)
    system = System(_cfg(True, profile=True))  # PROFILER counters gate on
    #                                            runtime.profile
    rejected_before = PROFILER.counters.get("fast_path_rejected", 0)
    fast_before_reject = fast_after_reject = 0
    orig_cfg = system._fast.cfg
    for i in range(n):
        left, right, _ = renderer.render(i)
        if i == reject_at:
            # force the inlier gate impossibly high for ONE frame: the
            # fused step runs, fails the gate, and the host tracker
            # re-runs the frame from the same features
            system._fast.cfg = orig_cfg.replace(
                tracking=orig_cfg.tracking.__class__(
                    **{**orig_cfg.tracking.__dict__,
                       "min_inliers_local_map": 10 ** 6}))
        system.track_stereo(left, right, i * 0.1, i)
        system._fast.cfg = orig_cfg
        if i < reject_at:
            fast_before_reject = system._fast_frames
        else:
            fast_after_reject = system._fast_frames
    system.wait_for_mapping()
    traj = {f: np.linalg.inv(T)[:3, 3] for f, T, _ in
            system.camera_trajectory()}
    system.shutdown()

    assert PROFILER.counters.get("fast_path_rejected", 0) > rejected_before
    # the fast path resumed after the episode
    assert fast_after_reject > fast_before_reject
    # no discontinuity: the frame-to-frame step around the episode stays
    # comparable to the median step of the run
    frames = sorted(traj)
    steps = {f2: np.linalg.norm(traj[f2] - traj[f1])
             for f1, f2 in zip(frames, frames[1:])}
    med_step = float(np.median(list(steps.values())))
    for f in (reject_at, reject_at + 1):
        if f in steps:
            assert steps[f] < 5.0 * med_step + 0.05, (f, steps[f], med_step)
    # and the whole run stays accurate
    errs = [np.linalg.norm(p - scene.poses_world[f][:3, 3])
            for f, p in traj.items()]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.2, ate
