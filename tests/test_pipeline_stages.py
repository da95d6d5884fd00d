"""Pipeline-stage partitioning: mapping host in its own process.

The cross-host form of the reference's thread topology (tracking thread +
LocalMapping/LoopClosing threads, src/System.cc:99-141): keyframe deltas
travel to a mapping-stage process, BA/cull/loop results travel back
(parallel/pipeline.py)."""

import numpy as np
import pytest

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
from pointslot_tpu.slam.system import System

N_FRAMES = 12


def test_map_replica_diff_apply():
    """Row-level delta round-trip between two MapState replicas."""
    from pointslot_tpu.parallel.pipeline import (
        MapReplica, decode_arrays, encode_arrays,
    )
    from pointslot_tpu.slam.map_state import MapState

    rng = np.random.default_rng(0)
    a = MapState(max_kfs=8, max_points=64, feats_per_kf=16)
    b = MapState(max_kfs=8, max_points=64, feats_per_kf=16)
    ra, rb = MapReplica(a), MapReplica(b)

    # a allocates a keyframe + points, binds observations
    kf = a.alloc_keyframe()
    a.kf_pose[kf] = np.diag([1, 1, 1, 1]).astype(np.float32)
    a.kf_frame_id[kf] = 7
    pts = a.alloc_points(5)
    a.pt_pos[pts] = rng.normal(size=(5, 3))
    a.kf_point_idx[kf, :5] = pts
    a.obs[pts, kf] = True

    delta = decode_arrays(encode_arrays(ra.collect()))
    rb.apply(delta)
    assert b.kf_valid[kf] and b.kf_frame_id[kf] == 7
    assert np.allclose(b.pt_pos[pts], a.pt_pos[pts])
    assert b.obs[pts, kf].all()
    assert b._next_uid == a._next_uid

    # b moves a point + culls nothing; the echo must not bounce back to b
    b.pt_pos[pts[0]] += 1.0
    back = decode_arrays(encode_arrays(rb.collect()))
    assert list(back["pt_rows"]) == [int(pts[0])]
    ra.apply(back, guard_uids=True)
    assert np.allclose(a.pt_pos[pts[0]], b.pt_pos[pts[0]])
    # both replicas now agree: no residual diff on either side
    assert len(ra.collect()["pt_rows"]) == 0
    assert len(rb.collect()["kf_rows"]) == 0


def test_uid_guard_rejects_recycled_slot():
    from pointslot_tpu.parallel.pipeline import MapReplica
    from pointslot_tpu.slam.map_state import MapState

    a = MapState(max_kfs=4, max_points=16, feats_per_kf=8)
    ra = MapReplica(a)
    kf = a.alloc_keyframe()
    delta = ra.collect()                      # snapshot with uid 0
    # slot recycled locally: new uid
    a.remove_keyframe(kf)
    kf2 = a.alloc_keyframe()
    assert kf2 == kf and a.kf_uid[kf] != delta["kf/kf_uid"][0]
    ra.shadow["kf_valid"][kf] = a.kf_valid[kf]  # pretend synced
    stale = dict(delta)
    stale["kf/kf_pose"] = delta["kf/kf_pose"] + 5.0
    ra.apply(stale, guard_uids=True)
    assert not np.allclose(a.kf_pose[kf], stale["kf/kf_pose"][0]), (
        "stale update clobbered a recycled keyframe slot"
    )


@pytest.fixture(scope="module")
def paired_runs():
    """The same synthetic mode-0 sequence through the in-process System and
    the pipeline-partitioned System."""
    scene = make_scene(n_frames=N_FRAMES, n_points=2500, n_objects=0, seed=11,
                       forward_speed=0.6)
    renderer = SyntheticRenderer(scene)
    results = {}
    for name, pipeline in (("inproc", False), ("pipeline", True)):
        cfg = SystemConfig(slot_mode=0)
        cfg = cfg.replace(
            runtime=cfg.runtime.__class__(
                **{**cfg.runtime.__dict__, "pipeline_stages": pipeline}),
            tracking=cfg.tracking.__class__(
                **{**cfg.tracking.__dict__, "min_init_stereo_features": 350}),
        )
        system = System(cfg)
        for i in range(N_FRAMES):
            left, right, inst = renderer.render(i)
            system.track_stereo(left, right, timestamp=i * 0.1, frame_id=i)
        traj = system.camera_trajectory()
        stats = system.shutdown()
        results[name] = (traj, stats, system)
    return scene, results


def test_pipeline_stage_runs_and_syncs(paired_runs):
    scene, results = paired_runs
    traj, stats, system = results["pipeline"]
    assert stats["pipeline_packets"] >= 1, "no keyframes crossed the channel"
    assert stats["pipeline_bytes_received"] > 0, "mapping host never replied"
    # mapping results flowed back: triangulated points live in the
    # mapping host's arena (high half of the point table)
    hi = system.map.max_points // 2
    assert system.map.pt_valid[hi:].sum() > 0, (
        "no triangulated points came back from the mapping stage"
    )


def test_pipeline_matches_inprocess_accuracy(paired_runs):
    scene, results = paired_runs

    def ate(traj):
        f0 = traj[0][0]
        A = scene.poses_world[f0]
        errs = [
            np.linalg.norm((A @ np.linalg.inv(T))[:3, 3]
                           - scene.poses_world[f][:3, 3])
            for f, T, _ in traj
        ]
        return float(np.sqrt(np.mean(np.square(errs))))

    ate_in = ate(results["inproc"][0])
    ate_pp = ate(results["pipeline"][0])
    assert len(results["pipeline"][0]) >= N_FRAMES - 2
    assert ate_pp < max(2.0 * ate_in, 0.15), (
        f"pipelined ATE {ate_pp:.3f} vs in-process {ate_in:.3f}"
    )
