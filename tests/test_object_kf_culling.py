"""Redundant object-keyframe culling (reference
ObjectLocalMapping::KeyFrameCulling, src/ObjectLocalMapping.cpp:269-323):
the 90% rule keeps long-lived tracks' keyframe lists — and with them the
fuse windows, covisibility scans and BA problem packing — bounded.
"""

import numpy as np
import pytest

from pointslot_tpu.config import CameraConfig, SLOTMode, SystemConfig
from pointslot_tpu.slam.objects import ObjectKeyFrameRec, ObjectTrack


def _mk_okf(idx, frame_id, point_idx, T_co=None, n_feats=None,
            level=None, depth=None):
    F = len(point_idx) if n_feats is None else n_feats
    point_idx = np.asarray(point_idx, np.int64)
    if T_co is None:
        T_co = np.eye(4)
        T_co[:3, 3] = [0.1 * idx, 0, 5.0]
    return ObjectKeyFrameRec(
        obj_kf_id=idx,
        frame_id=frame_id,
        T_co=np.asarray(T_co, np.float64),
        T_cw=np.eye(4),
        xy=np.zeros((F, 2), np.float32),
        level=np.zeros(F, np.int32) if level is None else np.asarray(level),
        desc=np.zeros((F, 8), np.uint32),
        angle=np.zeros(F, np.float32),
        depth=np.full(F, 5.0, np.float32) if depth is None else np.asarray(depth),
        u_right=np.zeros(F, np.float32),
        point_idx=point_idx,
    )


def _mk_track(n_kfs=5, n_pts=6):
    """Every KF observes every point (maximal redundancy fixture)."""
    track = ObjectTrack(track_id=0, dims=np.array([1.6, 1.5, 3.5]),
                        max_points=32)
    rows = track.alloc_points(n_pts)
    track.pt_first_okf[rows] = 0
    for i in range(n_kfs):
        okf = _mk_okf(i, frame_id=i * 2, point_idx=rows)
        track.keyframes.append(okf)
        track.obs[rows, i] = True
        track.rel_pose_log[i * 2] = (i, np.eye(4))
    return track, rows


class TestRemoveKeyframes:
    def test_compaction_invariants(self):
        track, rows = _mk_track(n_kfs=5)
        removed_T = track.keyframes[2].T_co.copy()
        track.remove_keyframes([2, 3])
        assert len(track.keyframes) == 3
        # obj_kf_id == list index invariant holds after compaction
        assert [kf.obj_kf_id for kf in track.keyframes] == [0, 1, 2]
        assert [kf.frame_id for kf in track.keyframes] == [0, 2, 8]
        # obs columns compacted: every point still observed by 3 KFs
        assert (track.obs[rows, :3].sum(axis=1) == 3).all()
        assert not track.obs[:, 3:].any()
        # surviving anchors remapped in the rel-pose log
        assert track.rel_pose_log[8][0] == 2
        assert track.rel_pose_log[0][0] == 0

    def test_rebased_rel_pose_preserves_absolute_pose(self):
        track, _ = _mk_track(n_kfs=5)
        # a frame anchored on KF 2 with a nontrivial relative transform
        T_rel = np.eye(4)
        T_rel[:3, 3] = [0.5, 0.2, -0.1]
        T_okf2 = track.keyframes[2].T_co.copy()
        track.rel_pose_log[99] = (2, T_rel.copy())
        absolute_before = T_rel @ T_okf2

        track.remove_keyframes([2])
        new_idx, T_new = track.rel_pose_log[99]
        absolute_after = T_new @ track.keyframes[new_idx].T_co
        np.testing.assert_allclose(absolute_after, absolute_before,
                                   atol=1e-10)

    def test_first_okf_falls_to_earliest_survivor(self):
        track, rows = _mk_track(n_kfs=4)
        # one point first observed at KF 1 (which we remove)
        extra = track.alloc_points(1)
        track.pt_first_okf[extra] = 1
        track.obs[extra, [1, 2, 3]] = True
        track.remove_keyframes([1])
        # earliest surviving observation is old KF 2 -> new index 1
        assert track.pt_first_okf[extra[0]] == 1

    def test_points_only_in_removed_kfs_are_culled(self):
        track, rows = _mk_track(n_kfs=4)
        lonely = track.alloc_points(1)
        track.pt_first_okf[lonely] = 2
        track.obs[lonely, 2] = True
        track.keyframes[2].point_idx = np.concatenate(
            [track.keyframes[2].point_idx, lonely])
        track.remove_keyframes([2])
        assert not track.pt_valid[lonely[0]]

    def test_never_removes_first_or_out_of_range(self):
        track, _ = _mk_track(n_kfs=3)
        track.remove_keyframes([0, -1, 99])
        assert len(track.keyframes) == 3


class TestCullingRule:
    def _system(self, kf_culling=True):
        from pointslot_tpu.slam.system import System

        cfg = SystemConfig(slot_mode=SLOTMode.OFFLINE)
        cfg = cfg.replace(objects=cfg.objects.__class__(**{
            **cfg.objects.__dict__, "kf_culling": kf_culling}))
        return System(cfg)._object_system

    def test_redundant_kf_removed(self):
        o = self._system()
        # 6 KFs all observing the same well-depthed points at scale 0:
        # the middle ones are redundant under the 90% rule
        track, rows = _mk_track(n_kfs=6)
        o.tracks[0] = track
        n_before = len(track.keyframes)
        o._cull_object_keyframes(track)
        assert len(track.keyframes) < n_before
        # first and newest keyframes survive
        assert track.keyframes[0].frame_id == 0
        assert track.keyframes[-1].frame_id == 10

    def test_far_depth_points_do_not_count(self):
        o = self._system()
        far = o.cfg.camera.depth_threshold * 2
        track = ObjectTrack(track_id=0, dims=np.array([1.6, 1.5, 3.5]),
                            max_points=32)
        rows = track.alloc_points(6)
        track.pt_first_okf[rows] = 0
        for i in range(6):
            okf = _mk_okf(i, frame_id=i, point_idx=rows,
                          depth=np.full(len(rows), far, np.float32))
            track.keyframes.append(okf)
            track.obs[rows, i] = True
        o.tracks[0] = track
        o._cull_object_keyframes(track)
        # every observation is beyond ThDepth -> nMPs == 0 -> nothing culled
        assert len(track.keyframes) == 6

    def test_disabled_by_config(self):
        o = self._system(kf_culling=False)
        track, _ = _mk_track(n_kfs=6)
        o.tracks[0] = track
        o._cull_object_keyframes(track)
        assert len(track.keyframes) == 6


@pytest.mark.slow
def test_long_track_keyframes_bounded_and_accurate():
    """130-frame single-object run (VERDICT r3 item 3): culling keeps
    len(track.keyframes) bounded while the object-pose accuracy matches
    the unculled run."""
    from pointslot_tpu.datasets.synthetic import (
        SyntheticRenderer, make_scene, offline_detection_rows,
    )
    from pointslot_tpu.slam.objects import Detection
    from pointslot_tpu.slam.system import System

    cam = CameraConfig(width=768, height=384, fx=450.0, fy=450.0,
                       cx=384.0, cy=192.0, bf=90.0)
    scene = make_scene(n_frames=130, n_points=2500, n_objects=1, seed=7,
                       camera=cam, forward_speed=0.02)
    renderer = SyntheticRenderer(scene)
    rows = offline_detection_rows(scene)

    def run(kf_culling):
        cfg = SystemConfig(slot_mode=SLOTMode.OFFLINE)
        cfg = cfg.replace(
            camera=cam,
            objects=cfg.objects.__class__(**{
                **cfg.objects.__dict__,
                "init_min_features": 10, "init_min_map_points": 8,
                "min_tracked_points": 8, "track_min_features": 10,
                "kf_culling": kf_culling}),
            tracking=cfg.tracking.__class__(**{
                **cfg.tracking.__dict__, "min_init_stereo_features": 200}),
        )
        system = System(cfg)
        peak_kfs = 0
        for i in range(scene.n_frames):
            left, right, inst = renderer.render(i)
            fr = rows[(rows[:, 0] == i) & (rows[:, 1] >= 0)]
            dets = [Detection.from_row24(r, mask_value=int(r[1]) + 1)
                    for r in fr]
            system.track_stereo(left, right, i * 0.1, i,
                                detections=dets, instance_mask=inst)
            o = system._object_system
            if o.all_tracks:
                peak_kfs = max(peak_kfs, len(o.all_tracks[0].keyframes))
        o = system._object_system
        assert len(o.all_tracks) >= 1
        track = o.all_tracks[0]

        gt = scene.objects[track.track_id]
        errs = {}
        for f, T_co in track.poses_cf.items():
            T_cw = np.linalg.inv(scene.poses_world[f])
            T_co_gt = T_cw @ gt.poses_world[f]
            errs[f] = np.linalg.norm(T_co[:3, 3] - T_co_gt[:3, 3])
        return track, errs, peak_kfs

    track_c, errs_c, peak_c = run(kf_culling=True)
    n_poses = len(track_c.poses_cf)
    assert n_poses >= 90, f"track too short ({n_poses}) for the stress"
    # the culled keyframe list stays bounded through a 100+-frame track
    # (reinit-proof: peak over the whole run, not the end state)
    assert peak_c <= 40, f"keyframes unbounded under culling: {peak_c}"

    track_u, errs_u, peak_u = run(kf_culling=False)
    assert peak_u > peak_c, (
        f"culling never reduced the list: peak {peak_c} vs unculled {peak_u}"
    )
    # no accuracy loss over the frames both runs tracked: culled median
    # center error within 20% + 2cm of the unculled run's
    common = sorted(set(errs_c) & set(errs_u))
    assert len(common) >= 60, f"only {len(common)} common tracked frames"
    err_c = float(np.median([errs_c[f] for f in common]))
    err_u = float(np.median([errs_u[f] for f in common]))
    assert err_c <= err_u * 1.2 + 0.02, (
        f"culled err {err_c:.3f} vs unculled {err_u:.3f}"
    )
