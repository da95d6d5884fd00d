"""Map / object-state checkpointing.

The reference has NO persistence at all — System::SaveMap/LoadMap is an
unimplemented TODO (reference include/System.h:109-111); the only
deserialization is the vocabulary load. For a multi-host deployment (and
plain crash recovery) checkpointing is required infrastructure, so it is
first-class here: the full MapState SoA tables, the camera trajectory, and
every object track serialize to one compressed npz.
"""

from __future__ import annotations

import numpy as np

_MAP_FIELDS = [
    "kf_pose", "kf_valid", "kf_uid", "kf_frame_id", "kf_xy", "kf_level",
    "kf_desc", "kf_angle", "kf_depth", "kf_uright", "kf_feat_valid",
    "kf_point_idx", "kf_parent", "pt_pos", "pt_desc", "pt_valid", "pt_normal",
    "pt_min_dist", "pt_max_dist", "pt_first_kf", "pt_visible", "pt_found",
    "pt_dynamic", "obs",
]

_TRACK_SCALARS = ["track_id", "last_seen_frame", "last_seen_time", "dynamic",
                  "dyn_votes", "track_ok", "n_inliers"]
_TRACK_ARRAYS = ["dims", "pt_pos", "pt_desc", "pt_valid", "pt_found",
                 "pt_visible", "pt_first_okf", "pt_last_xy", "pt_last_angle",
                 "pt_last_frame",
                 "obs"]
_OKF_ARRAYS = ["xy", "level", "desc", "angle", "depth", "u_right", "point_idx",
               "T_co", "T_cw", "bbox"]


def save_checkpoint(path: str, system) -> None:
    data = {}
    m = system.map
    for f in _MAP_FIELDS:
        data[f"map/{f}"] = getattr(m, f)
    data["map/next_uid"] = np.int64(m._next_uid)

    # tracker continuation state: enough to resume tracking against the
    # restored map (the first resumed frame goes through reference-KF
    # tracking, which needs only ref_kf + the KF tables)
    tr = system.tracker
    data["tracker/state"] = np.int64(tr.state)
    data["tracker/ref_kf"] = np.int64(tr.ref_kf)
    data["tracker/last_kf_frame_id"] = np.int64(tr.last_kf_frame_id)
    data["tracker/last_T_cw"] = (
        tr.last_frame.T_cw if tr.last_frame is not None
        and tr.last_frame.T_cw is not None else np.eye(4, dtype=np.float32)
    )

    traj = system.tracker.trajectory
    data["traj/frame_id"] = np.asarray([e.frame_id for e in traj], np.int64)
    data["traj/ref_kf"] = np.asarray([e.ref_kf for e in traj], np.int64)
    data["traj/ref_uid"] = np.asarray([e.ref_uid for e in traj], np.int64)
    data["traj/T_rel"] = (
        np.stack([e.T_rel for e in traj]) if traj else np.zeros((0, 4, 4))
    )
    data["traj/lost"] = np.asarray([e.lost for e in traj], bool)

    if system._object_system is not None:
        tracks = system._object_system.all_tracks
        data["obj/n_tracks"] = np.int64(len(tracks))
        for i, t in enumerate(tracks):
            for s in _TRACK_SCALARS:
                data[f"obj/{i}/{s}"] = np.asarray(getattr(t, s))
            for a in _TRACK_ARRAYS:
                data[f"obj/{i}/{a}"] = np.asarray(getattr(t, a))
            frames = sorted(t.poses_cf)
            data[f"obj/{i}/frames"] = np.asarray(frames, np.int64)
            data[f"obj/{i}/poses_cf"] = (
                np.stack([t.poses_cf[f] for f in frames])
                if frames else np.zeros((0, 4, 4))
            )
            data[f"obj/{i}/poses_world"] = (
                np.stack([t.poses_world[f] for f in frames])
                if frames else np.zeros((0, 4, 4))
            )
            data[f"obj/{i}/n_okf"] = np.int64(len(t.keyframes))
            for j, okf in enumerate(t.keyframes):
                data[f"obj/{i}/okf/{j}/frame_id"] = np.int64(okf.frame_id)
                for a in _OKF_ARRAYS:
                    v = getattr(okf, a)
                    data[f"obj/{i}/okf/{j}/{a}"] = (
                        v if v is not None else np.zeros(0)
                    )
    np.savez_compressed(path, **data)


def load_checkpoint(path: str, system) -> None:
    from pointslot_tpu.slam.objects import ObjectKeyFrameRec, ObjectTrack
    from pointslot_tpu.slam.tracking import TrajectoryEntry

    z = np.load(path, allow_pickle=False)
    m = system.map
    for f in _MAP_FIELDS:
        if f"map/{f}" in z:          # tolerate checkpoints from older schemas
            getattr(m, f)[...] = z[f"map/{f}"]
    m._next_uid = int(z["map/next_uid"])

    if "tracker/state" in z:
        tr = system.tracker
        tr.state = int(z["tracker/state"])
        tr.ref_kf = int(z["tracker/ref_kf"])
        tr.last_kf_frame_id = int(z["tracker/last_kf_frame_id"])
        # no per-frame features are persisted: resume without a velocity
        # model, so the next frame re-acquires via reference-KF tracking
        tr.velocity = None
        tr.last_frame = None

    # rebuild the loop-closing BoW database from the restored keyframes
    if system.loop_closer is not None:
        db = system.loop_closer.db
        db.clear()
        for kf in m.keyframe_ids():
            db.add(int(kf), m.kf_desc[kf], m.kf_feat_valid[kf])

    system.tracker.trajectory = [
        TrajectoryEntry(
            frame_id=int(f), ref_kf=int(r), ref_uid=int(u),
            T_rel=T, lost=bool(l),
        )
        for f, r, u, T, l in zip(
            z["traj/frame_id"], z["traj/ref_kf"], z["traj/ref_uid"],
            z["traj/T_rel"], z["traj/lost"],
        )
    ]

    if system._object_system is not None and "obj/n_tracks" in z:
        objsys = system._object_system
        objsys.all_tracks = []
        objsys.tracks = {}
        for i in range(int(z["obj/n_tracks"])):
            t = ObjectTrack(
                track_id=int(z[f"obj/{i}/track_id"]),
                dims=z[f"obj/{i}/dims"],
                max_points=len(z[f"obj/{i}/pt_valid"]),
            )
            for s in _TRACK_SCALARS:
                setattr(t, s, z[f"obj/{i}/{s}"].item())
            for a in _TRACK_ARRAYS:
                if f"obj/{i}/{a}" in z:   # fields added later stay at defaults
                    setattr(t, a, z[f"obj/{i}/{a}"].copy())
            frames = z[f"obj/{i}/frames"]
            for k, f in enumerate(frames):
                t.poses_cf[int(f)] = z[f"obj/{i}/poses_cf"][k]
                t.poses_world[int(f)] = z[f"obj/{i}/poses_world"][k]
            for j in range(int(z[f"obj/{i}/n_okf"])):
                kw = {a: z[f"obj/{i}/okf/{j}/{a}"].copy() for a in _OKF_ARRAYS}
                t.keyframes.append(ObjectKeyFrameRec(
                    obj_kf_id=j, frame_id=int(z[f"obj/{i}/okf/{j}/frame_id"]),
                    **kw,
                ))
            objsys.all_tracks.append(t)
            objsys.tracks[t.track_id] = t
