"""Device-resident camera tracking fast path.

Runs the fused per-frame step (ops/fused_track.py — frontend + two
projection-match/pose-LM stages in ONE XLA dispatch) inside the System
facade: the local-map tables live on device and refresh at keyframe rate,
poses/velocities chain device-to-device, and the host downloads only the
pose, the per-feature bindings and depths each frame. Full feature arrays
are materialized only when a keyframe is created.

This is the serving configuration of the TPU design: the regular host
tracker (slam/tracking.py) remains the reference implementation and
handles initialization, relocalization, gated (masked) frames, and any
frame the fast path rejects — mirroring how the reference's
TrackWithMotionModel is the common case with TrackReferenceKeyFrame as
the fallback (reference src/Tracking.cc:1148-1163).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.ops.fused_track import FusedTrackStep
from pointslot_tpu.slam.tracking import FrameRecord, TrackingState
from pointslot_tpu.utils.profiling import PROFILER

M_CAP = 2048


class DeviceTrackingPath:
    """Owns the fused step, the device map tables and the device pose/
    velocity chain. One instance per System."""

    def __init__(self, cfg: SystemConfig, frontend):
        import jax.numpy as jnp

        self.cfg = cfg
        self.step = FusedTrackStep(cfg, frontend=frontend)
        self.table_pts: Optional[np.ndarray] = None  # row -> map point id
        self._tables = None                          # device (pos, desc, lvl, valid)
        self._T_dev = None                           # chained device pose
        self._vel_dev = None
        self._eye = jnp.eye(4, dtype=jnp.float32)

    # ------------------------------------------------------------------
    def invalidate(self):
        self.table_pts = None
        self._tables = None
        self._T_dev = None
        self._vel_dev = None

    def refresh(self, m, ref_kf: int):
        """Rebuild the device local-map tables around ref_kf's covisibility
        neighborhood (keyframe-rate work, like the reference's local map
        update, src/Tracking.cc:3395)."""
        import jax

        if ref_kf < 0 or not m.kf_valid[ref_kf]:
            self.invalidate()
            return
        kfs = list(m.covisible_keyframes(
            ref_kf, min_weight=1,
            max_n=self.cfg.tracking.max_local_keyframes,
        ))
        kfs.append(ref_kf)
        pts = m.points_of_keyframes(np.asarray(kfs, np.int64))
        if len(pts) == 0:
            self.invalidate()
            return
        if len(pts) > M_CAP:
            PROFILER.count("fast_path_table_truncated", len(pts) - M_CAP)
            pts = pts[:M_CAP]
        pos = np.zeros((M_CAP, 3), np.float32)
        desc = np.zeros((M_CAP, 8), np.uint32)
        lvl = np.zeros(M_CAP, np.int32)
        val = np.zeros(M_CAP, bool)
        pos[: len(pts)] = m.pt_pos[pts]
        desc[: len(pts)] = m.pt_desc[pts]
        Tcw = m.kf_pose[ref_kf]
        cam_center = -Tcw[:3, :3].T @ Tcw[:3, 3]
        dists = np.linalg.norm(m.pt_pos[pts] - cam_center, axis=1)
        lvl[: len(pts)] = m.predict_scale(dists, pts)
        val[: len(pts)] = True
        self.table_pts = pts
        self._tables = tuple(jax.device_put(a) for a in (pos, desc, lvl, val))

    # ------------------------------------------------------------------
    def ready(self, tracker) -> bool:
        return (
            self._tables is not None
            and tracker.state == TrackingState.OK
            and tracker.velocity is not None
            and tracker.last_frame is not None
            and tracker.last_frame.T_cw is not None
        )

    def track(self, tracker, left, right, frame_id: int, gate=None):
        """One fused-step frame. Returns the (light) FrameRecord on
        success, or None to signal the caller to run the host tracker
        (full-feature fallback frame available via `materialize`)."""
        import jax.numpy as jnp

        m = tracker.map
        T_prev = (
            self._T_dev
            if self._T_dev is not None
            else jnp.asarray(tracker.last_frame.T_cw, jnp.float32)
        )
        vel = (
            self._vel_dev
            if self._vel_dev is not None
            else jnp.asarray(tracker.velocity, jnp.float32)
        )
        res = self.step(left, right, T_prev, vel, *self._tables, gate=gate)
        self._last_res = res
        # ONE device->host transfer for everything the light frame needs:
        # separate np.asarray calls are separate sync roundtrips (~25 ms
        # each through a remote tunnel; a fixed cost on any host), and
        # they'd run while this thread HOLDS the map lock
        import jax

        pf, level, depth, valid, T_cw, velocity, n_inl = jax.device_get((
            res.point_for_feature, res.level, res.depth, res.valid,
            res.T_cw, res.velocity, res.n_inliers,
        ))
        n_inl = int(n_inl)
        if n_inl < self.cfg.tracking.min_inliers_local_map:
            # reject: host tracker re-runs this frame from the same features
            self._T_dev = None
            self._vel_dev = None
            PROFILER.count("fast_path_rejected")
            return None
        # accept: light host copy — pose, bindings, depth; features stay
        # on device until a keyframe needs them
        frame = FrameRecord(
            frame_id=frame_id,
            xy=None, desc=None, angle=None,
            # level ships with the light frame: the host motion-model
            # fallback reads last_frame.level (tracking.py)
            level=level,
            depth=depth,
            u_right=None,
            valid=valid,
            point_idx=np.where(pf >= 0, self.table_pts[
                np.clip(pf, 0, len(self.table_pts) - 1)
            ], -1),
            T_cw=T_cw,
        )
        self._T_dev = res.T_cw
        self._vel_dev = res.velocity

        # map bookkeeping the host tracker does per frame: visibility for
        # every projected table point, found for the bound ones, ref-KF
        # re-election by observation votes
        m.pt_visible[self.table_pts] += 1
        bound = frame.point_idx[frame.point_idx >= 0]
        m.pt_found[bound] += 1
        if len(bound):
            votes = m.obs[bound].sum(axis=0)
            votes[~m.kf_valid] = 0
            best = int(np.argmax(votes))
            if votes[best] > 0:
                tracker.ref_kf = best
        tracker.n_matches_inliers = n_inl
        tracker.velocity = velocity
        PROFILER.count("frames_tracked_fast")
        PROFILER.count("inliers_total", n_inl)
        return frame

    def materialize(self, frame: FrameRecord) -> FrameRecord:
        """Download the full feature arrays of the last fused step into
        `frame` (keyframe creation / fallback needs them) — one transfer,
        not five sync roundtrips."""
        import jax

        res = self._last_res
        (frame.xy, frame.level, frame.desc, frame.angle,
         frame.u_right) = jax.device_get(
            (res.xy, res.level, res.desc, res.angle, res.u_right))
        return frame

    def fallback_frame(self, frame_id: int) -> FrameRecord:
        """Full FrameRecord from the last fused step's features, with no
        bindings — the host tracker's input when the fast path rejects."""
        import jax

        res = self._last_res
        n = res.xy.shape[0]
        xy, level, desc, angle, depth, u_right, valid = jax.device_get(
            (res.xy, res.level, res.desc, res.angle, res.depth,
             res.u_right, res.valid))
        return FrameRecord(
            frame_id=frame_id,
            xy=xy, level=level, desc=desc, angle=angle,
            depth=depth, u_right=u_right, valid=valid,
            point_idx=np.full(n, -1, np.int64),
        )
