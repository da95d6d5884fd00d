"""Per-frame object-SLOT pipeline (modes 2/3/4).

Replaces the object half of the reference Tracking thread plus the
ObjectLocalMapping thread:

- TrackMapObject association + velocity prediction (reference
  src/Tracking.cc:1533-1638)
- InitializeCurrentObjPose / MapObjectInit / MapObjectReInit (:1640-2031)
- TrackLastFrameObjectPoint -> CFSE3ObjStateOptimization (:2288-2466)
- TrackObjectLocalMap (:2468-2712)
- DynamicStaticDiscrimination (:2058-2202) + MapObject::DynamicDetection
  hysteresis
- StaticPointRecoveryFromObj (:2204-2254)
- NeedNewObjectKeyFrame / CreateNewObjectKeyFrame (:2714-2837)
- ObjectLocalMapping::Run culling + fuse + ObjectLocalBundleAdjustment
  (reference src/ObjectLocalMapping.cpp, src/Optimizer.cc:755-1075)

TPU design notes: object features come from ONE masked extractor pass over
the union instance mask (the reference runs a dense OpenCV ORB per object,
src/Frame.cc:2623-2665); per-object pose solves share the jitted LM kernel
with fixed 512-edge capacity, with the detection-translation prior
(info=50*I) of the reference's EdgeTransConstraintFromDetction; object BA
reuses the Schur engine with roll/pitch frozen via the dof mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.slam import matchers
from pointslot_tpu.slam.objects import Detection, ObjectKeyFrameRec, ObjectTrack
from pointslot_tpu.solvers import local_ba, pose_opt

EDGE_CAP = 512
F_CAP = 512  # per-detection feature capacity (static shape for the kernels)


def _rotation_y_matrix(ry: float) -> np.ndarray:
    """Rotation about the camera y-axis (vehicle heading in KITTI)."""
    c, s = np.cos(ry), np.sin(ry)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def heading_y(R: np.ndarray) -> float:
    return float(np.arctan2(R[0, 2], R[2, 2]))


def _pose_bucket(n: int, cap: int) -> int:
    """Next power-of-two pose capacity (>=16) for a window of n poses."""
    b = 16
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


@dataclass
class ObjectFrameFeatures:
    """Object-region features of the current frame, with detection labels."""

    xy: np.ndarray
    level: np.ndarray
    desc: np.ndarray
    angle: np.ndarray
    depth: np.ndarray
    u_right: np.ndarray
    valid: np.ndarray
    det_index: np.ndarray    # (N,) index into the frame's detection list, -1 none


class ObjectSystem:
    def __init__(self, config: SystemConfig, system):
        import threading

        self.cfg = config
        self.system = system
        self.tracks: Dict[int, ObjectTrack] = {}
        self.all_tracks: List[ObjectTrack] = []
        self.finished_tracks: List[ObjectTrack] = []
        # object-map concurrency (the reference's ObjectLocalMapping thread
        # owns its queue + per-object gate, src/ObjectLocalMapping.cpp:32-55):
        # track tables are guarded by _obj_lock; the expensive BA solve runs
        # OUTSIDE the lock on the mapping worker so tracking never stalls on
        # an object-KF spawn
        self._obj_lock = threading.RLock()
        self._pending_okfs: Dict[int, int] = {}
        self.ba_threads: set = set()  # thread idents that ran an object BA
        cam = config.camera
        self._cam_args = dict(
            fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx), cy=float(cam.cy),
            bf=float(cam.bf),
        )
        self._cam_args_nobf = dict(
            fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx), cy=float(cam.cy),
        )
        self._scales = np.asarray(
            [config.orb.scale_factor ** i for i in range(config.orb.n_levels)],
            np.float32,
        )
        self.ba_calls = 0
        # dedicated object feature engine (the reference's second extractor,
        # dense OpenCV ORB on object masks, src/Frame.cc:2623-2665) — shares
        # the camera frontend unless the object BRIEF pattern differs
        self._frontend = system.frontend
        if config.objects.brief_pattern != config.orb.brief_pattern:
            from pointslot_tpu.ops.frontend import StereoFrontend

            orb = config.orb.__class__(**{
                **config.orb.__dict__,
                "brief_pattern": config.objects.brief_pattern,
            })
            self._frontend = StereoFrontend(
                cam.height, cam.width, cam.fx, cam.bf, orb
            )
        self._build_batched_kernels()

    # ------------------------------------------------------------------
    def _build_batched_kernels(self):
        """One jit per stage, vmapped over the object axis: the reference
        loops objects serially (src/Tracking.cc:2288-2466); here every
        object of the frame is matched and solved in a single program."""
        import jax

        cam = self._cam_args
        w, h = self.cfg.camera.width, self.cfg.camera.height
        scales = jnp.asarray(self._scales)

        # ratio + rotation-histogram filtering, the reference's
        # SearchByBruceMatching protocol (src/ORBmatcher.cc:2043-2155);
        # point angles are their last observed keypoint orientation. When
        # GMS is enabled the histogram is skipped, matching the reference's
        # GMS path (TwoFrameObjectPointsBruceMatching src/ORBmatcher.cc:1982
        # ratio-only brute + grid filter).
        rot_check = not self.cfg.objects.use_gms

        def one_brute(f_desc, f_angle, f_valid, p_desc, p_angle, p_valid):
            return matchers.brute_match(
                f_desc, f_angle, f_valid,
                p_desc, p_angle, p_valid,
                nn_ratio=0.9, th_desc=matchers.TH_HIGH,
                check_rotation=rot_check,
            ).idx_b_for_a

        self._brute_batched = jax.jit(jax.vmap(one_brute))

        ocfg = self.cfg.objects

        def one_guided(pred_xy, pred_ok, p_desc, f_xy, f_desc, f_valid):
            r = matchers.guided_match(
                pred_xy, pred_ok, p_desc, f_xy, f_desc, f_valid,
                radius=ocfg.flow_match_radius,
                th_desc=ocfg.flow_match_th_desc,
            )
            return r.point_for_feature, r.n_matches

        self._guided_batched = jax.jit(jax.vmap(one_guided))

        def one_proj(pt_pos, pt_desc, pt_valid, T, f_xy, f_level, f_desc, f_valid):
            M = pt_pos.shape[0]
            return matchers.project_and_match(
                pt_pos, pt_desc, pt_valid, T,
                f_xy, f_level, f_desc, f_valid,
                jnp.full((M,), 6.0, jnp.float32), scales,
                jnp.zeros(M, jnp.int32),
                width=w, height=h, th_desc=matchers.TH_HIGH, **cam,
            ).point_for_feature

        self._proj_batched = jax.jit(jax.vmap(one_proj))

        def solve_batch(T0, edges, priors):
            return pose_opt.pose_optimize_batched(
                T0, edges, **cam, trans_priors=priors, use_trans_prior=True,
            )

        self._solve_batched = jax.jit(solve_batch)

    # ------------------------------------------------------------------
    def process_frame(self, frame, left, right, detections, instance_mask,
                      timestamp, flow=None):
        """flow: optional (H, W, 2) forward optical flow of the PREVIOUS
        frame (pixel displacement last->current, Virtual KITTI offline
        maps) — switches point tracking from brute matching to the
        flow-guided path (reference SearchByOfflineOpticalFlowTracking)."""
        if not detections:
            return
        dets = [d for d in detections if d.track_id >= 0]
        if self.cfg.objects.select_tracked_obj_id >= 0:
            dets = [d for d in dets
                    if d.track_id == self.cfg.objects.select_tracked_obj_id]
        if not dets or instance_mask is None:
            return

        from pointslot_tpu.utils.profiling import PROFILER

        with PROFILER.timer("obj_extract"):
            feats = self._extract_object_features(
                left, right, instance_mask, dets)
        T_cw = frame.T_cw.astype(np.float64)

        with self._obj_lock:
            to_init, to_track = [], []
            for di, det in enumerate(dets):
                fsel = np.nonzero(feats.det_index == di)[0]
                track = self.tracks.get(det.track_id)
                if track is None or track.n_points() == 0:
                    to_init.append((det, fsel))
                else:
                    to_track.append((det, fsel, track))

            with PROFILER.timer("obj_track"):
                failed = self._track_objects_batched(to_track, feats, T_cw,
                                                     timestamp, flow=flow)
            for det, fsel, track in failed:
                missing_t = timestamp - track.last_seen_time
                if missing_t > self.cfg.objects.max_missing_dt:
                    # re-init the object from scratch (MapObjectReInit)
                    self._reinit(track, det, feats, fsel, T_cw, timestamp)
            with PROFILER.timer("obj_init"):
                for det, fsel in to_init:
                    self._try_init(det, feats, fsel, T_cw, timestamp)

    # ------------------------------------------------------------------
    def _extract_object_features(self, left, right, instance_mask, dets):
        from pointslot_tpu.ops.frontend import dilate_mask_left

        gate = instance_mask > 0
        gate_r = dilate_mask_left(gate, max_disparity=128)
        sf = self._frontend(left, right, gate=gate, gate_right=gate_r)
        # one transfer for the whole feature set (per-field np.asarray is
        # a sync roundtrip each)
        import jax

        sf = type(sf)(*jax.device_get(tuple(sf)))
        xy = np.asarray(sf.xy)
        valid = np.asarray(sf.valid)
        H, W = instance_mask.shape
        xi = np.clip(np.round(xy[:, 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(xy[:, 1]).astype(int), 0, H - 1)
        mask_vals = instance_mask[yi, xi]
        det_index = np.full(len(xy), -1, np.int32)
        for di, det in enumerate(dets):
            det_index[(mask_vals == det.mask_value) & valid] = di
        return ObjectFrameFeatures(
            xy=xy,
            level=np.asarray(sf.level),
            desc=np.asarray(sf.desc),
            angle=np.asarray(sf.angle),
            depth=np.asarray(sf.depth),
            u_right=np.asarray(sf.u_right),
            valid=valid,
            det_index=det_index,
        )

    # ------------------------------------------------------------------
    def _init_pose_from_detection(self, det: Detection, feats, fsel) -> Optional[np.ndarray]:
        """InitializeCurrentObjPose: rotation from detection yaw; translation
        from the trimmed centroid of stereo points (reference
        src/Tracking.cc:1640-1703) or the detection location."""
        R = _rotation_y_matrix(det.rotation_y)
        if self.cfg.objects.set_init_position_by_points:
            stereo = fsel[feats.depth[fsel] > 0]
            if len(stereo) >= 3:
                z = feats.depth[stereo]
                cam = self.cfg.camera
                x = (feats.xy[stereo, 0] - cam.cx) * z / cam.fx
                y = (feats.xy[stereo, 1] - cam.cy) * z / cam.fy
                pc = np.stack([x, y, z], axis=1)
                # trimmed centroid: drop depth outliers beyond 1 sigma-ish
                med = np.median(pc, axis=0)
                d = np.linalg.norm(pc - med, axis=1)
                keep = d < max(np.median(d) * 2.5, 1.0)
                t = pc[keep].mean(axis=0) if keep.sum() >= 3 else med
            else:
                t = det.location_cam
        else:
            t = det.location_cam
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        if self.cfg.objects.set_init_position_by_points:
            # refine the centroid init against the detected 2D box
            # (Tracking::FineTuningUsing2dBox, src/Tracking.cc:1704-1786)
            from pointslot_tpu.solvers.object_factors import fine_tune_with_bbox

            T = np.asarray(
                fine_tune_with_bbox(
                    jnp.asarray(T, jnp.float32),
                    jnp.asarray(det.dims[::-1].copy(), jnp.float32),  # (w,h,l)->xyz extents
                    jnp.asarray(det.bbox, jnp.float32),
                    **self._cam_args_nobf,
                ),
                np.float64,
            )
        return T

    def _point_max_dist(self, det: Detection) -> float:
        if self.cfg.objects.manual_point_max_distance:
            return self.cfg.objects.in_obj_frame_point_max_distance
        return float(np.linalg.norm(np.asarray(det.dims) / 2.0))

    def _unproject(self, feats, fsel):
        cam = self.cfg.camera
        z = feats.depth[fsel]
        x = (feats.xy[fsel, 0] - cam.cx) * z / cam.fx
        y = (feats.xy[fsel, 1] - cam.cy) * z / cam.fy
        return np.stack([x, y, z], axis=1)

    # ------------------------------------------------------------------
    def _try_init(self, det, feats, fsel, T_cw, timestamp):
        stereo = fsel[(feats.depth[fsel] > 0)]
        if len(stereo) < self.cfg.objects.init_min_features:
            return
        T_co = self._init_pose_from_detection(det, feats, fsel)
        track = self.tracks.get(det.track_id)
        if track is None:
            track = ObjectTrack(
                track_id=det.track_id,
                dims=np.asarray(det.dims, np.float64),
                max_points=self.cfg.objects.max_object_points,
            )
            self.tracks[det.track_id] = track
            self.all_tracks.append(track)
        self._add_keyframe_with_points(track, det, feats, fsel, T_co, T_cw, timestamp)
        if track.n_points() >= self.cfg.objects.init_min_map_points:
            track.track_ok = True
        self._record_state(track, det, T_co, T_cw, timestamp)

    def _reinit(self, track, det, feats, fsel, T_cw, timestamp):
        track.epoch += 1
        track.pt_valid[:] = False
        track.obs[:, :] = False
        track.keyframes.clear()
        track.velocity_world = None
        self._try_init(det, feats, fsel, T_cw, timestamp)

    # ------------------------------------------------------------------
    def _add_keyframe_with_points(self, track, det, feats, fsel, T_co, T_cw,
                                  timestamp, bind: Optional[np.ndarray] = None):
        """Create an ObjectKeyFrame; spawn object points from unbound stereo
        features within the scale bound."""
        okf_idx = len(track.keyframes)
        if okf_idx >= track.MAX_OKF:
            return None
        F = len(fsel)
        point_idx = np.full(F, -1, np.int64) if bind is None else bind.copy()
        okf = ObjectKeyFrameRec(
            obj_kf_id=okf_idx,
            frame_id=det.frame_id,
            T_co=np.asarray(T_co, np.float64),
            T_cw=np.asarray(T_cw, np.float64),
            xy=feats.xy[fsel].copy(),
            level=feats.level[fsel].copy(),
            desc=feats.desc[fsel].copy(),
            angle=feats.angle[fsel].copy(),
            depth=feats.depth[fsel].copy(),
            u_right=feats.u_right[fsel].copy(),
            point_idx=point_idx,
            bbox=np.asarray(det.bbox, np.float64),
        )
        # bind existing points' observations
        bound = np.nonzero(point_idx >= 0)[0]
        if len(bound):
            track.obs[point_idx[bound], okf_idx] = True
        # spawn new points from unbound stereo features
        T_oc = np.linalg.inv(okf.T_co)
        new_sel = np.nonzero((point_idx < 0) & (okf.depth > 0))[0]
        if len(new_sel):
            pc = self._unproject_local(okf, new_sel)
            po = pc @ T_oc[:3, :3].T + T_oc[:3, 3]
            in_bound = np.linalg.norm(po, axis=1) <= self._point_max_dist(det)
            new_sel = new_sel[in_bound]
            po = po[in_bound]
            n_free = int((~track.pt_valid).sum())
            if len(new_sel) > n_free:
                new_sel, po = new_sel[:n_free], po[:n_free]
            if len(new_sel):
                rows = track.alloc_points(len(new_sel))
                track.pt_pos[rows] = po
                track.pt_desc[rows] = okf.desc[new_sel]
                track.pt_first_okf[rows] = okf_idx
                track.pt_found[rows] = 1
                track.pt_visible[rows] = 1
                track.pt_last_xy[rows] = okf.xy[new_sel]
                track.pt_last_angle[rows] = okf.angle[new_sel]
                track.pt_last_frame[rows] = okf.frame_id
                okf.point_idx[new_sel] = rows
                track.obs[rows, okf_idx] = True
        track.keyframes.append(okf)
        self._schedule_object_mapping(track, det)
        return okf

    def _schedule_object_mapping(self, track: ObjectTrack, det: Detection):
        """Hand the new object keyframe to the mapping worker when the
        async pipeline is on (reference ObjectLocalMapping::
        InsertOneObjKeyFrame, src/ObjectLocalMapping.cpp:55); inline
        otherwise."""
        sys_ = self.system
        if sys_ is not None and getattr(sys_, "_mapping_thread", None) is not None:
            self._pending_okfs[track.track_id] = (
                self._pending_okfs.get(track.track_id, 0) + 1
            )
            sys_._mapping_queue.put(("object", track.track_id, det))
        else:
            self._object_local_mapping(track, det)

    def process_object_task(self, track_id: int, det: Detection):
        """Mapping-worker entry. Same-object queue gate: while another
        keyframe of THIS object is still queued, defer fuse/cull/BA to the
        newest one (reference ObjectLocalMapping::CheckTheSameObject,
        src/ObjectLocalMapping.cpp:32-47, gate at :370)."""
        self.process_object_tasks([(track_id, det)])

    def process_object_tasks(self, items):
        """Batched mapping-worker entry: apply the same-object gate to every
        queued (track_id, det), then solve ALL gate-cleared objects' windowed
        BAs in ONE vmapped device dispatch (object-parallel BA — where the
        reference serializes per-object solves on its mapping thread,
        src/ObjectLocalMapping.cpp:356-395)."""
        ready = []
        with self._obj_lock:
            for track_id, det in items:
                self._pending_okfs[track_id] = (
                    self._pending_okfs.get(track_id, 1) - 1
                )
                if self._pending_okfs.get(track_id, 0) > 0:
                    continue
                track = self.tracks.get(track_id)
                if track is None or not track.keyframes:
                    continue
                ready.append((track, det))
        if len(ready) <= 1:
            for track, det in ready:
                self._object_local_mapping(track, det)
            return
        # batched path: cull/fuse + problem build under the lock, one
        # stacked solve outside it, epoch-guarded write-backs
        built = []
        with self._obj_lock:
            for track, det in ready:
                okf_idx = len(track.keyframes) - 1
                epoch = getattr(track, "epoch", 0)
                self._cull_object_points(track, okf_idx)
                self._fuse_object_neighbors(track, okf_idx)
                n_cov = len(track.covisible_keyframes(okf_idx, min_weight=5))
                ba_inputs = None
                if n_cov > self.cfg.objects.ba_min_covisible_kfs:
                    ba_inputs = self._build_object_ba(track, okf_idx)
                if ba_inputs is not None:
                    built.append((track, epoch, ba_inputs))
                else:
                    # no solve pending for this track -> safe to cull now
                    # (culling between a BA build and its write-back would
                    # shift the okf indices the solve was built against)
                    self._cull_object_keyframes(track)
        if not built:
            return
        # group by problem shape (windows bucket their pose capacity to
        # powers of two); each shape group solves in one vmapped dispatch
        from collections import defaultdict

        groups = defaultdict(list)
        for b in built:
            prob = b[2][0]
            groups[(prob.poses.shape[0], prob.points.shape[0])].append(b)
        import threading

        for (P_cap, _), grp in groups.items():
            probs = local_ba.stack_problems([b[2][0] for b in grp])
            pri_list = [b[2][3] for b in grp]
            priors = None
            if any(p is not None for p in pri_list):
                priors = local_ba.stack_problems([
                    p if p is not None
                    else local_ba.empty_motion_priors(R_cap=P_cap)
                    for p in pri_list
                ])
            results = local_ba.bundle_adjust_batched(
                probs, **self._cam_args, priors=priors
            )
            # host materialization outside the lock (see
            # _object_local_mapping): the per-object np.asarray slicing in
            # the locked write-back must not wait on the device solve.
            # ONE transfer for the whole result stack (per-field asarray
            # is a sync roundtrip each)
            import jax

            results = list(jax.device_get(tuple(results)))
            self.ba_calls += len(grp)
            self.ba_threads.add(threading.get_ident())
            with self._obj_lock:
                for bi, (track, epoch, (prob, slot_edge, meta, _)) in enumerate(grp):
                    if getattr(track, "epoch", 0) != epoch:
                        continue
                    res = local_ba.BAResult(
                        *(np.asarray(x[bi]) for x in results))
                    self._apply_object_ba(track, res, slot_edge, meta)
                    self._cull_object_keyframes(track)

    def _unproject_local(self, okf, sel):
        cam = self.cfg.camera
        z = okf.depth[sel]
        x = (okf.xy[sel, 0] - cam.cx) * z / cam.fx
        y = (okf.xy[sel, 1] - cam.cy) * z / cam.fy
        return np.stack([x, y, z], axis=1)

    # ------------------------------------------------------------------
    def _prior_translation(self, det, feats, fsel) -> np.ndarray:
        """Detection-derived translation prior for the pose solve (the
        reference's EdgeTransConstraintFromDetction anchor): trimmed stereo
        centroid or the offline location."""
        if self.cfg.objects.set_init_position_by_points:
            stereo = fsel[feats.depth[fsel] > 0]
            if len(stereo) >= 3:
                pc = self._unproject(feats, stereo)
                med = np.median(pc, axis=0)
                d = np.linalg.norm(pc - med, axis=1)
                keep = d < max(np.median(d) * 2.5, 1.0)
                return pc[keep].mean(axis=0) if keep.sum() >= 3 else med
        return np.asarray(det.location_cam, np.float64)

    def _build_edges(self, items, binds, feats):
        """Batched PoseObs from per-object feature bindings."""
        O = len(items)
        pts = np.zeros((O, EDGE_CAP, 3), np.float32)
        obs = np.zeros((O, EDGE_CAP, 3), np.float32)
        stereo = np.zeros((O, EDGE_CAP), bool)
        inv2 = np.ones((O, EDGE_CAP), np.float32)
        valid = np.zeros((O, EDGE_CAP), bool)
        for oi, (det, fsel, track) in enumerate(items):
            bind = binds[oi]
            good = np.nonzero(bind >= 0)[0][:EDGE_CAP]
            n = len(good)
            if n == 0:
                continue
            f = fsel[good]
            pts[oi, :n] = track.pt_pos[bind[good]]
            obs[oi, :n] = np.stack(
                [feats.xy[f, 0], feats.xy[f, 1], feats.u_right[f]], axis=1
            )
            stereo[oi, :n] = feats.depth[f] > 0
            inv2[oi, :n] = (1.0 / self._scales**2)[feats.level[f]]
            valid[oi, :n] = True
        return pose_opt.PoseObs(
            pts=jnp.asarray(pts), obs=jnp.asarray(obs),
            is_stereo=jnp.asarray(stereo), inv_sigma2=jnp.asarray(inv2),
            valid=jnp.asarray(valid),
        ), valid

    def _track_objects_batched(self, items, feats, T_cw, timestamp,
                               flow=None):
        """Track every live object of the frame in four batched programs:
        point match (flow-guided when `flow` maps are supplied, brute
        otherwise) -> pose LM -> local-map projection -> pose LM.
        Returns the list of (det, fsel, track) that failed."""
        if not items:
            return []
        min_feats = self.cfg.objects.track_min_features // 2
        pre_failed = [it for it in items if len(it[1]) < min_feats]
        for det, fsel, track in pre_failed:
            track.track_ok = False
        items = [it for it in items if len(it[1]) >= min_feats]
        if not items:
            return pre_failed

        O = len(items)
        # pad the object axis to a power of two (bounds recompilation)
        O_pad = 1
        while O_pad < O:
            O_pad *= 2

        P = self.cfg.objects.max_object_points
        f_xy = np.zeros((O_pad, F_CAP, 2), np.float32)
        pt_angle = np.zeros((O_pad, P), np.float32)
        f_level = np.zeros((O_pad, F_CAP), np.int32)
        f_desc = np.zeros((O_pad, F_CAP, 8), np.uint32)
        f_angle = np.zeros((O_pad, F_CAP), np.float32)
        f_valid = np.zeros((O_pad, F_CAP), bool)
        pt_pos = np.zeros((O_pad, P, 3), np.float32)
        pt_desc = np.zeros((O_pad, P, 8), np.uint32)
        pt_valid = np.zeros((O_pad, P), bool)
        T_pred = np.tile(np.eye(4, dtype=np.float32), (O_pad, 1, 1))
        priors = np.zeros((O_pad, 3), np.float32)
        fsels = []
        for oi, (det, fsel, track) in enumerate(items):
            fsel = fsel[:F_CAP]
            fsels.append(fsel)
            n = len(fsel)
            f_xy[oi, :n] = feats.xy[fsel]
            f_level[oi, :n] = feats.level[fsel]
            f_desc[oi, :n] = feats.desc[fsel]
            f_angle[oi, :n] = feats.angle[fsel]
            f_valid[oi, :n] = feats.valid[fsel]
            pt_pos[oi] = track.pt_pos
            pt_desc[oi] = track.pt_desc
            pt_angle[oi] = track.pt_last_angle
            pt_valid[oi] = track.pt_valid
            Tp = track.predict_pose_cf(det.frame_id, T_cw)
            if Tp is None:
                Tp = self._init_pose_from_detection(det, feats, fsel)
            T_pred[oi] = Tp
            priors[oi] = self._prior_translation(det, feats, fsel)

        # stage 1: batched brute match (SearchByBruceMatching analog)
        bind_j = self._brute_batched(
            jnp.asarray(f_desc), jnp.asarray(f_angle), jnp.asarray(f_valid),
            jnp.asarray(pt_desc), jnp.asarray(pt_angle), jnp.asarray(pt_valid),
        )
        # the velocity-pose projection supplement (consumed further down)
        # is independent of the brute result: dispatch it NOW so both
        # matchers come back in ONE transfer
        pf0_j = self._proj_batched(
            jnp.asarray(pt_pos), jnp.asarray(pt_desc), jnp.asarray(pt_valid),
            jnp.asarray(T_pred, jnp.float32),
            jnp.asarray(f_xy), jnp.asarray(f_level), jnp.asarray(f_desc),
            jnp.asarray(f_valid),
        )
        # one transfer, then host-side slicing (per-object np.asarray is a
        # sync roundtrip per object)
        import jax

        bind_np, pf0_np = (np.asarray(x)
                           for x in jax.device_get((bind_j, pf0_j)))
        binds = [bind_np[oi].astype(np.int64)[: len(fsels[oi])]
                 for oi in range(O)]

        if flow is not None:
            # flow-guided path (SearchByOfflineOpticalFlowTracking analog):
            # warp each point's last observed pixel by the previous frame's
            # forward flow and match within a small radius; an object keeps
            # the guided binding when it yields >= 5 pairs, else it falls
            # back to the brute result (reference nMinRansacNum fallback,
            # src/ORBmatcher.cc:2319-2334)
            H_f, W_f = flow.shape[:2]
            pred_xy = np.zeros((O_pad, P, 2), np.float32)
            pred_ok = np.zeros((O_pad, P), bool)
            for oi, (det, fsel, track) in enumerate(items):
                anchored = track.pt_valid & (
                    track.pt_last_frame == det.frame_id - 1
                )
                rows = np.nonzero(anchored)[0]
                if len(rows) == 0:
                    continue
                xy = track.pt_last_xy[rows]
                xi = np.clip(np.round(xy[:, 0]).astype(int), 0, W_f - 1)
                yi = np.clip(np.round(xy[:, 1]).astype(int), 0, H_f - 1)
                uv = flow[yi, xi]
                pred_xy[oi, rows] = xy + uv
                pred_ok[oi, rows] = True
            pf_g, n_g = jax.device_get(self._guided_batched(
                jnp.asarray(pred_xy), jnp.asarray(pred_ok),
                jnp.asarray(pt_desc),
                jnp.asarray(f_xy), jnp.asarray(f_desc), jnp.asarray(f_valid),
            ))
            for oi in range(O):
                if int(n_g[oi]) >= 5:
                    binds[oi] = np.asarray(pf_g[oi]).astype(np.int64)[
                        : len(fsels[oi])
                    ]
                    items[oi][2].flow_tracked_frames += 1

        if self.cfg.objects.use_gms:
            # GMS consistency filter on the brute matches, using each
            # point's predicted projection as the second view (the
            # reference's SearchByBruceMatchingWithGMS role)
            from pointslot_tpu.ops.gms import gms_filter

            cam = self.cfg.camera
            for oi, (det, _, track) in enumerate(items):
                bind = binds[oi]
                good = np.nonzero(bind >= 0)[0]
                if len(good) < 20:
                    continue
                po = track.pt_pos[bind[good]]
                T = T_pred[oi].astype(np.float64)
                pc = po @ T[:3, :3].T + T[:3, 3]
                z = np.maximum(pc[:, 2], 1e-6)
                proj = np.stack(
                    [cam.fx * pc[:, 0] / z + cam.cx,
                     cam.fy * pc[:, 1] / z + cam.cy], axis=1)
                xy_a = np.zeros((F_CAP, 2), np.float32)
                xy_b = np.zeros((F_CAP, 2), np.float32)
                vmask = np.zeros(F_CAP, bool)
                n = len(good)
                xy_a[:n] = feats.xy[fsels[oi][good]]
                xy_b[:n] = proj
                vmask[:n] = True
                keep = np.asarray(gms_filter(
                    jnp.asarray(xy_a), jnp.asarray(xy_b), jnp.asarray(vmask),
                    cam.width, cam.height,
                ))[:n]
                bind[good[~keep]] = -1

        # spatially-gated projection match through the velocity-predicted
        # pose supplements the brute bindings (the reference's dynamic-point
        # SearchByProjection, src/ORBmatcher.cc:157: RADIUS_FORDYNAMIC=5,
        # TH_HIGH_FORDYNAMIC=130) — brute alone degrades on small objects
        # whose descriptors carry background contamination
        for oi in range(O):
            pf = pf0_np[oi][: len(fsels[oi])]
            bind = binds[oi]
            add = np.nonzero((pf >= 0) & (bind < 0))[0]
            bind[add] = pf[add]

        edges1, _ = self._build_edges(items, binds, feats)
        # pad edges pytree to O_pad
        def padO(a):
            out = np.zeros((O_pad,) + a.shape[1:], np.asarray(a).dtype)
            out[:O] = np.asarray(a)
            return jnp.asarray(out)
        edges1 = pose_opt.PoseObs(*[padO(x) for x in edges1])
        res1 = self._solve_batched(jnp.asarray(T_pred), edges1, jnp.asarray(priors))
        T1_f32, inl1 = jax.device_get((res1.T, res1.inliers))
        T1 = np.asarray(T1_f32, np.float64)
        for oi in range(O):
            bind = binds[oi]
            good = np.nonzero(bind >= 0)[0][:EDGE_CAP]
            bad = good[~inl1[oi, : len(good)]]
            bind[bad] = -1

        # stage 2: batched local-map projection through the refined poses
        pf_j = self._proj_batched(
            jnp.asarray(pt_pos), jnp.asarray(pt_desc), jnp.asarray(pt_valid),
            jnp.asarray(T1, jnp.float32),
            jnp.asarray(f_xy), jnp.asarray(f_level), jnp.asarray(f_desc),
            jnp.asarray(f_valid),
        )
        pf_np = np.asarray(jax.device_get(pf_j))
        for oi in range(O):
            pf = pf_np[oi][: len(fsels[oi])]
            bind = binds[oi]
            add = np.nonzero((pf >= 0) & (bind < 0))[0]
            bind[add] = pf[add]

        edges2, valid2 = self._build_edges(items, binds, feats)
        edges2 = pose_opt.PoseObs(*[padO(x) for x in edges2])
        res2 = self._solve_batched(jnp.asarray(T1, jnp.float32), edges2,
                                   jnp.asarray(priors))
        T2_f32, inl2 = jax.device_get((res2.T, res2.inliers))
        T2 = np.asarray(T2_f32, np.float64)

        failed = list(pre_failed)
        for oi, (det, fsel, track) in enumerate(items):
            bind = binds[oi]
            good = np.nonzero(bind >= 0)[0][:EDGE_CAP]
            inl = inl2[oi, : len(good)]
            bind[good[~inl]] = -1
            n_inl = int(inl.sum())
            track.n_inliers = n_inl
            found = bind[bind >= 0]
            track.pt_found[found] += 1
            track.pt_visible[found] += 1
            # record last observed pixel per point (flow-warp anchor)
            fidx = np.nonzero(bind >= 0)[0]
            track.pt_last_xy[bind[fidx]] = feats.xy[fsels[oi][fidx]]
            track.pt_last_angle[bind[fidx]] = feats.angle[fsels[oi][fidx]]
            track.pt_last_frame[bind[fidx]] = det.frame_id
            if n_inl < self.cfg.objects.min_tracked_points:
                track.track_ok = False
                failed.append((det, fsel, track))
                continue
            track.track_ok = True
            fsel_t = fsels[oi]
            self._dynamic_discrimination(track, det, feats, fsel_t, bind,
                                         T_cw, T2[oi])
            self._record_state(track, det, T2[oi], T_cw, timestamp)
            last_okf = track.keyframes[-1]
            n_ref = int((last_okf.point_idx >= 0).sum())
            if n_inl < 0.9 * n_ref or det.frame_id - last_okf.frame_id >= 5:
                self._add_keyframe_with_points(
                    track, det, feats, fsel_t, T2[oi], T_cw, timestamp, bind=bind
                )
        return failed

    # ------------------------------------------------------------------
    def _dynamic_discrimination(self, track, det, feats, fsel, bind, T_cw, T_co):
        """Static-hypothesis reprojection test (reference
        src/Tracking.cc:2058-2202; thresholds mono>1 / stereo>2 from
        src/DetectionObject.cc:189)."""
        prev = track.last_seen_frame
        if prev < 0 or prev not in track.poses_world:
            return
        cam = self.cfg.objects
        T_co_static = T_cw @ track.poses_world[prev]     # object frozen in world
        good = np.nonzero(bind >= 0)[0]
        if len(good) < 5:
            return
        po = track.pt_pos[bind[good]]
        pc = po @ T_co_static[:3, :3].T + T_co_static[:3, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        c = self.cfg.camera
        u = c.fx * pc[:, 0] / z + c.cx
        v = c.fy * pc[:, 1] / z + c.cy
        f = fsel[good]
        err = np.sqrt((u - feats.xy[f, 0]) ** 2 + (v - feats.xy[f, 1]) ** 2)
        stereo = feats.depth[f] > 0
        err_ur = np.abs((u - c.bf / z) - feats.u_right[f])
        mono_err = float(np.median(err[~stereo])) if (~stereo).any() else 0.0
        stereo_err = (
            float(np.median(np.maximum(err[stereo], err_ur[stereo])))
            if stereo.any()
            else 0.0
        )
        is_dyn = (mono_err > cam.dyn_mono_err_threshold) or (
            stereo_err > cam.dyn_stereo_err_threshold
        )
        track.vote_dynamic(is_dyn, hysteresis=cam.dyn_hysteresis_votes)

    def _record_state(self, track, det, T_co, T_cw, timestamp):
        f = det.frame_id
        track.poses_cf[f] = np.asarray(T_co, np.float64)
        track.poses_world[f] = np.linalg.inv(T_cw) @ T_co
        track.detections[f] = det
        if track.keyframes:
            okf = track.keyframes[-1]
            track.rel_pose_log[f] = (
                okf.obj_kf_id, T_co @ np.linalg.inv(okf.T_co)
            )
        prev = track.last_seen_frame
        if prev >= 0 and prev != f:
            track.update_velocity(prev, f)
        track.last_seen_frame = f
        track.last_seen_time = timestamp

    # ------------------------------------------------------------------
    def _object_local_mapping(self, track: ObjectTrack, det: Detection):
        """Culling + neighbor fuse + windowed object BA
        (ObjectLocalMapping thread analog). The BA device solve runs with
        the object lock RELEASED so the tracking path never waits on it."""
        with self._obj_lock:
            okf_idx = len(track.keyframes) - 1
            epoch = getattr(track, "epoch", 0)
            self._cull_object_points(track, okf_idx)
            self._fuse_object_neighbors(track, okf_idx)
            n_cov = len(track.covisible_keyframes(okf_idx, min_weight=5))
            ba_inputs = None
            if n_cov > self.cfg.objects.ba_min_covisible_kfs:
                ba_inputs = self._build_object_ba(track, okf_idx)
            if ba_inputs is None:
                self._cull_object_keyframes(track)
        if ba_inputs is None:
            return
        prob, slot_edge, meta, priors = ba_inputs
        result = local_ba.bundle_adjust(prob, **self._cam_args, priors=priors)
        # materialize on the host BEFORE re-taking the lock — JAX dispatch
        # is async, so np.asarray inside the locked write-back would pull
        # the whole device solve into the critical section
        result = type(result)(*(np.asarray(x) for x in result))
        self.ba_calls += 1
        import threading

        self.ba_threads.add(threading.get_ident())
        with self._obj_lock:
            if getattr(track, "epoch", 0) == epoch:
                self._apply_object_ba(track, result, slot_edge, meta)
            self._cull_object_keyframes(track)

    def _fuse_object_neighbors(self, track: ObjectTrack, okf_idx: int):
        """Bind the new object-KF's unmatched features to existing object
        points by projection (ObjectLocalMapping::SearchInNeighbors two-level
        fuse, reference src/ObjectLocalMapping.cpp:153-267)."""
        okf = track.keyframes[okf_idx]
        unbound = okf.point_idx < 0
        if unbound.sum() < 5 or track.n_points() == 0:
            return
        F = len(okf.xy)

        def fpad(a, fill=0):
            out = np.full((F_CAP,) + a.shape[1:], fill, a.dtype)
            out[: min(F, F_CAP)] = a[:F_CAP]
            return out

        res = matchers.project_and_match(
            jnp.asarray(track.pt_pos, jnp.float32),
            jnp.asarray(track.pt_desc),
            jnp.asarray(track.pt_valid),
            jnp.asarray(okf.T_co, jnp.float32),
            jnp.asarray(fpad(okf.xy.astype(np.float32))),
            jnp.asarray(fpad(okf.level.astype(np.int32))),
            jnp.asarray(fpad(okf.desc)),
            jnp.asarray(fpad(unbound, False)),
            jnp.full((track.max_points,), 4.0, jnp.float32),
            jnp.asarray(self._scales),
            jnp.zeros(track.max_points, jnp.int32),
            width=self.cfg.camera.width, height=self.cfg.camera.height,
            th_desc=matchers.TH_LOW,
            **self._cam_args,
        )
        pf = np.asarray(res.point_for_feature)[:F]
        feats = np.nonzero(pf >= 0)[0]
        if len(feats):
            okf.point_idx[feats] = pf[feats]
            track.obs[pf[feats], okf_idx] = True
            track.update_point_stats(pf[feats])

    def _cull_object_points(self, track: ObjectTrack, okf_idx: int):
        """found/visible < 0.25 or <3 obs shortly after creation
        (reference src/ObjectLocalMapping.cpp:107-151)."""
        valid = np.nonzero(track.pt_valid)[0]
        if len(valid) == 0:
            return
        ratio = track.pt_found[valid] / np.maximum(track.pt_visible[valid], 1)
        age = okf_idx - track.pt_first_okf[valid]
        obs_n = track.obs[valid].sum(axis=1)
        cull = (ratio < 0.25) & (age >= 2)
        cull |= (age >= 2) & (obs_n < 2)
        if cull.any():
            track.cull_points(valid[cull])

    def _cull_object_keyframes(self, track: ObjectTrack) -> None:
        """90%-redundancy object-keyframe culling (reference
        ObjectLocalMapping::KeyFrameCulling, src/ObjectLocalMapping.cpp:
        269-323): a covisible object KF dies when >90% of its close-depth
        points are observed by >=3 OTHER object KFs at scale <= level+1.
        KF 0 (the object's first observation) is never culled. Runs on the
        mapping worker with the object lock held; must not run between a
        BA build and its write-back (indices would shift)."""
        cfg = self.cfg.objects
        if not cfg.kf_culling or len(track.keyframes) < 3:
            return
        okf_idx = len(track.keyframes) - 1
        cand = [int(i)
                for i in track.covisible_keyframes(okf_idx, min_weight=5)
                if int(i) not in (0, okf_idx)]
        if not cand:
            return
        n = len(track.keyframes)
        P = track.max_points
        # per-KF point -> observation octave (127 = not observed)
        lvl = np.full((n, P), 127, np.int16)
        for j, okf in enumerate(track.keyframes):
            b = okf.point_idx >= 0
            lvl[j, okf.point_idx[b]] = okf.level[b]
        observed = lvl < 127                               # (n, P)
        th_depth = self.cfg.camera.depth_threshold
        remove = []
        for c in cand:
            okf = track.keyframes[c]
            b = np.nonzero(okf.point_idx >= 0)[0]
            rows = okf.point_idx[b]
            good = (track.pt_valid[rows]
                    & (okf.depth[b] > 0) & (okf.depth[b] <= th_depth))
            rows, b = rows[good], b[good]
            if len(rows) == 0:
                continue
            total_obs = observed[:, rows].sum(axis=0)
            scale_ok = (observed[:, rows]
                        & (lvl[:, rows] <= okf.level[b][None, :] + 1))
            others = scale_ok.sum(axis=0) - scale_ok[c]
            redundant = (total_obs > 3) & (others >= 3)
            if redundant.sum() > cfg.kf_cull_redundancy * len(rows):
                remove.append(c)
        if remove:
            track.remove_keyframes(remove)
            from pointslot_tpu.utils.profiling import PROFILER

            PROFILER.count("object_kf_culled", len(remove))

    def _build_object_ba(self, track: ObjectTrack, okf_idx: int):
        """Assemble the windowed object BA problem: covisible object KFs
        within the 120-id window with roll/pitch frozen (reference
        Optimizer::ObjectLocalBundleAdjustment, window src/Optimizer.cc:47,
        VertexSE3Fix :836-838). Called with the object lock held; returns
        (prob, slot_edge, meta) for the lock-free solve, or None.

        The pose capacity is the next power-of-two bucket of the live
        window size (ceiling ObjectConfig.ba_window_pose_cap), so small
        windows solve cheap and long ones keep the reference's full 120-id
        span; the batched solver groups problems by this shape."""
        window_all = sorted(set([okf_idx] + [
            int(i)
            for i in track.covisible_keyframes(okf_idx, min_weight=5)
            if okf_idx - int(i) <= self.cfg.objects.ba_window_kf_ids
        ]))
        P_cap = _pose_bucket(len(window_all),
                             self.cfg.objects.ba_window_pose_cap)
        window_ids = window_all[-P_cap:]
        if len(window_all) > len(window_ids):
            from pointslot_tpu.utils.profiling import PROFILER

            PROFILER.count("object_ba_window_truncated",
                           len(window_all) - len(window_ids))
        kfs = [track.keyframes[i] for i in window_ids]
        L_cap = track.max_points

        pts = np.nonzero(track.pt_valid)[0]
        pt_row = np.full(track.max_points, -1, np.int64)
        pt_row[pts] = np.arange(len(pts))

        e_pose, e_point, e_obs, e_stereo, e_inv2 = [], [], [], [], []
        for ri, okf in enumerate(kfs):
            bound = np.nonzero(okf.point_idx >= 0)[0]
            p = okf.point_idx[bound]
            sel = pt_row[p] >= 0
            bound, p = bound[sel], p[sel]
            e_pose.append(np.full(len(bound), ri))
            e_point.append(pt_row[p])
            e_obs.append(
                np.stack([okf.xy[bound, 0], okf.xy[bound, 1], okf.u_right[bound]], 1)
            )
            e_stereo.append(okf.depth[bound] > 0)
            e_inv2.append(1.0 / self._scales[okf.level[bound]] ** 2)
        e_pose = np.concatenate(e_pose)
        e_point = np.concatenate(e_point)
        e_obs = np.concatenate(e_obs)
        e_stereo = np.concatenate(e_stereo)
        e_inv2 = np.concatenate(e_inv2)
        E = len(e_pose)
        if E < 30:
            return

        # dof mask: translations + yaw (omega_y) free; roll/pitch frozen
        dof = np.zeros((P_cap, 6), np.float32)
        dof[:, :3] = 1.0
        dof[:, 4] = 1.0
        fixed = [i == 0 for i in range(len(kfs))]

        prob, slot_edge = local_ba.build_problem(
            poses=np.stack([k.T_co for k in kfs]).astype(np.float32),
            pose_fixed=np.asarray(fixed),
            points=track.pt_pos[pts].astype(np.float32),
            e_pose=e_pose, e_point=e_point, e_obs=e_obs, e_stereo=e_stereo,
            e_inv_sigma2=e_inv2,
            P_cap=P_cap, L_cap=L_cap, K=self.cfg.ba.max_obs_per_point,
            dof_mask=dof,
        )
        priors = self._build_motion_priors(track, kfs, R_cap=P_cap)
        meta = dict(kfs=kfs, fixed=fixed, pts=pts, window_ids=window_ids,
                    e_pose=e_pose, e_point=e_point)
        return prob, slot_edge, meta, priors

    def _build_motion_priors(self, track: ObjectTrack, kfs, R_cap: int = 32):
        """Constant-velocity SE(3) priors between consecutive window KFs
        (the live form of the reference's motion-model/smoothness edges,
        include/g2o_Object.h:361-405): predicted T_co(j) =
        T_cw(j) V^gap T_wo(i), weighted by objects.ba_motion_prior_weight.
        Off (None) at weight 0, matching the reference's live surface."""
        w = self.cfg.objects.ba_motion_prior_weight
        if w <= 0 or track.velocity_world is None or len(kfs) < 2:
            return None
        idx, T_rel, weights = [], [], []
        for ri in range(1, len(kfs)):
            a, b = kfs[ri - 1], kfs[ri]
            gap = max(int(b.frame_id - a.frame_id), 1)
            V = np.linalg.matrix_power(track.velocity_world, gap)
            T_rel.append(b.T_cw @ V @ np.linalg.inv(a.T_cw))
            idx.append([ri - 1, ri])
            weights.append(w / gap)
        return local_ba.build_motion_priors(
            idx=np.asarray(idx), T_rel=np.stack(T_rel).astype(np.float32),
            weight=np.asarray(weights), R_cap=R_cap,
        )

    def _apply_object_ba(self, track: ObjectTrack, result, slot_edge, meta):
        """Write the solve back onto the track tables (object lock held)."""
        kfs, fixed, pts = meta["kfs"], meta["fixed"], meta["pts"]
        window_ids, e_pose, e_point = (
            meta["window_ids"], meta["e_pose"], meta["e_point"]
        )
        new_poses = np.asarray(result.poses, np.float64)
        for ri, okf in enumerate(kfs):
            if not fixed[ri]:
                okf.T_co = new_poses[ri]
        still = track.pt_valid[pts]  # points culled since build stay culled
        track.pt_pos[pts[still]] = np.asarray(
            result.points, np.float64)[: len(pts)][still]
        # drop outlier observations
        inl = np.asarray(result.obs_inlier)
        for b in slot_edge[(slot_edge >= 0) & ~inl]:
            okf = kfs[int(e_pose[b])]
            p = pts[int(e_point[b])]
            featsel = np.nonzero(okf.point_idx == p)[0]
            if len(featsel):
                okf.point_idx[featsel] = -1
                track.obs[p, window_ids[int(e_pose[b])]] = False

    # ------------------------------------------------------------------
    def export_detections(self) -> List[dict]:
        """Per-frame object states in the writer's schema, recovered from the
        relative-pose log against (BA-refined) object keyframes — the
        reference's SaveObjectDetectionKITTI recovery (src/System.cc:409-473)."""
        out = []
        for track in self.all_tracks:
            for f, (okf_id, T_rel) in sorted(track.rel_pose_log.items()):
                if okf_id >= len(track.keyframes):
                    continue
                okf = track.keyframes[okf_id]
                T_co = T_rel @ okf.T_co
                det = track.detections.get(f)
                if det is None:
                    continue
                out.append(
                    dict(
                        frame_id=f,
                        track_id=track.track_id,
                        bbox=np.asarray(det.bbox),
                        dims=np.asarray(det.dims),
                        t_co=T_co[:3, 3],
                        pitch=heading_y(T_co[:3, :3]),
                        truncated=det.truncated,
                        occluded=det.occluded,
                        alpha=det.alpha,
                        dynamic=track.dynamic,
                    )
                )
        return out
