"""System facade: the one-object API a user drives.

Replaces the reference's System class (reference src/System.cc:46-141 ctor
spawning 4 threads, TrackStereo :143, SaveTrajectoryKITTI :346,
SaveObjectDetectionKITTI :409, Shutdown :225). The thread topology becomes a
host-side pipeline: the frontend + tracking run inline; mapping work is
executed per-keyframe (synchronously by default — see
RuntimeConfig.async_mapping for deferred batching).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from pointslot_tpu.config import SLOTMode, SystemConfig
from pointslot_tpu.ops.frontend import StereoFrontend
from pointslot_tpu.slam.local_mapping import LocalMapper
from pointslot_tpu.slam.map_state import MapState
from pointslot_tpu.slam.tracking import CameraTracker, FrameRecord


class System:
    def __init__(self, config: Optional[SystemConfig] = None):
        self.cfg = config or SystemConfig()
        cam = self.cfg.camera
        self.frontend = StereoFrontend(
            cam.height, cam.width, cam.fx, cam.bf, self.cfg.orb
        )
        self.map = MapState(
            max_kfs=self.cfg.runtime.map_max_kfs,
            max_points=self.cfg.runtime.map_max_points,
        )
        self.tracker = CameraTracker(self.cfg, self.map)
        self.local_mapper = LocalMapper(self.cfg, self.map)
        self.tracker.new_kf_callback = self._on_new_keyframe
        self.tracker.reset_callback = self._on_reset
        self.loop_closer = None
        self._pipeline = None
        self._fast = None
        self._fast_frames = 0
        if self.cfg.runtime.device_resident_tracking:
            from pointslot_tpu.slam.fast_path import DeviceTrackingPath

            self._fast = DeviceTrackingPath(self.cfg, self.frontend)
        if self.cfg.runtime.pipeline_stages:
            # cross-host stage partitioning: local mapping + loop closing
            # run on the mapping-host process (parallel/pipeline.py);
            # tracking keeps the LOW half of the point arena and a local
            # BoW database for relocalization only
            self.map.pt_alloc_range = (0, self.map.max_points // 2)
            if self.cfg.loop.enabled:
                from pointslot_tpu.slam.loop_closing import (
                    Relocalizer, make_database,
                )
                from pointslot_tpu.vocab.bow import (
                    load_vocab, train_default_vocab,
                )

                vocab = (load_vocab(self.cfg.loop.vocab_path,
                                    as_tree=self.cfg.loop.vocab_as_tree)
                         if self.cfg.loop.vocab_path else train_default_vocab())
                self._reloc_db = make_database(vocab, self.map.max_kfs)
                self.tracker.relocalizer = Relocalizer(
                    self.cfg, self.map, self._reloc_db
                )
        elif self.cfg.loop.enabled:
            from pointslot_tpu.slam.loop_closing import LoopCloser, Relocalizer
            from pointslot_tpu.vocab.bow import (
                load_vocab, train_default_vocab,
            )

            if self.cfg.loop.vocab_path:
                vocab = load_vocab(self.cfg.loop.vocab_path,
                                    as_tree=self.cfg.loop.vocab_as_tree)
            else:
                vocab = train_default_vocab()
            self.loop_closer = LoopCloser(self.cfg, self.map, vocab)
            self.loop_closer.on_loop_closed = self._on_loop_closed
            self.tracker.relocalizer = Relocalizer(
                self.cfg, self.map, self.loop_closer.db
            )
        self.map.on_remove_keyframe = self._on_keyframe_removed
        # async mapping pipeline (the reference's thread topology); OFF by
        # default — enable with RuntimeConfig.async_mapping
        import queue as _queue
        import threading

        self.map_lock = threading.RLock()
        if self.loop_closer is not None:
            # the GBA merge-back must exclude tracking/mapping map access
            self.loop_closer.map_lock = self.map_lock
        # the mapper's BA solve runs outside this lock (see process_keyframe)
        self.local_mapper.lock = self.map_lock
        self._mapping_queue = _queue.Queue()
        self._mapping_thread = None
        self._ba_skips = 0   # consecutive InterruptBA skips (capped at 2)
        self._pending_cam_kfs = 0          # camera KFs waiting in the queue
        self._pending_cam_lock = threading.Lock()
        if self.cfg.runtime.pipeline_stages:
            from pointslot_tpu.parallel.pipeline import PipelineMapping

            self._pipeline = PipelineMapping(self)
        elif self.cfg.runtime.async_mapping:
            self._mapping_thread = threading.Thread(
                target=self._mapping_worker, daemon=True
            )
            self._mapping_thread.start()
        self.frame_times = []
        self.timestamps = []
        self._object_system = None
        if self.cfg.slot_mode in (
            SLOTMode.MANUAL_TRACKING, SLOTMode.AUTONOMOUS_DRIVING, SLOTMode.OFFLINE
        ):
            from pointslot_tpu.slam.object_system import ObjectSystem

            self._object_system = ObjectSystem(self.cfg, self)

        # mode 3: online detector + MOT association in-loop
        self.detector = None
        self.mot = None
        if self.cfg.slot_mode == SLOTMode.AUTONOMOUS_DRIVING:
            from pointslot_tpu.detect.deepsort import DeepSort
            from pointslot_tpu.detect.reid import ReIDEmbedder
            from pointslot_tpu.detect.yolo import Detector

            det_cfg = self.cfg.detector
            self.detector = Detector(
                input_size=det_cfg.input_size, conf=det_cfg.conf_threshold,
                iou=det_cfg.iou_threshold, keep_classes=det_cfg.keep_classes,
                width=det_cfg.network_width,
            )
            if det_cfg.weights_path:
                self.detector.load_npz(det_cfg.weights_path)
            embedder = ReIDEmbedder(feature_dim=det_cfg.reid_feature_dim)
            reid_path = (det_cfg.reid_weights_path
                         or ReIDEmbedder.bundled_weights_path())
            if reid_path:
                embedder.load_npz(reid_path)
            self.mot = DeepSort(det_cfg, embedder=embedder)
        # mode 2: manual-ROI template tracking; mode 1 sub-mode DynaSLAM
        # carries dynamic-region masks with the same tracker when per-frame
        # masks are unavailable (reference src/Tracking.cc:127-139)
        self.roi_tracker = None
        self._prev_flow = None   # last frame's forward flow (offline mode)
        if self.cfg.slot_mode == SLOTMode.MANUAL_TRACKING or (
            self.cfg.slot_mode == SLOTMode.DYNAMIC_SLAM
            and self.cfg.dynaslam_mode == 1
        ):
            from pointslot_tpu.detect.tracker2d import MultiTracker2D

            self.roi_tracker = MultiTracker2D()

        from pointslot_tpu.utils.profiling import PROFILER

        self.profiler = PROFILER
        self.profiler.enabled = self.cfg.runtime.profile

    # ------------------------------------------------------------------
    def _on_new_keyframe(self, kf: int):
        if self._pipeline is not None:
            if getattr(self, "_reloc_db", None) is not None:
                self._reloc_db.add(
                    kf, self.map.kf_desc[kf], self.map.kf_feat_valid[kf]
                )
            self._pipeline.on_new_keyframe(kf)
        elif self._mapping_thread is not None:
            with self._pending_cam_lock:
                self._pending_cam_kfs += 1
            self._mapping_queue.put(("camera", kf))
        else:
            self._process_keyframe_sync(kf)
        if self._fast is not None:
            # keyframe-rate device-table refresh (sync mapping has already
            # run BA here; async updates land via the periodic refresh)
            self._fast.refresh(self.map, self.tracker.ref_kf)

    def _process_keyframe_sync(self, kf: int):
        # the mapper takes map_lock per phase and runs its BA solve
        # lock-free (the reference's LocalBundleAdjustment takes the map
        # mutex only to apply results); loop closing locks for the whole
        # event like the reference's CorrectLoop under mMutexMapUpdate.
        # When ANOTHER keyframe is already queued, the windowed BA is
        # skipped for this one — the reference's InterruptBA /
        # CheckNewKeyFrames gate (src/LocalMapping.cc:219, mbAbortBA):
        # under keyframe bursts the mapper must drain the queue, not run
        # a multi-10ms solve per KF while tracking queues behind it on
        # the same chip. A later KF's BA covers the same covisibility
        # window; to bound starvation when the queue NEVER empties, at
        # most two consecutive keyframes skip (every 3rd always solves).
        # gate on further CAMERA keyframes waiting (the reference's
        # CheckNewKeyFrames is exactly this). Raw queue size was wrong:
        # object keyframes share the queue, so steady-state object
        # traffic starved camera BA and measurably diverged the async
        # map from the sync schedule.
        if self._mapping_thread is not None:
            with self._pending_cam_lock:
                self._pending_cam_kfs -= 1
                pending = self._pending_cam_kfs >= 1
        else:
            pending = False
        skip = pending and self._ba_skips < 2
        self._ba_skips = self._ba_skips + 1 if skip else 0
        with self.profiler.timer("mapping"):
            self.local_mapper.process_keyframe(kf, skip_ba=skip)
            if self.loop_closer is not None:
                with self.map_lock:
                    self.loop_closer.on_keyframe(kf)

    def _mapping_worker(self):
        """Async mapping thread — the LocalMapping/ObjectLocalMapping/
        LoopClosing thread analog (reference src/System.cc:106-118 spawns
        them; hand-off is the InsertKeyFrame queues, src/LocalMapping.cc:265
        and src/ObjectLocalMapping.cpp:55). Camera work shares MapState with
        tracking under map_lock (the reference's mMutexMapUpdate); object
        work locks per the ObjectSystem's own lock, with the BA solve
        running unlocked."""
        import queue as _queue

        while True:
            item = self._mapping_queue.get()
            if item is None:
                self._mapping_queue.task_done()
                return
            drained = 0
            try:
                if item[0] == "camera":
                    self._process_keyframe_sync(item[1])
                elif item[0] == "object" and self._object_system is not None:
                    # drain CONSECUTIVE queued object KFs and solve every
                    # gate-cleared object's BA in one vmapped dispatch; stop
                    # at the first non-object item so camera keyframes are
                    # never deferred behind an object batch
                    batch = [(item[1], item[2])]
                    extra = ()  # () = no follow-up item drained
                    while len(batch) < 8:
                        try:
                            nxt = self._mapping_queue.get_nowait()
                        except _queue.Empty:
                            break
                        drained += 1
                        if nxt is not None and nxt[0] == "object":
                            batch.append((nxt[1], nxt[2]))
                        else:
                            extra = nxt
                            break
                    try:
                        self._object_system.process_object_tasks(batch)
                    finally:
                        # the drained follow-up item must survive an
                        # object-batch failure
                        if extra is None:
                            # re-arm the shutdown sentinel for this loop
                            self._mapping_queue.put(None)
                        elif extra != () and extra[0] == "camera":
                            self._process_keyframe_sync(extra[1])
            except Exception:  # pragma: no cover - worker must not die silently
                import traceback

                traceback.print_exc()
            finally:
                self._mapping_queue.task_done()
                for _ in range(drained):
                    self._mapping_queue.task_done()

    def _on_loop_closed(self, corrections):
        # pose landscape changed under the tracker: drop the velocity model
        # so the next frame re-anchors on the corrected reference keyframe
        self.tracker.velocity = None
        if self.tracker.last_frame is not None and self.tracker.ref_kf >= 0:
            # re-express the last frame pose against the corrected ref KF
            ref = self.tracker.ref_kf
            if ref in corrections:
                T_old, T_new = corrections[ref]
                rel = self.tracker.last_frame.T_cw @ np.linalg.inv(
                    T_old.astype(np.float32)
                )
                self.tracker.last_frame.T_cw = (rel @ T_new).astype(np.float32)
        if self._fast is not None:
            self._fast.invalidate()

    def _on_keyframe_removed(self, kf: int):
        self.tracker.on_keyframe_removed(kf)
        if self.loop_closer is not None:
            self.loop_closer.db.remove(kf)

    def _on_reset(self):
        self.tracker.reset()
        self.local_mapper.recent_points.clear()
        if self.loop_closer is not None:
            self.loop_closer.db.clear()
            self.loop_closer.abort_gba()  # in-flight GBA is now stale
        if self._fast is not None:
            self._fast.invalidate()

    # ------------------------------------------------------------------
    def track_stereo(self, left, right, timestamp: float, frame_id: int,
                     detections=None, instance_mask=None, flow=None,
                     precomputed=None):
        """Per-frame entry point (reference System::TrackStereo).

        detections / instance_mask feed the object pipeline in SLOT modes
        2/3/4; mode 1 uses the mask to suppress dynamic features. flow is
        this frame's (H, W, 2) FORWARD optical flow map (Virtual KITTI
        offline mode) — the next frame's object tracking warps point
        anchors through it (the reference stores it on the Frame,
        src/Frame.cc:700, and reads LastFrame's, src/ORBmatcher.cc:2268).
        precomputed: a StereoFrame extracted ahead of time (the runner's
        --dp mesh-sharded batched frontend); skips in-loop extraction —
        only valid when no detection gate applies (mode 0).
        """
        t0 = time.perf_counter()
        left = np.asarray(left)
        right = np.asarray(right)

        # mode 3: run the detection + association pipeline in-loop
        if (
            self.cfg.slot_mode == SLOTMode.AUTONOMOUS_DRIVING
            and detections is None
            and self.detector is not None
        ):
            raw = self.detector.run(left)
            tracks = self.mot.update(raw, left)
            detections = self._tracks_to_detections(tracks, frame_id)
            instance_mask = self._mask_from_detections(detections, left.shape)
        # mode 2: carry the user ROIs with the template tracker
        elif self.cfg.slot_mode == SLOTMode.MANUAL_TRACKING and detections is None:
            if self.roi_tracker is not None and self.roi_tracker.tracks:
                live = self.roi_tracker.update(left)
                detections = self._tracks_to_detections(
                    [{"track_id": t.track_id, "bbox": t.bbox, "class_id": 2}
                     for t in live],
                    frame_id,
                )
                instance_mask = self._mask_from_detections(detections, left.shape)

        # DynaSLAM sub-mode: carry dynamic regions across frames without
        # per-frame masks
        if self.cfg.slot_mode == SLOTMode.DYNAMIC_SLAM and self.cfg.dynaslam_mode == 1:
            if instance_mask is not None and np.any(instance_mask):
                # (re)seed the 2D trackers from the mask's component bboxes
                self.roi_tracker.tracks.clear()
                for v in np.unique(instance_mask):
                    if v == 0:
                        continue
                    ys, xs = np.nonzero(instance_mask == v)
                    bbox = (xs.min(), ys.min(), xs.max() - xs.min() + 1,
                            ys.max() - ys.min() + 1)
                    self.roi_tracker.add(left, bbox)
            elif self.roi_tracker is not None and self.roi_tracker.tracks:
                live = self.roi_tracker.update(left)
                mask = np.zeros(left.shape[:2], np.int32)
                for k, t in enumerate(live):
                    x, y, w, h = t.bbox
                    x0, y0 = int(max(x, 0)), int(max(y, 0))
                    x1 = int(min(x + w, mask.shape[1]))
                    y1 = int(min(y + h, mask.shape[0]))
                    if x1 > x0 and y1 > y0:
                        mask[y0:y1, x0:x1] = k + 1
                instance_mask = mask

        gate = None
        if self.cfg.slot_mode == SLOTMode.DYNAMIC_SLAM and instance_mask is not None:
            gate = instance_mask == 0
        elif (
            self.cfg.slot_mode in (SLOTMode.OFFLINE, SLOTMode.AUTONOMOUS_DRIVING,
                                   SLOTMode.MANUAL_TRACKING)
            and instance_mask is not None
        ):
            # background features avoid object regions — EXCEPT objects the
            # discriminator has settled as static, whose features are
            # recovered for camera tracking (the reference's
            # StaticPointRecoveryFromObj, src/Tracking.cc:2204-2254)
            gate = instance_mask == 0
            if self._object_system is not None and detections:
                for det in detections:
                    tr = self._object_system.tracks.get(det.track_id)
                    if tr is not None and not tr.dynamic and tr.track_ok and \
                            len(tr.poses_cf) >= self.cfg.objects.dyn_hysteresis_votes:
                        gate |= instance_mask == det.mask_value

        # device-resident fast path: ONE fused dispatch (frontend + two
        # match/solve stages, gate applied in-kernel) when tracking is
        # healthy; the host tracker takes init/reloc/rejected frames and
        # the cross-host pipeline mode
        c = self.cfg.camera
        fast_ok = (
            precomputed is None
            and self._fast is not None
            and self._pipeline is None
            and c.k1 == 0 and c.k2 == 0 and c.p1 == 0 and c.p2 == 0
            and self._fast.ready(self.tracker)
        )
        if fast_ok:
            with self.profiler.timer("tracking"), self.map_lock:
                # re-check under the lock: a loop closure can land between
                # the lock-free ready() probe and here, dropping the
                # velocity model (_on_loop_closed) — observed as a
                # jnp.asarray(None) crash in a full-System bench run
                if not self._fast.ready(self.tracker):
                    fast_ok = False
                    frame = None
                else:
                    frame = self._fast.track(self.tracker, left, right,
                                             frame_id, gate=gate)
                if not fast_ok:
                    pass
                elif frame is not None:
                    self._fast_frames += 1
                    if (
                        self._fast_frames
                        % self.cfg.runtime.fast_refresh_every == 0
                    ):
                        self._fast.refresh(self.map, self.tracker.ref_kf)
                    if self.tracker._need_new_keyframe(frame):
                        with self.profiler.timer("kf_create"):
                            self._fast.materialize(frame)
                            self.tracker._create_keyframe(frame)
                    self.tracker.commit_frame(frame)
                    if self._object_system is not None:
                        # the object pipeline reads the camera frame's
                        # features; pull them once per frame
                        self._fast.materialize(frame)
                else:
                    # rejected: the host tracker re-runs the frame from the
                    # same extracted (and gate-checked) features (reference
                    # fallback order, src/Tracking.cc:1148-1163)
                    frame = self._fast.fallback_frame(frame_id)
                    self.tracker.track(frame)
        if not fast_ok:
            if precomputed is not None and gate is None:
                sf = precomputed
            else:
                with self.profiler.timer("frontend"):
                    sf = self.frontend(left, right, gate=gate)
            frame = self._build_frame_record(sf, gate, frame_id)
            if self._pipeline is not None:
                # fold in any finished mapping-host work (BA poses, culls,
                # loop corrections) before tracking against the map
                self._pipeline.poll()
            with self.profiler.timer("tracking"), self.map_lock:
                self.tracker.track(frame)
        self.timestamps.append(timestamp)

        if self._object_system is not None and frame.T_cw is not None:
            with self.profiler.timer("objects"):
                self._object_system.process_frame(
                    frame, left, right, detections, instance_mask, timestamp,
                    flow=self._prev_flow if self.cfg.objects.use_offline_flow
                    else None,
                )
        self._prev_flow = flow

        self.frame_times.append(time.perf_counter() - t0)
        return frame

    def _build_frame_record(self, sf, gate, frame_id) -> FrameRecord:
        # ONE device->host transfer for the whole frame: field-by-field
        # np.asarray would be 7 sync roundtrips (a fixed per-sync cost on
        # any host; ~25 ms each through a remote tunnel)
        import jax

        sf = type(sf)(*jax.device_get(tuple(sf)))
        xy = np.asarray(sf.xy)
        u_right = np.asarray(sf.u_right)
        c = self.cfg.camera
        if c.k1 != 0 or c.k2 != 0 or c.p1 != 0 or c.p2 != 0:
            # non-rectified calibration: undistort keypoints like the
            # reference's Frame::UndistortKeyPoints (no-op on KITTI).
            # u_right shifts by the same horizontal displacement so the
            # disparity (hence depth) measured on the distorted pair stays
            # consistent — valid when L/R distortion fields are near-equal;
            # pre-rectified input remains the recommended stereo path, as
            # in the reference
            from pointslot_tpu.geometry.camera import undistort_points

            xy_und = np.asarray(undistort_points(
                xy, c.fx, c.fy, c.cx, c.cy, c.k1, c.k2, c.p1, c.p2
            ))
            # the right-image match undistorts through the right camera's
            # model at the left row (L/R share intrinsics here, like the
            # reference's single mDistCoef)
            has_st = u_right >= 0
            ur_xy = np.stack([np.where(has_st, u_right, 0.0), xy[:, 1]], 1)
            ur_und = np.asarray(undistort_points(
                ur_xy, c.fx, c.fy, c.cx, c.cy, c.k1, c.k2, c.p1, c.p2
            ))[:, 0]
            u_right = np.where(has_st, ur_und, u_right).astype(u_right.dtype)
            # depth re-derives from the UNDISTORTED disparity
            disp = np.maximum(xy_und[:, 0] - u_right, 1e-3)
            depth = np.where(has_st, c.bf / disp, -1.0).astype(np.float32)
            xy = xy_und
        else:
            depth = np.asarray(sf.depth)
        frame = FrameRecord(
            frame_id=frame_id,
            xy=xy,
            level=np.asarray(sf.level),
            desc=np.asarray(sf.desc),
            angle=np.asarray(sf.angle),
            depth=depth,
            u_right=u_right,
            valid=np.asarray(sf.valid),
            point_idx=np.full(sf.xy.shape[0], -1, np.int64),
        )
        if gate is not None:
            # exact per-feature mask check at level-0 coords — coarse-level
            # gating leaks a few boundary features (reference AssignFeatures
            # filters by mask value at the keypoint, src/Frame.cc:810-844).
            # masks live on the distorted image: check at raw coords
            xy_raw = np.asarray(sf.xy)
            yi = np.clip(np.round(xy_raw[:, 1]).astype(int), 0, gate.shape[0] - 1)
            xi = np.clip(np.round(xy_raw[:, 0]).astype(int), 0, gate.shape[1] - 1)
            frame.valid = frame.valid & np.asarray(gate)[yi, xi]
        return frame

    # ------------------------------------------------------------------
    def select_rois(self, img, rois):
        """Mode 2: register user-drawn ROIs on the current frame (the
        reference's cv::selectROIs at src/Frame.cc:1537). rois: list of
        (x, y, w, h)."""
        if self.roi_tracker is None:
            raise RuntimeError("ROI tracking requires SLOT mode 2")
        return [self.roi_tracker.add(np.asarray(img), r) for r in rois]

    def _tracks_to_detections(self, tracks, frame_id: int):
        from pointslot_tpu.slam.objects import Detection

        dets = []
        for k, t in enumerate(tracks):
            bbox = np.asarray(t["bbox"], np.float64)
            dims = np.asarray(
                [self.cfg.objects.uniform_scale[2],   # length
                 self.cfg.objects.uniform_scale[1],   # height
                 self.cfg.objects.uniform_scale[0]],  # width
                np.float64,
            )
            dets.append(Detection(
                frame_id=frame_id,
                track_id=int(t["track_id"]),
                bbox=bbox,
                dims=dims,
                location_cam=np.zeros(3),
                rotation_y=0.0,
                mask_value=k + 1,
                score=float(t.get("score", 1.0)),
            ))
        return dets

    def _mask_from_detections(self, detections, shape):
        """Rectangle instance mask, boxes shrunk by narrow_bbox_px
        (reference EnNarrowBBoxPixelValue, src/Frame.cc:2595-2616)."""
        mask = np.zeros(shape[:2], np.int32)
        n = self.cfg.objects.narrow_bbox_px
        order = sorted(
            detections, key=lambda d: d.bbox[2] * d.bbox[3], reverse=True
        )
        for det in order:
            x, y, w, h = det.bbox
            x0 = int(max(x + n, 0)); y0 = int(max(y + n, 0))
            x1 = int(min(x + w - n, shape[1])); y1 = int(min(y + h - n, shape[0]))
            if x1 > x0 and y1 > y0:
                mask[y0:y1, x0:x1] = det.mask_value
        return mask

    @property
    def tracking_state(self):
        return self.tracker.state

    def camera_trajectory(self):
        return self.tracker.camera_trajectory()

    def save_trajectory_kitti(self, path: str):
        """KITTI odometry format: 12 floats per row = top 3 rows of T_wc
        (reference System::SaveTrajectoryKITTI src/System.cc:346-408)."""
        from pointslot_tpu.io.writers import write_trajectory_kitti

        write_trajectory_kitti(path, self.camera_trajectory())

    def save_object_detections_kitti(self, out_dir: str):
        if self._object_system is None:
            raise RuntimeError("object pipeline inactive in this SLOT mode")
        from pointslot_tpu.io.writers import write_object_detections_kitti

        write_object_detections_kitti(
            out_dir, self._object_system.export_detections(), len(self.timestamps)
        )

    def save_object_poses_camera_frame(self, path: str):
        """Per-frame object poses in the CAMERA frame, one line per
        (frame, track): `frame_id track_id r00 ... t2` (12-float T_co rows)
        — the reference's SaveObjectDetectionResultsInCameraFrame
        (src/System.cc:474-543)."""
        if self._object_system is None:
            raise RuntimeError("object pipeline inactive in this SLOT mode")
        lines = []
        for track in self._object_system.all_tracks:
            for f in sorted(track.poses_cf):
                T = track.poses_cf[f]
                vals = " ".join(f"{v:.9f}" for v in T[:3, :4].reshape(-1))
                lines.append(f"{f} {track.track_id} {vals}")
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    def save_trajectory_camera_and_objects(self, camera_path: str,
                                           object_path_prefix: str = None):
        """Camera trajectory + per-object world-frame trajectories in KITTI
        rows (reference System::SaveTrajectoryKITTICameraAndObject
        src/System.cc:544-631: T_wo recovered as inv(T_co @ T_cw) per frame;
        the reference writes only the first object — we write one file per
        track)."""
        from pointslot_tpu.io.writers import write_trajectory_kitti

        traj = self.camera_trajectory()
        write_trajectory_kitti(camera_path, traj)
        if self._object_system is None:
            return
        prefix = object_path_prefix or (os.path.splitext(camera_path)[0] + "_object")
        pose_by_frame = {f: T for f, T, _ in traj}
        for track in self._object_system.all_tracks:
            rows = []
            for f in sorted(track.poses_cf):
                if f not in pose_by_frame:
                    continue
                T_cw = pose_by_frame[f]
                T_ow = track.poses_cf[f] @ T_cw  # object-from-world
                rows.append((f, T_ow, False))
            if rows:
                write_trajectory_kitti(f"{prefix}_{track.track_id}.txt", rows)

    def wait_for_mapping(self):
        """Block until the async mapping queue is drained AND the in-flight
        task (if any) has finished."""
        if self._mapping_thread is not None:
            self._mapping_queue.join()

    def shutdown(self):
        self.wait_for_mapping()
        if self.loop_closer is not None:
            self.loop_closer.wait_for_gba()
        if self._mapping_thread is not None:
            self._mapping_queue.put(None)
            self._mapping_thread.join(timeout=10)
            self._mapping_thread = None
        med = float(np.median(self.frame_times)) if self.frame_times else 0.0
        mean = float(np.mean(self.frame_times)) if self.frame_times else 0.0
        out = {"median_track_s": med, "mean_track_s": mean,
               "n_keyframes": self.map.n_keyframes(),
               "n_points": self.map.n_points()}
        if self._pipeline is not None:
            self._pipeline.shutdown()
            out.update(self._pipeline.stats())
            self._pipeline = None
        if self.profiler.enabled:
            out["profile"] = self.profiler.summary()
        return out
