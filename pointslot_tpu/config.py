"""Typed configuration for pointslot_tpu.

Replaces the reference's ~80 mutable namespace globals (reference
include/Parameters.h:36-132, defaults src/Parameters.cc:8-97) and its two-tier
cv::FileStorage-YAML + CLI-positional config (reference src/Tracking.cc:69-272,
Examples/Stereo/0000-0013.yaml) with a single immutable dataclass tree.

YAML files in the reference's schema (``Camera.fx`` etc., OpenCV ``%YAML:1.0``
headers) load directly via :func:`load_yaml`.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Optional, Tuple


class SLOTMode:
    """The five behavioral modes (reference include/Parameters.h:68-75)."""

    SLAM = 0                 # pure stereo ORB-SLAM
    DYNAMIC_SLAM = 1         # semantic dynamic SLAM: mask out dynamic regions
    MANUAL_TRACKING = 2      # user-selected ROIs, object pipeline on those
    AUTONOMOUS_DRIVING = 3   # online detector + MOT association in-loop
    OFFLINE = 4              # offline GT detections/IDs (reproducibility mode)


@dataclass(frozen=True)
class CameraConfig:
    """Stereo pinhole camera (reference YAML ``Camera.*`` keys)."""

    fx: float = 721.5377
    fy: float = 721.5377
    cx: float = 609.5593
    cy: float = 172.8540
    # distortion (KITTI is rectified; kept for parity with reference schema)
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 1242
    height: int = 375
    fps: float = 10.0
    bf: float = 384.38148       # baseline * fx
    rgb: bool = True
    # Close/far point threshold, in units of baseline (reference ThDepth: 50,
    # applied as th_depth * baseline = th_depth * bf / fx, src/Tracking.cc:402)
    th_depth: float = 50.0

    @property
    def baseline(self) -> float:
        return self.bf / self.fx

    @property
    def depth_threshold(self) -> float:
        return self.th_depth * self.bf / self.fx

    @property
    def K(self):
        import numpy as np

        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float64,
        )


@dataclass(frozen=True)
class ORBConfig:
    """Feature extraction budget (reference YAML ``ORBextractor.*``)."""

    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 5
    # rBRIEF sample-pair table: "learned" (the standard decorrelated ORB
    # table, reference src/ORBextractor.cc:150-406) or "gaussian" (seeded
    # random pairs, kept for A/B comparison)
    brief_pattern: str = "learned"
    # full-resolution stereo disparity re-fit for keypoints at this octave
    # or above (ops/stereo.fine_refine); 1.2^6 ~ 3x quantization is where
    # the octave-level SAD parabola stops being sub-pixel at level 0
    stereo_fine_min_level: int = 6
    # descriptor pre-filter for the stereo row match. The reference gates at
    # (TH_HIGH+TH_LOW)/2 = 75 (src/Frame.cc:2151) against OpenCV-ORB
    # distance statistics; the learned-pattern distances of this pipeline
    # run ~25 bits higher on textured scenes, and the epipolar window + SAD
    # refinement + median filter downstream are the actual precision gates,
    # so the pre-filter sits at TH_HIGH
    stereo_match_th: int = 100
    # TPU-side capacities (static shapes; candidates before top-N selection)
    max_keypoints_per_level: int = 4096
    grid_rows: int = 48   # reference FRAME_GRID_ROWS (include/Frame.h:40)
    grid_cols: int = 64   # reference FRAME_GRID_COLS (include/Frame.h:41)


@dataclass(frozen=True)
class MatcherConfig:
    """Descriptor matching thresholds (reference src/ORBmatcher.cc:58-62)."""

    th_low: int = 50
    th_high: int = 100
    th_high_dynamic: int = 130
    radius_dynamic: float = 5.0
    histo_length: int = 30
    nn_ratio: float = 0.9


@dataclass(frozen=True)
class TrackingConfig:
    """Camera-tracking policy knobs (reference src/Tracking.cc)."""

    # Stereo initialization gate (reference src/Tracking.cc:2840)
    min_init_stereo_features: int = 500
    # Minimum matches to accept motion-model / reference-KF / local-map tracking
    min_matches_motion_model: int = 20
    min_matches_ref_kf: int = 15
    min_inliers_local_map: int = 30
    # Keyframe policy (reference Tracking::NeedNewKeyFrame src/Tracking.cc:3137)
    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 10    # = fps in the reference
    kf_ref_ratio_many_close: float = 0.75
    kf_ref_ratio: float = 0.9
    min_tracked_close: int = 100
    max_nontracked_close: int = 70
    # Local map caps (reference src/Tracking.cc:3448)
    max_local_keyframes: int = 80
    # Reset policy: lost with <= this many KFs → full reset (src/Tracking.cc:1308)
    reset_max_kfs_when_lost: int = 5


@dataclass(frozen=True)
class ObjectConfig:
    """Object-SLOT knobs (reference Parameters.cc object block)."""

    max_objects: int = 50               # reference Max_OBJ_NUM (include/Frame.h:42)
    # BRIEF pattern for the OBJECT feature extractor. The reference runs a
    # separate dense OpenCV ORB on object masks (src/Frame.cc:2623-2665);
    # our object frontend is likewise its own engine. The concentrated
    # gaussian pattern is measurably more repeatable on small masked
    # regions (the learned table's wide sample pairs pick up background
    # contamination near object boundaries); the camera/BoW path keeps the
    # learned table. Set equal to ORBConfig.brief_pattern to share one
    # extractor.
    brief_pattern: str = "gaussian"
    max_object_points: int = 512        # per-object landmark capacity
    max_object_keyframes: int = 256     # per-object KF capacity
    select_tracked_obj_id: int = -1     # mode 2: user-picked track (-1 = all)
    narrow_bbox_px: int = 10            # shrink 2D bbox before masking
    max_missing_dt: float = 0.5         # occlusion bridge time (s)
    manual_point_max_distance: bool = False
    in_obj_frame_point_max_distance: float = 3.0
    init_min_features: int = 40         # EnInitDetObjORBFeaturesNum
    init_min_map_points: int = 17       # EnInitMapObjectPointsNum
    min_tracked_points: int = 15        # EnMinTrackedMOPsNUM
    track_min_features: int = 30        # EnTrackObjectMinFeatureNum
    state_optimization: bool = True
    use_offline_pose_init: bool = False
    use_uniform_scale: bool = False
    uniform_scale: Tuple[float, float, float] = (1.6, 1.5, 3.0)  # w, h, l prior
    set_init_position_by_points: bool = True
    object_center: int = 0              # 0 = geometric center, 1 = bottom center
    # Dynamic/static discrimination (reference src/DetectionObject.cc:189,
    # src/MapObject.cc:414-448)
    dyn_mono_err_threshold: float = 1.0
    dyn_stereo_err_threshold: float = 2.0
    dyn_hysteresis_votes: int = 4
    # Object BA weights (reference src/Parameters.cc:79-92)
    bbox_ba_weight: float = 2.0
    smooth_term_weight: float = 2.0
    motion_model_weight: float = 1.0
    angular_vs_linear_weight: float = 2.0
    smooth_huber: float = 10.0 ** 0.5
    motion_model_huber: float = 10.0 ** 0.5
    bbox_huber: float = 30.0
    mono_huber: float = 5.991 ** 0.5
    stereo_huber: float = 7.815 ** 0.5
    # Object keyframe / BA policy (reference src/Optimizer.cc:47,
    # src/ObjectLocalMapping.cpp:375)
    ba_window_kf_ids: int = 120
    ba_min_covisible_kfs: int = 8
    # pose-slot ceiling for one windowed object BA problem; the actual
    # solve is bucketed to the next power of two of the live window size
    # (small windows stay cheap, long ones keep the reference's full
    # 120-id span instead of being silently truncated)
    ba_window_pose_cap: int = 128
    # Redundant object-keyframe culling: drop a covisible object KF when
    # more than `kf_cull_redundancy` of its well-depthed points are seen
    # by >= 3 other object KFs at the same-or-finer scale (reference
    # ObjectLocalMapping::KeyFrameCulling, src/ObjectLocalMapping.cpp:
    # 269-323). Keeps long-lived tracks' keyframe lists, fuse windows and
    # covisibility scans bounded.
    kf_culling: bool = True
    kf_cull_redundancy: float = 0.9
    # SE(3) constant-velocity priors between consecutive object KFs in the
    # BA window (live form of EdgeMotionModel/EdgeSmoothTerm, reference
    # include/g2o_Object.h:361-405); 0 = off, matching the reference's
    # live surface (those edges only appear in its declared-unused solvers)
    ba_motion_prior_weight: float = 0.0
    vehicle_axle_distance: float = 0.15
    # GMS grid-statistics filtering of object brute matches (the reference's
    # SearchByBruceMatchingWithGMS path)
    use_gms: bool = False
    # offline-optical-flow point tracking (Virtual KITTI flow maps; the
    # reference's SearchByOfflineOpticalFlowTracking, src/ORBmatcher.cc:2236:
    # search radius RADIUS_FORDYNAMIC=5 px, Hamming gate
    # TH_HIGH_FORDYNAMIC=130)
    use_offline_flow: bool = False
    flow_match_radius: float = 5.0
    flow_match_th_desc: int = 130


@dataclass(frozen=True)
class DetectorConfig:
    """Online detection head (mode 3; reference YOLOdetector + deepsort)."""

    conf_threshold: float = 0.4
    iou_threshold: float = 0.5
    input_size: int = 640
    network_width: int = 16      # base channel count of the Flax YOLO
    keep_classes: Tuple[int, ...] = (2, 7)   # car, truck (reference Frame.cc:2557)
    weights_path: Optional[str] = None
    reid_weights_path: Optional[str] = None
    reid_feature_dim: int = 128
    max_detections: int = 64
    # DeepSORT association (reference deepsort/src/tracker.cpp)
    max_cosine_distance: float = 0.2
    nn_budget: int = 100
    max_iou_distance: float = 0.7
    max_age: int = 30
    n_init: int = 3


@dataclass(frozen=True)
class BAConfig:
    """Bundle-adjustment solver settings (reference src/Optimizer.cc)."""

    # Motion-only pose solve: 4 stages x 10 LM iterations with chi2 re-gating
    # between stages (reference Optimizer::PoseOptimization src/Optimizer.cc:386-388)
    pose_opt_stages: int = 4
    pose_opt_iters_per_stage: int = 10
    chi2_mono: float = 5.991
    chi2_stereo: float = 7.815
    # Local BA: 5 + 10 iterations with outlier removal between (Optimizer.cc:1077)
    local_ba_iters_stage1: int = 5
    local_ba_iters_stage2: int = 10
    # Static capacities for the jitted solvers
    max_ba_keyframes: int = 32
    max_ba_points: int = 8192
    max_obs_per_point: int = 16
    # LM damping
    lm_lambda_init: float = 1e-4
    lm_lambda_factor: float = 10.0


@dataclass(frozen=True)
class LoopConfig:
    """Loop closing (reference src/LoopClosing.cc)."""

    enabled: bool = True
    covisibility_consistency_th: int = 3
    sim3_ransac_iters: int = 64
    min_sim3_inliers: int = 20
    fix_scale: bool = True   # stereo
    pose_graph_cg_iters: int = 100
    # detection policy (reference src/LoopClosing.cc:106 DetectLoop)
    min_kfs_before_detect: int = 10   # map must have this many KFs
    cooldown_kfs: int = 10            # KFs between accepted loops
    min_frame_distance: int = 20      # candidate must be this many frames old
    max_candidates: int = 5           # BoW candidates examined per query
    # relocalization BoW floor (reference KeyFrameDatabase::
    # DetectRelocalizationCandidates minScore analog)
    reloc_min_score: float = 0.015
    reloc_max_candidates: int = 5
    # inlier-weighted IRLS refinement of the RANSAC loop transform
    # (reference Optimizer::OptimizeSim3, src/Optimizer.cc:1684)
    refine_transform_iters: int = 4
    # optional DBoW2 text-format vocabulary (ORBvoc.txt); default trains a
    # small self-consistent vocabulary from synthetic descriptors
    vocab_path: Optional[str] = None
    # force the tree (staged-descent) vocabulary representation + sparse
    # inverted-index database; None = auto by vocabulary size
    vocab_as_tree: Optional[bool] = None
    # full-map BA after loop correction (the reference's detached-thread
    # GBA, src/LoopClosing.cc:648-752). Duplicate map structure across the
    # loop is merged first (SearchAndFuse analog) so the joint solve pulls
    # the loop together instead of locking in pre-correction drift.
    run_global_ba: bool = True
    # run the GBA solve on a detached thread outside the map lock (the
    # reference's RunGlobalBundleAdjustment thread + mbStopGBA abort);
    # False = inline deterministic solve (unit tests)
    background_gba: bool = True
    # global-BA structure caps (all keyframes participate; points beyond the
    # cap are corrected by their reference keyframe's pose delta)
    gba_max_points: int = 8192
    gba_obs_per_point: int = 8


@dataclass(frozen=True)
class RuntimeConfig:
    """Host-pipeline execution knobs (net-new; replaces pthread topology)."""

    # run mapping in a worker thread like the reference's LocalMapping /
    # LoopClosing threads (tracking holds the map lock only during its own
    # map reads/writes, so mapping overlaps the frontend). Synchronous by
    # default for determinism.
    async_mapping: bool = False
    mapping_every_n_frames: int = 1
    # device-resident camera tracking: run the fused per-frame step
    # (ops/fused_track.py) with keyframe-rate device map tables; the host
    # tracker handles init/reloc/gated frames and rejected frames
    device_resident_tracking: bool = False
    # frames between device-table refreshes (catches async BA updates
    # between keyframes)
    fast_refresh_every: int = 10
    use_native: bool = True          # use the C++ runtime library when built
    profile: bool = False
    seed: int = 0
    # MapState table capacities (fixed-capacity SoA tables; the KF table
    # evicts least-connected keyframes when full — map_state.alloc_keyframe)
    map_max_kfs: int = 256
    map_max_points: int = 32768
    # pipeline-stage partitioning: run local mapping + loop closing in a
    # separate mapping-host process exchanging MapState deltas
    # (parallel/pipeline.py — the cross-host form of the reference's
    # LocalMapping/LoopClosing threads, src/System.cc:99-141)
    pipeline_stages: bool = False
    # JAX platform for the mapping-host process; "" inherits the parent's.
    # On a single-accelerator box the stage must not fight tracking for
    # the chip, so it defaults to cpu; a real multi-host deployment sets
    # "" (own chip per host).
    pipeline_child_platform: str = "cpu"


@dataclass(frozen=True)
class SystemConfig:
    slot_mode: int = SLOTMode.SLAM
    dynaslam_mode: int = 0
    camera: CameraConfig = field(default_factory=CameraConfig)
    orb: ORBConfig = field(default_factory=ORBConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    objects: ObjectConfig = field(default_factory=ObjectConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    ba: BAConfig = field(default_factory=BAConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    def replace(self, **kwargs) -> "SystemConfig":
        return dataclasses.replace(self, **kwargs)


# ---------------------------------------------------------------------------
# YAML loading (reference schema)
# ---------------------------------------------------------------------------

def _parse_opencv_yaml(path: str) -> dict:
    """Parse an OpenCV ``%YAML:1.0`` flat key:value file.

    cv::FileStorage YAML is almost-but-not-quite standard YAML (the ``%YAML:1.0``
    directive and ``!!opencv-matrix`` tags break pyyaml), and the reference's
    configs are flat scalars — so a tolerant line parser is both simpler and
    more compatible.
    """
    out: dict = {}
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or line.startswith("%"):
                continue
            m = re.match(r"^([A-Za-z0-9_.]+)\s*:\s*(.+)$", line)
            if not m:
                continue
            key, val = m.group(1), m.group(2).strip().strip('"')
            try:
                out[key] = int(val)
            except ValueError:
                try:
                    out[key] = float(val)
                except ValueError:
                    out[key] = val
    return out


def load_yaml(path: str, base: Optional[SystemConfig] = None) -> SystemConfig:
    """Build a :class:`SystemConfig` from a reference-schema YAML file."""
    y = _parse_opencv_yaml(path)
    cfg = base or SystemConfig()

    def get(key, default):
        return y.get(key, default)

    cam = dataclasses.replace(
        cfg.camera,
        fx=float(get("Camera.fx", cfg.camera.fx)),
        fy=float(get("Camera.fy", cfg.camera.fy)),
        cx=float(get("Camera.cx", cfg.camera.cx)),
        cy=float(get("Camera.cy", cfg.camera.cy)),
        k1=float(get("Camera.k1", cfg.camera.k1)),
        k2=float(get("Camera.k2", cfg.camera.k2)),
        p1=float(get("Camera.p1", cfg.camera.p1)),
        p2=float(get("Camera.p2", cfg.camera.p2)),
        width=int(get("Camera.width", cfg.camera.width)),
        height=int(get("Camera.height", cfg.camera.height)),
        fps=float(get("Camera.fps", cfg.camera.fps)),
        bf=float(get("Camera.bf", cfg.camera.bf)),
        rgb=bool(get("Camera.RGB", int(cfg.camera.rgb))),
        th_depth=float(get("ThDepth", cfg.camera.th_depth)),
    )
    orb = dataclasses.replace(
        cfg.orb,
        n_features=int(get("ORBextractor.nFeatures", cfg.orb.n_features)),
        scale_factor=float(get("ORBextractor.scaleFactor", cfg.orb.scale_factor)),
        n_levels=int(get("ORBextractor.nLevels", cfg.orb.n_levels)),
        ini_th_fast=int(get("ORBextractor.iniThFAST", cfg.orb.ini_th_fast)),
        min_th_fast=int(get("ORBextractor.minThFAST", cfg.orb.min_th_fast)),
    )
    uniform_scale = (
        float(get("Object.Width.xc", cfg.objects.uniform_scale[0])),
        float(get("Object.Height.yc", cfg.objects.uniform_scale[1])),
        float(get("Object.Length.zc", cfg.objects.uniform_scale[2])),
    )
    objects = dataclasses.replace(
        cfg.objects,
        select_tracked_obj_id=int(
            get("Object.EnSelectTrackedObjId", cfg.objects.select_tracked_obj_id)
        ),
        manual_point_max_distance=bool(
            int(get("Object.EbManualSetPointMaxDistance", 0)) > 0
        ),
        in_obj_frame_point_max_distance=float(
            get(
                "Object.EfInObjFramePointMaxDistance",
                cfg.objects.in_obj_frame_point_max_distance,
            )
        ),
        set_init_position_by_points=(
            float(get("Object.EbSetInitPositionByPoints", 1)) > 0
        ),
        # extension key: the reference hard-codes this switch as a local
        # `int temp = 0/1` (src/Tracking.cc:2384-2412)
        use_offline_flow=bool(
            int(get("Object.UseOfflineFlow",
                    int(cfg.objects.use_offline_flow)))
        ),
        init_min_features=int(
            get("Object.EnInitDetObjORBFeaturesNum", cfg.objects.init_min_features)
        ),
        object_center=int(get("Viewer.ObjectCenter", cfg.objects.object_center)),
        uniform_scale=uniform_scale,
    )
    detector = dataclasses.replace(
        cfg.detector,
        conf_threshold=float(get("Yolo.confThres", cfg.detector.conf_threshold)),
        iou_threshold=float(get("Yolo.iouThres", cfg.detector.iou_threshold)),
        weights_path=get("Yolo.weightsPath", cfg.detector.weights_path),
        reid_weights_path=get("DeepSort.weightsPath", cfg.detector.reid_weights_path),
    )
    # extension key (no reference analog — the reference hard-codes 500,
    # src/Tracking.cc:2842, which is disproportionate at small geometries)
    tracking = dataclasses.replace(
        cfg.tracking,
        min_init_stereo_features=int(
            get("Tracking.MinInitStereoFeatures",
                cfg.tracking.min_init_stereo_features)
        ),
    )
    return dataclasses.replace(
        cfg,
        slot_mode=int(get("SLOT.MODE", cfg.slot_mode)),
        dynaslam_mode=int(get("DynaSLAM.MODE", cfg.dynaslam_mode)),
        camera=cam,
        orb=orb,
        objects=objects,
        detector=detector,
        tracking=tracking,
    )


def kitti_tracking_config(sequence: int = 0, slot_mode: int = SLOTMode.OFFLINE) -> SystemConfig:
    """Default config for KITTI tracking sequences 0000-0013 (reference
    Examples/Stereo/0000-0013.yaml values)."""
    return SystemConfig(slot_mode=slot_mode)
