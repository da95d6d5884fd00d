"""Fused per-frame tracking step: ONE device dispatch for the camera hot
path — frontend (pyramid/FAST/BRIEF/stereo) + motion-model projection
matching + pose LM + local-map projection matching + second pose LM, with
the constant-velocity model applied on-device.

This is the TPU answer to the reference's per-frame tracking-thread work
(reference src/Tracking.cc: TrackWithMotionModel :3028 -> SearchByProjection
src/ORBmatcher.cc:1613 -> PoseOptimization src/Optimizer.cc:249, then
TrackLocalMap :3090 -> SearchByProjection :68 -> PoseOptimization), which
issues it as six-plus separate GPU/CPU stages. Fusing everything into one
XLA program removes all intermediate host round-trips: per frame the host
uploads nothing but the images and downloads nothing but a pose and a few
scalars (and may leave even those on device, chaining step outputs into the
next step's inputs — the bench.py e2e loop runs fully device-resident).

The map-side inputs are fixed-capacity padded tables (positions,
descriptors, predicted octaves, validity) refreshed by the host at keyframe
rate, not frame rate — mirroring the reference, where the local map also
only changes when the mapping thread commits a keyframe.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.ops.frontend import StereoFrontend
from pointslot_tpu.slam import matchers
from pointslot_tpu.solvers import pose_opt


class FusedStepResult(NamedTuple):
    T_cw: jnp.ndarray            # (4, 4) optimized pose
    velocity: jnp.ndarray        # (4, 4) updated constant-velocity model
    point_for_feature: jnp.ndarray  # (N,) map row bound per feature (-1)
    n_inliers: jnp.ndarray       # () int32 final inlier count
    xy: jnp.ndarray              # (N, 2) frame features (for KF policy)
    level: jnp.ndarray           # (N,)
    desc: jnp.ndarray            # (N, 8)
    angle: jnp.ndarray           # (N,)
    depth: jnp.ndarray           # (N,)
    u_right: jnp.ndarray         # (N,)
    valid: jnp.ndarray           # (N,)


class FusedTrackStep:
    """jit-compiled (left, right, T_prev, velocity, map tables) -> result.

    map tables: pos (M, 3) f32, desc (M, 8) u32, level (M,) i32 predicted
    octave, valid (M,) bool. M is a static capacity; callers pad.
    """

    def __init__(self, config: SystemConfig, frontend: StereoFrontend = None):
        self.cfg = config
        cam = config.camera
        self.frontend = frontend or StereoFrontend(
            cam.height, cam.width, cam.fx, cam.bf, config.orb
        )
        self._scales = jnp.asarray(
            [config.orb.scale_factor ** i for i in range(config.orb.n_levels)],
            jnp.float32,
        )
        self._cam = dict(
            fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
            cy=float(cam.cy), bf=float(cam.bf),
        )
        self._wh = dict(width=cam.width, height=cam.height)
        self._step = jax.jit(self._step_impl)
        self._step_gated = jax.jit(self._step_gated_impl)

    # ------------------------------------------------------------------
    def __call__(self, left, right, T_prev, velocity,
                 map_pos, map_desc, map_level, map_valid,
                 gate=None) -> FusedStepResult:
        """gate: optional (H, W) bool allowed-region mask — detection is
        restricted to it AND each feature is exact-checked at its level-0
        coords (the reference's AssignFeatures mask filter,
        src/Frame.cc:810-844), all inside the one dispatch."""
        args = (
            jnp.asarray(left), jnp.asarray(right),
            jnp.asarray(T_prev, jnp.float32), jnp.asarray(velocity, jnp.float32),
            jnp.asarray(map_pos, jnp.float32), jnp.asarray(map_desc, jnp.uint32),
            jnp.asarray(map_level, jnp.int32), jnp.asarray(map_valid, bool),
        )
        if gate is None:
            return FusedStepResult(*self._step(*args))
        return FusedStepResult(*self._step_gated(*args, jnp.asarray(gate, bool)))

    # ------------------------------------------------------------------
    def _match_stage(self, sf, T, map_pos, map_desc, map_level, map_valid,
                     radius: float, th_desc: int):
        M = map_pos.shape[0]
        res = matchers.project_and_match(
            map_pos, map_desc, map_valid, T,
            sf.xy, sf.level, sf.desc, sf.valid,
            jnp.full((M,), radius, jnp.float32),
            self._scales, map_level,
            th_desc=th_desc, level_window=jnp.int32(2),
            **self._cam, **self._wh,
        )
        return res.point_for_feature

    def _solve_stage(self, sf, pf, T_init, map_pos):
        ok = pf >= 0
        rows = jnp.clip(pf, 0, map_pos.shape[0] - 1)
        edges = pose_opt.PoseObs(
            pts=map_pos[rows],
            obs=jnp.stack([sf.xy[:, 0], sf.xy[:, 1], sf.u_right], axis=-1),
            is_stereo=sf.depth > 0,
            inv_sigma2=1.0 / self._scales[jnp.clip(sf.level, 0, 7)] ** 2,
            valid=ok & sf.valid,
        )
        return pose_opt.pose_optimize(T_init, edges, **self._cam)

    def _step_gated_impl(self, left, right, T_prev, velocity,
                         map_pos, map_desc, map_level, map_valid, gate):
        return self._step_impl(left, right, T_prev, velocity,
                               map_pos, map_desc, map_level, map_valid,
                               gate=gate)

    def _step_impl(self, left, right, T_prev, velocity,
                   map_pos, map_desc, map_level, map_valid, gate=None):
        frame = _stereo_frame(self.frontend, left, right, gate)
        if gate is not None:
            # exact per-feature mask check at level-0 coords (coarse-level
            # gating leaks a few boundary features)
            xi = jnp.clip(jnp.round(frame.xy[:, 0]).astype(jnp.int32), 0,
                          gate.shape[1] - 1)
            yi = jnp.clip(jnp.round(frame.xy[:, 1]).astype(jnp.int32), 0,
                          gate.shape[0] - 1)
            frame = frame._replace(valid=frame.valid & gate[yi, xi])

        T_pred = velocity @ T_prev
        # stage 1: motion-model window (radius 7, TH_HIGH — reference
        # SearchByProjection(cur, last, th=7), src/ORBmatcher.cc:1613)
        pf1 = self._match_stage(frame, T_pred, map_pos, map_desc, map_level,
                                map_valid, radius=7.0,
                                th_desc=matchers.TH_HIGH)
        r1 = self._solve_stage(frame, pf1, T_pred, map_pos)
        # stage 2: local-map window at the refined pose (radius 4, matching
        # the host tracker; reference SearchByProjection vs local map,
        # src/ORBmatcher.cc:68)
        pf2 = self._match_stage(frame, r1.T, map_pos, map_desc, map_level,
                                map_valid, radius=4.0,
                                th_desc=matchers.TH_HIGH)
        # features that matched in stage 1 keep their binding if stage 2
        # found nothing there (the keep_existing semantics of tracking)
        pf = jnp.where(pf2 >= 0, pf2, pf1)
        r2 = self._solve_stage(frame, pf, r1.T, map_pos)
        pf_final = jnp.where(r2.inliers, pf, -1)

        vel_new = r2.T @ jnp.linalg.inv(T_prev)
        return (r2.T, vel_new, pf_final, r2.n_inliers,
                frame.xy, frame.level, frame.desc, frame.angle,
                frame.depth, frame.u_right, frame.valid)


def _stereo_frame(frontend: StereoFrontend, left, right, gate=None):
    """Run the frontend impl inline (inside the enclosing jit)."""
    from pointslot_tpu.ops.frontend import StereoFrame

    if gate is None:
        return StereoFrame(*frontend._run_impl(left, right))
    return StereoFrame(*frontend._run_gated_impl(left, right, gate))


# ---------------------------------------------------------------------------
# batched object phase (mode-4 e2e): per-object projection match + batched
# pose LM — the device work of TrackLastFrameObjectPoint/TrackObjectLocalMap
# (reference src/Tracking.cc:2288/:2468, solves at src/Optimizer.cc:479)
# ---------------------------------------------------------------------------

class FusedObjectPhase:
    """jit-compiled (frame features, per-object point tables, T_co inits)
    -> batched optimized object poses.

    Tables: obj_pos (O, Mo, 3) points in object frame, obj_desc (O, Mo, 8),
    obj_valid (O, Mo); T_init (O, 4, 4) camera-from-object predictions.
    """

    def __init__(self, config: SystemConfig):
        self.cfg = config
        cam = config.camera
        self._cam = dict(
            fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
            cy=float(cam.cy), bf=float(cam.bf),
        )
        self._wh = dict(width=cam.width, height=cam.height)
        self._scales = jnp.asarray(
            [config.orb.scale_factor ** i for i in range(config.orb.n_levels)],
            jnp.float32,
        )
        self._run = jax.jit(self._impl)

    def __call__(self, feat_xy, feat_level, feat_desc, feat_valid,
                 feat_depth, feat_uright, obj_pos, obj_desc, obj_valid,
                 T_prev, velocity=None):
        """T_prev (O, 4, 4) last camera-from-object poses; velocity
        (O, 4, 4) per-object constant-velocity model (identity if None).
        Returns (T_new, velocity_new, n_inliers) — chainable on device."""
        if velocity is None:
            velocity = jnp.tile(jnp.eye(4, dtype=jnp.float32),
                                (np.asarray(obj_pos).shape[0], 1, 1))
        return self._run(
            jnp.asarray(feat_xy), jnp.asarray(feat_level),
            jnp.asarray(feat_desc), jnp.asarray(feat_valid),
            jnp.asarray(feat_depth), jnp.asarray(feat_uright),
            jnp.asarray(obj_pos), jnp.asarray(obj_desc),
            jnp.asarray(obj_valid), jnp.asarray(T_prev),
            jnp.asarray(velocity),
        )

    def _impl(self, feat_xy, feat_level, feat_desc, feat_valid,
              feat_depth, feat_uright, obj_pos, obj_desc, obj_valid,
              T_prev, velocity):
        Mo = obj_pos.shape[1]

        def one(pos, desc, valid, Tp, vel):
            # constant-velocity prediction (reference
            # UsingVelocitySetPredictPos, src/g2o_Object.cc:58)
            T0 = vel @ Tp
            res = matchers.project_and_match(
                pos, desc, valid, T0,
                feat_xy, feat_level, feat_desc, feat_valid,
                jnp.full((Mo,), 7.0, jnp.float32),
                self._scales, jnp.zeros((Mo,), jnp.int32),
                th_desc=matchers.TH_HIGH, level_window=jnp.int32(8),
                **self._cam, **self._wh,
            )
            pf = res.point_for_feature
            ok = pf >= 0
            rows = jnp.clip(pf, 0, Mo - 1)
            edges = pose_opt.PoseObs(
                pts=pos[rows],
                obs=jnp.stack(
                    [feat_xy[:, 0], feat_xy[:, 1], feat_uright], axis=-1
                ),
                is_stereo=feat_depth > 0,
                inv_sigma2=1.0 / self._scales[jnp.clip(feat_level, 0, 7)] ** 2,
                valid=ok & feat_valid,
            )
            r = pose_opt.pose_optimize(T0, edges, **self._cam)
            vel_new = r.T @ jnp.linalg.inv(Tp)
            return r.T, vel_new, r.n_inliers

        return jax.vmap(one)(obj_pos, obj_desc, obj_valid, T_prev, velocity)


class FusedFrameStep:
    """Camera step + batched object phase in ONE device dispatch — the
    full mode-4 per-frame hot path as a single program.

    NOTE: for a streaming loop the two-dispatch split (`.step` then
    `.phase`) measured FASTER on chip (187 vs 172 fps): frame i+1's
    enqueue/DMA overlaps frame i's object compute across the dispatch
    boundary. Use this fused form when a single program is structurally
    required (one enqueue slot per frame, remote/queued execution);
    use .step/.phase for lowest streaming latency."""

    def __init__(self, config: SystemConfig,
                 frontend: StereoFrontend = None):
        self.step = FusedTrackStep(config, frontend)
        self.phase = FusedObjectPhase(config)
        self._run = jax.jit(self._impl)

    @property
    def frontend(self):
        return self.step.frontend

    def _impl(self, left, right, T_prev, velocity,
              map_pos, map_desc, map_level, map_valid,
              obj_pos, obj_desc, obj_valid, T_obj, vel_obj):
        r = FusedStepResult(*self.step._step_impl(
            left, right, T_prev, velocity,
            map_pos, map_desc, map_level, map_valid,
        ))
        T_new, vel_new, n_inl = self.phase._impl(
            r.xy, r.level, r.desc, r.valid, r.depth, r.u_right,
            obj_pos, obj_desc, obj_valid, T_obj, vel_obj,
        )
        return tuple(r) + (T_new, vel_new, n_inl)

    def __call__(self, left, right, T_prev, velocity,
                 map_pos, map_desc, map_level, map_valid,
                 obj_pos, obj_desc, obj_valid, T_obj, vel_obj=None):
        """Returns (FusedStepResult, T_obj', vel_obj', obj_n_inliers) —
        all chainable on device."""
        if vel_obj is None:
            vel_obj = jnp.tile(jnp.eye(4, dtype=jnp.float32),
                               (np.asarray(obj_pos).shape[0], 1, 1))
        out = self._run(
            jnp.asarray(left), jnp.asarray(right),
            jnp.asarray(T_prev, jnp.float32),
            jnp.asarray(velocity, jnp.float32),
            jnp.asarray(map_pos, jnp.float32),
            jnp.asarray(map_desc, jnp.uint32),
            jnp.asarray(map_level, jnp.int32), jnp.asarray(map_valid, bool),
            jnp.asarray(obj_pos, jnp.float32),
            jnp.asarray(obj_desc, jnp.uint32), jnp.asarray(obj_valid, bool),
            jnp.asarray(T_obj, jnp.float32), jnp.asarray(vel_obj, jnp.float32),
        )
        n = len(FusedStepResult._fields)
        return FusedStepResult(*out[:n]), out[n], out[n + 1], out[n + 2]

    # ------------------------------------------------------------------
    def _multi_impl(self, lefts, rights, T_prev, velocity,
                    map_pos, map_desc, map_level, map_valid,
                    obj_pos, obj_desc, obj_valid, T_obj, vel_obj):
        """lax.scan the full mode-4 frame over S consecutive frames —
        ONE dispatch per chunk, poses/velocities chained in-program. The
        dispatch-rate amortization: once the per-frame device time drops
        below ~2x the host enqueue cost, a streaming loop becomes
        ENQUEUE-bound; chunking S frames divides that cost by S (at S-1
        frames of added latency — a throughput configuration, the
        streaming per-frame path stays `.step`/`.phase` or __call__)."""
        def body(carry, xs):
            T, vel, To, vo = carry
            left, right = xs
            out = self._impl(left, right, T, vel,
                             map_pos, map_desc, map_level, map_valid,
                             obj_pos, obj_desc, obj_valid, To, vo)
            n = len(FusedStepResult._fields)
            res = FusedStepResult(*out[:n])
            carry = (res.T_cw, res.velocity, out[n], out[n + 1])
            return carry, (res.T_cw, res.n_inliers, out[n + 2])

        carry, ys = jax.lax.scan(body, (T_prev, velocity, T_obj, vel_obj),
                                 (lefts, rights))
        return carry, ys

    def multi(self, lefts, rights, T_prev, velocity,
              map_pos, map_desc, map_level, map_valid,
              obj_pos, obj_desc, obj_valid, T_obj, vel_obj=None):
        """Chunked mode-4 tracking: lefts/rights (S, H, W). Returns
        ((T_cw', velocity', T_obj', vel_obj'), (T_cw per frame,
        n_inliers per frame, obj_n_inliers per frame)) — the carry chains
        into the next chunk on device."""
        if vel_obj is None:
            vel_obj = jnp.tile(jnp.eye(4, dtype=jnp.float32),
                               (np.asarray(obj_pos).shape[0], 1, 1))
        if not hasattr(self, "_run_multi"):
            self._run_multi = jax.jit(self._multi_impl)
        return self._run_multi(
            jnp.asarray(lefts), jnp.asarray(rights),
            jnp.asarray(T_prev, jnp.float32),
            jnp.asarray(velocity, jnp.float32),
            jnp.asarray(map_pos, jnp.float32),
            jnp.asarray(map_desc, jnp.uint32),
            jnp.asarray(map_level, jnp.int32), jnp.asarray(map_valid, bool),
            jnp.asarray(obj_pos, jnp.float32),
            jnp.asarray(obj_desc, jnp.uint32), jnp.asarray(obj_valid, bool),
            jnp.asarray(T_obj, jnp.float32),
            jnp.asarray(vel_obj, jnp.float32),
        )
