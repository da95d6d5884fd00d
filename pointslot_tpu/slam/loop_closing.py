"""Loop detection, geometric verification and loop correction.

Replaces the reference's KeyFrameDatabase (reference
src/KeyFrameDatabase.cc: BoW inverted index, DetectLoopCandidates,
DetectRelocalizationCandidates) and the LoopClosing thread
(reference src/LoopClosing.cc: DetectLoop :106 with 3-consistent
covisibility groups, ComputeSim3 :234 RANSAC + refine, CorrectLoop :405
pose propagation + SearchAndFuse + OptimizeEssentialGraph, then global BA
in a detached thread :648; stereo fixes scale, so the Sim3 degenerates to
SE(3)).

TPU design: the database is a dense (K, W) tf-idf matrix — a whole-database
similarity query is one matvec; geometric verification is the vmapped
3-point Horn RANSAC on stereo-unprojected 3D-3D matches followed by
inlier-weighted IRLS refinement (the OptimizeSim3 analog); the essential
graph is solvers/posegraph.py's batched GN — or the matrix-free
distributed CG engine when a multi-device mesh is attached; global BA is
the explicit-Schur engine over ALL keyframes — point-sharded over the mesh
when one is attached (parallel/dist_ba.py).
"""

from __future__ import annotations

from typing import List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from pointslot_tpu.config import SystemConfig
from pointslot_tpu.geometry import pnp
from pointslot_tpu.slam import matchers
from pointslot_tpu.slam.map_state import MapState
from pointslot_tpu.solvers import posegraph
from pointslot_tpu.utils.profiling import PROFILER
from pointslot_tpu.vocab.bow import BinaryVocabulary


def _next_pow2(n: int, lo: int, hi: int) -> int:
    p = lo
    while p < min(n, hi):
        p *= 2
    return p


class KeyFrameDatabase:
    """Dense BoW database over the keyframe table — the right representation
    for small self-trained vocabularies (a whole-database query is one
    matvec). For tree vocabularies at ORBvoc scale, make_database returns
    the sparse inverted-index twin (vocab/tree.py) instead."""

    def __init__(self, vocab: BinaryVocabulary, max_kfs: int):
        self.vocab = vocab
        self.vectors = np.zeros((max_kfs, vocab.n_words), np.float32)
        self.present = np.zeros(max_kfs, bool)

    def transform(self, desc: np.ndarray, valid: np.ndarray) -> np.ndarray:
        vec, _ = self.vocab.transform(desc, valid)
        return np.asarray(vec)

    def add(self, kf: int, desc: np.ndarray, valid: np.ndarray) -> np.ndarray:
        self.vectors[kf] = self.transform(desc, valid)
        self.present[kf] = True
        return self.vectors[kf]

    def remove(self, kf: int):
        self.present[kf] = False

    def clear(self):
        self.present[:] = False

    def pair_score(self, kf: int, vec: np.ndarray) -> float:
        if not self.present[kf]:
            return -1.0
        return float(1.0 - 0.5 * np.abs(self.vectors[kf] - vec).sum())

    def query(self, vec: np.ndarray, exclude: Set[int], min_score: float) -> List[int]:
        scores = 1.0 - 0.5 * np.abs(self.vectors - vec[None, :]).sum(axis=1)
        scores[~self.present] = -1.0
        for k in exclude:
            if 0 <= k < len(scores):
                scores[k] = -1.0
        ids = np.nonzero(scores >= min_score)[0]
        return list(ids[np.argsort(-scores[ids])])


def make_database(vocab, max_kfs: int):
    """Pick the database representation by vocabulary type: dense (K, W)
    tf-idf matrix for small flat vocabularies, sparse inverted index for
    tree vocabularies (bounded memory at ORBvoc's ~1M words — the
    reference's KeyFrameDatabase design, src/KeyFrameDatabase.cc)."""
    from pointslot_tpu.vocab.tree import SparseKeyFrameDatabase, TreeVocabulary

    if isinstance(vocab, TreeVocabulary):
        return SparseKeyFrameDatabase(vocab, max_kfs)
    return KeyFrameDatabase(vocab, max_kfs)


class LoopCloser:
    def __init__(self, config: SystemConfig, map_state: MapState,
                 vocab: BinaryVocabulary):
        self.cfg = config
        self.map = map_state
        self.vocab = vocab
        self.db = make_database(vocab, map_state.max_kfs)
        self._consistent_groups: List[tuple] = []  # (set_of_kfs, count)
        self.loops_closed = 0
        self.last_loop_kf = -10 ** 9
        self.on_loop_closed = None  # callback(corrections dict)
        self.last_gba_stats = None  # set by _global_ba

    # ------------------------------------------------------------------
    def on_keyframe(self, kf: int) -> bool:
        """Add to database; attempt detection + correction. Returns True if
        a loop was closed."""
        m = self.map
        lc = self.cfg.loop
        vec = self.db.add(kf, m.kf_desc[kf], m.kf_feat_valid[kf])
        if not lc.enabled:
            return False
        if (m.n_keyframes() < lc.min_kfs_before_detect
                or kf - self.last_loop_kf < lc.cooldown_kfs):
            return False

        candidate = self._detect_loop(kf, vec)
        if candidate is None:
            return False
        ok, T_lc = self._geometric_verification(kf, candidate)
        if not ok:
            return False
        self._correct_loop(kf, candidate, T_lc)
        self.loops_closed += 1
        self.last_loop_kf = kf
        return True

    # ------------------------------------------------------------------
    def _detect_loop(self, kf: int, vec: np.ndarray) -> Optional[int]:
        m = self.map
        lc = self.cfg.loop
        neighbors = m.covisible_keyframes(kf, min_weight=15)
        if len(neighbors) == 0:
            return None
        # min similarity to the covisible neighborhood sets the query floor
        neigh_scores = [self.db.pair_score(n, vec) for n in neighbors]
        min_score = max(min(neigh_scores), 0.0)
        exclude = set(int(n) for n in neighbors) | {kf}
        candidates = self.db.query(vec, exclude, min_score)
        # drop candidates too recent in time (KITTI: avoid adjacent frames)
        candidates = [
            c for c in candidates
            if abs(int(m.kf_frame_id[c]) - int(m.kf_frame_id[kf]))
            > lc.min_frame_distance
        ]
        if not candidates:
            self._consistent_groups = []
            return None

        # covisibility-consistency across consecutive detections (the
        # reference requires 3 consecutive consistent detections); a group is
        # the candidate + its covisible neighborhood, and its count is the
        # best chain it extends
        confirmed = None
        new_groups = []
        # temporal ordering for group expansion in sparse maps (a candidate
        # alone in its covisibility neighborhood still chains through its
        # sequential neighbors)
        by_time = sorted(m.keyframe_ids(), key=lambda k: m.kf_frame_id[k])
        pos = {int(k): i for i, k in enumerate(by_time)}
        for c in candidates[: lc.max_candidates]:
            group = set(int(x) for x in m.covisible_keyframes(c, min_weight=5))
            group.add(int(c))
            i = pos.get(int(c))
            if i is not None:
                for j in (i - 1, i + 1):
                    if 0 <= j < len(by_time):
                        group.add(int(by_time[j]))
            count = 0
            for prev_group, prev_count in self._consistent_groups:
                if group & prev_group:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count + 1 >= lc.covisibility_consistency_th and confirmed is None:
                confirmed = int(c)
        self._consistent_groups = new_groups
        return confirmed

    # ------------------------------------------------------------------
    def _geometric_verification(self, kf: int, cand: int):
        """Brute descriptor match + stereo-unprojected 3D-3D RANSAC,
        followed by inlier-weighted IRLS refinement (the reference's
        OptimizeSim3 role, src/Optimizer.cc:1684). Returns (ok, T_lc) with
        X_cand = T_lc @ X_cur (camera frames)."""
        m = self.map
        res = matchers.brute_match(
            jnp.asarray(m.kf_desc[kf]), jnp.asarray(m.kf_angle[kf]),
            jnp.asarray(m.kf_feat_valid[kf] & (m.kf_depth[kf] > 0)),
            jnp.asarray(m.kf_desc[cand]), jnp.asarray(m.kf_angle[cand]),
            jnp.asarray(m.kf_feat_valid[cand] & (m.kf_depth[cand] > 0)),
            nn_ratio=0.75, th_desc=matchers.TH_LOW, check_rotation=True,
        )
        idx = np.asarray(res.idx_b_for_a)
        sel = np.nonzero(idx >= 0)[0]
        if len(sel) < self.cfg.loop.min_sim3_inliers:
            return False, None
        cam = self.cfg.camera

        def unproject(k, feats):
            z = m.kf_depth[k, feats]
            x = (m.kf_xy[k, feats, 0] - cam.cx) * z / cam.fx
            y = (m.kf_xy[k, feats, 1] - cam.cy) * z / cam.fy
            return np.stack([x, y, z], axis=1)

        src = unproject(kf, sel)                      # current cam frame
        dst = unproject(cand, idx[sel])               # candidate cam frame
        N = 512
        pad_src = np.zeros((N, 3), np.float32)
        pad_dst = np.zeros((N, 3), np.float32)
        valid = np.zeros(N, bool)
        n = min(len(src), N)
        pad_src[:n], pad_dst[:n], valid[:n] = src[:n], dst[:n], True
        result = pnp.rigid_ransac(
            jnp.asarray(pad_src), jnp.asarray(pad_dst), jnp.asarray(valid),
            jax.random.PRNGKey(kf),
            inlier_threshold=0.4,
            n_hypotheses=self.cfg.loop.sim3_ransac_iters,
            with_scale=not self.cfg.loop.fix_scale,
            min_inliers=self.cfg.loop.min_sim3_inliers,
        )
        if not bool(result.ok):
            return False, None
        # IRLS refinement on the inlier set
        T_ref = pnp.rigid_refine(
            jnp.asarray(pad_src), jnp.asarray(pad_dst), result.inliers,
            result.T, huber_delta=0.15,
            n_iters=self.cfg.loop.refine_transform_iters,
            with_scale=not self.cfg.loop.fix_scale,
        )
        return True, np.asarray(T_ref, np.float64)

    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, cand: int, T_lc: np.ndarray):
        """Essential-graph optimization with the loop constraint; map points
        move with their reference keyframes; duplicate structure across the
        loop is merged before global BA."""
        m = self.map
        kf_ids = m.keyframe_ids()
        K = len(kf_ids)
        row = {int(k): i for i, k in enumerate(kf_ids)}
        old_poses = m.kf_pose[kf_ids].astype(np.float64).copy()

        e_i, e_j, meas, weight = [], [], [], []
        # sequential (spanning-tree analog) edges in frame order
        order = np.argsort(m.kf_frame_id[kf_ids])
        seq = [int(kf_ids[o]) for o in order]
        for a, b in zip(seq[1:], seq[:-1]):
            e_i.append(row[a]); e_j.append(row[b])
            meas.append(m.kf_pose[a].astype(np.float64) @ np.linalg.inv(m.kf_pose[b]))
            weight.append(1.0)
        # strong covisibility edges
        for k in kf_ids:
            for c in m.covisible_keyframes(int(k), min_weight=100):
                if int(c) > int(k):
                    e_i.append(row[int(k)]); e_j.append(row[int(c)])
                    meas.append(
                        m.kf_pose[int(k)].astype(np.float64)
                        @ np.linalg.inv(m.kf_pose[int(c)])
                    )
                    weight.append(1.0)
        # the loop edge: corrected T_cur = inv(T_lc) @ T_cand
        e_i.append(row[kf]); e_j.append(row[cand])
        meas.append(np.linalg.inv(T_lc))
        weight.append(20.0)

        new_poses = self._optimize_essential_graph(
            old_poses, kf_ids == cand, e_i, e_j, meas, weight
        )

        # move map points with their reference keyframe's correction
        corrections = {}
        for i, k in enumerate(kf_ids):
            corrections[int(k)] = (old_poses[i], new_poses[i])
            m.kf_pose[int(k)] = new_poses[i].astype(np.float32)
        pts = np.nonzero(m.pt_valid)[0]
        for p in pts:
            ref = int(m.pt_first_kf[p])
            if ref not in corrections:
                obs_kfs = np.nonzero(m.obs[p])[0]
                if len(obs_kfs) == 0:
                    continue
                ref = int(obs_kfs[0])
                if ref not in corrections:
                    continue
            T_old, T_new = corrections[ref]
            X = m.pt_pos[p]
            Xc = T_old[:3, :3] @ X + T_old[:3, 3]
            T_wc_new = np.linalg.inv(T_new)
            m.pt_pos[p] = T_wc_new[:3, :3] @ Xc + T_wc_new[:3, 3]

        # merge duplicate structure across the loop (SearchAndFuse analog,
        # reference src/LoopClosing.cc:590) so global BA ties the loop
        # together instead of keeping two copies of the revisited scene
        self._search_and_fuse(kf, cand)

        if self.cfg.loop.run_global_ba:
            self._global_ba(cand)

        if self.on_loop_closed:
            self.on_loop_closed(corrections)

    # ------------------------------------------------------------------
    def _optimize_essential_graph(self, old_poses, fixed_mask,
                                  e_i, e_j, meas, weight) -> np.ndarray:
        """Dense GN pose graph on one device; matrix-free distributed CG
        (parallel/dist_pg.py) over the mesh when one is attached."""
        from pointslot_tpu.parallel.runtime import default_mesh

        K = len(old_poses)
        E = len(e_i)
        mesh = default_mesh()
        n_iters = self.cfg.loop.pose_graph_cg_iters // 5

        if mesh is not None:
            n_dev = mesh.size
            E_pad = -(-E // n_dev) * n_dev
        else:
            E_pad = E

        def pad(a, fill=0):
            a = np.asarray(a)
            out = np.full((E_pad,) + a.shape[1:], fill, a.dtype)
            out[:E] = a
            return out

        prob = posegraph.PoseGraphProblem(
            poses=jnp.asarray(old_poses, jnp.float32),
            fixed=jnp.asarray(fixed_mask),
            valid=jnp.ones(K, bool),
            e_i=jnp.asarray(pad(np.asarray(e_i, np.int32))),
            e_j=jnp.asarray(pad(np.asarray(e_j, np.int32))),
            e_meas=jnp.asarray(pad(np.stack(meas).astype(np.float32),
                                   np.eye(4, dtype=np.float32))),
            e_weight=jnp.asarray(pad(np.asarray(weight, np.float32))),
            e_valid=jnp.asarray(np.arange(E_pad) < E),
        )
        if mesh is not None:
            from pointslot_tpu.parallel.dist_pg import distributed_pose_graph

            PROFILER.count("essential_graph_distributed")
            out = distributed_pose_graph(prob, mesh, n_gn_iters=n_iters,
                                         n_cg_iters=32)
        else:
            out = posegraph.optimize_pose_graph(prob, n_iters=n_iters)
        return np.asarray(out, np.float64)

    # ------------------------------------------------------------------
    def _search_and_fuse(self, kf: int, cand: int):
        """Project the loop side's map points into the current side's
        keyframes (at their corrected poses) and merge matches: features
        bound to a different point have that point replaced by the loop
        point; unbound features gain a binding."""
        m = self.map
        cam = self.cfg.camera
        loop_kfs = [cand] + [int(c) for c in m.covisible_keyframes(cand, min_weight=15)]
        cur_kfs = [kf] + [int(c) for c in m.covisible_keyframes(kf, min_weight=15)]
        loop_pts = m.points_of_keyframes(loop_kfs)
        if len(loop_pts) == 0:
            return
        scales = np.asarray(
            [self.cfg.orb.scale_factor ** i for i in range(self.cfg.orb.n_levels)],
            np.float32,
        )
        M = len(loop_pts)
        M_pad = _next_pow2(M, 256, 1 << 30)

        def padM(a, fill=0):
            out = np.full((M_pad,) + a.shape[1:], fill, a.dtype)
            out[:M] = a[:M_pad]
            return out

        merged = 0
        for k in cur_kfs:
            # per-point predicted octave from viewing distance (the same
            # scale prediction tracking and neighbor-fuse use; a zero
            # pred_level would level-gate away every high-octave feature)
            T = m.kf_pose[k]
            cam_center = -T[:3, :3].T @ T[:3, 3]
            dists = np.linalg.norm(m.pt_pos[loop_pts] - cam_center, axis=1)
            pred_level = m.predict_scale(dists, loop_pts)
            res = matchers.project_and_match(
                jnp.asarray(padM(m.pt_pos[loop_pts].astype(np.float32))),
                jnp.asarray(padM(m.pt_desc[loop_pts])),
                jnp.asarray(padM(m.pt_valid[loop_pts], False)),
                jnp.asarray(m.kf_pose[k], jnp.float32),
                jnp.asarray(m.kf_xy[k]), jnp.asarray(m.kf_level[k]),
                jnp.asarray(m.kf_desc[k]),
                jnp.asarray(m.kf_feat_valid[k]),
                jnp.full((M_pad,), 8.0, jnp.float32),
                jnp.asarray(scales),
                jnp.asarray(padM(pred_level.astype(np.int32))),
                width=cam.width, height=cam.height,
                th_desc=matchers.TH_LOW,
                level_window=jnp.int32(2),
                fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
                cy=float(cam.cy), bf=float(cam.bf),
            )
            pf = np.asarray(res.point_for_feature)
            feats = np.nonzero(pf >= 0)[0]
            for f in feats:
                dst = int(loop_pts[pf[f]])
                cur = int(m.kf_point_idx[k, f])
                if cur < 0:
                    m.bind(k, np.asarray([f]), np.asarray([dst]))
                elif cur != dst:
                    m.replace_point(cur, dst)
                    merged += 1
        PROFILER.count("loop_points_merged", merged)

    # ------------------------------------------------------------------
    def _global_ba(self, fixed_kf: int):
        """Full-map bundle adjustment after loop correction (the reference
        runs this in a detached thread, LoopClosing::RunGlobalBundleAdjustment
        src/LoopClosing.cc:648-752). ALL keyframes participate; structure is
        capped at loop.gba_max_points well-observed points (the rest are
        corrected afterwards by their reference keyframe's pose delta, the
        same propagation the reference applies to points created during
        GBA). Point-sharded over the device mesh when one is attached."""
        from pointslot_tpu.solvers import local_ba

        m = self.map
        cam = self.cfg.camera
        lc = self.cfg.loop
        kf_ids = list(m.keyframe_ids())
        P_cap = _next_pow2(len(kf_ids), 16, m.max_kfs)
        kf_row = {int(k): i for i, k in enumerate(kf_ids)}

        # structure selection: prefer well-observed points
        pts_all = np.nonzero(m.pt_valid)[0]
        if len(pts_all) == 0:
            return
        obs_count = m.point_obs_count()[pts_all]
        if len(pts_all) > lc.gba_max_points:
            keep = np.argsort(-obs_count)[: lc.gba_max_points]
            PROFILER.count("gba_points_propagated_only",
                           len(pts_all) - lc.gba_max_points)
            pts = np.sort(pts_all[keep])
        else:
            pts = pts_all
        L_cap = _next_pow2(len(pts), 1024, 1 << 30)
        pt_row = np.full(m.max_points, -1, np.int64)
        pt_row[pts] = np.arange(len(pts))
        scales = np.asarray(
            [self.cfg.orb.scale_factor ** i for i in range(self.cfg.orb.n_levels)],
            np.float32,
        )

        e_pose, e_point, e_obs, e_stereo, e_inv2 = [], [], [], [], []
        for k in kf_ids:
            bound = np.nonzero(m.kf_point_idx[k] >= 0)[0]
            p_idx = m.kf_point_idx[k, bound]
            sel = pt_row[p_idx] >= 0
            bound, p_idx = bound[sel], p_idx[sel]
            e_pose.append(np.full(len(bound), kf_row[int(k)]))
            e_point.append(pt_row[p_idx])
            e_obs.append(np.stack(
                [m.kf_xy[k, bound, 0], m.kf_xy[k, bound, 1],
                 m.kf_uright[k, bound]], axis=1))
            e_stereo.append(m.kf_depth[k, bound] > 0)
            e_inv2.append(1.0 / scales[m.kf_level[k, bound]] ** 2)
        e_pose = np.concatenate(e_pose)
        e_point = np.concatenate(e_point)
        e_obs = np.concatenate(e_obs)
        e_stereo = np.concatenate(e_stereo)
        e_inv2 = np.concatenate(e_inv2)
        if len(e_pose) < 100:
            return

        fixed_flags = [int(k) == int(fixed_kf) for k in kf_ids]
        if not any(fixed_flags):
            fixed_flags[0] = True
        old_kf_poses = m.kf_pose[kf_ids].astype(np.float64).copy()

        prob, slot_edge = local_ba.build_problem(
            poses=m.kf_pose[kf_ids].astype(np.float32),
            pose_fixed=np.asarray(fixed_flags),
            points=m.pt_pos[pts].astype(np.float32),
            e_pose=e_pose, e_point=e_point, e_obs=e_obs, e_stereo=e_stereo,
            e_inv_sigma2=e_inv2,
            P_cap=P_cap, L_cap=L_cap, K=lc.gba_obs_per_point,
        )
        # pre-gate: drop grossly-inconsistent observations (wrong
        # associations made while the map was drifted) at the corrected
        # state BEFORE optimizing, so the robust stage starts clean
        cam_args = dict(fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
                        cy=float(cam.cy), bf=float(cam.bf))
        res0, behind0 = local_ba._residuals_only(
            prob.poses, prob.points, prob, **cam_args)
        chi2_0 = local_ba._chi2(res0, prob.obs_stereo, prob.obs_inv_sigma2)
        gate0 = jnp.where(prob.obs_stereo, local_ba.CHI2_STEREO,
                          local_ba.CHI2_MONO) * 10.0
        prob = prob._replace(
            obs_valid=prob.obs_valid & (chi2_0 <= gate0) & ~behind0)

        from pointslot_tpu.parallel.runtime import default_mesh

        mesh = default_mesh()
        if mesh is not None and L_cap % mesh.size == 0:
            from pointslot_tpu.parallel.dist_ba import distributed_bundle_adjust

            PROFILER.count("gba_distributed")
            result = distributed_bundle_adjust(prob, mesh, **cam_args)
        else:
            result = local_ba.bundle_adjust(prob, **cam_args)

        # record structure-level improvement for observability/tests: robust
        # cost of the SAME observation set before vs after the joint solve
        delta2 = jnp.where(prob.obs_stereo, local_ba.CHI2_STEREO,
                           local_ba.CHI2_MONO)
        chi2_in = local_ba._chi2(
            *local_ba._residuals_only(prob.poses, prob.points, prob,
                                      **cam_args)[:1],
            prob.obs_stereo, prob.obs_inv_sigma2)
        chi2_out = local_ba._chi2(
            *local_ba._residuals_only(result.poses, result.points, prob,
                                      **cam_args)[:1],
            prob.obs_stereo, prob.obs_inv_sigma2)
        act = prob.obs_valid
        self.last_gba_stats = {
            "cost_before": float(jnp.sum(jnp.where(
                act, local_ba._robust_cost(chi2_in, delta2), 0.0))),
            "cost_after": float(jnp.sum(jnp.where(
                act, local_ba._robust_cost(chi2_out, delta2), 0.0))),
            "n_obs": int(jnp.sum(act)),
            "n_kfs": len(kf_ids),
            "n_points": len(pts),
        }

        new_poses = np.asarray(result.poses, np.float64)
        for i, k in enumerate(kf_ids):
            if not fixed_flags[i]:
                m.kf_pose[int(k)] = new_poses[i].astype(np.float32)
        m.pt_pos[pts] = np.asarray(result.points, np.float64)[: len(pts)]

        # propagate the GBA pose deltas to points that were not in the solve
        rest = pts_all[pt_row[pts_all] < 0]
        for p in rest:
            ref = int(m.pt_first_kf[p])
            if ref not in kf_row:
                obs_kfs = np.nonzero(m.obs[p])[0]
                if len(obs_kfs) == 0:
                    continue
                ref = int(obs_kfs[0])
                if ref not in kf_row:
                    continue
            i = kf_row[ref]
            T_old = old_kf_poses[i]
            T_new = new_poses[i] if not fixed_flags[i] else T_old
            X = m.pt_pos[p]
            Xc = T_old[:3, :3] @ X + T_old[:3, 3]
            T_wc_new = np.linalg.inv(T_new)
            m.pt_pos[p] = T_wc_new[:3, :3] @ Xc + T_wc_new[:3, 3]


class Relocalizer:
    """BoW candidate search + PnP-RANSAC recovery from LOST
    (reference Tracking::Relocalization src/Tracking.cc:3502-3663)."""

    def __init__(self, config: SystemConfig, map_state: MapState,
                 db: KeyFrameDatabase):
        self.cfg = config
        self.map = map_state
        self.db = db

    def relocalize(self, frame) -> bool:
        m = self.map
        lc = self.cfg.loop
        vec = self.db.transform(frame.desc, frame.valid)
        candidates = self.db.query(
            vec, set(), min_score=lc.reloc_min_score
        )[: lc.reloc_max_candidates]
        cam = self.cfg.camera
        for cand in candidates:
            res = matchers.brute_match(
                jnp.asarray(frame.desc), jnp.asarray(frame.angle),
                jnp.asarray(frame.valid),
                jnp.asarray(m.kf_desc[cand]), jnp.asarray(m.kf_angle[cand]),
                jnp.asarray(m.kf_feat_valid[cand] & (m.kf_point_idx[cand] >= 0)),
                nn_ratio=0.75, th_desc=matchers.TH_LOW, check_rotation=True,
            )
            idx = np.asarray(res.idx_b_for_a)
            sel = np.nonzero(idx >= 0)[0]
            if len(sel) < 15:
                continue
            pts = m.kf_point_idx[cand, idx[sel]]
            ok = m.pt_valid[pts]
            sel, pts = sel[ok], pts[ok]
            if len(sel) < 15:
                continue
            N = 512
            p3 = np.zeros((N, 3), np.float32)
            uv = np.zeros((N, 2), np.float32)
            valid = np.zeros(N, bool)
            n = min(len(sel), N)
            p3[:n] = m.pt_pos[pts[:n]]
            uv[:n] = frame.xy[sel[:n]]
            valid[:n] = True
            result = pnp.pnp_ransac(
                jnp.asarray(p3), jnp.asarray(uv), jnp.asarray(valid),
                jax.random.PRNGKey(int(frame.frame_id)),
                float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
                min_inliers=15,
            )
            if bool(result.ok):
                frame.T_cw = np.asarray(result.T, np.float32)
                bind = np.full(len(frame.xy), -1, np.int64)
                inl = np.asarray(result.inliers)[:n]
                bind[sel[:n][inl]] = pts[:n][inl]
                frame.point_idx = bind
                return True
        return False
