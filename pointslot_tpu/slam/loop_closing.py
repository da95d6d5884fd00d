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
        import threading

        self.cfg = config
        self.map = map_state
        self.vocab = vocab
        self.db = make_database(vocab, map_state.max_kfs)
        self._consistent_groups: List[tuple] = []  # (set_of_kfs, count)
        self.loops_closed = 0
        self.last_loop_kf = -10 ** 9
        self.on_loop_closed = None  # callback(corrections dict)
        self.last_gba_stats = None  # set by the GBA merge-back
        # background global BA (the reference's detached thread + abort
        # flag, src/LoopClosing.cc:648-752 mbStopGBA/mnFullBAIdx): the
        # solve runs WITHOUT the map lock; the merge-back re-takes it and
        # is discarded if the epoch moved (a newer loop/reset superseded it)
        self.map_lock = threading.RLock()  # System replaces with its lock
        self._gba_thread: Optional[threading.Thread] = None
        self._gba_epoch = 0
        self.gba_running = False

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
        # (vectorized — runs under the map lock)
        corrections = {}
        for i, k in enumerate(kf_ids):
            corrections[int(k)] = (old_poses[i], new_poses[i])
            m.kf_pose[int(k)] = new_poses[i].astype(np.float32)
        A = np.einsum("kij,kjl->kil", np.linalg.inv(new_poses), old_poses)
        row_of_slot = np.full(m.max_kfs, -1, np.int64)
        for k, i in row.items():
            row_of_slot[k] = i
        pts = np.nonzero(m.pt_valid)[0]
        if len(pts):
            ref = m.pt_first_kf[pts]
            rows_p = np.where(ref >= 0, row_of_slot[np.maximum(ref, 0)], -1)
            for j in np.nonzero(rows_p < 0)[0]:
                obs_kfs = np.nonzero(m.obs[pts[j]])[0]
                if len(obs_kfs):
                    rows_p[j] = row_of_slot[int(obs_kfs[0])]
            sel = rows_p >= 0
            rp, rr = pts[sel], rows_p[sel]
            X = m.pt_pos[rp]
            m.pt_pos[rp] = (
                np.einsum("rij,rj->ri", A[rr, :3, :3], X) + A[rr, :3, 3]
            )

        # merge duplicate structure across the loop (SearchAndFuse analog,
        # reference src/LoopClosing.cc:590) so global BA ties the loop
        # together instead of keeping two copies of the revisited scene
        self._search_and_fuse(kf, cand)

        if self.cfg.loop.run_global_ba:
            self._launch_global_ba(cand)

        if self.on_loop_closed:
            self.on_loop_closed(corrections)

    # ------------------------------------------------------------------
    def _launch_global_ba(self, fixed_kf: int):
        """Run the full-map BA off the tracking critical path (reference
        LoopClosing::RunGlobalBundleAdjustment detached thread,
        src/LoopClosing.cc:648). The snapshot is taken under the map lock
        (cheap array packing); the LM solve runs lock-free on a background
        thread; the merge-back re-takes the lock with uid staleness guards
        and is discarded if a newer loop closure/reset bumped the epoch
        (the mnFullBAIdx check)."""
        import threading

        self._gba_epoch += 1
        snap = self._gba_snapshot(fixed_kf)
        if snap is None:
            return
        if not self.cfg.loop.background_gba:
            self._gba_run(snap, self._gba_epoch)
            return
        self.wait_for_gba()  # at most one in flight; stale one was aborted
        self.gba_running = True
        t = threading.Thread(
            target=self._gba_run, args=(snap, self._gba_epoch), daemon=True
        )
        self._gba_thread = t
        t.start()

    def _gba_run(self, snap, epoch: int):
        try:
            result, stats = self._gba_solve(snap)
            with self.map_lock:
                if epoch != self._gba_epoch:
                    PROFILER.count("gba_aborted")
                    return
                self._gba_merge(snap, result)
                self.last_gba_stats = stats
        finally:
            self.gba_running = False

    def wait_for_gba(self, timeout: Optional[float] = None):
        t = self._gba_thread
        if t is not None and t.is_alive():
            t.join(timeout)
        self._gba_thread = None

    def abort_gba(self):
        """Invalidate any in-flight global BA (map reset / superseding
        event) — its merge-back will be discarded."""
        self._gba_epoch += 1

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
    def _gba_snapshot(self, fixed_kf: int) -> Optional[dict]:
        """Pack the full-map BA problem from the current map state (runs
        under the map lock; cheap array packing only). ALL keyframes
        participate; structure is capped at loop.gba_max_points
        well-observed points (the rest are corrected at merge time by their
        reference keyframe's pose delta, the same propagation the reference
        applies to points created during GBA)."""
        from pointslot_tpu.solvers import local_ba

        m = self.map
        lc = self.cfg.loop
        kf_ids = list(m.keyframe_ids())
        P_cap = _next_pow2(len(kf_ids), 16, m.max_kfs)
        kf_row = {int(k): i for i, k in enumerate(kf_ids)}

        # structure selection: prefer well-observed points
        pts_all = np.nonzero(m.pt_valid)[0]
        if len(pts_all) == 0:
            return None
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
            return None

        fixed_flags = [int(k) == int(fixed_kf) for k in kf_ids]
        if not any(fixed_flags):
            fixed_flags[0] = True

        prob, _ = local_ba.build_problem(
            poses=m.kf_pose[kf_ids].astype(np.float32),
            pose_fixed=np.asarray(fixed_flags),
            points=m.pt_pos[pts].astype(np.float32),
            e_pose=e_pose, e_point=e_point, e_obs=e_obs, e_stereo=e_stereo,
            e_inv_sigma2=e_inv2,
            P_cap=P_cap, L_cap=L_cap, K=lc.gba_obs_per_point,
        )
        return dict(
            prob=prob, L_cap=L_cap, kf_ids=kf_ids, kf_row=kf_row,
            fixed_flags=fixed_flags,
            kf_uid=m.kf_uid[kf_ids].copy(),
            old_kf_poses=m.kf_pose[kf_ids].astype(np.float64).copy(),
            pts=pts, pt_first_kf=m.pt_first_kf[pts].copy(),
            n_kfs=len(kf_ids),
        )

    def _gba_solve(self, snap: dict):
        """The expensive LM solve — touches ONLY the snapshot (no map state,
        no lock). Point-sharded over the device mesh when one is attached."""
        from pointslot_tpu.solvers import local_ba

        cam = self.cfg.camera
        prob = snap["prob"]
        cam_args = dict(fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
                        cy=float(cam.cy), bf=float(cam.bf))
        # pre-gate: drop grossly-inconsistent observations (wrong
        # associations made while the map was drifted) at the corrected
        # state BEFORE optimizing, so the robust stage starts clean
        res0, behind0 = local_ba._residuals_only(
            prob.poses, prob.points, prob, **cam_args)
        chi2_0 = local_ba._chi2(res0, prob.obs_stereo, prob.obs_inv_sigma2)
        gate0 = jnp.where(prob.obs_stereo, local_ba.CHI2_STEREO,
                          local_ba.CHI2_MONO) * 10.0
        prob = prob._replace(
            obs_valid=prob.obs_valid & (chi2_0 <= gate0) & ~behind0)

        from pointslot_tpu.parallel.runtime import default_mesh

        mesh = default_mesh()
        if mesh is not None and snap["L_cap"] % mesh.size == 0:
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
        stats = {
            "cost_before": float(jnp.sum(jnp.where(
                act, local_ba._robust_cost(chi2_in, delta2), 0.0))),
            "cost_after": float(jnp.sum(jnp.where(
                act, local_ba._robust_cost(chi2_out, delta2), 0.0))),
            "n_obs": int(jnp.sum(act)),
            "n_kfs": snap["n_kfs"],
            "n_points": len(snap["pts"]),
        }
        return result, stats

    def _gba_merge(self, snap: dict, result):
        """Write the GBA result back under the map lock. The map may have
        moved on during the solve (keyframes culled + slots recycled, points
        culled, new keyframes/points created) — the reference handles the
        same window with uid/spanning-tree propagation (src/LoopClosing.cc:
        686-745). Guards: keyframe slots are verified by uid; point slots by
        first-keyframe identity; keyframes created DURING the solve are
        corrected by their nearest (frame-id) solved keyframe's delta, and
        non-solved points ride their reference keyframe's delta."""
        m = self.map
        kf_ids = snap["kf_ids"]
        kf_row = snap["kf_row"]
        fixed_flags = snap["fixed_flags"]
        old_kf_poses = snap["old_kf_poses"]
        pts = snap["pts"]

        new_poses = np.asarray(result.poses, np.float64)
        live = np.zeros(len(kf_ids), bool)
        for i, k in enumerate(kf_ids):
            if m.kf_uid[int(k)] != snap["kf_uid"][i]:
                continue  # slot recycled during the solve
            live[i] = True
            if not fixed_flags[i]:
                m.kf_pose[int(k)] = new_poses[i].astype(np.float32)

        # keyframes created during the solve: propagate the correction
        # through the spanning tree (T_k' = (T_k T_parent^-1) T_parent_gba,
        # reference src/LoopClosing.cc:686-745). A mid-solve KF's parent
        # chain ends at a solved KF on the correct SIDE of a loop seam —
        # after a relocalization the parent is the reloc KF, where
        # frame-id adjacency would pick the wrong side's delta. Fallback
        # when the chain never reaches the solved set: nearest frame id.
        solved_set = {int(k) for i, k in enumerate(kf_ids) if live[i]}
        solved_fids = {int(k): int(m.kf_frame_id[int(k)]) for k in solved_set}

        def _solved_ancestor(k: int):
            seen = set()
            p = int(m.kf_parent[k])
            while p >= 0 and p not in seen:
                if p in solved_set:
                    return p
                seen.add(p)
                p = int(m.kf_parent[p])
            return None

        for k in m.keyframe_ids():
            k = int(k)
            if k in solved_set or not solved_set:
                continue
            ref = _solved_ancestor(k)
            if ref is None:
                fid = int(m.kf_frame_id[k])
                ref = min(solved_set, key=lambda s: abs(solved_fids[s] - fid))
            i = kf_row[ref]
            if fixed_flags[i]:
                continue
            T_rel = m.kf_pose[k].astype(np.float64) @ np.linalg.inv(
                old_kf_poses[i])
            m.kf_pose[k] = (T_rel @ new_poses[i]).astype(np.float32)

        # solved points: write back where the slot still holds that point
        ok = m.pt_valid[pts] & (m.pt_first_kf[pts] == snap["pt_first_kf"])
        m.pt_pos[pts[ok]] = np.asarray(result.points, np.float64)[: len(pts)][ok]

        # propagate the GBA pose deltas to points that were not in the solve
        # (vectorized — this runs under the map lock, so it must be O(µs/pt))
        in_solve = np.zeros(m.max_points, bool)
        in_solve[pts[ok]] = True
        rest = np.nonzero(m.pt_valid & ~in_solve)[0]
        if len(rest):
            # per-solved-KF correction: p' = inv(T_new) @ T_old @ p
            A = np.empty((len(kf_ids), 4, 4))
            for i in range(len(kf_ids)):
                T_old = old_kf_poses[i]
                T_new = new_poses[i] if not fixed_flags[i] else T_old
                A[i] = np.linalg.inv(T_new) @ T_old
            row_of_slot = np.full(m.max_kfs, -1, np.int64)
            for k, i in kf_row.items():
                if live[i]:
                    row_of_slot[k] = i
            ref = m.pt_first_kf[rest]
            rows = np.where(ref >= 0, row_of_slot[np.maximum(ref, 0)], -1)
            # fallback (rare): reference keyframe gone — first live observer
            for j in np.nonzero(rows < 0)[0]:
                for c in np.nonzero(m.obs[rest[j]])[0]:
                    if row_of_slot[int(c)] >= 0:
                        rows[j] = row_of_slot[int(c)]
                        break
            sel = rows >= 0
            rp, rr = rest[sel], rows[sel]
            X = m.pt_pos[rp]
            m.pt_pos[rp] = (
                np.einsum("rij,rj->ri", A[rr, :3, :3], X) + A[rr, :3, 3]
            )


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
