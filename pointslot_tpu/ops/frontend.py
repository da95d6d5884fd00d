"""Stereo frame frontend: ORB extraction (L+R) + stereo matching in ONE jit.

This is the per-frame hot path — the TPU equivalent of the reference's
Frame constructor fork-join (reference src/Frame.cc:516-760: parallel L/R
ORBextractor threads + ComputeStereoMatches). Where the reference overlaps
two CPU threads, we fuse everything into a single XLA program so the
compiler pipelines pyramid building, FAST, gathers and the Hamming matmul
without host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointslot_tpu.config import ORBConfig
from pointslot_tpu.ops import fast as fast_ops
from pointslot_tpu.ops import pyramid as pyr_ops
from pointslot_tpu.ops.orb import FeatureSet, ORBExtractor


class StereoFrame(NamedTuple):
    """Everything the tracker needs about one stereo frame."""

    xy: jnp.ndarray        # (N, 2) left keypoints, level-0 coords
    response: jnp.ndarray  # (N,)
    angle: jnp.ndarray     # (N,)
    level: jnp.ndarray     # (N,) int32
    desc: jnp.ndarray      # (N, 8) uint32
    valid: jnp.ndarray     # (N,) bool
    u_right: jnp.ndarray   # (N,) float32 (-1 = no stereo)
    depth: jnp.ndarray     # (N,) float32 (-1 = no stereo)

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


class StereoFrontend:
    """Jitted (left, right[, gate]) -> StereoFrame at fixed geometry."""

    def __init__(
        self,
        height: int,
        width: int,
        fx: float,
        bf: float,
        config: Optional[ORBConfig] = None,
        capacity: Optional[int] = None,
    ):
        self.config = config or ORBConfig()
        self.extractor = ORBExtractor(height, width, self.config, capacity=capacity)
        self.fx = float(fx)
        self.bf = float(bf)
        cfg = self.config
        self._scales = jnp.asarray(
            [cfg.scale_factor ** i for i in range(cfg.n_levels)], jnp.float32
        )
        self._lshapes = jnp.asarray(self.extractor.shapes, jnp.int32)
        self._run = jax.jit(self._run_impl)
        self._run_gated = jax.jit(self._run_gated_impl)
        self._run_gated_lr = jax.jit(self._run_gated_lr_impl)

    @property
    def capacity(self) -> int:
        return self.extractor.capacity

    def __call__(self, left, right, gate=None, gate_right=None) -> StereoFrame:
        """gate / gate_right: boolean allowed-region masks for detection.
        If only `gate` is given the right image is ungated (background use);
        pass gate_right (e.g. a disparity-dilated object mask) to focus the
        right-image feature budget for object stereo."""
        # ship uint8 to the device when possible (4x less PCIe/tunnel traffic);
        # cast to f32 on-device inside the jit
        left = jnp.asarray(left)
        right = jnp.asarray(right)
        if gate is None:
            return StereoFrame(*self._run(left, right))
        if gate_right is None:
            return StereoFrame(*self._run_gated(left, right, jnp.asarray(gate, bool)))
        return StereoFrame(
            *self._run_gated_lr(
                left, right, jnp.asarray(gate, bool), jnp.asarray(gate_right, bool)
            )
        )

    # ------------------------------------------------------------------
    def batch(self, lefts, rights) -> StereoFrame:
        """Process a BATCH of stereo pairs in one dispatch — the single-chip
        data-parallel path for offline/throughput runs (SURVEY §2d DP; the
        multi-device variant shards the same vmap over the dp mesh axis,
        parallel/step.py). Inputs (B, H, W); every output gains a leading
        batch axis."""
        if not hasattr(self, "_run_batch"):
            self._run_batch = jax.jit(jax.vmap(self._run_impl))
        return StereoFrame(*self._run_batch(jnp.asarray(lefts), jnp.asarray(rights)))

    def batch_sharded(self, lefts, rights, mesh) -> StereoFrame:
        """Mesh-sharded batched frontend: the batch axis is partitioned over
        the mesh's first axis, each device extracting its shard of frames —
        the load-bearing DP path of `run.py --dp` (SURVEY §2d). Batch size
        must divide by the mesh axis (the runner pads)."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        if getattr(self, "_run_batch_sharded_mesh", None) is not mesh:
            axis = mesh.axis_names[0]
            sh = NamedSharding(mesh, P(axis))
            self._run_batch_sharded = jax.jit(
                jax.vmap(self._run_impl), in_shardings=(sh, sh)
            )
            self._run_batch_sharded_mesh = mesh
        return StereoFrame(
            *self._run_batch_sharded(jnp.asarray(lefts), jnp.asarray(rights))
        )

    # ------------------------------------------------------------------
    def _frontend(self, left, right, gate, gate_r=None):
        ext = self.extractor
        cfg = self.config
        left = left.astype(jnp.float32)
        right = right.astype(jnp.float32)
        levels_l = pyr_ops.build_pyramid(left, cfg.n_levels, cfg.scale_factor)
        levels_r = pyr_ops.build_pyramid(right, cfg.n_levels, cfg.scale_factor)

        def gated_scores(levels, g):
            out = []
            for img in levels:
                s = fast_ops.fast_score_map(img, cfg.min_th_fast)
                if g is not None:
                    gg = jax.image.resize(g.astype(jnp.float32), img.shape, "nearest")
                    s = s * gg
                out.append(s)
            return out

        scores_l = gated_scores(levels_l, gate)
        scores_r = gated_scores(levels_r, gate_r)

        feats_l, patches_l = ext._extract_from_scores(
            levels_l, scores_l, return_patches=True
        )
        fl = FeatureSet(*feats_l)
        fr = FeatureSet(*ext._extract_from_scores(levels_r, scores_r))

        u_right, depth, valid_st = self._stereo_from_patches(
            fl, fr, levels_l, levels_r, patches_l
        )
        return (
            fl.xy, fl.response, fl.angle, fl.level, fl.desc, fl.valid,
            u_right, depth,
        )

    def _stereo_from_patches(self, fl, fr, levels_l, levels_r, patch_l):
        """Stereo matching with the SAD windows fetched by the patch DMA
        kernel: left features are laid out per-level (extraction order), so
        each level's segment slices statically and reads its own pyramid
        image — no pyramid-stack gathers. The LEFT windows are the very
        patches the extractor already DMA'd (same rounded level coords), so
        only the right-image candidate windows are fetched here."""
        import numpy as np

        from pointslot_tpu.ops import stereo as st

        ext = self.extractor
        best_idx, matched = st.stereo_candidates(
            fl.xy, fl.level, fl.desc, fl.valid,
            fr.xy, fr.level, fr.desc, fr.valid,
            self._scales, self.fx,
            th_orb=self.config.stereo_match_th,
        )
        ul, yl = fl.xy[:, 0], fl.xy[:, 1]
        inv_scale = 1.0 / self._scales[fl.level]
        u0r = jnp.take(fr.xy[:, 0], best_idx)
        scaled_ul = jnp.round(ul * inv_scale).astype(jnp.int32)
        scaled_vl = jnp.round(yl * inv_scale).astype(jnp.int32)
        scaled_ur = jnp.round(u0r * inv_scale).astype(jnp.int32)

        # one stacked patch-DMA launch for the right candidate windows
        from pointslot_tpu.ops.pallas_patch import (
            extract_patches_stack, stack_pyramid_for_patches,
        )

        xyl_r = []
        offset = 0
        for lvl, budget in enumerate(ext.budgets):
            seg = slice(offset, offset + budget)
            offset += budget
            h, w = ext.shapes[lvl]
            xyl_r.append(jnp.stack([
                jnp.clip(scaled_ur[seg], 0, w - 1),
                jnp.clip(scaled_vl[seg], 0, h - 1),
                jnp.full((budget,), lvl, jnp.int32),
            ], axis=1).astype(jnp.int32))
        patch_r = extract_patches_stack(
            stack_pyramid_for_patches(levels_r), jnp.concatenate(xyl_r),
            use_pallas=ext.use_pallas,
        )

        lh = self._lshapes[fl.level, 0]
        lw = self._lshapes[fl.level, 1]
        in_bounds = (
            (scaled_vl - st._W >= 0) & (scaled_vl + st._W < lh)
            & (scaled_ul - st._W >= 0) & (scaled_ul + st._W < lw)
            & (scaled_ur - st._W - st._L >= 0) & (scaled_ur + st._W + st._L < lw)
        )
        u_right, depth, valid_st = st.sad_refine_from_patches(
            patch_l, patch_r, scaled_ul, scaled_vl, scaled_ur,
            ul, matched, in_bounds, self._scales[fl.level],
            self.fx, self.bf,
        )
        # second pass at full resolution: coarse-octave disparities carry
        # error proportional to their scale; re-fitting at level 0 removes
        # it (st.fine_refine). The per-level slot layout makes the coarse
        # tail a STATIC slice, so the level-0 window gathers touch only the
        # ~10% of keypoints that need them.
        fine_min = self.config.stereo_fine_min_level
        if fine_min < len(ext.budgets):
            s0 = sum(ext.budgets[:fine_min])
            H0, W0 = levels_l[0].shape
            u0 = jnp.round(u_right[s0:]).astype(jnp.int32)
            v0 = jnp.round(yl[s0:]).astype(jnp.int32)
            ulr = jnp.round(ul[s0:]).astype(jnp.int32)
            margin = st._W + st._L + 1
            inb = (
                (v0 - margin >= 0) & (v0 + margin < H0)
                & (ulr - margin >= 0) & (ulr + margin < W0)
                & (u0 - margin >= 0) & (u0 + margin < W0)
            )
            # one launch for both L and R windows: the two images stack on
            # the patch canvas and the level column selects between them
            from pointslot_tpu.ops.pallas_patch import (
                extract_patches_stack, stack_pyramid_for_patches,
            )

            n_t = v0.shape[0]
            lr_stack = stack_pyramid_for_patches([levels_l[0], levels_r[0]])
            xyl = jnp.concatenate([
                jnp.stack([jnp.clip(ulr, 0, W0 - 1), jnp.clip(v0, 0, H0 - 1),
                           jnp.zeros_like(ulr)], axis=1),
                jnp.stack([jnp.clip(u0, 0, W0 - 1), jnp.clip(v0, 0, H0 - 1),
                           jnp.ones_like(u0)], axis=1),
            ]).astype(jnp.int32)
            both = extract_patches_stack(lr_stack, xyl,
                                         use_pallas=ext.use_pallas)
            pl0, pr0 = both[:n_t], both[n_t:]
            uf, df, _ = st.fine_refine_from_patches(
                pl0, pr0, ul[s0:], u_right[s0:], depth[s0:],
                valid_st[s0:] & inb, self.bf,
            )
            u_right = jnp.concatenate([u_right[:s0], uf])
            depth = jnp.concatenate([depth[:s0], df])
        return u_right, depth, valid_st

    def _run_impl(self, left, right):
        return self._frontend(left, right, None)

    def _run_gated_impl(self, left, right, gate):
        return self._frontend(left, right, gate)

    def _run_gated_lr_impl(self, left, right, gate, gate_r):
        return self._frontend(left, right, gate, gate_r)


def dilate_mask_left(mask: "np.ndarray", max_disparity: int = 128) -> "np.ndarray":
    """Union of the mask shifted left by 0..max_disparity px — where an
    object can appear in the RIGHT stereo image. Log-step doubling trick."""
    m = np.asarray(mask) != 0
    s = 1
    while s < max_disparity:
        shifted = np.zeros_like(m)
        shifted[:, :-s] = m[:, s:]
        m = m | shifted
        s *= 2
    return m


def frame_to_numpy(frame: StereoFrame) -> "StereoFrame":
    return StereoFrame(*[np.asarray(x) for x in frame])
