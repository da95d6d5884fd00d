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
        multi-device variant shards the batch over the dp mesh axis,
        batch_sharded). Inputs (B, H, W); every output gains a leading
        batch axis.

        Implementation: lax.scan of the SINGLE-PAIR program over the
        batch. Measured on chip (r5): scan 1.98 ms/frame vs single-pair
        1.96 vs flat-2B layout 2.20 vs 4 unrolled chains 2.12 — running
        several pair-chains co-scheduled in one program inflates peak
        liveness (VMEM spills), while scan keeps exactly one pair's
        working set live and compiles the body once. Cross-DEVICE
        parallelism comes from sharding the batch axis, not from
        co-scheduling pairs on one core."""
        if not hasattr(self, "_run_batch"):
            self._run_batch = jax.jit(self._run_batch_scan_impl)
        return StereoFrame(*self._run_batch(jnp.asarray(lefts), jnp.asarray(rights)))

    def batch_sharded(self, lefts, rights, mesh) -> StereoFrame:
        """Mesh-sharded batched frontend: the batch axis is partitioned over
        the mesh's first axis, each device scanning its shard of frames —
        the load-bearing DP path of `run.py --dp` (SURVEY §2d). Batch size
        must divide by the mesh axis (the runner pads)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        if getattr(self, "_run_batch_sharded_mesh", None) is not mesh:
            axis = mesh.axis_names[0]
            spec = P(axis)
            self._run_batch_sharded = jax.jit(shard_map(
                self._run_batch_scan_impl, mesh=mesh,
                in_specs=(spec, spec), out_specs=spec,
                check_vma=False,
            ))
            self._run_batch_sharded_mesh = mesh
        return StereoFrame(
            *self._run_batch_sharded(jnp.asarray(lefts), jnp.asarray(rights))
        )

    def _run_batch_scan_impl(self, lefts, rights):
        def body(carry, xs):
            left, right = xs
            return carry, self._frontend(left, right, None)

        _, outs = jax.lax.scan(body, jnp.int32(0), (lefts, rights))
        return outs

    # ------------------------------------------------------------------
    def _image_stage(self, imgs):
        """Image-plane stages over a FLAT leading axis of G images:
        pyramid + dense FAST scores. G = 2 (one stereo pair) on the live
        path, G = 2B on the batched path — flat layout measured 2.2x
        faster per image than per-pair programs on chip (bigger kernels,
        1/G the launches)."""
        cfg = self.config
        levels = pyr_ops.build_pyramid(
            imgs.astype(jnp.float32), cfg.n_levels, cfg.scale_factor
        )
        scores = [fast_ops.fast_score_map(x, cfg.min_th_fast)
                  for x in levels]
        return levels, scores

    def _frontend(self, left, right, gate, gate_r=None):
        ext = self.extractor
        cfg = self.config
        both = jnp.stack([left.astype(jnp.float32),
                          right.astype(jnp.float32)])
        levels_both, scores_both = self._image_stage(both)
        if gate is not None or gate_r is not None:
            ones = jnp.ones_like(both[0], bool)
            g_both = jnp.stack([
                gate if gate is not None else ones,
                gate_r if gate_r is not None else ones,
            ]).astype(jnp.float32)
            scores_both = [
                s * jax.image.resize(g_both, s.shape, "nearest")
                for s in scores_both
            ]
        # single-pair path keeps PER-IMAGE extraction launches: the L
        # image's patch DMA overlaps the R image's select/BRIEF compute
        # (one fused multi launch serializes DMA then compute — measured
        # ~0.8 ms slower per pair); the batched path amortizes launches
        # across pairs instead (_run_batch_impl)
        levels_l = [x[0] for x in levels_both]
        levels_r = [x[1] for x in levels_both]
        scores_l = [s[0] for s in scores_both]
        scores_r = [s[1] for s in scores_both]
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

    def _run_batch_impl(self, lefts, rights):
        """Batched frontend: image-plane stages AND feature extraction on
        the FLAT (2B, ...) axis (one patch-DMA launch, single big MXU
        matmuls for orientation/BRIEF across the whole batch); the stereo
        compute phases run vmapped over pairs with their two pallas
        fetches hoisted out as flat whole-batch launches."""
        from pointslot_tpu.ops.pallas_patch import extract_patches_stack

        ext = self.extractor
        L = self.config.n_levels
        B, H, W = lefts.shape
        flat = jnp.stack([lefts, rights], axis=1).reshape(B * 2, H, W)
        levels, scores = self._image_stage(flat)
        feats, patches, canvas = ext._extract_from_scores_multi(
            levels, scores, return_patches=True
        )                                   # leading axis 2B
        feats_b = tuple(x.reshape(B, 2, *x.shape[1:]) for x in feats)
        patches_b = patches.reshape(B, 2, *patches.shape[1:])
        fl = FeatureSet(*(x[:, 0] for x in feats_b))
        fr = FeatureSet(*(x[:, 1] for x in feats_b))

        pre = jax.vmap(self._stereo_pre)(fl, fr)
        base_r = ((jnp.arange(B, dtype=jnp.int32) * 2 + 1) * L)[:, None, None]
        xyl_r = pre["xyl_r"]                                  # (B, K, 3)
        K = xyl_r.shape[1]
        xyl_r_flat = jnp.concatenate(
            [xyl_r[..., :2], xyl_r[..., 2:3] + base_r], axis=-1
        ).reshape(B * K, 3)
        patch_r = extract_patches_stack(
            canvas, xyl_r_flat, use_pallas=ext.use_pallas
        ).reshape(B, K, *patches.shape[2:])
        mid = jax.vmap(self._stereo_sad)(fl, pre, patches_b[:, 0], patch_r)
        if "xyl_fine" not in mid:
            u_right, depth = mid["u_right"], mid["depth"]
        else:
            xf = mid["xyl_fine"]                              # (B, 2n, 3)
            n2 = xf.shape[1]
            base_l = ((jnp.arange(B, dtype=jnp.int32) * 2) * L)[:, None]
            row = jnp.where(xf[..., 2] == 0, base_l, base_l + L)
            xf_flat = jnp.concatenate(
                [xf[..., :2], row[..., None]], axis=-1
            ).reshape(B * n2, 3)
            both = extract_patches_stack(
                canvas, xf_flat, use_pallas=ext.use_pallas
            ).reshape(B, n2, *patches.shape[2:])
            u_right, depth, _ = jax.vmap(self._stereo_fine)(fl, mid, both)
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
        only the right-image candidate windows are fetched here.

        Split into vmappable compute phases (_stereo_pre / _stereo_sad /
        _stereo_fine) with the two pallas fetches between them, so the
        batched frontend can run the phases under vmap and the fetches
        FLAT across the whole batch (one launch each — pallas under vmap
        both overflows scalar-prefetch SMEM and serializes)."""
        from pointslot_tpu.ops.pallas_patch import (
            extract_patches_stack, stack_pyramid_for_patches,
        )

        ext = self.extractor
        pre = self._stereo_pre(fl, fr)
        patch_r = extract_patches_stack(
            stack_pyramid_for_patches(levels_r), pre["xyl_r"],
            use_pallas=ext.use_pallas,
        )
        mid = self._stereo_sad(fl, pre, patch_l, patch_r)
        fine_min = self.config.stereo_fine_min_level
        if fine_min >= len(ext.budgets):
            return mid["u_right"], mid["depth"], mid["valid_st"]
        # one launch for both L and R level-0 windows: the two images
        # stack on the patch canvas; the level column selects between them
        lr_stack = stack_pyramid_for_patches([levels_l[0], levels_r[0]])
        both = extract_patches_stack(lr_stack, mid["xyl_fine"],
                                     use_pallas=ext.use_pallas)
        return self._stereo_fine(fl, mid, both)

    def _stereo_pre(self, fl, fr):
        """Candidate match + rounded per-level window coords (no pallas).
        xyl_r carries LOCAL pyramid level indices; callers offset them to
        canvas rows."""
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
        return dict(
            matched=matched, scaled_ul=scaled_ul, scaled_vl=scaled_vl,
            scaled_ur=scaled_ur, xyl_r=jnp.concatenate(xyl_r),
        )

    def _stereo_sad(self, fl, pre, patch_l, patch_r):
        """SAD refine over the fetched windows + the level-0 fine-refine
        window coords (no pallas). xyl_fine's level column is 0 for the
        left image, 1 for the right; callers map to canvas rows."""
        from pointslot_tpu.ops import stereo as st

        ext = self.extractor
        ul, yl = fl.xy[:, 0], fl.xy[:, 1]
        scaled_ul, scaled_vl = pre["scaled_ul"], pre["scaled_vl"]
        scaled_ur = pre["scaled_ur"]
        lh = self._lshapes[fl.level, 0]
        lw = self._lshapes[fl.level, 1]
        in_bounds = (
            (scaled_vl - st._W >= 0) & (scaled_vl + st._W < lh)
            & (scaled_ul - st._W >= 0) & (scaled_ul + st._W < lw)
            & (scaled_ur - st._W - st._L >= 0) & (scaled_ur + st._W + st._L < lw)
        )
        u_right, depth, valid_st = st.sad_refine_from_patches(
            patch_l, patch_r, scaled_ul, scaled_vl, scaled_ur,
            ul, pre["matched"], in_bounds, self._scales[fl.level],
            self.fx, self.bf,
        )
        out = dict(u_right=u_right, depth=depth, valid_st=valid_st)
        # second pass at full resolution: coarse-octave disparities carry
        # error proportional to their scale; re-fitting at level 0 removes
        # it (st.fine_refine). The per-level slot layout makes the coarse
        # tail a STATIC slice, so the level-0 window gathers touch only the
        # ~10% of keypoints that need them.
        fine_min = self.config.stereo_fine_min_level
        if fine_min < len(ext.budgets):
            s0 = sum(ext.budgets[:fine_min])
            H0, W0 = ext.shapes[0]
            u0 = jnp.round(u_right[s0:]).astype(jnp.int32)
            v0 = jnp.round(yl[s0:]).astype(jnp.int32)
            ulr = jnp.round(ul[s0:]).astype(jnp.int32)
            margin = st._W + st._L + 1
            inb = (
                (v0 - margin >= 0) & (v0 + margin < H0)
                & (ulr - margin >= 0) & (ulr + margin < W0)
                & (u0 - margin >= 0) & (u0 + margin < W0)
            )
            out["fine_inb"] = inb
            out["xyl_fine"] = jnp.concatenate([
                jnp.stack([jnp.clip(ulr, 0, W0 - 1), jnp.clip(v0, 0, H0 - 1),
                           jnp.zeros_like(ulr)], axis=1),
                jnp.stack([jnp.clip(u0, 0, W0 - 1), jnp.clip(v0, 0, H0 - 1),
                           jnp.ones_like(u0)], axis=1),
            ]).astype(jnp.int32)
        return out

    def _stereo_fine(self, fl, mid, both_patches):
        """Apply the level-0 fine refine given its fetched windows."""
        from pointslot_tpu.ops import stereo as st

        ext = self.extractor
        fine_min = self.config.stereo_fine_min_level
        s0 = sum(ext.budgets[:fine_min])
        u_right, depth = mid["u_right"], mid["depth"]
        valid_st = mid["valid_st"]
        ul = fl.xy[:, 0]
        n_t = mid["xyl_fine"].shape[0] // 2
        pl0, pr0 = both_patches[:n_t], both_patches[n_t:]
        uf, df, _ = st.fine_refine_from_patches(
            pl0, pr0, ul[s0:], u_right[s0:], depth[s0:],
            valid_st[s0:] & mid["fine_inb"], self.bf,
        )
        return (
            jnp.concatenate([u_right[:s0], uf]),
            jnp.concatenate([depth[:s0], df]),
            valid_st,
        )

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
