"""Per-stage on-chip timing of the stereo frontend.

Times each stage of the frontend hot path (SURVEY §3.2: the reference's
Frame-constructor cost, Examples/Stereo/stereo_kitti.cc:151-160) as its own
jitted dispatch: pyramid, FAST score, NMS+cell-select, patch DMA,
orientation, blur+BRIEF, stereo candidate match, SAD+fine refine. Stage
boundaries force materialization, so the per-stage sum exceeds the fused
frontend time — the breakdown diagnoses WHERE the time goes, the fused
number is the metric.

Usage: python scripts/profile_frontend.py  (prints a JSON dict of ms/stage)
The same `stage_breakdown()` feeds bench.py's per-stage JSON record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, n=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def stage_breakdown(n=20):
    """Return {stage: ms} for one KITTI-geometry stereo frame (L+R)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointslot_tpu.config import CameraConfig
    from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
    from pointslot_tpu.ops import fast as fast_ops
    from pointslot_tpu.ops import pyramid as pyr_ops
    from pointslot_tpu.ops import stereo as st
    from pointslot_tpu.ops.frontend import StereoFrontend
    from pointslot_tpu.ops.pallas_patch import (
        extract_patches_stack, stack_pyramid_for_patches,
    )

    cam = CameraConfig()
    scene = make_scene(n_frames=2, n_points=2500, n_objects=0, seed=7,
                       camera=cam, forward_speed=0.3)
    renderer = SyntheticRenderer(scene)
    left_np, right_np, _ = renderer.render(0)
    left = jax.device_put(np.asarray(left_np, np.uint8))
    right = jax.device_put(np.asarray(right_np, np.uint8))

    fe = StereoFrontend(cam.height, cam.width, cam.fx, cam.bf)
    ext = fe.extractor
    cfg = fe.config
    out = {}

    # -- stage jits ------------------------------------------------------
    @jax.jit
    def s_pyramid(l, r):
        pl = pyr_ops.build_pyramid(l.astype(jnp.float32), cfg.n_levels,
                                   cfg.scale_factor)
        pr = pyr_ops.build_pyramid(r.astype(jnp.float32), cfg.n_levels,
                                   cfg.scale_factor)
        return pl + pr

    levels_all = s_pyramid(left, right)
    L = cfg.n_levels
    levels_l, levels_r = levels_all[:L], levels_all[L:]

    @jax.jit
    def s_fast(levels):
        return [fast_ops.fast_score_map(im, cfg.min_th_fast) for im in levels]

    scores_l = s_fast(levels_l)
    scores_r = s_fast(levels_r)

    @jax.jit
    def s_select(levels, scores):
        import jax.numpy as jnp
        out_xyl = []
        for lvl, (img_l, score) in enumerate(zip(levels, scores)):
            h, w = ext.shapes[lvl]
            m = 16
            border = jnp.zeros((h, w), score.dtype).at[m:h - m, m:w - m].set(1.0)
            score = fast_ops.nms3x3(score * border)
            top, ys, xs = ext._select_cells(score, ext.budgets[lvl])
            out_xyl.append(jnp.stack([
                jnp.clip(xs, 0, w - 1), jnp.clip(ys, 0, h - 1),
                jnp.full_like(xs, lvl)], axis=1).astype(jnp.int32))
        return jnp.concatenate(out_xyl)

    xyl_l = s_select(levels_l, scores_l)

    @jax.jit
    def s_stack(levels):
        return stack_pyramid_for_patches(levels)

    stack_l = s_stack(levels_l)

    def s_patch(stackv, xylv):
        return extract_patches_stack(stackv, xylv, use_pallas=ext.use_pallas)

    patches = s_patch(stack_l, xyl_l)

    @jax.jit
    def s_orient(p):
        return ext._orientation_from_patches(p)

    angles = s_orient(patches)

    @jax.jit
    def s_blur_brief(p, a):
        return ext._descriptors_from_patches(ext._blur_patches(p), a)

    # full per-image extraction + stereo pieces
    fl = fe.extractor(left)
    fr = fe.extractor(right)

    @jax.jit
    def s_stereo_cand(flv, frv):
        return st.stereo_candidates(
            flv.xy, flv.level, flv.desc, flv.valid,
            frv.xy, frv.level, frv.desc, frv.valid,
            fe._scales, fe.fx, th_orb=cfg.stereo_match_th)

    # -- timings ---------------------------------------------------------
    out["pyramid_lr"] = _timeit(s_pyramid, left, right, n=n)
    out["fast_score_lr"] = _timeit(lambda: (s_fast(levels_l), s_fast(levels_r)),
                                   n=n)
    out["nms_select_lr"] = _timeit(
        lambda: (s_select(levels_l, scores_l), s_select(levels_r, scores_r)),
        n=n)
    out["stack_canvas_lr"] = _timeit(lambda: (s_stack(levels_l),
                                              s_stack(levels_r)), n=n)
    out["patch_dma_lr"] = _timeit(lambda: (s_patch(stack_l, xyl_l),
                                           s_patch(stack_l, xyl_l)), n=n)
    out["orientation_lr"] = _timeit(lambda: (s_orient(patches),
                                             s_orient(patches)), n=n)
    out["blur_brief_lr"] = _timeit(
        lambda: (s_blur_brief(patches, angles), s_blur_brief(patches, angles)),
        n=n)
    out["stereo_candidates"] = _timeit(s_stereo_cand, fl, fr, n=n)

    # fused whole-frontend reference number
    out["fused_frontend_total"] = _timeit(lambda: fe(left, right), n=n)
    out["sum_of_stages"] = round(sum(
        v for k, v in out.items() if k not in (
            "fused_frontend_total", "sum_of_stages")), 3)
    return {k: round(v, 3) for k, v in out.items()}


if __name__ == "__main__":
    from pointslot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(json.dumps(stage_breakdown(), indent=1))
