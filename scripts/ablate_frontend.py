"""Fused-prefix ablation of the stereo frontend on the real chip.

profile_frontend.py times each stage as its own dispatch, which charges
every stage its materialization cost; this script instead times FUSED
PREFIXES of the real pipeline (pyramid; +FAST; +NMS/select; +patch DMA;
+orientation; +blur/BRIEF; +stereo) so the deltas are the marginal cost of
each stage inside the one fused program — the quantity that actually moves
the frontend fps.

Usage: python scripts/ablate_frontend.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, n=30, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointslot_tpu.config import CameraConfig
    from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
    from pointslot_tpu.ops import fast as fast_ops
    from pointslot_tpu.ops import pyramid as pyr_ops
    from pointslot_tpu.ops.frontend import StereoFrontend
    from pointslot_tpu.ops.orb import EDGE_MARGIN
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

    def pyramids(l, r):
        pl = pyr_ops.build_pyramid(l.astype(jnp.float32), cfg.n_levels,
                                   cfg.scale_factor)
        pr = pyr_ops.build_pyramid(r.astype(jnp.float32), cfg.n_levels,
                                   cfg.scale_factor)
        return pl, pr

    def scores_of(levels):
        return [fast_ops.fast_score_map(im, cfg.min_th_fast) for im in levels]

    def select_of(levels, scores):
        out_xyl, out_top = [], []
        for lvl, score in enumerate(scores):
            h, w = ext.shapes[lvl]
            m = EDGE_MARGIN
            border = jnp.zeros((h, w), score.dtype).at[m:h - m, m:w - m].set(1.0)
            score = fast_ops.nms3x3(score * border)
            top, ys, xs = ext._select_cells(score, ext.budgets[lvl])
            out_top.append(top)
            out_xyl.append(jnp.stack([
                jnp.clip(xs, 0, w - 1), jnp.clip(ys, 0, h - 1),
                jnp.full_like(xs, lvl)], axis=1).astype(jnp.int32))
        return jnp.concatenate(out_xyl), jnp.concatenate(out_top)

    @jax.jit
    def p1(l, r):
        pl, pr = pyramids(l, r)
        # reduce to a tiny output so nothing is DCE'd but no big materialize
        return sum(x.sum() for x in pl + pr)

    @jax.jit
    def p2(l, r):
        pl, pr = pyramids(l, r)
        return sum(s.sum() for s in scores_of(pl) + scores_of(pr))

    @jax.jit
    def p3(l, r):
        pl, pr = pyramids(l, r)
        xl, tl = select_of(pl, scores_of(pl))
        xr, tr = select_of(pr, scores_of(pr))
        return xl.sum() + xr.sum() + tl.sum() + tr.sum()

    @jax.jit
    def p4(l, r):
        pl, pr = pyramids(l, r)
        xl, _ = select_of(pl, scores_of(pl))
        xr, _ = select_of(pr, scores_of(pr))
        patl = extract_patches_stack(stack_pyramid_for_patches(pl), xl,
                                     use_pallas=ext.use_pallas)
        patr = extract_patches_stack(stack_pyramid_for_patches(pr), xr,
                                     use_pallas=ext.use_pallas)
        return patl.sum() + patr.sum()

    @jax.jit
    def p5(l, r):
        pl, pr = pyramids(l, r)
        xl, _ = select_of(pl, scores_of(pl))
        xr, _ = select_of(pr, scores_of(pr))
        patl = extract_patches_stack(stack_pyramid_for_patches(pl), xl,
                                     use_pallas=ext.use_pallas)
        patr = extract_patches_stack(stack_pyramid_for_patches(pr), xr,
                                     use_pallas=ext.use_pallas)
        return (ext._orientation_from_patches(patl).sum()
                + ext._orientation_from_patches(patr).sum())

    @jax.jit
    def p6(l, r):
        pl, pr = pyramids(l, r)
        xl, _ = select_of(pl, scores_of(pl))
        xr, _ = select_of(pr, scores_of(pr))
        out = []
        for pyr, x in ((pl, xl), (pr, xr)):
            pat = extract_patches_stack(stack_pyramid_for_patches(pyr), x,
                                        use_pallas=ext.use_pallas)
            ang = ext._orientation_from_patches(pat)
            out.append(ext._descriptors_from_patches(
                ext._blur_patches(pat), ang))
        return out[0].sum() + out[1].sum()

    def p7(l, r):  # full frontend (already jitted inside)
        return fe(l, r)

    res = {}
    res["p1_pyramid"] = _timeit(p1, left, right)
    res["p2_fast"] = _timeit(p2, left, right)
    res["p3_select"] = _timeit(p3, left, right)
    res["p4_patch"] = _timeit(p4, left, right)
    res["p5_orient"] = _timeit(p5, left, right)
    res["p6_brief"] = _timeit(p6, left, right)
    res["p7_full"] = _timeit(p7, left, right)

    keys = list(res)
    deltas = {"d_" + keys[0]: res[keys[0]]}
    for a, b in zip(keys, keys[1:]):
        deltas["d_" + b] = res[b] - res[a]
    print(json.dumps({k: round(v, 3) for k, v in {**res, **deltas}.items()},
                     indent=1))


if __name__ == "__main__":
    from pointslot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    main()
