"""Removal ablation INSIDE the pyr_fast_select stage.

pyr_fast_select is the worst roofline kernel (bench.py). Prefix-timing its
sub-stages mis-measures: adding a full-image reduction to expose a prefix
costs more than the sub-stage itself. Instead this script times the FULL
fused select chain and variants with one sub-stage removed/stubbed — the
delta is that sub-stage's marginal cost inside the fused program.

Every variant carries the SAME full-image s.sum() consumer, so its cost is
a common additive constant that cancels in every delta (it previously
appeared only in '-cell_select', contaminating the cellmax_rw estimate).
`full_bare` (no extra consumer) is also measured — that absolute is the
one comparable with bench.py's pyr_fast_select stage.

Two chain modes, matching the two shipped programs:
- default: per-image `_select_cells` on the stacked (2, h, w) score — the
  single-pair production path (frontend._frontend keeps per-image
  extraction launches; see the comment at ops/frontend.py `_frontend`).
- --batched: `_select_cells_batched` over the stacked score — the batched
  production path (`_extract_from_scores_multi`).

Usage: python scripts/ablate_select.py [--batched]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pointslot_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointslot_tpu.config import CameraConfig
    from pointslot_tpu.datasets.synthetic import SyntheticRenderer, make_scene
    from pointslot_tpu.ops import fast as fast_ops
    from pointslot_tpu.ops import pyramid as pyr_ops
    from pointslot_tpu.ops.frontend import StereoFrontend
    from pointslot_tpu.ops.orb import EDGE_MARGIN
    from pointslot_tpu.utils.stagebench import timeit_ms

    batched = "--batched" in sys.argv[1:]

    cam = CameraConfig()
    scene = make_scene(n_frames=2, n_points=2000, n_objects=0, seed=3,
                       camera=cam)
    r = SyntheticRenderer(scene)
    left, right, _ = r.render(0)
    left = jax.device_put(np.asarray(left, np.uint8))
    right = jax.device_put(np.asarray(right, np.uint8))

    fe = StereoFrontend(cam.height, cam.width, cam.fx, cam.bf)
    ext = fe.extractor
    cfg = fe.config

    def chain(l, r_, *, do_fast=True, do_nms=True, do_cell=True,
              do_topk=True, consume_s=True):
        stacked = jnp.stack([l, r_]).astype(jnp.float32)
        pyr = pyr_ops.build_pyramid(stacked, cfg.n_levels, cfg.scale_factor)
        acc = jnp.float32(0)
        for lvl, p in enumerate(pyr):
            if do_fast:
                s = fast_ops.fast_score_map(p, cfg.min_th_fast)
            else:
                s = p * jnp.float32(1e-3)
            h, w = ext.shapes[lvl]
            m = EDGE_MARGIN
            border = (
                jnp.zeros((h, w), s.dtype).at[m: h - m, m: w - m].set(1.0)
            )
            s = s * border[None]
            if do_nms:
                s = fast_ops.nms3x3(s)
            # uniform consumer: identical in every variant -> cancels in
            # all deltas (it used to be '-cell_select'-only, folding its
            # full-image reduction cost into the cellmax_rw estimate)
            if consume_s:
                acc = acc + s.sum()
            if not do_cell:
                continue
            if not do_topk:
                # reduce_window cellmax only, no top_k/argmax gather
                cs = ext.cell_size
                hc, wc = -(-h // cs), -(-w // cs)
                if batched:
                    pad_cfg = ((0, 0), (0, hc * cs - h), (0, wc * cs - w))
                    win = (1, cs, cs)
                    cellmax = jax.lax.reduce_window(
                        s, -jnp.inf, jax.lax.max, win, win, pad_cfg)
                    acc = acc + cellmax.sum()
                else:
                    pad_cfg = ((0, hc * cs - h), (0, wc * cs - w))
                    for g in range(2):
                        cellmax = jax.lax.reduce_window(
                            s[g], -jnp.inf, jax.lax.max, (cs, cs), (cs, cs),
                            pad_cfg)
                        acc = acc + cellmax.sum()
                continue
            if batched:
                top, ys, xs = ext._select_cells_batched(s, ext.budgets[lvl])
                acc = acc + top.sum() + ys.sum() + xs.sum()
            else:
                for g in range(2):
                    top, ys, xs = ext._select_cells(s[g], ext.budgets[lvl])
                    acc = acc + top.sum() + ys.sum() + xs.sum()
        return acc

    variants = {
        "full": dict(),
        "full_bare": dict(consume_s=False),   # == bench pyr_fast_select
        "-topk_argmax": dict(do_topk=False),
        "-cell_select": dict(do_cell=False),
        "-nms": dict(do_nms=False, do_cell=False),
        "-nms-fast": dict(do_fast=False, do_nms=False, do_cell=False),
    }
    absolute = {}
    for name, kw in variants.items():
        absolute[name] = timeit_ms(
            lambda l, r_, kw=kw: chain(l, r_, **kw), left, right, n=30)
    out = {
        "full_bare": absolute["full_bare"],
        "s_sum_consumer": absolute["full"] - absolute["full_bare"],
        "topk_argmax": absolute["full"] - absolute["-topk_argmax"],
        "cellmax_rw": absolute["-topk_argmax"] - absolute["-cell_select"],
        "nms": absolute["-cell_select"] - absolute["-nms"],
        "fast": absolute["-nms"] - absolute["-nms-fast"],
        "pyramid+overhead": absolute["-nms-fast"],
    }
    print(json.dumps({"mode": "batched" if batched else "per-image",
                      "ms": {k: round(v, 4) for k, v in out.items()
                             if v is not None},
                      "absolute_ms": {k: round(v, 4) for k, v in
                                      absolute.items()}}, indent=1))


if __name__ == "__main__":
    main()
