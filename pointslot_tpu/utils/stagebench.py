"""Fused-prefix stage timing of the stereo frontend.

Timing each stage as its own dispatch charges it the materialization cost
of its outputs; timing FUSED PREFIXES of the real pipeline instead gives
marginal per-stage costs inside the one fused program — the quantity that
actually moves frontend fps. Used by bench.py (per-stage breakdown in the
round JSON, VERDICT r3 item 1) and scripts/ablate_frontend.py.

Each prefix reduces its outputs to a scalar so nothing is DCE'd but no
large tensor is materialized to HBM beyond what the real pipeline writes.
"""

from __future__ import annotations

import time


def frontend_prefixes(fe) -> dict:
    """Ordered {name: jitted (left, right) -> scalar} fused prefixes:
    pyramid+FAST+NMS/select, +patch DMA, +orientation+blur+BRIEF, full
    frontend (adds stereo match + SAD refine)."""
    import jax
    import jax.numpy as jnp

    from pointslot_tpu.ops import fast as fast_ops
    from pointslot_tpu.ops import pyramid as pyr_ops
    from pointslot_tpu.ops.orb import EDGE_MARGIN
    from pointslot_tpu.ops.pallas_patch import (
        extract_patches_stack,
        stack_pyramid_for_patches,
    )

    ext = fe.extractor
    cfg = fe.config

    def pyramids(l, r):
        pl = pyr_ops.build_pyramid(
            l.astype(jnp.float32), cfg.n_levels, cfg.scale_factor
        )
        pr = pyr_ops.build_pyramid(
            r.astype(jnp.float32), cfg.n_levels, cfg.scale_factor
        )
        return pl, pr

    def select_of(levels):
        out_xyl, out_top = [], []
        for lvl, score_im in enumerate(levels):
            score = fast_ops.fast_score_map(score_im, cfg.min_th_fast)
            h, w = ext.shapes[lvl]
            m = EDGE_MARGIN
            border = (
                jnp.zeros((h, w), score.dtype).at[m : h - m, m : w - m].set(1.0)
            )
            score = fast_ops.nms3x3(score * border)
            top, ys, xs = ext._select_cells(score, ext.budgets[lvl])
            out_top.append(top)
            out_xyl.append(
                jnp.stack(
                    [
                        jnp.clip(xs, 0, w - 1),
                        jnp.clip(ys, 0, h - 1),
                        jnp.full_like(xs, lvl),
                    ],
                    axis=1,
                ).astype(jnp.int32)
            )
        return jnp.concatenate(out_xyl), jnp.concatenate(out_top)

    @jax.jit
    def p_select(l, r):
        pl, pr = pyramids(l, r)
        xl, tl = select_of(pl)
        xr, tr = select_of(pr)
        return xl.sum() + xr.sum() + tl.sum() + tr.sum()

    def patches_of(pyr, xyl):
        return extract_patches_stack(
            stack_pyramid_for_patches(pyr), xyl, use_pallas=ext.use_pallas
        )

    @jax.jit
    def p_patch(l, r):
        pl, pr = pyramids(l, r)
        xl, _ = select_of(pl)
        xr, _ = select_of(pr)
        return patches_of(pl, xl).sum() + patches_of(pr, xr).sum()

    @jax.jit
    def p_brief(l, r):
        pl, pr = pyramids(l, r)
        out = []
        for pyr, _ in ((pl, None), (pr, None)):
            xyl, _ = select_of(pyr)
            pat = patches_of(pyr, xyl)
            ang = ext._orientation_from_patches(pat)
            out.append(
                ext._descriptors_from_patches(ext._blur_patches(pat), ang)
            )
        return out[0].sum() + out[1].sum()

    def p_full(l, r):
        sf = fe(l, r)
        return jnp.sum(sf.xy) + jnp.sum(sf.depth)

    return {
        "pyr_fast_select": p_select,
        "patch_dma": p_patch,
        "orient_brief": p_brief,
        "stereo_sad": p_full,
    }


def timeit_ms(fn, *args, n=30, warmup=3):
    """Serial DEVICE time of a scalar-returning fn via an in-jit chained
    loop: iteration k's input depends on k-1's output, so nothing
    pipelines. Plain dispatch loops + block_until_ready are unreliable
    through the remote TPU tunnel (block can return with work in flight,
    and the ~2.4 ms per-dispatch enqueue floor pins small programs).

    The chain call itself carries a LARGE fixed cost through the tunnel
    (~25 ms dispatch+sync roundtrip — measured: reported(n) fits
    fixed/n + c almost exactly), so a single-point measurement at n=30
    overstates every absolute by ~0.8 ms. Two-point calibration removes
    it: run the same compiled chain at n and 3n iterations (dynamic trip
    count -> one compile) and report (T(3n) - T(n)) / 2n."""
    import jax
    import jax.numpy as jnp

    a, rest = args[0], args[1:]

    @jax.jit
    def chain(steps, a, *rest):
        def body(i, acc):
            o = fn(a + (acc * 0).astype(a.dtype), *rest)
            return acc + o.astype(jnp.float32)
        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    float(chain(n, a, *rest))   # compile + settle
    float(chain(3 * n, a, *rest))

    def once(steps):
        t0 = time.perf_counter()
        float(chain(steps, a, *rest))
        return time.perf_counter() - t0

    t1 = min(once(n), once(n))
    t3 = min(once(3 * n), once(3 * n))
    return max(t3 - t1, 0.0) / (2 * n) * 1e3


def frontend_stage_ms(fe, left, right, n=30) -> dict:
    """Marginal ms of each frontend stage (successive prefix deltas;
    the first entry is its prefix's absolute time)."""
    prefixes = frontend_prefixes(fe)
    absolute = {k: timeit_ms(fn, left, right, n=n) for k, fn in prefixes.items()}
    names = list(absolute)
    out = {names[0]: absolute[names[0]]}
    for a, b in zip(names, names[1:]):
        out[b] = max(absolute[b] - absolute[a], 0.0)
    return out
