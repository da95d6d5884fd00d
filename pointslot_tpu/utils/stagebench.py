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
    frontend (adds stereo match + SAD refine).

    The prefixes are built out of the SAME pieces the shipped single-pair
    program uses (frontend._frontend): a stacked (2, h, w) image stage,
    then per-image `_select_cells` / patch DMA / BRIEF — so the measured
    deltas describe the production program, not a reconstruction of it."""
    import jax
    import jax.numpy as jnp

    from pointslot_tpu.ops import fast as fast_ops
    from pointslot_tpu.ops.orb import EDGE_MARGIN
    from pointslot_tpu.ops.pallas_patch import (
        extract_patches_stack,
        stack_pyramid_for_patches,
    )

    ext = fe.extractor
    cfg = fe.config

    def image_stage(l, r):
        """Stacked pyramid + FAST scores — fe._image_stage on (2, h, w),
        exactly as the production single-pair path stages both images."""
        both = jnp.stack([l.astype(jnp.float32), r.astype(jnp.float32)])
        levels_both, scores_both = fe._image_stage(both)
        levels = [[x[g] for x in levels_both] for g in range(2)]
        scores = [[s[g] for s in scores_both] for g in range(2)]
        return levels, scores

    def select_of(scores_one):
        """Per-image NMS + cell select (mirrors _extract_from_scores)."""
        out_xyl, out_top = [], []
        for lvl, score in enumerate(scores_one):
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
        _, scores = image_stage(l, r)
        xl, tl = select_of(scores[0])
        xr, tr = select_of(scores[1])
        return xl.sum() + xr.sum() + tl.sum() + tr.sum()

    def patches_of(pyr, xyl):
        return extract_patches_stack(
            stack_pyramid_for_patches(pyr), xyl, use_pallas=ext.use_pallas
        )

    @jax.jit
    def p_patch(l, r):
        levels, scores = image_stage(l, r)
        xl, _ = select_of(scores[0])
        xr, _ = select_of(scores[1])
        return patches_of(levels[0], xl).sum() + patches_of(levels[1], xr).sum()

    @jax.jit
    def p_brief(l, r):
        levels, scores = image_stage(l, r)
        out = []
        for g in range(2):
            xyl, _ = select_of(scores[g])
            pat = patches_of(levels[g], xyl)
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


def track_prefixes(step, phase) -> dict:
    """Fused prefixes of the mode-4 per-frame hot path BEYOND the
    frontend: camera motion-model match, first pose LM, local-map match,
    second pose LM, then the batched object phase — built from the same
    `FusedTrackStep`/`FusedObjectPhase` internals the shipped two-dispatch
    loop runs, so successive deltas are the marginal cost of each stage
    inside the real program (replacing bench.py's fps-subtraction
    attribution, which inherited the noise of two fps measurements).

    Each prefix takes (left, right, map_pos, map_desc, map_level,
    map_valid, obj_pos, obj_desc, obj_valid, T_obj) and returns a scalar.
    """
    import jax
    import jax.numpy as jnp

    from pointslot_tpu.ops.fused_track import _stereo_frame
    from pointslot_tpu.slam import matchers

    fe = step.frontend
    eye = jnp.eye(4, dtype=jnp.float32)

    def stages(l, r, pos, dsc, lvl, val, upto):
        frame = _stereo_frame(fe, l, r)
        acc = jnp.sum(frame.xy) + jnp.sum(frame.depth)
        T_pred = eye  # velocity model @ T_prev with both identity
        if upto == 0:
            return acc, frame, T_pred
        pf1 = step._match_stage(frame, T_pred, pos, dsc, lvl, val,
                                radius=7.0, th_desc=matchers.TH_HIGH)
        if upto == 1:
            return acc + jnp.sum(pf1), frame, T_pred
        r1 = step._solve_stage(frame, pf1, T_pred, pos)
        if upto == 2:
            return acc + jnp.sum(r1.T), frame, r1.T
        pf2 = step._match_stage(frame, r1.T, pos, dsc, lvl, val,
                                radius=4.0, th_desc=matchers.TH_HIGH)
        pf = jnp.where(pf2 >= 0, pf2, pf1)
        if upto == 3:
            return acc + jnp.sum(pf), frame, r1.T
        r2 = step._solve_stage(frame, pf, r1.T, pos)
        return acc + jnp.sum(r2.T) + r2.n_inliers.astype(jnp.float32), \
            frame, r2.T

    def make(upto):
        @jax.jit
        def p(l, r, pos, dsc, lvl, val, opos, odesc, ovalid, oT):
            acc, _, _ = stages(l, r, pos, dsc, lvl, val, upto)
            return acc
        return p

    @jax.jit
    def p_object(l, r, pos, dsc, lvl, val, opos, odesc, ovalid, oT):
        acc, frame, T = stages(l, r, pos, dsc, lvl, val, 4)
        ovel = jnp.tile(eye, (oT.shape[0], 1, 1))
        T_new, _, n_inl = phase._impl(
            frame.xy, frame.level, frame.desc, frame.valid,
            frame.depth, frame.u_right, opos, odesc, ovalid, oT, ovel,
        )
        return acc + jnp.sum(T_new) + jnp.sum(n_inl).astype(jnp.float32)

    return {
        "frontend": make(0),
        "cam_match1": make(1),
        "cam_lm1": make(2),
        "cam_match2": make(3),
        "cam_lm2": make(4),
        "object_phase": p_object,
    }


def track_stage_ms(step, phase, left, right, map_tables, obj_tables,
                   n=30) -> dict:
    """Marginal ms of each post-frontend tracking stage (successive
    prefix deltas; 'frontend' is its prefix's absolute time)."""
    prefixes = track_prefixes(step, phase)
    args = (left, right) + tuple(map_tables) + tuple(obj_tables)
    absolute = {k: timeit_ms(fn, *args, n=n) for k, fn in prefixes.items()}
    names = list(absolute)
    out = {names[0]: absolute[names[0]]}
    for a, b in zip(names, names[1:]):
        out[b] = max(absolute[b] - absolute[a], 0.0)
    return out


def timeit_ms(fn, *args, n=30, warmup=3, max_escalations=2):
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
    count -> one compile) and report (T(3n) - T(n)) / 2n.

    When the 2n*x signal is within the roundtrip noise floor (repeat
    spread of the same chain), n escalates 3x (same compile — trip count
    is dynamic) up to ``max_escalations`` times; if the signal never
    clears the floor a warning is surfaced and the last (noisy) estimate
    — or NaN if non-positive — is returned rather than a silent 0.0."""
    import warnings

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

    signal = 0.0
    for _ in range(max_escalations + 1):
        t1a, t1b = once(n), once(n)
        t3a, t3b = once(3 * n), once(3 * n)
        signal = min(t3a, t3b) - min(t1a, t1b)
        noise = max(abs(t1a - t1b), abs(t3a - t3b))
        if signal > 2.0 * noise:
            return signal / (2 * n) * 1e3
        n *= 3
    n //= 3  # the n the last signal was measured at
    warnings.warn(
        f"timeit_ms: signal {signal * 1e3:.2f} ms within tunnel noise even "
        f"at n={n}; estimate is unreliable",
        stacklevel=2,
    )
    return signal / (2 * n) * 1e3 if signal > 0 else float("nan")


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
