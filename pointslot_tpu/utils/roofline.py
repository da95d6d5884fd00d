"""Analytic roofline / MFU accounting for the hot kernels.

BASELINE.md pins "BA ms/iter and matching kernels at speed-of-light per
chip"; this module makes that obligation falsifiable: each hot kernel gets
an explicit flops+bytes model, and `analyze` turns a measured wall time
into MFU, HBM-bandwidth utilisation, the speed-of-light time, and the
binding resource. bench.py attaches the result to every round's JSON.

Hardware model — TPU v5e ("TPU v5 lite") nominal peaks:
  - 197 TFLOP/s bf16 on the MXU (f32 matmuls modelled at 1/4 of that;
    VPU elementwise f32 modelled at 4 TFLOP/s — 8 ops/cycle/lane x 8
    lanes x ~940 MHz x 128 sublanes is the right order)
  - 819 GB/s HBM

A kernel whose compute AND bandwidth fractions are both tiny is
*latency-bound*: its time is sequential-dependency / dispatch overhead
(e.g. 6x6 LM solves in a fori_loop), and the fix is restructuring, not
faster math. The `bound` field names which of the three regimes holds.
"""

from __future__ import annotations

import dataclasses

# nominal v5e peaks (see module docstring)
PEAK_BF16_FLOPS = 197e12
PEAK_F32_MXU_FLOPS = PEAK_BF16_FLOPS / 4.0
PEAK_F32_VPU_FLOPS = 4e12
HBM_BYTES_PER_S = 819e9

# a kernel using under 5% of both resources is dominated by serial
# latency, not by either roofline wall
_LATENCY_FRAC = 0.05


@dataclasses.dataclass(frozen=True)
class KernelModel:
    """Analytic cost of one kernel invocation.

    flops are counted as 2*M*N*K for matmul-shaped work and 1 per
    add/sub/abs/min for elementwise work; bytes are HBM traffic assuming
    perfect on-chip reuse within one fused region (each tensor read once
    + written once), which makes the model a LOWER bound on traffic and
    the utilisation numbers an UPPER bound on headroom.
    """

    name: str
    flops: float
    bytes: float
    # which peak the flops ride: "bf16" (MXU), "f32" (MXU f32), "vpu"
    engine: str = "vpu"


def _peak(engine: str) -> float:
    return {
        "bf16": PEAK_BF16_FLOPS,
        "f32": PEAK_F32_MXU_FLOPS,
        "vpu": PEAK_F32_VPU_FLOPS,
    }[engine]


def analyze(model: KernelModel, measured_ms: float) -> dict:
    """Measured time -> roofline verdict for one kernel."""
    peak = _peak(model.engine)
    sol_ms = max(model.flops / peak, model.bytes / HBM_BYTES_PER_S) * 1e3
    if measured_ms < 1e-3:
        # a fused-prefix delta can vanish into timing noise; don't report
        # fictional utilisations off a ~0 denominator
        return {
            "ms": round(measured_ms, 4),
            "gflop": round(model.flops / 1e9, 3),
            "mbytes": round(model.bytes / 1e6, 3),
            "mfu": None,
            "bw_frac": None,
            "sol_ms": round(sol_ms, 4),
            "bound": "unmeasured",
            "engine": model.engine,
        }
    t = measured_ms * 1e-3
    mfu = model.flops / t / peak
    bw_frac = model.bytes / t / HBM_BYTES_PER_S
    if mfu < _LATENCY_FRAC and bw_frac < _LATENCY_FRAC:
        bound = "latency"
    elif bw_frac >= mfu:
        bound = "bandwidth"
    else:
        bound = "compute"
    return {
        "ms": round(measured_ms, 4),
        "gflop": round(model.flops / 1e9, 3),
        "mbytes": round(model.bytes / 1e6, 3),
        "mfu": round(mfu, 4),
        "bw_frac": round(bw_frac, 4),
        "sol_ms": round(sol_ms, 4),
        "bound": bound,
        "engine": model.engine,
    }


# ---------------------------------------------------------------------------
# per-kernel models (dims read off the live objects, not hard-coded)
# ---------------------------------------------------------------------------


def _pyramid_px(height: int, width: int, n_levels: int, scale: float) -> float:
    """Total pixels across one image's pyramid."""
    return sum(
        int(round(height / scale**i)) * int(round(width / scale**i))
        for i in range(n_levels)
    )


def frontend_models(frontend) -> dict:
    """Stage models for the stereo extraction chain (one L+R pair).

    Stages match bench.py's fused-prefix breakdown:
      - pyr_fast_select: pyramid build (7-tap separable blur + resize),
        FAST ring test (~110 VPU ops/px: 16 ring diffs, doubling min/max
        trees, score), 3x3 NMS + cell top-k. Traffic: L0 read + pyramid
        write + score map r/w (the fused region re-reads each level ~3x).
      - patch_dma: the pallas DMA kernel copies an aligned (RY, RX) bf16
        window per keypoint and positions it with one-hot shift matmuls.
      - orient_brief: orientation is a (K, P^2) x (P^2, 2) MXU matmul;
        BRIEF adds a 7x7 separable blur over patches + 256 compares.
      - stereo: 11-shift x 11x11 SAD over pre-fetched windows.
    """
    from pointslot_tpu.ops import pallas_patch as pp

    ext = frontend.extractor
    cfg = frontend.config
    h, w = ext.shapes[0]
    K = ext.capacity
    px = _pyramid_px(h, w, cfg.n_levels, cfg.scale_factor)
    pair = 2.0  # L + R images

    pyr_flops = pair * px * (2 * 7 * 2 + 110 + 9)  # blur + FAST + NMS
    pyr_bytes = pair * px * 4 * 5  # L0 + levels out + ~3 score-map passes

    patch = pp.PATCH
    ry, rx = pp._RY, pp._RX
    dma_bytes = pair * K * (ry * rx * 2 + patch * patch * 4)  # bf16 in, f32 out
    # two one-hot shift matmuls per patch: (P, RY)x(RY, RX) + (RX, P)
    dma_flops = pair * K * 2 * patch * ry * rx

    p2 = patch * patch
    orient_flops = pair * K * 2 * p2 * 2  # (K, P^2) x (P^2, 2)
    brief_flops = pair * K * (p2 * 2 * 7 * 2 + 256 * 4)  # blur + compares
    ob_bytes = pair * K * p2 * 4 * 3  # patches read 2x + blurred write

    sad_flops = K * 11 * 11 * 11 * 3  # shifts x window x |l-r| ops
    sad_bytes = K * 11 * 21 * 4 * 2  # refine windows

    return {
        "pyr_fast_select": KernelModel(
            "pyr_fast_select", pyr_flops, pyr_bytes, "vpu"
        ),
        "patch_dma": KernelModel("patch_dma", dma_flops, dma_bytes, "bf16"),
        "orient_brief": KernelModel(
            "orient_brief", orient_flops + brief_flops, ob_bytes, "bf16"
        ),
        "stereo_sad": KernelModel("stereo_sad", sad_flops, sad_bytes, "vpu"),
    }


def hamming_model(n_query: int, n_train: int) -> KernelModel:
    """Sign-matmul Hamming tables: (Q, 256) x (256, T) bf16 on the MXU
    (ops/hamming.py hamming_table_mxu)."""
    flops = 2.0 * n_query * n_train * 256
    bytes_ = (n_query * 256 + n_train * 256) * 2 + n_query * n_train * 4
    return KernelModel("hamming_match", flops, bytes_, "bf16")


def ba_iteration_model(P: int, L: int, K: int) -> KernelModel:
    """One LM iteration of the point-major Schur engine
    (solvers/local_ba.py). Dominant einsums:
      S_cross (laik,lbjk->abij): 2*L*P^2*6*6*3
      U       (lkp,lkij->lpij):  2*L*K*P*6*3
      W2      (lpij,ljk->lpik):  2*L*P*6*3*3
      residual/Jacobian passes:  ~2*L*K*200 elementwise
    Traffic: U, W2 (L,P,6,3) f32 tensors + edge tensors (L,K,...) r/w.
    """
    flops = (
        2.0 * L * P * P * 6 * 6 * 3
        + 2.0 * L * K * P * 6 * 3
        + 2.0 * L * P * 6 * 3 * 3
        + 2.0 * L * K * 200
    )
    bytes_ = (2 * (L * P * 18) + 3 * (L * K * 30)) * 4
    return KernelModel("ba_lm_iter", flops, bytes_, "f32")


def report(models_and_times: dict) -> dict:
    """{name: (KernelModel, measured_ms)} -> {name: verdict-dict}."""
    return {
        name: analyze(model, ms)
        for name, (model, ms) in models_and_times.items()
    }
