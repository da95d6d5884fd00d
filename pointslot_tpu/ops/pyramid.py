"""Image pyramid + separable Gaussian blur in JAX.

Replaces the reference's per-level cv::resize pyramid
(reference src/ORBextractor.cc:1107 ComputePyramid) and the pre-descriptor
GaussianBlur(7x7, sigma=2) (reference src/ORBextractor.cc:1086).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    shapes = []
    for lvl in range(n_levels):
        s = scale_factor ** lvl
        shapes.append((max(int(round(h / s)), 16), max(int(round(w / s)), 16)))
    return shapes


@functools.lru_cache(maxsize=64)
def _resize_mats(h_in: int, w_in: int, h_out: int, w_out: int):
    """Per-axis bilinear interpolation matrices R (h_out, h_in) and
    C (w_in, w_out) such that resize(img) == R @ img @ C, built by
    resizing identity matrices (resize is separable and linear, so the
    identity columns ARE the weight rows — including jax's antialias
    triangle taps). Computed once per level geometry on the host CPU."""
    import contextlib

    try:
        dev = jax.default_device(jax.devices("cpu")[0])
    except Exception:  # CPU backend pinned away: eager on default backend
        dev = contextlib.nullcontext()
    # ensure_compile_time_eval: this helper is (lru-cached but) reachable
    # from inside jit traces, where jnp ops on concrete values would
    # otherwise become traced constants folded into every caller.
    with dev, jax.ensure_compile_time_eval():
        R = np.asarray(jax.image.resize(
            jnp.eye(h_in, dtype=jnp.float32), (h_out, h_in), "bilinear"))
        C = np.asarray(jax.image.resize(
            jnp.eye(w_in, dtype=jnp.float32), (w_in, w_out), "bilinear"))
    return R.astype(np.float32), C.astype(np.float32)


def _resize_matmul(x: jnp.ndarray, h_out: int, w_out: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W) as two dense matmuls on the MXU.

    jax.image.resize's sparse dot_general lowers to tiny-window
    convolutions on TPU (window=2/3, EmitOutputBatchInSublanes); the same
    contraction as dense (h_out, h_in) / (w_in, w_out) matmuls rides the
    MXU instead. Measured equal on the calibrated device-time harness
    (both ~0.02-0.05 ms for the whole cascade — the pyramid was never the
    bottleneck once the harness's fixed tunnel cost was removed, see
    utils/stagebench.timeit_ms) and exact to 3e-5 vs resize in f32.

    Operands stay f32 with Precision.HIGH (3-pass bf16 decomposition,
    ~1e-7 relative error): an earlier bf16-operand cast re-quantized every
    level of the 7-level CASCADE (<=0.5 grey per level, accumulating to a
    few grey levels at coarse scales — near min_th_fast margins) for no
    measured speedup, and made the accelerator path numerically different
    from the CPU oracle backend. One code path everywhere now."""
    h_in, w_in = x.shape[-2:]
    R, C = _resize_mats(h_in, w_in, h_out, w_out)
    lead = x.shape[:-2]
    xb = x.reshape((-1, h_in, w_in))
    hi = jax.lax.Precision.HIGH
    t = jnp.einsum("oh,bhw->bow", jnp.asarray(R), xb, precision=hi)
    out = jnp.einsum("bow,wq->boq", t, jnp.asarray(C), precision=hi)
    return out.reshape(lead + (h_out, w_out))


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> List[jnp.ndarray]:
    """img (..., H, W) float32 -> list of per-level images, each level a
    bilinear resize of the PREVIOUS level — the reference's cascade
    (ORBextractor::ComputePyramid resizes level l-1 into l,
    src/ORBextractor.cc:1107). Cascading also reads geometrically
    shrinking sources instead of re-reading the full-res image per level
    (8x full-res reads -> ~2.2x total). Leading batch dims pass through
    (the frontend stacks L+R so both pyramids share one fused program).
    Each resize is the dense-matmul form (_resize_matmul) — numerically
    the same contraction jax.image.resize performs, but on the MXU."""
    h, w = img.shape[-2:]
    shapes = level_shapes(h, w, n_levels, scale_factor)
    out = [img]
    for lvl in range(1, n_levels):
        out.append(_resize_matmul(out[-1], *shapes[lvl]))
    return out


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with edge-replicate padding, (H, W) float32."""
    k = jnp.asarray(_gaussian_kernel(ksize, sigma))
    r = ksize // 2
    padded = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    # vertical pass: conv along rows
    v = jax.lax.conv_general_dilated(
        padded[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    padded = jnp.pad(v, ((0, 0), (r, r)), mode="edge")
    h = jax.lax.conv_general_dilated(
        padded[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    return h
