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


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> List[jnp.ndarray]:
    """img (..., H, W) float32 -> list of per-level images, each level a
    bilinear resize of the PREVIOUS level — the reference's cascade
    (ORBextractor::ComputePyramid resizes level l-1 into l,
    src/ORBextractor.cc:1107). Cascading also reads geometrically
    shrinking sources instead of re-reading the full-res image per level
    (8x full-res reads -> ~2.2x total). Leading batch dims pass through
    (the frontend stacks L+R so both pyramids share one fused program)."""
    h, w = img.shape[-2:]
    lead = img.shape[:-2]
    shapes = level_shapes(h, w, n_levels, scale_factor)
    out = [img]
    for lvl in range(1, n_levels):
        out.append(jax.image.resize(out[-1], lead + shapes[lvl],
                                    method="bilinear"))
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
