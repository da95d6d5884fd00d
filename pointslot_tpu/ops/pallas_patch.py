"""Pallas TPU kernel: batched keypoint patch extraction by explicit DMA.

THE frontend bottleneck on TPU is XLA's gather lowering: orientation +
descriptor sampling gather ~1.6M scattered elements per image and cost
~20 ms — three orders of magnitude off DMA speed. This kernel replaces
every gather in the feature path with per-keypoint async copies
(HBM -> VMEM) driven by scalar-prefetched keypoint coordinates.

Mosaic constraints shape the kernel: DMA source slices must be 8-aligned in
the sublane dim and 128-aligned/sized in the lane dim, so each step fetches
an aligned (56, 256) superset and recovers the exact 48x48 window with two
one-hot shift matmuls on the MXU (exact in f32 at Precision.HIGHEST).
Measured: 1024 patches in ~1.4 ms vs ~20 ms for the XLA gather.

Downstream (ops/orb.py) the patches make orientation a masked reduction and
steered-BRIEF sampling a pair of small batched matmuls — no gathers
anywhere. An XLA take-based fallback serves CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 48  # covers the 31x31 orientation disc and the rotated BRIEF
#             pattern (radius 13 * sqrt2 ~ 19) with margin
HALF = PATCH // 2
_RY = PATCH + 8     # aligned DMA region rows
_RX = 256           # aligned DMA region cols (two lane tiles)


def _patch_kernel(xy_ref, img_ref, out_ref, scratch, sem):
    k = pl.program_id(0)
    x = xy_ref[k, 0]
    y = xy_ref[k, 1]
    y_al = (y // 8) * 8
    x_al = (x // 128) * 128
    dy = y - y_al
    dx = x - x_al
    cp = pltpu.make_async_copy(
        img_ref.at[pl.ds(y_al, _RY), pl.ds(x_al, _RX)], scratch, sem
    )
    cp.start()
    cp.wait()
    # one-hot shift matmuls: out[i, j] = scratch[i + dy, j + dx]
    R = (
        jax.lax.broadcasted_iota(jnp.int32, (PATCH, _RY), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (PATCH, _RY), 0) + dy
    ).astype(jnp.float32)
    C = (
        jax.lax.broadcasted_iota(jnp.int32, (_RX, PATCH), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (_RX, PATCH), 1) + dx
    ).astype(jnp.float32)
    tmp = jnp.dot(R, scratch[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.dot(tmp, C, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def _extract_patches_pallas(img_padded: jnp.ndarray, xy_corner: jnp.ndarray):
    K = xy_corner.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, PATCH, PATCH), lambda k, xy: (k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((_RY, _RX), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _patch_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, PATCH, PATCH), img_padded.dtype),
    )(xy_corner, img_padded)


def _extract_patches_xla(img_padded: jnp.ndarray, xy_corner: jnp.ndarray):
    dy = jnp.arange(PATCH)
    dx = jnp.arange(PATCH)
    rows = xy_corner[:, 1:2] + dy[None, :]              # (K, P)
    cols = xy_corner[:, 0:1] + dx[None, :]              # (K, P)
    return img_padded[rows[:, :, None], cols[:, None, :]]


def pad_for_patches(img: jnp.ndarray) -> jnp.ndarray:
    """Pad so any in-image-centered patch window (plus DMA alignment slop)
    stays in bounds: HALF top/left, HALF + alignment slack bottom/right."""
    return jnp.pad(img, ((HALF, HALF + 8), (HALF, HALF + _RX - PATCH)))


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def extract_patches(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                    use_pallas: bool = True) -> jnp.ndarray:
    """img (H, W) f32; keypoint centers xs/ys (K,) int -> (K, 48, 48)
    patches with the keypoint at (HALF, HALF). Centers are clamped to the
    image; the patch may read zero-padding near borders."""
    img_padded = pad_for_patches(img)
    xy_corner = jnp.stack(
        [jnp.clip(xs, 0, img.shape[1] - 1), jnp.clip(ys, 0, img.shape[0] - 1)],
        axis=1,
    ).astype(jnp.int32)
    # corner coords in padded frame: center - HALF + HALF = center
    if use_pallas:
        return _extract_patches_pallas(img_padded, xy_corner)
    return _extract_patches_xla(img_padded, xy_corner)


def _patch_kernel_stack(xy_ref, img_ref, out_ref, scratch, sem):
    k = pl.program_id(0)
    x = xy_ref[k, 0]
    y = xy_ref[k, 1]
    lvl = xy_ref[k, 2]
    y_al = (y // 8) * 8
    x_al = (x // 128) * 128
    dy = y - y_al
    dx = x - x_al
    cp = pltpu.make_async_copy(
        img_ref.at[lvl, pl.ds(y_al, _RY), pl.ds(x_al, _RX)], scratch, sem
    )
    cp.start()
    cp.wait()
    R = (
        jax.lax.broadcasted_iota(jnp.int32, (PATCH, _RY), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (PATCH, _RY), 0) + dy
    ).astype(jnp.float32)
    C = (
        jax.lax.broadcasted_iota(jnp.int32, (_RX, PATCH), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (_RX, PATCH), 1) + dx
    ).astype(jnp.float32)
    tmp = jnp.dot(R, scratch[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.dot(tmp, C, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def stack_pyramid_for_patches(levels) -> jnp.ndarray:
    """Pad every pyramid level onto level-0's patch-padded canvas and stack:
    (n_levels, Hp, Wp). One canvas means ONE kernel launch fetches patches
    from any level (the per-level launches were ~60 us each, launch-bound)."""
    ref = pad_for_patches(levels[0])
    Hp, Wp = ref.shape
    out = [ref]
    for im in levels[1:]:
        out.append(jnp.pad(
            im, ((HALF, Hp - im.shape[0] - HALF), (HALF, Wp - im.shape[1] - HALF))
        ))
    return jnp.stack(out)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def extract_patches_stack(stack: jnp.ndarray, xyl: jnp.ndarray,
                          use_pallas: bool = True) -> jnp.ndarray:
    """stack: (L, Hp, Wp) from stack_pyramid_for_patches. xyl: (K, 3) int32
    (x, y, level) with x/y CENTER coords already clamped to their level's
    extent. Returns (K, 48, 48) patches centered at the keypoint."""
    K = xyl.shape[0]
    if use_pallas:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(K,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (1, PATCH, PATCH), lambda k, xy: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((_RY, _RX), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(
            _patch_kernel_stack,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, PATCH, PATCH), stack.dtype),
        )(xyl, stack)
    dy = jnp.arange(PATCH)
    dx = jnp.arange(PATCH)
    rows = xyl[:, 1:2] + dy[None, :]
    cols = xyl[:, 0:1] + dx[None, :]
    return stack[xyl[:, 2][:, None, None], rows[:, :, None], cols[:, None, :]]


def default_use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False
