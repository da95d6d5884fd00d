"""Hamming distance on 256-bit ORB descriptors.

Replaces the reference's scalar popcount loop (DescriptorDistance,
reference src/ORBmatcher.cc:2704) with two batched formulations:

1. ``hamming_table_popcount`` — XOR + ``lax.population_count`` on the packed
   uint32 words; exact, VPU-bound, no unpacking.
2. ``hamming_table_mxu`` — descriptors as ±1 int8 sign vectors;
   d(a, b) = (256 − aᵀb) / 2, i.e. one int8 matmul that runs on the MXU.
   This is the TPU-native formulation: an (N, 256) x (256, M) contraction at
   N = M = 1024 is ~0.5 GFLOP-equivalent — effectively free — and every
   matcher in the system (stereo, projection, brute-force, fuse, BoW) reduces
   to this one kernel plus masking.

Both return int32 distance tables in [0, 256].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unpack_signs(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 packed bits -> (N, 256) int8 in {-1, +1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256)
    return (bits.astype(jnp.int8) * 2 - 1).astype(jnp.int8)


def hamming_table_popcount(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) packed uint32 -> (N, M) int32 Hamming distances."""
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_table_mxu(signs_a: jnp.ndarray, signs_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) x (M, 256) int8 sign vectors -> (N, M) int32 distances.

    d = (256 - a.b) / 2 since matching bits contribute +1 and differing -1.
    """
    dot = jax.lax.dot_general(
        signs_a,
        signs_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (256 - dot) // 2


def hamming_pairwise(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise distance of aligned pairs: (N, 8), (N, 8) -> (N,) int32."""
    x = desc_a ^ desc_b
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
