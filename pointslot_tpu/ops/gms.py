"""GMS (Grid-based Motion Statistics) match filtering, batched.

Replaces the reference's header-only gms_matcher (reference
include/gms_matcher.h:15-50: 20x20 grids, vote-based cell acceptance) used
by ORBmatcher::SearchByBruceMatchingWithGMS for object feature matching.

TPU formulation: matches scatter votes into a (G*G, G*G) cell-pair count
matrix; a 3x3 neighborhood sum over source cells gives each cell-pair's
support; matches are kept when support exceeds alpha*sqrt(mean matches per
active cell) — the GMS statistical threshold. One scatter + one small conv
instead of per-cell loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

GRID = 20
# The GMS paper's alpha=6 assumes ~10k-feature densities; SLOT match sets are
# hundreds, so the default here is calibrated lower.
ALPHA = 3.0


@partial(jax.jit, static_argnames=("width", "height", "grid"))
def gms_filter(
    xy_a: jnp.ndarray,       # (N, 2) match endpoints in image A
    xy_b: jnp.ndarray,       # (N, 2) corresponding points in image B
    valid: jnp.ndarray,      # (N,) bool
    width: int, height: int,
    grid: int = GRID,
    alpha: float = ALPHA,
) -> jnp.ndarray:
    """Returns (N,) bool inlier mask."""
    G2 = grid * grid

    def cell_of(xy):
        cx = jnp.clip((xy[:, 0] * grid / width).astype(jnp.int32), 0, grid - 1)
        cy = jnp.clip((xy[:, 1] * grid / height).astype(jnp.int32), 0, grid - 1)
        return cy * grid + cx

    ca = cell_of(xy_a)
    cb = cell_of(xy_b)

    # cell-pair vote matrix
    votes = jnp.zeros((G2, G2), jnp.float32).at[
        jnp.where(valid, ca, G2), jnp.where(valid, cb, G2)
    ].add(1.0, mode="drop")

    # support of pair (i, j) = number of matches whose a-end falls in i's
    # 3x3 neighborhood AND b-end in j's 3x3 neighborhood. (The original GMS
    # achieves sub-cell shift tolerance with 8 half-cell-shifted grid
    # patterns; two-sided neighborhood smoothing is the batched equivalent.)
    vgrid = votes.reshape(grid, grid, grid, grid)  # (ay, ax, by, bx)
    sa = jnp.zeros_like(vgrid)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sa = sa + jnp.roll(vgrid, (dy, dx), axis=(0, 1))
    support = jnp.zeros_like(sa)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            support = support + jnp.roll(sa, (dy, dx), axis=(2, 3))
    support = support.reshape(G2, G2)

    # GMS statistical threshold: tau = alpha * sqrt(mean matches per cell in
    # the source neighborhood)
    per_cell = votes.sum(axis=1).reshape(grid, grid)
    neigh = jnp.zeros_like(per_cell)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            neigh = neigh + jnp.roll(per_cell, (dy, dx), axis=(0, 1))
    mean_n = neigh.reshape(-1) / 9.0
    tau = alpha * jnp.sqrt(jnp.maximum(mean_n, 1e-6))

    # subtract the match's own vote so singleton pairs never self-support
    score = support[ca, cb] - 1.0
    keep = score > tau[ca]
    return keep & valid
