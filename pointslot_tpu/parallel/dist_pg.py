"""Distributed pose-graph optimization: edge-sharded Gauss-Newton with a
matrix-free conjugate-gradient solve.

The multi-host essential-graph/global design (BASELINE.json north star):
edges shard across the mesh; each CG matvec accumulates per-edge
J^T W J x contributions locally and combines with one psum — the Hessian is
never materialized, so the keyframe axis can grow to pod-scale while each
step moves only (K, 6) vectors over ICI. Single-chip loop closing uses the
dense solver (solvers/posegraph.py); this path takes over when K is large
or the graph spans hosts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pointslot_tpu.geometry import se3
from pointslot_tpu.solvers.posegraph import PoseGraphProblem, _edge_res_jac


def distributed_pose_graph(
    prob: PoseGraphProblem,
    mesh,
    n_gn_iters: int = 10,
    n_cg_iters: int = 32,
    damping: float = 1e-6,
):
    """Edge count must divide by the total device count. Returns (K, 4, 4)."""
    axes = tuple(mesh.axis_names)
    K = prob.poses.shape[0]
    edge_spec = P(axes)
    rep = P()

    def psum_all(x):
        for ax in axes:
            x = jax.lax.psum(x, ax)
        return x

    @partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, rep, edge_spec, edge_spec, edge_spec, edge_spec,
                  edge_spec),
        out_specs=rep,
        check_vma=False,
    )
    def solve(poses, fixed, valid, e_i, e_j, e_meas, e_weight, e_valid):
        free = ((valid & ~fixed)[:, None] * jnp.ones((1, 6))).astype(jnp.float32)

        def gn_iter(_, poses):
            Ti = poses[e_i]
            Tj = poses[e_j]
            r, Ji, Jj = jax.vmap(_edge_res_jac)(Ti, Tj, e_meas)
            w = jnp.where(e_valid, e_weight, 0.0)

            b = jnp.zeros((K, 6))
            b = b.at[e_i].add(jnp.einsum("eij,ei,e->ej", Ji, r, w))
            b = b.at[e_j].add(jnp.einsum("eij,ei,e->ej", Jj, r, w))
            b = psum_all(b) * free

            diag = jnp.zeros((K, 6))
            diag = diag.at[e_i].add(jnp.einsum("eij,eij,e->ej", Ji, Ji, w))
            diag = diag.at[e_j].add(jnp.einsum("eij,eij,e->ej", Jj, Jj, w))
            diag = psum_all(diag)
            # diag-scaled damping (matches the dense engine,
            # solvers/posegraph.py) — absolute damping under-regularizes
            # weakly-constrained poses and lets CG blow up
            lam = damping * jnp.maximum(diag, 1.0)
            precond = 1.0 / jnp.maximum(diag + lam, 1e-9)

            def matvec(x):
                xi = x[e_i]
                xj = x[e_j]
                Jx = (
                    jnp.einsum("eij,ej->ei", Ji, xi)
                    + jnp.einsum("eij,ej->ei", Jj, xj)
                ) * w[:, None]
                y = jnp.zeros((K, 6))
                y = y.at[e_i].add(jnp.einsum("eij,ei->ej", Ji, Jx))
                y = y.at[e_j].add(jnp.einsum("eij,ei->ej", Jj, Jx))
                y = psum_all(y)
                return (y + lam * x) * free

            # preconditioned CG for H dx = -b
            bneg = -b

            def cg_body(_, st):
                x, rr, z, p = st
                Ap = matvec(p)
                pAp = jnp.sum(p * Ap)
                rz = jnp.sum(rr * z)
                alpha = jnp.where(pAp > 1e-12, rz / pAp, 0.0)
                x = x + alpha * p
                r_new = rr - alpha * Ap
                z_new = r_new * precond * free
                beta = jnp.where(rz > 1e-12, jnp.sum(r_new * z_new) / rz, 0.0)
                p = z_new + beta * p
                return x, r_new, z_new, p

            x0 = jnp.zeros((K, 6))
            r0 = bneg
            z0 = r0 * precond * free
            dx, _, _, _ = jax.lax.fori_loop(
                0, n_cg_iters, cg_body, (x0, r0, z0, z0)
            )
            # trust region: an unconverged CG direction on an ill-conditioned
            # graph can be huge; cap the per-pose step (GN re-iterates) and
            # drop non-finite directions entirely
            nrm = jnp.linalg.norm(dx, axis=-1, keepdims=True)
            dx = dx * jnp.minimum(1.0, 5.0 / jnp.maximum(nrm, 1e-12))
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

            new_poses = jax.vmap(se3.se3_retract)(poses, dx)
            return jnp.where((fixed | ~valid)[:, None, None], poses, new_poses)

        return jax.lax.fori_loop(0, n_gn_iters, gn_iter, poses)

    return solve(prob.poses, prob.fixed, prob.valid, prob.e_i, prob.e_j,
                 prob.e_meas, prob.e_weight, prob.e_valid)
