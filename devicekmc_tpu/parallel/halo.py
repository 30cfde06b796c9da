"""Halo-exchange domain decomposition (shard_map) for the site graph.

The round-1 default sharding (sharding.py) replicates the per-site field
vectors and shards only the pair arrays — simple, exact, and fine while
vectors are MB-sized.  This module is the scaling path beyond that: sites
are split into contiguous slabs along the (x-sorted) transport axis, each
shard holds ONLY its slab of every vector, and neighbour reads across slab
boundaries are satisfied by exchanging fixed-width halos with the adjacent
shards over ICI (``jax.lax.ppermute``) — the SURVEY §5.8 recipe.  Dot
products reduce with ``psum``.

Requirements: the site ordering must have graph bandwidth <= halo width H
(x-sorted structures do; use tools/sort_structure.py), and H + slab edges
must fit the slab size.  ``compute_halo_width`` measures it.

Implemented here: a halo-exchanged ELL matvec and a fully-distributed
Jacobi-CG Dirichlet Laplace solve, equivalence-tested against the
replicated-vector solver (tests/test_halo.py).  Wiring the whole superstep
through this path is the round-2 plan (event selection already reduces with
a single psum in the hierarchical scheme).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.4.35 canonical location
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def compute_halo_width(neigh_idx: np.ndarray) -> int:
    """Maximum |i - j| over graph edges (the ordering's bandwidth)."""
    n, m = neigh_idx.shape
    rows = np.repeat(np.arange(n), m)
    cols = neigh_idx.reshape(-1)
    ok = cols >= 0
    if not ok.any():
        return 0
    return int(np.abs(rows[ok] - cols[ok]).max())


def _exchange_halo(x_local, halo: int, axis: str):
    """Return [halo + S + halo] window: left neighbour's tail, own slab,
    right neighbour's head.  Edge shards receive zeros (their halo region
    is outside the domain; callers mask by validity anyway)."""
    n_sh = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    # send my tail to the right neighbour (it becomes their left halo)
    right_pairs = [(i, (i + 1) % n_sh) for i in range(n_sh)]
    left_pairs = [(i, (i - 1) % n_sh) for i in range(n_sh)]
    from_left = jax.lax.ppermute(x_local[-halo:], axis, right_pairs)
    from_right = jax.lax.ppermute(x_local[:halo], axis, left_pairs)
    zeros = jnp.zeros((halo,), x_local.dtype)
    left = jnp.where(idx > 0, from_left, zeros)
    right = jnp.where(idx < n_sh - 1, from_right, zeros)
    return jnp.concatenate([left, x_local, right])


def make_halo_laplace_solver(
    mesh: Mesh,
    halo: int,
    tol: float = 1e-10,
    maxiter: int = 50000,
    axis: str = "sites",
):
    """Build a fully-distributed Dirichlet Laplace solver.

    Inputs (sharded along ``axis`` into equal slabs):
      edge_g [N, max_nn], neigh_idx [N, max_nn] (GLOBAL indices),
      interior/left/right masks [N], x0 [N]; scalars v_left/v_right.
    Returns (phi [N] sharded, iters).
    """

    def solver(edge_g, neigh_idx, interior, is_left, is_right, x0,
               v_left, v_right):
        S = x0.shape[0]                      # local slab size
        gstart = jax.lax.axis_index(axis) * S

        diag = jnp.sum(edge_g, axis=1)
        local_idx = neigh_idx - (gstart - halo)   # into the halo window
        safe = jnp.clip(local_idx, 0, S + 2 * halo - 1)
        valid = neigh_idx >= 0

        def win_gather(vec_local):
            w = _exchange_halo(vec_local, halo, axis)
            return jnp.where(valid, w[safe], 0.0)

        # boundary values folded into the RHS (Dirichlet elimination)
        nb_left = win_gather(is_left.astype(edge_g.dtype)) > 0.5
        nb_right = win_gather(is_right.astype(edge_g.dtype)) > 0.5
        nb_bv = jnp.where(nb_left, v_left, jnp.where(nb_right, v_right, 0.0))
        b = jnp.where(interior, jnp.sum(edge_g * nb_bv, axis=1), 0.0)

        nb_interior = win_gather(interior.astype(edge_g.dtype)) > 0.5
        neg_vals = jnp.where(nb_interior, -edge_g, 0.0)

        def matvec(x):
            xm = jnp.where(interior, x, 0.0)
            xj = win_gather(xm)
            y = diag * xm + jnp.sum(neg_vals * xj, axis=1)
            return jnp.where(interior, y, 0.0)

        def pdot(a, bb):
            return jax.lax.psum(jnp.dot(a, bb), axis)

        minv = jnp.where(interior & (diag != 0), 1.0 / diag, 1.0)
        x0m = jnp.where(interior, x0, 0.0)
        r0 = b - matvec(x0m)
        z0 = minv * r0
        rz0 = pdot(r0, z0)
        bnorm = jnp.sqrt(pdot(b, b))
        thresh2 = (tol * jnp.where(bnorm > 0, bnorm, 1.0)) ** 2

        def cond(c):
            _, r, _, _, it = c
            return (pdot(r, r) > thresh2) & (it < maxiter)

        def body(c):
            x, r, p, rz, it = c
            ap = matvec(p)
            denom = pdot(p, ap)
            alpha = jnp.where(denom != 0, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = minv * r
            rz_new = pdot(r, z)
            beta = jnp.where(rz != 0, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, r, p, rz_new, it + 1)

        x, r, _, _, iters = jax.lax.while_loop(
            cond, body, (x0m, r0, z0, rz0, jnp.asarray(0, jnp.int32))
        )
        phi = jnp.where(
            is_left, v_left, jnp.where(is_right, v_right, x)
        )
        return phi, iters

    spec_pair = P(axis)
    return jax.jit(
        shard_map(
            solver,
            mesh=mesh,
            in_specs=(spec_pair, spec_pair, spec_pair, spec_pair, spec_pair,
                      spec_pair, P(), P()),
            out_specs=(spec_pair, P()),
        )
    )
