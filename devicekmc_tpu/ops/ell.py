"""Padded-neighbour (ELL) sparse matrix-vector product.

The device conductance graph is naturally an ELL matrix: ``neigh_idx[N,
max_nn]`` (pad -1) with per-edge values ``vals[N, max_nn]`` and a diagonal.
This is the TPU-idiomatic sparse format — fully regular gathers, no CSR
row-pointer indirection — and replaces the reference's cuSPARSE CSR SpMV
(src/iterative_solvers_gpu.cu).  Pads carry value 0 so no masking is needed
in the accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp


def ell_matvec(diag, vals, neigh_idx, x):
    """y = A @ x with A = diag + off-diagonal ELL values.

    Args:
      diag: [N] diagonal entries.
      vals: [N, max_nn] off-diagonal values (0 at pads).
      neigh_idx: [N, max_nn] int32 column indices (pad -1; any pad value is
        safe because ``vals`` is 0 there — we clamp to 0 for the gather).
      x: [N] vector.
    """
    safe = jnp.maximum(neigh_idx, 0)
    xg = x[safe]                          # [N, max_nn]
    return diag * x + jnp.sum(vals * xg, axis=1)
