"""Fixed-size stream compaction without integer scans.

``jnp.nonzero(size=...)`` lowers to an integer cumsum whose multi-level
scan decomposition trips an XLA scoped-vmem compiler bug when nested under
``lax.scan`` on TPU.  This variant runs the positional cumsum in f32 —
exact for counts below 2^24 — and scatters with out-of-range drop.
"""

from __future__ import annotations

import jax.numpy as jnp


def nonzero_fixed(mask, size: int, fill_value: int = 0):
    """Indices of True entries (ascending), padded with ``fill_value`` to
    ``size``; also returns the true count.  Requires len(mask) < 2^24."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.float32)).astype(jnp.int32) - 1
    count = jnp.where(n > 0, pos[-1] + 1, 0).astype(jnp.int32)
    target = jnp.where(mask & (pos < size), pos, size)   # size = dropped
    out = jnp.full(size, fill_value, dtype=jnp.int32)
    src = jnp.arange(n, dtype=jnp.int32)
    out = out.at[target].set(src, mode="drop")
    return out, count
