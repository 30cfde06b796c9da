"""Batched device ensembles: vmap the superstep over independent devices.

The crossbar structures are arrays of nominally-identical devices; the
reference simulates one giant merged structure (structures/crossbars).  On
TPU there is a second, often better-mapping option: batch B independent
device instances (same geometry, different state/RNG streams) through one
vmapped superstep, and shard the batch axis over the mesh — ideal for
ensemble statistics, parameter sweeps and crossbar cells that interact only
through external circuit constraints.  This is the data-parallel axis of the
mesh ("batch"), composable with the site-sharding axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import Geometry, PhysParams, SimState
from ..superstep import superstep_impl


def batch_states(state: SimState, n: int, base_seed: int = 0) -> SimState:
    """Replicate a state B times with independent RNG streams."""
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), state
    )
    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(base_seed), i)
    )(jnp.arange(n, dtype=jnp.uint32))
    return batched.replace(key=keys)


def make_batched_superstep(
    geom: Geometry,
    params: PhysParams,
    heat,
    mesh: Optional[Mesh] = None,
    axis: str = "batch",
):
    """Return ``superstep(batched_state, Vd) -> (batched_state, step_times,
    metrics)`` vmapped over the leading device axis; if ``mesh`` is given the
    batch axis is sharded over ``axis``."""

    vstep = jax.vmap(
        lambda st, vd: superstep_impl(geom, params, heat, st, vd),
        in_axes=(0, None),
    )
    jitted = jax.jit(vstep)

    def superstep(states: SimState, Vd):
        return jitted(states, Vd)

    return superstep


def shard_batch(states: SimState, mesh: Mesh, axis: str = "batch") -> SimState:
    """Place a batched state with the batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), states
    )
