"""SPMD sharding of the KMC superstep over a device mesh.

Design (round 1): *site-row decomposition with replicated field vectors*.
The memory- and FLOP-dominant objects are the per-pair arrays
(``[N, max_nn]`` rate table / edge conductances / pair geometry) and the
dense transport matrix (``[N_atom+2, N_atom+2]``); these are sharded along
their leading (site/atom) axis across the ``"sites"`` mesh axis.  The
per-site field *vectors* (potentials, charges, temperatures — a few hundred
KB even at 100k sites) stay replicated, so neighbour gathers never cross
shard boundaries and XLA's SPMD partitioner inserts exactly the collectives
the scaling recipe calls for:

  * ``psum``-style all-reduces for the global rate sum, CG dot products and
    the total dissipated power (SURVEY.md §5.8),
  * all-gathers to re-replicate solver outputs.

This is the annotate-and-let-XLA-partition approach: the superstep body is
unchanged; only input shardings (+ a few ``with_sharding_constraint`` hints)
differ.  A shard_map/pallas halo-exchange path for >1M-site structures (no
replicated vectors, boundary-only exchange over ICI) is the planned
evolution — the contact layers already pin to the edge shards because sites
are x-sorted.

There is no reference equivalent: the reference is single-process,
single-GPU (SURVEY.md §2.12; its MPI build is commented out, Makefile:31-43).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import Geometry, PhysParams, SimState


def _site_sharded_geometry_specs() -> Geometry:
    """PartitionSpecs for Geometry: pair arrays sharded by site row,
    small tables replicated."""
    return dict(
        coords=P("sites"),
        neigh_idx=P("sites"),
        neigh_valid=P("sites"),
        pair_dist=P("sites"),
        v2_pair=P("sites"),
        site_layer=P("sites"),
        rev_slot=P("sites"),
        atom_ind=P(),            # atom gather indices: replicated
        atom_metalp_idx=P(),
        atom_metalp_inv=P(),
        atom_neigh_idx=P(),      # [N_atom, max_nn] — atom axis is unpadded
        metal_mask_table=P(),
        layer_E=P(),
        lattice=P(),
        io_idx=P(),              # I/O permutation: replicated
        io_fpos=P(),
        left_mask=P(),           # contact masks: replicated (vector-sized)
        right_mask=P(),
        interior_mask=P(),
        bp_left_mask=P(),
        bp_right_mask=P(),
        bp_interior_mask=P(),
        inner_mask=P(),
        real_mask=P(),
    )


def _replicated_state_specs() -> dict:
    return dict(
        element=P(), charge=P(), potential_boundary=P(),
        potential_charge=P(), CB_edge=P(), power=P(), temperature=P(),
        T_bg=P(), key=P(), kmc_time=P(), I_macro=P(), P_tot=P(),
        virtual_potentials=P(), step_count=P(), cvac_prev=P(), Vd_prev=P(),
        boundary_r=P(), boundary_b=P(),
        trans_elem_prev=P(), trans_charge_prev=P(), transport_Vd_prev=P(),
        tt_slot_atom=P(), tt_vm=P(), tt_vv=P(), tt_valid=P(),
    )


def shard_simulation(
    geom: Geometry, state: SimState, mesh: Mesh
) -> Tuple[Geometry, SimState]:
    """Place geometry and state on the mesh with the canonical shardings."""
    gspecs = _site_sharded_geometry_specs()
    geom_sharded = geom.replace(
        **{
            name: jax.device_put(
                getattr(geom, name), NamedSharding(mesh, spec)
            )
            for name, spec in gspecs.items()
        }
    )
    sspecs = _replicated_state_specs()
    state_sharded = state.replace(
        **{
            name: jax.device_put(
                getattr(state, name), NamedSharding(mesh, spec)
            )
            for name, spec in sspecs.items()
        }
    )
    return geom_sharded, state_sharded


def make_sharded_superstep(
    geom: Geometry, params: PhysParams, heat, mesh: Mesh
):
    """Jit the fused superstep over the mesh.

    Inputs arrive with the shardings set by :func:`shard_simulation`; the
    output state keeps the replicated layout so supersteps chain without
    resharding.  Returns ``superstep(state, Vd) -> (state, step_time,
    metrics)``.
    """
    # the exact same superstep body as the single-device path — only data
    # placement differs
    from ..superstep import superstep_impl

    jitted = jax.jit(superstep_impl)

    def superstep(state, Vd, cc=None):
        with mesh:
            return jitted(geom, params, heat, state, Vd, cc)

    return superstep


def solve_cb_edge_sharded(geom, params, state, Vd, mesh):
    from ..physics import potential as potential_mod

    f = jax.jit(potential_mod.solve_cb_edge)
    with mesh:
        return f(geom, params, state, Vd)
