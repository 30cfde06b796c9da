"""Charge-state update rule.

A vacancy carries +2 unless it has >= 2 vacancy neighbours or any metal
neighbour; an oxygen ion carries -2 unless it has a metal neighbour; all
other sites keep their charge (always 0 in practice).  Reference:
Device::updateCharge (src/potential_solver.cpp:142-229) and update_charge_gpu
(src/potential_solver_gpu.cu:10-63).

The reference walks each site's adjacency list with early-exit breaks; the
conditions are ORs, so the vectorised neighbour-count formulation below is
exactly equivalent.  One fused gather pass over the ELL graph, one thread of
work per (site, slot) pair — no atomics, no list walking.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..state import Geometry, SimState
from ..structure import Element

NN_COND = 2  # vacancy neighbour count that neutralises a vacancy


def update_charge(geom: Geometry, state: SimState) -> Tuple[SimState, Dict]:
    elem = state.element
    safe = jnp.maximum(geom.neigh_idx, 0)
    valid = geom.neigh_valid

    # single per-site flag word (is_metal << 1 | is_vacancy) -> one gather
    # instead of two (TPU gathers dominate this kernel's cost)
    flags = (
        (geom.metal_mask_table[elem].astype(jnp.int32) << 1)
        | (elem == int(Element.VACANCY)).astype(jnp.int32)
    )
    if getattr(geom, "gather_page", None) is not None:
        # page-shuffle window gather (ops/ell_gather_pallas.py): measured
        # 39.8 -> 3.0 ms at crossbar scale.  flags in {0..3} are exact in
        # f32, so a value round-trip through the f32 kernel is lossless.
        from ..ops.ell_gather_pallas import ell_gather_pallas, plan_from_geom
        from ..ops.pairwise_pallas import on_tpu_default_device

        nb_flags = ell_gather_pallas(
            plan_from_geom(geom), [flags.astype(jnp.float32)],
            interpret=not on_tpu_default_device(),
        )[0].astype(jnp.int32)
    else:
        nb_flags = flags[safe]
    nb_is_vac = ((nb_flags & 1) > 0) & valid
    nb_is_metal = ((nb_flags & 2) > 0) & valid

    n_vac_nn = jnp.sum(nb_is_vac, axis=1, dtype=jnp.int32)
    has_metal_nn = jnp.any(nb_is_metal, axis=1)

    is_vac = elem == int(Element.VACANCY)
    is_od = elem == int(Element.OXYGEN_DEFECT)

    vac_neutral = has_metal_nn | (n_vac_nn >= NN_COND)
    od_neutral = has_metal_nn

    charge = jnp.where(
        is_vac,
        jnp.where(vac_neutral, 0, 2),
        jnp.where(is_od, jnp.where(od_neutral, 0, -2), state.charge),
    ).astype(jnp.int32)

    metrics = {
        "Charged vacancies": jnp.sum(is_vac & ~vac_neutral).astype(jnp.int32),
        "Uncharged vacancies": jnp.sum(is_vac & vac_neutral).astype(jnp.int32),
        "Charged oxygen ions": jnp.sum(is_od & ~od_neutral).astype(jnp.int32),
        "Uncharged oxygen ions": jnp.sum(is_od & od_neutral).astype(jnp.int32),
    }
    return state.replace(charge=charge), metrics
