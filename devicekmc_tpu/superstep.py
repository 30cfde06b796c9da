"""The fused KMC superstep body (shared by the single-device and sharded
paths).  Phase order mirrors the reference main loop (src/kmc_main.cpp:175-234):
charge -> boundary potential -> gridless Poisson -> KMC events -> transport/
power -> heat."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from .physics import charge as charge_mod
from .physics import current as current_mod
from .physics import events as events_mod
from .physics import heat as heat_mod
from .physics import potential as potential_mod
from .state import Geometry, PhysParams, SimState


def superstep_impl(
    geom: Geometry, params: PhysParams, heat, state: SimState, Vd
) -> Tuple[SimState, jnp.ndarray, Dict]:
    metrics: Dict = {}
    if params.solve_potential:
        state, m = charge_mod.update_charge(geom, state)
        metrics.update(m)
        state, m = potential_mod.solve_boundary_potential(geom, params, state, Vd)
        metrics.update(m)
        if params.poisson_compact_cap > 0:
            state, n_charged = potential_mod.poisson_gridless_compact(
                geom, params, state, cap=params.poisson_compact_cap
            )
            metrics["n_charged_sites"] = n_charged
        else:
            state = potential_mod.poisson_gridless(geom, params, state)

    step_time = jnp.asarray(0.0, params.dtype)
    if params.perturb_structure:
        res = events_mod.execute_superstep(geom, params, state)
        state, step_time = res.state, res.step_time
        metrics["n_events"] = res.n_events
        metrics["n_active_rows"] = res.n_active

    if params.solve_current:
        state, m = current_mod.update_power(geom, params, state, Vd)
        metrics.update(m)
        if params.solve_heating_global or params.solve_heating_local:
            state, m = heat_mod.update_temperature(
                geom, params, heat, state, step_time
            )
            metrics.update(m)

    return state, step_time, metrics
