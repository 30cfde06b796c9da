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
    geom: Geometry, params: PhysParams, heat, state: SimState, Vd, cc=None
) -> Tuple[SimState, jnp.ndarray, Dict]:
    """``cc``: optional per-bias-point metal-block cache for the blocked
    transport operator (current.assemble_cc_block)."""
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
        # allow_skip: the exact unchanged-network fast path applies only
        # here, where events may have left X identical to the last solve;
        # cold pre-solves call update_power directly and always solve
        state, m = current_mod.update_power(
            geom, params, state, Vd, cc=cc, allow_skip=True
        )
        metrics.update(m)
        if params.solve_heating_global or params.solve_heating_local:
            state, m = heat_mod.update_temperature(
                geom, params, heat, state, step_time
            )
            metrics.update(m)

    return state, step_time, metrics


def multi_superstep_impl(
    geom: Geometry, params: PhysParams, heat, state: SimState, Vd,
    Icc_A, t_end, n_steps: int, cc=None, limit=None,
):
    """Run up to ``n_steps`` supersteps in ONE device dispatch.

    The driver-side loop conditions move on-device: the batch stops early
    (turns into no-ops) once the KMC clock passes ``t_end`` or the
    compliance current ``Icc_A`` trips — mirroring the reference main-loop
    exit conditions (src/kmc_main.cpp:175, 260-267).  Batching amortizes
    host-device dispatch latency (which on some transports dominates the
    sub-millisecond superstep) and removes per-step host round-trips, at
    the cost of logging granularity: metrics come back stacked [n_steps]
    with an ``active`` mask.

    ``limit``: optional traced int — only the first ``limit`` steps of the
    batch run (the rest become no-ops).  The driver uses this to stop a
    batch exactly at a snapshot boundary without recompiling for every
    remainder, so snapshot steps can run through the per-step path with
    the reference's mid-superstep element/potential pairing.
    """
    import jax

    def body(carry, step_idx):
        st, done = carry
        if limit is not None:
            done = done | (step_idx >= limit)
        new_st, step_time, metrics = superstep_impl(
            geom, params, heat, st, Vd, cc=cc
        )
        sel = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, b, a), new, old
        )
        st_out = sel(new_st, st)
        step_time = jnp.where(done, 0.0, step_time)
        metrics = {k: v for k, v in metrics.items()}
        metrics["active"] = ~done
        done_next = done | (st_out.kmc_time >= t_end) | (st_out.I_macro > Icc_A)
        return (st_out, done_next), (step_time, metrics)

    (final_state, done), (step_times, metrics_stacked) = jax.lax.scan(
        body, (state, jnp.asarray(False)),
        jnp.arange(n_steps, dtype=jnp.int32),
    )
    return final_state, step_times, metrics_stacked
