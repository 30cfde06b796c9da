"""KMC event engine: rate table + rejection-free residence-time superstep.

Four event types over (site i, neighbour j) pairs (reference:
KMCProcess::update_events_and_rates, src/KMCProcess.cpp:67-164; GPU
build_event_list, src/kmc_events.cu:34-126), with rate
``P = freq * exp(-EA / (kB * T_bg))``, ``EA = E_zero_field - E - Ekin``
(Ekin hard-zeroed as in the reference):

  0 VACANCY_GENERATION    (d, O):   E = 2*(phi_i - phi_j),           barrier E_gen_0[layer_j]
  1 VACANCY_RECOMBINATION (Od, V):  E = cs*(dphi + (cs/2)*v2),       barrier E_rec_1[layer_j]
  2 VACANCY_DIFFUSION     (V, O):   E = (qi-qj)*(dphi + qi*v1),      barrier E_diff_2[layer_i]
  3 ION_DIFFUSION         (Od, d):  E = (qi-qj)*(dphi - 2*v1),       barrier E_diff_3[layer_j]

where phi = potential_boundary + potential_charge, v_k = screened-Coulomb
self-interaction v_solve(r, k) (precomputed per pair in Geometry.v2_pair),
and cs = q_i - q_j.

Superstep semantics (reference: KMCProcess::executeKMCStep,
src/KMCProcess.cpp:259-373) reproduced exactly:
  * the rate table is built ONCE per superstep;
  * the residence-time loop repeatedly: cumsums rates -> draws u*Psum ->
    upper_bound -> executes the event -> zeroes every pair whose row site or
    neighbour site is i or j -> redraws event_time = -ln(u)/Psum from the
    *shrunken* Psum; the loop ends when event_time >= 1/freq and that final
    draw is the returned step_time.

TPU design: the whole loop is one ``lax.while_loop`` on device — no
host round-trips (the reference GPU path pays ~10 PCIe copies per event,
src/kmc_events.cu:210-349).  Event selection is hierarchical by default:
per-site rate sums -> cumsum over N -> pick row -> cumsum over max_nn ->
pick slot, which runs two short cumsums instead of one N*max_nn scan
(``selection="flat"`` gives the literal flat scan).  Selection is
identical in exact arithmetic; floating-point event choices may differ from
the flat scan on ties, which is statistically irrelevant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..state import Geometry, PhysParams, SimState
from ..structure import Element

# event type codes (reference: src/utils.h:53-60)
VACANCY_GENERATION = 0
VACANCY_RECOMBINATION = 1
VACANCY_DIFFUSION = 2
ION_DIFFUSION = 3
NULL_EVENT = 4

_D = int(Element.DEFECT)
_OD = int(Element.OXYGEN_DEFECT)
_V = int(Element.VACANCY)
_O = int(Element.O)


def pack_site_code(elem, charge, site_layer):
    """Pack (element, charge, layer) into one int32 per site so the
    neighbour side of the rate table costs ONE row gather instead of four
    element gathers (TPU gathers dominate this kernel's cost)."""
    return (
        (elem << 8)
        | ((charge + 8) << 4)
        | site_layer
    ).astype(jnp.int32)


def rates_from_pairs(
    params: PhysParams,
    layer_E,        # [n_layers, 4]
    T_bg,
    row_elem,       # [R]       source-site element
    row_charge,     # [R]
    row_phi,        # [R]
    row_layer,      # [R]
    phi_j,          # [R, m]    gathered neighbour potential
    code_j,         # [R, m]    gathered neighbour pack_site_code (low 16 bits)
    v1,             # [R, m]    v_solve(r, 1) per pair
    neigh_valid,    # [R, m]
):
    """The four-event-type Arrhenius rate law on pre-gathered pair data.

    Shared verbatim by the single-device table build and the halo-exchange
    sharded build so their arithmetic is identical (each shard computes its
    row block of exactly this)."""
    dtype = phi_j.dtype
    e_j = code_j >> 8
    q_j = (((code_j >> 4) & 15) - 8).astype(dtype)
    lay_j = code_j & 15

    e_i = row_elem[:, None]
    q_i = row_charge.astype(dtype)[:, None]
    dphi = row_phi[:, None] - phi_j

    # per-pair screened self-interaction for unit charge 1 / charge 2
    v1 = v1.astype(dtype)       # v_solve(r, 1); multiply by charge as needed
    v2 = v1 * 2.0               # v_solve(r, 2)

    lay_i = row_layer[:, None]
    layer_E = layer_E.astype(dtype)

    def _table(col, lay):
        # tiny-table lookup as an unrolled select chain (faster than a
        # 5.7M-element gather on TPU)
        out = layer_E[0, col] * jnp.ones_like(lay, dtype=dtype)
        for k in range(1, layer_E.shape[0]):
            out = jnp.where(lay == k, layer_E[k, col], out)
        return out

    E_gen_j = _table(0, lay_j)
    E_rec_j = _table(1, lay_j)
    E_diff_i = _table(2, lay_i)
    E_diff_j = _table(3, lay_j)

    # 0: generation (d, O)
    m_gen = (e_i == _D) & (e_j == _O)
    E_gen = 2.0 * dphi
    EA_gen = E_gen_j - E_gen

    # 1: recombination (Od, V); cs/2 uses C-truncation (charges are even)
    m_rec = (e_i == _OD) & (e_j == _V)
    cs = q_i - q_j
    E_rec = cs * (dphi + jnp.trunc(cs / 2.0) * v2)
    EA_rec = E_rec_j - E_rec

    # 2: vacancy diffusion (V, O); self-interaction only if charged
    m_vdf = (e_i == _V) & (e_j == _O)
    self_v = jnp.where(q_i != 0, q_i * v1, 0.0)
    E_vdf = (q_i - q_j) * (dphi + self_v)
    EA_vdf = E_diff_i - E_vdf

    # 3: ion diffusion (Od, d)
    m_idf = (e_i == _OD) & (e_j == _D)
    self_i = jnp.where(q_i != 0, v2, 0.0)
    E_idf = (q_i - q_j) * (dphi - self_i)
    EA_idf = E_diff_j - E_idf

    EA = jnp.where(
        m_gen, EA_gen,
        jnp.where(m_rec, EA_rec, jnp.where(m_vdf, EA_vdf, EA_idf)),
    )
    any_event = (m_gen | m_rec | m_vdf | m_idf) & neigh_valid

    kT = (C.KB_EV * T_bg).astype(dtype)
    # Clamp the Arrhenius exponent: strongly-downhill events (negative
    # barriers, e.g. charged-pair recombination with E_rec_1 = 0) reach
    # exp(+70)+ and would overflow f32 (and eventually f64) — they fire
    # "instantly" either way, so capping cannot change the trajectory
    # statistics, only keep Psum finite.  (The f64 reference relies on
    # exp(700) headroom for the same situation.)
    exp_cap = 80.0 if dtype == jnp.float32 else 600.0
    # rate cap chosen so that summing every pair cannot overflow the dtype:
    # N*max_nn ~ 1e7 pairs * P_cap must stay finite
    p_cap = 1e30 if dtype == jnp.float32 else 1e290
    P = params.freq.astype(dtype) * jnp.exp(jnp.minimum(-EA / kT, exp_cap))
    P = jnp.minimum(P, p_cap)
    return jnp.where(any_event, P, 0.0).astype(dtype)


def build_rate_table(
    geom: Geometry, params: PhysParams, state: SimState, active_idx=None
) -> jnp.ndarray:
    """Rates for every (site, neighbour-slot) pair -> [N, max_nn]
    (or [cap, max_nn] when ``active_idx`` restricts to candidate source
    rows — only sites in {DEFECT, OXYGEN_DEFECT, VACANCY} can source an
    event, so the compaction is exact).

    In mixed-precision mode the table is computed in f32: each rate is an
    independent exponential (relative error ~1e-7, far below KMC sampling
    noise), and f64 exp is software-emulated on TPU."""
    dtype = jnp.float32 if params.mixed else params.dtype
    elem = state.element
    phi = (state.potential_boundary + state.potential_charge).astype(dtype)

    code = pack_site_code(elem, state.charge, geom.site_layer)

    if active_idx is not None:
        neigh_idx = geom.neigh_idx[active_idx]       # [cap, max_nn]
        neigh_valid = geom.neigh_valid[active_idx]
        v_pair = geom.v2_pair[active_idx]
        row_elem = elem[active_idx]
        row_charge = state.charge[active_idx]
        row_phi = phi[active_idx]
        row_layer = geom.site_layer[active_idx]
    else:
        neigh_idx = geom.neigh_idx
        neigh_valid = geom.neigh_valid
        v_pair = geom.v2_pair
        row_elem = elem
        row_charge = state.charge
        row_phi = phi
        row_layer = geom.site_layer

    safe = jnp.maximum(neigh_idx, 0)
    if (
        dtype == jnp.float32
        and getattr(geom, "gather_page", None) is not None
    ):
        # page-shuffle window gather (ops/ell_gather_pallas.py): measured
        # 14.7 -> 4.8 ms at crossbar scale.  Packed codes are < 2^16, so a
        # value round-trip through the f32 kernel is lossless; the kernel
        # gathers the full-N table (its plan is static geometry), then the
        # active-row subset is one contiguous-row gather.
        from ..ops.ell_gather_pallas import ell_gather_pallas, plan_from_geom
        from ..ops.pairwise_pallas import on_tpu_default_device

        phi_j, code_f = ell_gather_pallas(
            plan_from_geom(geom), [phi, code.astype(jnp.float32)],
            interpret=not on_tpu_default_device(),
        )
        code_j = code_f.astype(jnp.int32)
        if active_idx is not None:
            phi_j = phi_j[active_idx]
            code_j = code_j[active_idx]
    elif dtype == jnp.float32:
        # Bit-or 0x40000000 so the bitcast lane is a NORMAL float (~2.0):
        # raw small ints are denormal bit patterns and TPU flushes denormals
        # to zero even through data movement.
        norm_code = code | jnp.int32(0x40000000)
        packed = jnp.stack(
            [phi, jax.lax.bitcast_convert_type(norm_code, jnp.float32)],
            axis=1,
        )                                 # [N, 2]
        g = packed[safe]                  # [N, max_nn, 2] — one gather
        phi_j = g[..., 0]
        code_j = (
            jax.lax.bitcast_convert_type(g[..., 1], jnp.int32)
            & jnp.int32(0xFFFF)
        )
    else:
        phi_j = phi[safe]
        code_j = code[safe]

    return rates_from_pairs(
        params, geom.layer_E, state.T_bg,
        row_elem, row_charge, row_phi, row_layer,
        phi_j, code_j, v_pair, neigh_valid,
    )


def _event_type_from_elements(e_i, e_j):
    """Re-derive the event type of a selected pair from current elements.
    Valid because conflict-zeroing guarantees a selectable pair's endpoints
    are unchanged since the rate build."""
    return jnp.where(
        (e_i == _D) & (e_j == _O), VACANCY_GENERATION,
        jnp.where(
            (e_i == _OD) & (e_j == _V), VACANCY_RECOMBINATION,
            jnp.where(
                (e_i == _V) & (e_j == _O), VACANCY_DIFFUSION,
                jnp.where((e_i == _OD) & (e_j == _D), ION_DIFFUSION, NULL_EVENT),
            ),
        ),
    )


def _execute_event(element, charge, i, j, ev):
    """Apply the two-site state mutation for event ``ev``
    (reference: KMCProcess::execute_event, src/KMCProcess.cpp:187-256)."""
    e_i, e_j = element[i], element[j]
    q_i, q_j = charge[i], charge[j]

    # generation: d -> Od(-2), O -> V(+2)
    # recombination: Od -> d(0), V -> O(0)
    # diffusion (both kinds): swap elements and charges
    is_noop = ev == NULL_EVENT
    new_e_i = jnp.where(
        is_noop, e_i,
        jnp.where(
            ev == VACANCY_GENERATION, _OD,
            jnp.where(ev == VACANCY_RECOMBINATION, _D, e_j),
        ),
    )
    new_e_j = jnp.where(
        is_noop, e_j,
        jnp.where(
            ev == VACANCY_GENERATION, _V,
            jnp.where(ev == VACANCY_RECOMBINATION, _O, e_i),
        ),
    )
    new_q_i = jnp.where(
        is_noop, q_i,
        jnp.where(
            ev == VACANCY_GENERATION, -2,
            jnp.where(ev == VACANCY_RECOMBINATION, 0, q_j),
        ),
    )
    new_q_j = jnp.where(
        is_noop, q_j,
        jnp.where(
            ev == VACANCY_GENERATION, 2,
            jnp.where(ev == VACANCY_RECOMBINATION, 0, q_i),
        ),
    )
    element = element.at[i].set(new_e_i.astype(element.dtype))
    element = element.at[j].set(new_e_j.astype(element.dtype))
    charge = charge.at[i].set(new_q_i.astype(charge.dtype))
    charge = charge.at[j].set(new_q_j.astype(charge.dtype))
    return element, charge


class SuperstepResult(NamedTuple):
    state: "SimState"
    step_time: jnp.ndarray
    n_events: jnp.ndarray
    n_active: jnp.ndarray = jnp.asarray(0, jnp.int32)


def _select_flat(prob, u):
    """Literal flat cumsum + upper_bound (reference semantics)."""
    flat = prob.reshape(-1)
    cum = jnp.cumsum(flat)
    psum = cum[-1]
    target = u * psum
    idx = jnp.searchsorted(cum, target, side="right").astype(jnp.int32)
    idx = jnp.minimum(idx, flat.shape[0] - 1)
    return psum, idx


def _select_two_level(prob, u):
    """Hierarchical selection: row sums -> row -> slot.

    The short (length-N) accumulations run in f64 even when the rate table
    is f32: with clamped rates at up to ~1e38 a f32 running sum can
    overflow/denormalise across millions of entries."""
    n, m = prob.shape
    acc = jnp.float64 if prob.dtype == jnp.float32 else prob.dtype
    row_sums = jnp.sum(prob, axis=1, dtype=acc)
    row_cum = jnp.cumsum(row_sums)
    psum = row_cum[-1]
    target = u.astype(acc) * psum
    row = jnp.searchsorted(row_cum, target, side="right").astype(jnp.int32)
    row = jnp.minimum(row, n - 1)
    base = jnp.where(row > 0, row_cum[row - 1], 0.0)
    inner = target - base
    slot_cum = jnp.cumsum(prob[row].astype(acc))
    slot = jnp.searchsorted(slot_cum, inner, side="right").astype(jnp.int32)
    slot = jnp.minimum(slot, m - 1)
    return psum, row * m + slot


def execute_superstep(
    geom: Geometry, params: PhysParams, state: SimState
) -> SuperstepResult:
    """One KMC superstep (dispatch on params.event_mode)."""
    if params.event_mode == "incremental":
        return execute_superstep_incremental(geom, params, state)
    return execute_superstep_scan(geom, params, state)


def execute_superstep_scan(
    geom: Geometry, params: PhysParams, state: SimState
) -> SuperstepResult:
    """One KMC superstep: build rates once, then select/execute/zero in an
    on-device residence-time loop until the drawn event time exceeds
    1/freq.  Literal formulation: every iteration rescans the full
    [N, max_nn] table (the reference's approach, Thrust scan + memsets,
    src/kmc_events.cu:210-349)."""
    prob0 = build_rate_table(geom, params, state)
    n, m = prob0.shape
    t_window = 1.0 / params.freq
    select = _select_flat if params.selection == "flat" else _select_two_level

    def cond(carry):
        _, _, _, _, event_time, count = carry
        return (event_time < t_window) & (count < params.max_events_per_superstep)

    def body(carry):
        prob, element, charge, key, _, count = carry
        key, k_sel, k_time = jax.random.split(key, 3)
        u_sel = jax.random.uniform(k_sel, dtype=prob.dtype)
        psum, idx = select(prob, u_sel)
        idx = idx.astype(jnp.int32)

        i = idx // m
        j = geom.neigh_idx.reshape(-1)[idx]
        ev = _event_type_from_elements(element[i], element[j])

        # degenerate guards: nothing can fire when psum == 0; a selected
        # zero-rate slot signals numerical inconsistency (e.g. overflow) —
        # terminate the superstep rather than spinning on no-ops
        valid = (psum > 0) & (prob.reshape(-1)[idx] > 0)
        ev = jnp.where(valid, ev, NULL_EVENT)
        element, charge = _execute_event(element, charge, i, j, ev)

        # conflict zeroing: any pair whose row or neighbour is i or j
        # (reference: src/KMCProcess.cpp:327-352)
        rows = jnp.arange(n, dtype=jnp.int32)[:, None]
        nb = geom.neigh_idx
        conflict = (rows == i) | (rows == j) | (nb == i) | (nb == j)
        prob = jnp.where(valid & conflict, 0.0, prob)

        u_t = jax.random.uniform(k_time, dtype=prob.dtype)
        event_time = jnp.where(
            valid,
            -jnp.log(u_t).astype(params.dtype) / psum.astype(params.dtype),
            jnp.asarray(jnp.inf, params.dtype),
        )
        count = count + jnp.where(valid, 1, 0).astype(jnp.int32)
        return (prob, element, charge, key, event_time, count)

    init = (
        prob0,
        state.element,
        state.charge,
        state.key,
        jnp.asarray(0.0, params.dtype),
        jnp.asarray(0, jnp.int32),
    )
    prob, element, charge, key, event_time, count = jax.lax.while_loop(
        cond, body, init
    )

    event_time = event_time.astype(params.dtype)
    new_state = state.replace(
        element=element,
        charge=charge,
        key=key,
        kmc_time=state.kmc_time + event_time,
    )
    return SuperstepResult(state=new_state, step_time=event_time, n_events=count)


# ----------------------------------------------------------------------------
# incremental residence-time loop
# ----------------------------------------------------------------------------

_BLOCK = 128  # rows per block in the hierarchical rate sum


def execute_superstep_incremental(
    geom: Geometry, params: PhysParams, state: SimState
) -> SuperstepResult:
    """Semantically identical to :func:`execute_superstep_scan`, but each
    event costs O(max_nn + N/BLOCK) instead of O(N * max_nn):

      * a three-level sum hierarchy (block sums -> row sums -> slots) is
        maintained *incrementally* — executing an event only invalidates the
        rows of i and j plus one reverse-edge slot per neighbour
        (geom.rev_slot), so the sums are updated by gather/scatter of
        O(max_nn) values;
      * selection walks the hierarchy: cumsum over N/BLOCK block sums, then
        over BLOCK rows, then over max_nn slots.

    The selection distribution is identical to the flat cumsum in exact
    arithmetic.  Sums are kept in f64 (tiny arrays) so incremental drift is
    negligible over a superstep; they are rebuilt from scratch every
    superstep anyway.

    With ``params.active_rows_cap > 0`` the table is row-compacted to
    candidate source sites (elements in {d, Od, V} — the only possible event
    sources), which is exact as long as the active count fits the cap (the
    returned ``n_active`` lets the driver grow the bucket).
    """
    N = geom.N
    m = geom.max_nn
    cap = params.active_rows_cap

    if cap > 0:
        elem = state.element
        active = (
            (elem == _D) | (elem == _OD) | (elem == _V)
        )
        from ..ops.compact import nonzero_fixed

        aidx, n_active = nonzero_fixed(active, cap, fill_value=0)
        slot_ok = jnp.arange(cap, dtype=jnp.int32) < n_active
        # site -> compact row (-1 if not active / fill)
        inv = jnp.full(N + 1, -1, dtype=jnp.int32)
        inv = inv.at[jnp.where(slot_ok, aidx, N)].set(
            jnp.arange(cap, dtype=jnp.int32)
        )[:N]
        prob0 = build_rate_table(geom, params, state, active_idx=aidx)
        prob0 = jnp.where(slot_ok[:, None], prob0, 0.0)
        row_nb = geom.neigh_idx[aidx]          # [cap, m]
        n_rows = cap
    else:
        aidx = jnp.arange(N, dtype=jnp.int32)
        inv = aidx
        n_active = jnp.asarray(N, jnp.int32)
        prob0 = build_rate_table(geom, params, state)
        row_nb = geom.neigh_idx
        n_rows = N

    nb_pad = (-n_rows) % _BLOCK
    n_blocks = (n_rows + nb_pad) // _BLOCK
    acc = jnp.float64 if prob0.dtype == jnp.float32 else prob0.dtype

    row_sums0 = jnp.sum(prob0, axis=1, dtype=acc)
    row_sums0 = jnp.pad(row_sums0, (0, nb_pad))
    block_sums0 = row_sums0.reshape(n_blocks, _BLOCK).sum(axis=1)

    t_window = 1.0 / params.freq

    def cond(carry):
        _, _, _, _, _, _, event_time, count = carry
        return (event_time < t_window) & (count < params.max_events_per_superstep)

    def body(carry):
        prob, row_sums, block_sums, element, charge, key, _, count = carry
        key, k_sel, k_time = jax.random.split(key, 3)
        u = jax.random.uniform(k_sel, dtype=acc)

        # --- hierarchical selection (over compact rows) ---
        block_cum = jnp.cumsum(block_sums)
        psum = block_cum[-1]
        target = u * psum
        blk = jnp.minimum(
            jnp.searchsorted(block_cum, target, side="right").astype(jnp.int32),
            n_blocks - 1,
        )
        base_b = jnp.where(blk > 0, block_cum[blk - 1], 0.0)
        rows_here = jax.lax.dynamic_slice(row_sums, (blk * _BLOCK,), (_BLOCK,))
        row_cum = jnp.cumsum(rows_here)
        r_in = jnp.minimum(
            jnp.searchsorted(row_cum, target - base_b, side="right").astype(jnp.int32),
            _BLOCK - 1,
        )
        r = jnp.minimum(blk * _BLOCK + r_in, n_rows - 1)
        i = aidx[r]
        base_r = jnp.where(r_in > 0, row_cum[r_in - 1], 0.0)
        slot_cum = jnp.cumsum(prob[r].astype(acc))
        s = jnp.minimum(
            jnp.searchsorted(slot_cum, target - base_b - base_r, side="right"
                             ).astype(jnp.int32),
            m - 1,
        )
        j = geom.neigh_idx[i, s]

        valid = (psum > 0) & (prob[r, s] > 0)
        ev = _event_type_from_elements(element[i], element[j])
        ev = jnp.where(valid, ev, NULL_EVENT)
        element, charge = _execute_event(element, charge, i, j, ev)

        # --- incremental conflict zeroing ---
        # entries to kill: full rows of i and j (if active), plus the
        # reverse-edge slot of i (and j) in every neighbouring active row
        # (reference semantics: src/KMCProcess.cpp:327-352).  Invalid/fill
        # slots are redirected into row r, which is fully zeroed afterwards,
        # so scatter collisions cannot resurrect values.
        rj_row = inv[jnp.maximum(j, 0)]
        rj_row = jnp.where((j >= 0) & (rj_row >= 0), rj_row, r)

        def rev_targets(site):
            nbrs = geom.neigh_idx[site]          # [m] sites whose rows hold `site`
            slots = geom.rev_slot[site]          # [m] slot of `site` there
            crow = inv[jnp.maximum(nbrs, 0)]
            rvalid = (nbrs >= 0) & (slots >= 0) & (crow >= 0)
            rows = jnp.where(rvalid, crow, r).astype(jnp.int32)
            cols = jnp.where(rvalid, slots, 0).astype(jnp.int32)
            return rows, cols

        ri_, ci = rev_targets(i)
        rj_, cj = rev_targets(j)

        # zero the probability entries (order matters: rows r / rj wipe
        # last, covering any fill-slot writes redirected there)
        prob = prob.at[ri_, ci].set(jnp.where(valid, 0.0, prob[ri_, ci]))
        prob = prob.at[rj_, cj].set(jnp.where(valid, 0.0, prob[rj_, cj]))
        prob = prob.at[r, :].set(jnp.where(valid, 0.0, prob[r, :]))
        prob = prob.at[rj_row, :].set(jnp.where(valid, 0.0, prob[rj_row, :]))

        # Recompute the touched rows' sums EXACTLY from the zeroed table
        # (<= 2m+2 rows of m entries — trivial).  Delta-subtraction would be
        # cheaper but suffers catastrophic cancellation: removing an exp(+70)
        # "instant" rate leaves ulp-scale noise that dwarfs the surviving
        # small rates and corrupts the residence-time clock.
        rows_touched = jnp.concatenate(
            [ri_, rj_, jnp.stack([r, rj_row]).astype(jnp.int32)]
        )
        new_rvals = jnp.sum(prob[rows_touched].astype(acc), axis=1)
        row_sums = jnp.where(
            valid, row_sums.at[rows_touched].set(new_rvals), row_sums
        )

        # and the touched blocks' sums exactly from row_sums.  Duplicate
        # block ids are fine: every duplicate writes the identical
        # recomputed value (no jnp.unique — its u32 sort/scan triggers an
        # XLA scoped-vmem compiler bug under lax.scan).
        ub = rows_touched // _BLOCK
        new_bvals = row_sums.reshape(n_blocks, _BLOCK)[ub].sum(axis=1)
        block_sums = jnp.where(
            valid, block_sums.at[ub].set(new_bvals), block_sums
        )

        u_t = jax.random.uniform(k_time, dtype=prob.dtype)
        event_time = jnp.where(
            valid,
            -jnp.log(u_t).astype(params.dtype) / psum.astype(params.dtype),
            jnp.asarray(jnp.inf, params.dtype),
        )
        count = count + jnp.where(valid, 1, 0).astype(jnp.int32)
        return (prob, row_sums, block_sums, element, charge, key, event_time, count)

    init = (
        prob0,
        row_sums0,
        block_sums0,
        state.element,
        state.charge,
        state.key,
        jnp.asarray(0.0, params.dtype),
        jnp.asarray(0, jnp.int32),
    )
    (prob, _, _, element, charge, key, event_time, count) = jax.lax.while_loop(
        cond, body, init
    )

    event_time = event_time.astype(params.dtype)
    new_state = state.replace(
        element=element,
        charge=charge,
        key=key,
        kmc_time=state.kmc_time + event_time,
    )
    return SuperstepResult(
        state=new_state, step_time=event_time, n_events=count,
        n_active=n_active,
    )
