"""Fully-distributed (halo-exchange) KMC superstep.

The replicated-vector sharding (sharding.py) keeps every per-site vector on
every device; this module is the memory-scalable path: sites are split into
contiguous x-slabs (one per device along the ``"sites"`` mesh axis), every
``[N]`` / ``[N, max_nn]`` array lives slab-sharded, and all cross-slab
neighbour reads go through fixed-width halo exchanges over ICI
(``jax.lax.ppermute``).  This is SURVEY.md §5.8 executed for the whole
superstep, not just the Laplace solve:

  * **charge update** — one halo exchange of the packed site flags;
  * **boundary potential** — distributed Jacobi-CG (halo matvec, psum dots),
    same stopping rule as ops.cg.cg_solve; the warm start makes the
    "conductance network unchanged" skip implicit (r0 ≈ 0 → 0 iterations);
  * **gridless Poisson** — per-shard charged-site compaction + all_gather of
    the (coords, charge) buckets, local [S, n_charged] pair sweep;
  * **KMC events** — the residence-time loop with *hierarchical distributed
    selection*: per-shard 128-row block sums are all-gathered (N/128 f64
    values), every shard computes the identical global cumsum + pick, the
    owner shard resolves (row, slot) and broadcasts the event via psum,
    every shard zeroes its conflicting pairs locally.  One all_gather + one
    psum per event — the reference pays ~10 PCIe round-trips per event
    (src/kmc_events.cu:210-349).

Arithmetic parity: rate rows, row sums and the selection hierarchy are
computed with the exact same primitives as the single-device incremental
engine (events.rates_from_pairs is shared), so a halo run is
trajectory-identical to the single-device run up to CG round-off
(equivalence-tested in tests/test_halo_superstep.py).

Requirements: graph bandwidth (max |i-j| over edges) <= halo width <= slab
size, and slab size a multiple of events._BLOCK so the block hierarchy
aligns with the single-device one.  x-sorted structures satisfy the
bandwidth condition (tools/sort_structure.py / build_geometry ordering).

There is no reference equivalent: the reference is single-process,
single-GPU (SURVEY.md §2.12).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import constants as C
from ..physics.events import (
    _BLOCK,
    NULL_EVENT,
    _event_type_from_elements,
    pack_site_code,
    rates_from_pairs,
)
from ..state import Geometry, PhysParams, SimState
from ..structure import Element
from .halo import compute_halo_width

_V = int(Element.VACANCY)
_OD = int(Element.OXYGEN_DEFECT)


# ----------------------------------------------------------------------------
# sharding-spec helpers
# ----------------------------------------------------------------------------

def site_axis_specs(tree, n_sites: int, axis: str = "sites"):
    """PartitionSpec pytree: leading-axis shard for arrays sized [N, ...],
    replicated otherwise."""
    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n_sites:
            return P(axis)
        return P()

    return jax.tree_util.tree_map(spec, tree)


def shard_halo_simulation(geom: Geometry, state: SimState, mesh: Mesh):
    """Place geometry/state with slab sharding of the site axis."""
    gspec = site_axis_specs(geom, geom.N)
    sspec = site_axis_specs(state, geom.N)
    put = lambda t, sp: jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)), t, sp
    )
    return put(geom, gspec), put(state, sspec)


# ----------------------------------------------------------------------------
# halo plumbing (per-shard, inside shard_map)
# ----------------------------------------------------------------------------

def _exchange_halo(x_local, halo: int, axis: str):
    """[S] -> [halo + S + halo]: left neighbour's tail | slab | right
    neighbour's head; edge shards get zeros in the out-of-domain halo."""
    n_sh = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    right_pairs = [(i, (i + 1) % n_sh) for i in range(n_sh)]
    left_pairs = [(i, (i - 1) % n_sh) for i in range(n_sh)]
    from_left = jax.lax.ppermute(x_local[-halo:], axis, right_pairs)
    from_right = jax.lax.ppermute(x_local[:halo], axis, left_pairs)
    zeros = jnp.zeros((halo,), x_local.dtype)
    left = jnp.where(idx > 0, from_left, zeros)
    right = jnp.where(idx < n_sh - 1, from_right, zeros)
    return jnp.concatenate([left, x_local, right])


class _Shard:
    """Per-shard context: local slab extent + neighbour-gather plumbing."""

    def __init__(self, neigh_idx_local, halo: int, axis: str):
        self.axis = axis
        self.H = halo
        self.S = neigh_idx_local.shape[0]
        self.idx = jax.lax.axis_index(axis)
        self.gstart = self.idx * self.S
        self.valid = neigh_idx_local >= 0
        # neighbour index into the [H + S + H] halo window
        loc = neigh_idx_local - (self.gstart - halo)
        self.win_safe = jnp.clip(loc, 0, self.S + 2 * halo - 1)
        self.rows_gid = self.gstart + jnp.arange(self.S, dtype=jnp.int32)

    def window(self, vec_local):
        return _exchange_halo(vec_local, self.H, self.axis)

    def gather(self, vec_local, fill=0):
        """Neighbour values for every (local row, slot) via one halo
        exchange + one window gather."""
        w = self.window(vec_local)
        g = w[self.win_safe]
        return jnp.where(self.valid, g, jnp.asarray(fill, g.dtype))

    def pdot(self, a, b):
        return jax.lax.psum(jnp.dot(a, b), self.axis)


# ----------------------------------------------------------------------------
# distributed Jacobi-CG Dirichlet Laplace (matches ops.cg.cg_solve semantics)
# ----------------------------------------------------------------------------

def _halo_dirichlet_laplace(
    sh: _Shard, edge_g, is_left, is_right, interior, x0,
    v_left, v_right, tol, maxiter,
):
    """Distributed equivalent of potential._dirichlet_laplace_solve +
    cg_solve (criterion "r", Jacobi preconditioner)."""
    dtype = edge_g.dtype
    diag = jnp.sum(edge_g, axis=1)

    nb_left = sh.gather(is_left.astype(dtype)) > 0.5
    nb_right = sh.gather(is_right.astype(dtype)) > 0.5
    nb_bv = jnp.where(
        nb_left, v_left, jnp.where(nb_right, v_right, 0.0)
    ).astype(dtype)
    b = jnp.where(interior, jnp.sum(edge_g * nb_bv, axis=1), 0.0)

    nb_int = sh.gather(interior.astype(dtype)) > 0.5
    neg_vals = jnp.where(nb_int, -edge_g, 0.0)

    def matvec(x):
        xm = jnp.where(interior, x, 0.0)
        xj = sh.gather(xm, fill=0.0)
        y = diag * xm + jnp.sum(neg_vals * xj, axis=1)
        return jnp.where(interior, y, 0.0)

    minv = jnp.where(interior & (diag != 0), 1.0 / diag, 1.0)
    x0m = jnp.where(interior, x0, 0.0)

    ref = jnp.sqrt(sh.pdot(b, b))
    thresh2 = (tol * jnp.where(ref > 0, ref, 1.0)) ** 2

    r0 = b - matvec(x0m)
    z0 = minv * r0
    rz0 = sh.pdot(r0, z0)

    def cond(c):
        _, r, _, _, it = c
        return (sh.pdot(r, r) > thresh2) & (it < maxiter)

    def body(c):
        x, r, p, rz, it = c
        ap = matvec(p)
        denom = sh.pdot(p, ap)
        alpha = jnp.where(denom != 0, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = minv * r
        rz_new = sh.pdot(r, z)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, _, _, _, iters = jax.lax.while_loop(
        cond, body, (x0m, r0, z0, rz0, jnp.asarray(0, jnp.int32))
    )
    phi = jnp.where(is_left, v_left, jnp.where(is_right, v_right, x))
    return phi.astype(dtype), iters


# ----------------------------------------------------------------------------
# the superstep body (runs per shard inside shard_map)
# ----------------------------------------------------------------------------

def _halo_superstep_body(
    geom: Geometry, params: PhysParams, state: SimState, Vd,
    halo: int, axis: str = "sites",
    heat=None, tstat=None, tsizes=None, cc=None,
) -> Tuple[SimState, jnp.ndarray, Dict]:
    sh = _Shard(geom.neigh_idx, halo, axis)
    metrics: Dict = {}
    dtype = params.dtype

    element = state.element
    charge = state.charge

    # ---- 1. charge update (physics/charge.py, halo-gathered) ----
    if params.solve_potential:
        flags = (
            (geom.metal_mask_table[element].astype(jnp.int32) << 1)
            | (element == _V).astype(jnp.int32)
        )
        nb_flags = sh.gather(flags)
        nb_is_vac = ((nb_flags & 1) > 0) & sh.valid
        nb_is_metal = ((nb_flags & 2) > 0) & sh.valid
        n_vac_nn = jnp.sum(nb_is_vac, axis=1, dtype=jnp.int32)
        has_metal_nn = jnp.any(nb_is_metal, axis=1)
        is_vac = element == _V
        is_od = element == _OD
        vac_neutral = has_metal_nn | (n_vac_nn >= 2)
        od_neutral = has_metal_nn
        charge = jnp.where(
            is_vac,
            jnp.where(vac_neutral, 0, 2),
            jnp.where(is_od, jnp.where(od_neutral, 0, -2), charge),
        ).astype(jnp.int32)
        pcount = lambda m: jax.lax.psum(
            jnp.sum(m).astype(jnp.int32), axis
        )
        metrics["Charged vacancies"] = pcount(is_vac & ~vac_neutral)
        metrics["Uncharged vacancies"] = pcount(is_vac & vac_neutral)
        metrics["Charged oxygen ions"] = pcount(is_od & ~od_neutral)
        metrics["Uncharged oxygen ions"] = pcount(is_od & od_neutral)

        # ---- 2. boundary potential ----
        # conductance: high_G iff (metal, metal) or (neutral-vacancy,
        # neutral-vacancy) pair (physics/potential._edge_conductance_boundary)
        cvac = is_vac & (charge == 0)
        f2 = (
            (geom.metal_mask_table[element].astype(jnp.int32) << 1)
            | cvac.astype(jnp.int32)
        )
        nb_f2 = sh.gather(f2)
        metal_i = (f2 >> 1)[:, None] > 0
        metal_j = (nb_f2 >> 1) > 0
        cvac_j = (nb_f2 & 1) > 0
        high = (metal_i & metal_j) | (cvac[:, None] & cvac_j)
        edge_g = jnp.where(high, params.high_G, params.low_G)
        edge_g = jnp.where(sh.valid, edge_g, 0.0).astype(dtype)

        vl = (-jnp.asarray(Vd, dtype) / 2.0)
        vr = (jnp.asarray(Vd, dtype) / 2.0)
        phi_b, it_b = _halo_dirichlet_laplace(
            sh, edge_g, geom.bp_left_mask, geom.bp_right_mask,
            geom.bp_interior_mask, state.potential_boundary,
            vl, vr, params.solver_tol, params.solver_maxiter,
        )
        metrics["cg_iters_boundary"] = it_b

        # ---- 3. gridless Poisson (compacted + all_gather) ----
        from ..ops.compact import nonzero_fixed

        cap = max(params.poisson_compact_cap, 1)
        cdtype = jnp.float32 if params.mixed else dtype
        cidx, n_charged_l = nonzero_fixed(charge != 0, cap, fill_value=0)
        slot_ok = jnp.arange(cap, dtype=jnp.int32) < n_charged_l
        c_coords = geom.coords[cidx].astype(cdtype)            # [cap, 3]
        c_q = jnp.where(slot_ok, charge[cidx], 0).astype(cdtype)
        c_gid = jnp.where(slot_ok, sh.gstart + cidx, -1)

        g_coords = jax.lax.all_gather(
            c_coords, axis, tiled=True
        )                                                       # [ndev*cap, 3]
        g_q = jax.lax.all_gather(c_q, axis, tiled=True)
        g_gid = jax.lax.all_gather(c_gid, axis, tiled=True)

        from ..physics.potential import _pairwise_dist

        lat = geom.lattice.astype(cdtype)
        inv_s = 1.0 / (params.sigma.astype(cdtype) * jnp.sqrt(2.0))
        dist = _pairwise_dist(
            geom.coords.astype(cdtype), g_coords, lat, geom.pbc
        ) * 1e-10                                               # [S, G] in m
        dead = (sh.rows_gid[:, None] == g_gid[None, :]) | (dist <= 0.0)
        dist = jnp.where(dead, 1.0, dist)
        from jax.scipy.special import erfc

        contrib = (
            g_q[None, :] * erfc(dist * inv_s)
            * params.k.astype(cdtype) * C.Q_C / dist
        )
        phi_c = jnp.sum(
            jnp.where(dead, 0.0, contrib), axis=1
        ).astype(dtype)
        n_charged = jax.lax.psum(n_charged_l.astype(jnp.int32), axis)
        metrics["n_charged_sites"] = n_charged
    else:
        phi_b = state.potential_boundary
        phi_c = state.potential_charge
        cvac = (element == _V) & (charge == 0)

    # ---- 4. KMC events (residence-time loop, distributed selection) ----
    step_time = jnp.asarray(0.0, dtype)
    n_events = jnp.asarray(0, jnp.int32)
    key = state.key
    if params.perturb_structure:
        element, charge, key, step_time, n_events = _halo_event_loop(
            sh, geom, params, element, charge, phi_b, phi_c,
            state.T_bg, key,
        )

    # ---- 5. transport + dissipated power (halo_transport.py) ----
    I_macro = state.I_macro
    P_tot = state.P_tot
    power = state.power
    vp = state.virtual_potentials
    T_bg = state.T_bg
    temperature = state.temperature
    if params.solve_current:
        from .halo_transport import halo_heat_local_cg, halo_transport_power

        vp, I_macro, atom_power, P_tot, m_t = halo_transport_power(
            sh, geom, params, tstat, tsizes,
            element, charge, state.CB_edge, vp, Vd,
            T_cc_loc=(cc or {}).get("cc"),
        )
        metrics.update(m_t)
        sa = tstat["site_atom"]                  # local [S]
        power = jnp.where(
            sa >= 0, atom_power[jnp.maximum(sa, 0)], 0.0
        ).astype(dtype)

        # ---- 6. heat (global model takes precedence, heat.py dispatch) ----
        if params.solve_heating_global:
            from ..physics.heat import global_ode

            T_new = global_ode(params, T_bg, P_tot, step_time)
            T_bg = T_new.astype(dtype)
            metrics["Global temperature [K]"] = T_new
        elif params.solve_heating_local and heat is not None \
                and heat.n_interface:
            temperature, T_bg, m_h = halo_heat_local_cg(
                sh, geom, params, heat, element, power, temperature,
                step_time,
            )
            metrics.update(m_h)

    new_state = state.replace(
        element=element,
        charge=charge,
        potential_boundary=phi_b,
        potential_charge=phi_c,
        cvac_prev=cvac,
        Vd_prev=jnp.asarray(Vd, dtype),
        key=key,
        kmc_time=state.kmc_time + step_time,
        power=power,
        I_macro=I_macro,
        P_tot=P_tot,
        virtual_potentials=vp,
        T_bg=T_bg,
        temperature=temperature,
    )
    metrics["n_events"] = n_events
    return new_state, step_time, metrics


def _halo_event_loop(
    sh: _Shard, geom: Geometry, params: PhysParams,
    element, charge, phi_b, phi_c, T_bg, key,
):
    """Residence-time loop with one all_gather (block sums) + one psum
    (event broadcast) per event.  Selection arithmetic mirrors
    events.execute_superstep_incremental bit-for-bit (same block size, same
    cumsum/searchsorted chain on the same values)."""
    axis = sh.axis
    S, m = geom.neigh_idx.shape
    assert S % _BLOCK == 0, "slab size must be a multiple of events._BLOCK"
    nb_l = S // _BLOCK

    rdtype = jnp.float32 if params.mixed else params.dtype
    acc = jnp.float64 if rdtype == jnp.float32 else rdtype

    phi = (phi_b + phi_c).astype(rdtype)

    def build_prob(element, charge, phi):
        code = pack_site_code(element, charge, geom.site_layer)
        if rdtype == jnp.float32:
            norm_code = code | jnp.int32(0x40000000)
            phi_w = sh.window(phi)
            code_w = sh.window(
                jax.lax.bitcast_convert_type(norm_code, jnp.float32)
            )
            packed = jnp.stack([phi_w, code_w], axis=1)  # [S+2H, 2]
            g = packed[sh.win_safe]
            phi_j = jnp.where(sh.valid, g[..., 0], 0.0)
            code_j = jnp.where(
                sh.valid,
                jax.lax.bitcast_convert_type(g[..., 1], jnp.int32)
                & jnp.int32(0xFFFF),
                0,
            )
        else:
            phi_j = sh.gather(phi, fill=0.0)
            code_j = sh.gather(code)
        return rates_from_pairs(
            params, geom.layer_E, T_bg,
            element, charge, phi, geom.site_layer,
            phi_j, code_j, geom.v2_pair, sh.valid,
        )

    prob0 = build_prob(element, charge, phi)
    row_sums0 = jnp.sum(prob0, axis=1, dtype=acc)
    block_sums0 = row_sums0.reshape(nb_l, _BLOCK).sum(axis=1)

    t_window = 1.0 / params.freq
    n_sh = jax.lax.psum(1, axis)
    n_blocks_g = nb_l * n_sh

    def cond(carry):
        _, _, _, _, _, _, event_time, count = carry
        return (event_time < t_window) & (
            count < params.max_events_per_superstep
        )

    def body(carry):
        prob, row_sums, block_sums, element, charge, key, _, count = carry
        key, k_sel, k_time = jax.random.split(key, 3)
        u = jax.random.uniform(k_sel, dtype=acc)

        # --- global hierarchical selection ---
        bs_all = jax.lax.all_gather(block_sums, axis, tiled=True)
        block_cum = jnp.cumsum(bs_all)
        psum = block_cum[-1]
        target = u * psum
        blk = jnp.minimum(
            jnp.searchsorted(block_cum, target, side="right").astype(jnp.int32),
            n_blocks_g - 1,
        )
        owner = blk // nb_l
        mine = owner == sh.idx
        base_b = jnp.where(blk > 0, block_cum[blk - 1], 0.0)
        lblk = jnp.clip(blk - sh.idx * nb_l, 0, nb_l - 1)
        rows_here = jax.lax.dynamic_slice(row_sums, (lblk * _BLOCK,), (_BLOCK,))
        row_cum = jnp.cumsum(rows_here)
        r_in = jnp.minimum(
            jnp.searchsorted(row_cum, target - base_b, side="right"
                             ).astype(jnp.int32),
            _BLOCK - 1,
        )
        r_l = jnp.minimum(lblk * _BLOCK + r_in, S - 1)
        base_r = jnp.where(r_in > 0, row_cum[r_in - 1], 0.0)
        slot_cum = jnp.cumsum(prob[r_l].astype(acc))
        s = jnp.minimum(
            jnp.searchsorted(slot_cum, target - base_b - base_r, side="right"
                             ).astype(jnp.int32),
            m - 1,
        )
        i_g = sh.gstart + r_l
        j_g = geom.neigh_idx[r_l, s]
        ok = (psum > 0) & (prob[r_l, s] > 0)

        # owner reads endpoint state from its halo window (j within halo of
        # its slab by the bandwidth condition), types the event, broadcasts
        elem_w = sh.window(element)
        chg_w = sh.window(charge)
        wi = jnp.clip(i_g - (sh.gstart - sh.H), 0, S + 2 * sh.H - 1)
        wj = jnp.clip(j_g - (sh.gstart - sh.H), 0, S + 2 * sh.H - 1)
        e_i, e_j = elem_w[wi], elem_w[wj]
        q_i, q_j = chg_w[wi], chg_w[wj]
        ev = _event_type_from_elements(e_i, e_j)
        ev = jnp.where(ok, ev, NULL_EVENT)

        msg = jnp.where(
            mine,
            jnp.stack([
                i_g, j_g, ev, e_i.astype(jnp.int32), e_j.astype(jnp.int32),
                q_i.astype(jnp.int32), q_j.astype(jnp.int32),
                ok.astype(jnp.int32),
            ]),
            jnp.zeros(8, jnp.int32),
        )
        msg = jax.lax.psum(msg, axis)
        i_g, j_g, ev = msg[0], msg[1], msg[2]
        e_i, e_j, q_i, q_j = msg[3], msg[4], msg[5], msg[6]
        valid = msg[7] > 0

        # --- event execution on owned slots (events._execute_event law) ---
        from ..physics.events import (
            VACANCY_GENERATION as GEN,
            VACANCY_RECOMBINATION as REC,
        )

        _D = int(Element.DEFECT)
        _O = int(Element.O)
        noop = ev == NULL_EVENT
        new_e_i = jnp.where(
            noop, e_i,
            jnp.where(ev == GEN, _OD, jnp.where(ev == REC, _D, e_j)),
        )
        new_e_j = jnp.where(
            noop, e_j,
            jnp.where(ev == GEN, _V, jnp.where(ev == REC, _O, e_i)),
        )
        new_q_i = jnp.where(
            noop, q_i, jnp.where(ev == GEN, -2, jnp.where(ev == REC, 0, q_j))
        )
        new_q_j = jnp.where(
            noop, q_j, jnp.where(ev == GEN, 2, jnp.where(ev == REC, 0, q_i))
        )

        def owned_set(vec, gidx, val):
            lidx = gidx - sh.gstart
            in_slab = (lidx >= 0) & (lidx < S)
            lsafe = jnp.clip(lidx, 0, S - 1)
            return vec.at[lsafe].set(
                jnp.where(in_slab, val.astype(vec.dtype), vec[lsafe])
            )

        element = owned_set(element, i_g, new_e_i)
        element = owned_set(element, j_g, new_e_j)
        charge = owned_set(charge, i_g, new_q_i)
        charge = owned_set(charge, j_g, new_q_j)

        # --- conflict zeroing (scan form over the local slab) ---
        conflict = (
            (sh.rows_gid[:, None] == i_g) | (sh.rows_gid[:, None] == j_g)
            | (geom.neigh_idx == i_g) | (geom.neigh_idx == j_g)
        )
        prob = jnp.where(valid & conflict, 0.0, prob)
        touched = jnp.any(conflict, axis=1)
        row_sums = jnp.where(
            valid & touched, jnp.sum(prob, axis=1, dtype=acc), row_sums
        )
        block_sums = row_sums.reshape(nb_l, _BLOCK).sum(axis=1)

        u_t = jax.random.uniform(k_time, dtype=rdtype)
        event_time = jnp.where(
            valid,
            -jnp.log(u_t).astype(params.dtype) / psum.astype(params.dtype),
            jnp.asarray(jnp.inf, params.dtype),
        )
        count = count + jnp.where(valid, 1, 0).astype(jnp.int32)
        return (prob, row_sums, block_sums, element, charge, key,
                event_time, count)

    init = (
        prob0, row_sums0, block_sums0, element, charge, key,
        jnp.asarray(0.0, params.dtype), jnp.asarray(0, jnp.int32),
    )
    (_, _, _, element, charge, key, event_time, count) = jax.lax.while_loop(
        cond, body, init
    )
    return element, charge, key, event_time.astype(params.dtype), count


# ----------------------------------------------------------------------------
# public entry
# ----------------------------------------------------------------------------

def make_halo_superstep(
    geom: Geometry, params: PhysParams, heat, mesh: Mesh, halo: int,
    axis: str = "sites", tstat=None, tspec=None, tsizes=None,
):
    """Build the jitted shard_map superstep for halo decomposition.

    Returns ``superstep(state, Vd, cc=None) -> (state, step_time, metrics)``
    — the same contract as engine.make_superstep.  With ``solve_current``
    the blocked transport operator runs row-sharded (halo_transport.py;
    ``tstat``/``tspec``/``tsizes`` from build_transport_static are
    required), ``cc`` optionally carries the per-bias-point sharded
    metal-block row cache (make_halo_cc_cache), and the heat phase runs
    distributed (global ODE on the psum'd power; local via the matrix-free
    CG model, which requires ``heat_solver='cg'``)."""
    if params.solve_current:
        if params.transport != "blocked":
            raise ValueError(
                "halo transport requires transport='blocked' (the dense "
                "X matrix cannot shard); set transport = blocked"
            )
        if tstat is None or tsizes is None:
            raise ValueError(
                "halo transport needs the static tables from "
                "halo_transport.build_transport_static"
            )
    if params.solve_heating_local and (heat is None or heat.method != "cg"):
        raise ValueError(
            "halo local heating requires the matrix-free model: set "
            "heat_solver = cg (the dense interface inverse cannot shard)"
        )
    ndev = int(np.prod(mesh.devices.shape))
    S = geom.N // ndev
    if geom.N % ndev:
        raise ValueError("site axis must divide the mesh size (pad_to)")
    if halo > S:
        raise ValueError(
            f"halo width {halo} exceeds slab size {S}: use fewer shards or "
            "a bandwidth-reducing site order"
        )
    if params.solve_potential and params.poisson_compact_cap <= 0:
        raise ValueError(
            "halo decomposition requires a positive poisson_compact_cap "
            "(the dense O(N^2) sweep is replaced by the compacted gather)"
        )

    gspec = site_axis_specs(geom, geom.N, axis)
    pspec = jax.tree_util.tree_map(lambda _: P(), params)
    hspec = site_axis_specs(heat, geom.N, axis)
    tspec = tspec if tstat is not None else {}
    tstat_in = tstat if tstat is not None else {}

    def body(geom_l, params_l, heat_l, ts_l, state_l, Vd, cc_l):
        return _halo_superstep_body(
            geom_l, params_l, state_l, Vd, halo, axis,
            heat=heat_l, tstat=ts_l, tsizes=tsizes, cc=cc_l,
        )

    metrics_template = {"n_events": P()}
    if params.solve_potential:
        metrics_template.update({
            "Charged vacancies": P(), "Uncharged vacancies": P(),
            "Charged oxygen ions": P(), "Uncharged oxygen ions": P(),
            "cg_iters_boundary": P(), "n_charged_sites": P(),
        })
    if params.solve_current:
        metrics_template.update({
            "n_vac_atoms": P(), "Current [uA]": P(), "Conductance [uS]": P(),
            "cg_iters_power": P(), "transport_converged": P(),
            "contact_potential_drop": P(), "tunnel_int_steps_needed": P(),
        })
        if params.solve_heating_global or params.solve_heating_local:
            metrics_template["Total dissipated power [mW]"] = P()
            metrics_template["Global temperature [K]"] = P()

    cache = {}

    def superstep(state: SimState, Vd, cc=None):
        key = cc is not None
        if key not in cache:
            sspec = site_axis_specs(state, geom.N, axis)
            ccspec = {"cc": P(axis)} if cc is not None else {}
            cache[key] = jax.jit(shard_map(
                body,
                mesh=mesh,
                in_specs=(gspec, pspec, hspec, tspec, sspec, P(), ccspec),
                out_specs=(sspec, P(), metrics_template),
                check_vma=False,
            ))
        return cache[key](
            geom, params, heat, tstat_in, state, Vd, cc if cc else {}
        )

    return superstep


def make_halo_cc_cache(
    geom: Geometry, params: PhysParams, mesh: Mesh,
    tstat, tspec, tsizes, axis: str = "sites",
):
    """Per-bias-point metal-block cache for the halo transport: the sharded
    analogue of current.assemble_transport_cache — each device keeps its
    [Smp, n_mp_pad] row chunk of the metal_p x metal_p tunnel block (valid
    within a bias point: CB edges are constant).  Returns
    ``fn(params, state) -> sharded rows`` for ``cc={"cc": rows}``."""
    from .halo_transport import halo_cc_rows

    gspec = site_axis_specs(geom, geom.N, axis)

    cache = {}

    def build(params, state):
        if "fn" not in cache:
            pspec = jax.tree_util.tree_map(lambda _: P(), params)

            def body(geom_l, params_l, ts_l, element, charge, cb):
                return halo_cc_rows(
                    geom_l, params_l, ts_l, tsizes, element, charge, cb,
                    axis,
                )

            cache["fn"] = jax.jit(shard_map(
                body,
                mesh=mesh,
                in_specs=(gspec, pspec, tspec, P(axis), P(axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            ))
        return cache["fn"](
            geom, params, tstat, state.element, state.charge, state.CB_edge
        )

    return build


def required_halo(geom_or_neigh) -> int:
    """Graph bandwidth of the (global) neighbour list."""
    nb = geom_or_neigh.neigh_idx if hasattr(geom_or_neigh, "neigh_idx") \
        else geom_or_neigh
    return compute_halo_width(np.asarray(nb))
