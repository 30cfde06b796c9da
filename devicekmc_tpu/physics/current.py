"""Charge-transport (current + dissipated power) solver.

Builds the transmission/conductance matrix X over the *atom* sub-graph plus
two virtual nodes (ground/extraction = node 0, source/injection = node 1),
solves for virtual potentials, extracts the macroscopic current and the
site-resolved dissipated power.  Reference: Device::updatePower
(src/current_solver.cpp:4-385) and update_power_gpu_sparse
(src/current_solver_gpu.cu:854-1136).

Matrix entries (atoms i, j at indices i+2, j+2):
  * neighbour pairs (dist < nn_dist): -high_G for metal-metal or neutral
    vacancy pairs, else -low_G;
  * non-neighbour pairs that are trap<->trap, contact<->trap or
    contact<->contact with |dE_CB| > tol: -T(WKB), with a trapezoidal
    (low-field) or triangular (high-field) barrier, and an energy-window
    integration for contact->trap (src/current_solver.cpp:99-154);
  * node 1 -- first ``num_source_inj`` atoms and node 0 -- atoms with index
    > N_atom - num_ground_ext at -high_G' (note: the reference's strict
    comparison attaches one atom fewer than num_ground_ext to ground —
    reproduced faithfully);
  * node 0 -- node 1 at -loop_G;
  * diagonal = negated row-sum of off-diagonals.

The linear system is the Nsub = N_atom+1 leading principal block (the last
atom is the ground reference), solved with Jacobi-preconditioned CG warm
started from the previous superstep's virtual potentials (the reference
keeps the same persistent warm start, src/gpu_buffers.h:137-138), or with a
dense direct solve for small systems / oracle tests.

TPU design: the atom set is static (see structure.NON_ATOM_ELEMENTS), so all
shapes are fixed.  The matrix is materialised densely and the CG matvec is a
single MXU matmul per iteration; the WKB energy-window integration is a
bounded fori_loop with masking (static trip count, no data-dependent
shapes).  For structures beyond ~20k atoms a blocked/matrix-free operator
takes over (see ops/pairwise; planned: x-window banding, since T decays
exponentially with distance).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops.cg import cg_solve
from ..state import Geometry, PhysParams, SimState
from ..structure import Element

#: conductance-quantum prefactor: G = G0 * T_ij
#: (reference: src/current_solver.cpp:13, G0 = 2 * 3.8612e-5 * 1e-5)
G0 = 2.0 * 3.8612e-5 * 1e-5

#: relative-residual threshold above which a refinement round engages the
#: A-DEF2 deflation; 0.0 = always on.  Crossbar measurement (the rel0
#: metric): deflation HELPS the tiny-residual re-solves (rel0 ~ 2e-8 when
#: a vacancy disappears and the potential redistributes globally/smoothly:
#: 213 -> 115 iters) and mildly hurts the larger-residual local solves
#: (rel0 ~ 3e-4 when a vacancy appears: 10 -> 30 iters) — i.e. hardness is
#: NOT monotone in rel0, so no threshold beats always-on; the gate is kept
#: as tunable observability machinery.
DEFLATION_GATE_REL = 0.0

#: energy spacing of the contact->trap integration [V]
#: (src/current_solver.cpp:111)
DV_INT = 0.01

#: static cap on energy-window integration steps; steps beyond the actual
#: window are masked out.  ceil(max |CB drop| [eV] / DV_INT) must fit.
#: (default of params.tunnel_int_steps — configurable per run)
MAX_TUNNEL_STEPS = 1024

#: row-chunking threshold (elements) for tunnel-block assembly; blocks
#: bigger than this are built with lax.map over row chunks
TUNNEL_CHUNK_ELEMS = 1 << 25

#: transport_cc="auto": largest stored metal_p tunnel block [bytes f32].
#: Below this the stored block's streamed MXU matvec is faster than the
#: on-the-fly kernel (~3-6 ms vs 11 ms at the 24,768-metal crossbar);
#: above it the block cannot be materialised and the fly kernel is the
#: only single-chip option (50 GB at ~112k metal atoms / 500k sites).
CC_STORED_MAX_BYTES = 3 << 30


def resolve_transport_cc(mode: str, n_mp: int, f32_entries: bool) -> str:
    """Resolve transport_cc='auto' to 'stored' or 'fly' (see
    CC_STORED_MAX_BYTES).  ``f32_entries``: pairwise dtype is f32 (mixed or
    f32 precision) — the fly kernel is an f32 VPU pipeline, so pure-f64
    runs always store."""
    if mode != "auto":
        return mode
    if not f32_entries:
        return "stored"
    return "stored" if n_mp * n_mp * 4 <= CC_STORED_MAX_BYTES else "fly"


def _pairwise_dist_atoms(coords, lattice, pbc: bool):
    d = coords[:, None, :] - coords[None, :, :]
    if pbc:
        dy = d[..., 1] - jnp.round(d[..., 1] / lattice[1]) * lattice[1]
        dz = d[..., 2] - jnp.round(d[..., 2] / lattice[2]) * lattice[2]
        d = jnp.stack([d[..., 0], dy, dz], axis=-1)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def assemble_X(geom: Geometry, params: PhysParams, state: SimState, Vd):
    """Dense X matrix [N_atom+2, N_atom+2] (symmetric, diagonal folded).

    In mixed-precision mode the pairwise assembly (distances, WKB
    exponentials) runs in f32 — every entry is an independent elementwise
    computation with ~1e-7 relative error, and all magnitudes involved
    (1e-30..1e30) sit inside the f32 normal range; sub-1e-38 transmissions
    flush to zero, which is physically nothing against low_G = 1e-8.  The
    matrix itself is cast to f64 for the CG solve."""
    dtype = params.dtype
    cdtype = jnp.float32 if params.mixed else params.dtype
    ai = geom.atom_ind
    Na = geom.N_atom
    apos = geom.coords[ai].astype(cdtype)
    aelem = state.element[ai]
    acharge = state.charge[ai]
    acb = state.CB_edge[ai].astype(cdtype)       # [J]

    high_G = params.high_G * 1e5                 # src/current_solver.cpp:9
    low_G = params.low_G
    loop_G = params.high_G * 1e7                 # src/current_solver.cpp:8
    tol = C.Q_C * 0.01                           # [J]

    idx = jnp.arange(Na, dtype=jnp.int32)
    eye = idx[:, None] == idx[None, :]
    dist = _pairwise_dist_atoms(apos, geom.lattice.astype(cdtype), geom.pbc)
    neighbor = (dist < params.nn_dist.astype(cdtype)) & ~eye

    metal = geom.metal_mask_table[aelem]
    anyvac = aelem == int(Element.VACANCY)
    cvac = anyvac & (acharge == 0)

    # --- neighbour conductances ---
    hi_pair = (metal[:, None] & metal[None, :]) | (cvac[:, None] & cvac[None, :])
    G_nb = jnp.where(hi_pair, high_G, low_G).astype(cdtype)

    # --- tunnelling ---
    nlc, nsi, nge = params.num_layers_contact, params.num_source_inj, params.num_ground_ext
    metal_p = metal & (idx > (nlc - 1) * nsi) & (idx < Na - (nlc - 1) * nge)
    t2t = anyvac[:, None] & anyvac[None, :]
    c2t = (anyvac[:, None] & metal_p[None, :]) | (anyvac[None, :] & metal_p[:, None])
    c2c = metal_p[:, None] & metal_p[None, :]

    dE = acb[:, None] - acb[None, :]             # [J]
    abs_dE = jnp.abs(dE)
    eligible = (t2t | c2t | c2c) & (abs_dE > jnp.asarray(tol, cdtype)) \
        & ~neighbor & ~eye
    safe_abs_dE = jnp.where(eligible, abs_dE, 1.0)

    prefac = (-(jnp.sqrt(2.0 * params.m_e) / C.H_BAR) * (2.0 / 3.0)).astype(cdtype)
    dist_m = dist * 1e-10
    s = prefac * dist_m / safe_abs_dE            # common exponent scale
    qV0 = (C.Q_C * params.V0).astype(cdtype)     # [J]

    # single-shot barrier (trap<->trap, contact<->contact)
    E1 = qV0
    E2 = E1 - abs_dE
    T_single = jnp.where(
        E2 > 0,
        jnp.exp(s * (E1 ** 1.5 - jnp.where(E2 > 0, E2, 0.0) ** 1.5)),
        jnp.where(E2 < 0, jnp.exp(s * E1 ** 1.5), 0.0),
    )

    # contact->trap: integrate over the occupied energy window
    # (the only O(pairs * MAX_TUNNEL_STEPS) computation).
    dE_step = jnp.asarray(C.Q_C * DV_INT, cdtype)

    def _integrate(s_, abs_dE_):
        def int_body(kk, acc):
            iv = kk * dE_step
            e1 = qV0 + iv
            e2 = e1 - abs_dE_
            term = jnp.where(
                e2 > 0,
                jnp.exp(s_ * (e1 ** 1.5 - jnp.where(e2 > 0, e2, 0.0) ** 1.5)),
                jnp.where(e2 < 0, jnp.exp(s_ * e1 ** 1.5), 0.0),
            )
            return acc + jnp.where(iv < abs_dE_, term, 0.0)

        return jax.lax.fori_loop(
            0, params.tunnel_int_steps, int_body, jnp.zeros_like(s_)
        )

    vcap = params.tunnel_vac_cap
    if vcap > 0 and geom.atom_metalp_idx.shape[0] > 0:
        # Compacted: c2t pairs live on (vacancy x interior-metal) only.
        # metal_p is static (events never touch metals, atom_metalp_idx);
        # vacancies are compacted into a driver-grown bucket.  Exact while
        # n_vac <= vcap (n_vac_atoms metric lets the driver redo on
        # overflow).  Cuts the integral from Na^2 to n_vac*n_mp pairs.
        from ..ops.compact import nonzero_fixed

        mp = geom.atom_metalp_idx                     # [n_mp]
        vidx, n_vac_c = nonzero_fixed(anyvac, vcap, fill_value=0)
        v_ok = jnp.arange(vcap, dtype=jnp.int32) < n_vac_c
        s_cv = s[vidx][:, mp]                          # [vcap, n_mp]
        abs_cv = abs_dE[vidx][:, mp]
        elig_cv = eligible[vidx][:, mp] & v_ok[:, None]
        T_cv = jnp.where(elig_cv, _integrate(s_cv, abs_cv), 0.0)

        T = T_single                                   # t2t / c2c
        X_atoms = jnp.where(
            neighbor, -G_nb, jnp.where(eligible & ~c2t, -T, 0.0)
        ).astype(dtype)
        # scatter the compact c2t entries symmetrically; fill slots carry 0
        # and eligibility masking keeps neighbour entries untouched
        upd = jnp.where(elig_cv, -T_cv, 0.0).astype(dtype)
        keep_vm = jnp.where(
            elig_cv, 0.0, X_atoms[vidx][:, mp]
        ).astype(dtype)
        X_atoms = X_atoms.at[vidx[:, None], mp[None, :]].set(keep_vm + upd)
        X_atoms = X_atoms.at[mp[None, :], vidx[:, None]].set(keep_vm + upd)
    else:
        T_c2t = _integrate(s, abs_dE)
        T = jnp.where(c2t, T_c2t, T_single)
        X_atoms = jnp.where(
            neighbor, -G_nb, jnp.where(eligible, -T, 0.0)
        ).astype(dtype)

    # --- assemble the full (Na+2) x (Na+2) matrix ---
    Nf = Na + 2
    X = jnp.zeros((Nf, Nf), dtype=dtype)
    X = X.at[2:, 2:].set(X_atoms)

    src_mask = idx < nsi
    # NOTE strict ">": reproduces the reference's off-by-one at
    # src/current_solver.cpp:187 (one fewer ground-extraction atom).
    gnd_mask = idx > (Na - nge)
    src_row = jnp.where(src_mask, -high_G, 0.0).astype(dtype)
    gnd_row = jnp.where(gnd_mask, -high_G, 0.0).astype(dtype)
    X = X.at[1, 2:].set(src_row)
    X = X.at[2:, 1].set(src_row)
    X = X.at[0, 2:].set(gnd_row)
    X = X.at[2:, 0].set(gnd_row)
    X = X.at[0, 1].set(-loop_G)
    X = X.at[1, 0].set(-loop_G)

    # diagonal = negated off-diagonal row sums over the FULL matrix
    diag = -jnp.sum(X, axis=1)
    X = X + jnp.diag(diag)
    return X, loop_G


# ----------------------------------------------------------------------------
# blocked / matrix-free transport (crossbar scale)
# ----------------------------------------------------------------------------
#
# The reference's own comment (src/current_solver_gpu.cu:32) observes that X
# "separates into a sparse neighbor matrix and a dense tunnel matrix" — and
# the tunnel-eligible pairs involve ONLY vacancies and interior-metal atoms
# (t2t, c2t, c2c; src/current_solver.cpp:86-99).  So instead of the dense
# [N_atom+2]^2 matrix (45 GB f64 at the 75k-atom reference crossbar), the
# operator splits into
#
#   * an ELL neighbour-conductance part over the static atom graph
#     (geom.atom_neigh_idx, O(N_atom * max_nn)),
#   * three dense tunnel blocks over the active subset:
#       - metal_p x metal_p  (c2c, single-shot WKB)    [static atom set]
#       - vac     x metal_p  (c2t, energy-window int.) [compacted bucket]
#       - vac     x vac      (t2t, single-shot WKB)
#   * the two virtual-node rows and the exact f64 diagonal.
#
# Every CG matvec is then a few MXU matmuls over the blocks plus one ELL
# gather — O(N_atom*max_nn + (n_mp + vcap)^2) memory and FLOPs, which fits
# the full reference crossbar on a single chip.  Entries are assembled in
# f32 in mixed mode (same accuracy contract as the dense-mixed path:
# matrix entries carry ~1e-7 relative error; the solve refines in f64).


def _dist_blocks(pa, pb, lattice, pbc: bool):
    """Pairwise distances between two point sets with y/z minimum image."""
    d = pa[:, None, :] - pb[None, :, :]
    if pbc:
        dy = d[..., 1] - jnp.round(d[..., 1] / lattice[1]) * lattice[1]
        dz = d[..., 2] - jnp.round(d[..., 2] / lattice[2]) * lattice[2]
        d = jnp.stack([d[..., 0], dy, dz], axis=-1)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


# --- WKB tunnelling physics, shared by the single-device blocked operator
# --- and the halo-distributed one (parallel/halo_transport.py) -------------

def wkb_env(geom: Geometry, params: PhysParams) -> dict:
    """Scalars of the WKB transmission model in the pairwise working dtype
    (f32 in mixed mode — same accuracy contract as assemble_X's docstring).
    Reference: src/current_solver.cpp:99-154."""
    cdtype = jnp.float32 if params.mixed else params.dtype
    return dict(
        cdtype=cdtype,
        prefac=(-(jnp.sqrt(2.0 * params.m_e) / C.H_BAR) * (2.0 / 3.0)).astype(cdtype),
        qV0=(C.Q_C * params.V0).astype(cdtype),
        dE_step=jnp.asarray(C.Q_C * DV_INT, cdtype),
        ctol=jnp.asarray(C.Q_C * 0.01, cdtype),
        nn=params.nn_dist.astype(cdtype),
        lattice=geom.lattice.astype(cdtype),
        pbc=geom.pbc,
        n_int_steps=params.tunnel_int_steps,
    )


def wkb_single_T(env, s, abs_dE):
    """Single-shot trapezoidal/triangular barrier (trap<->trap,
    contact<->contact; src/current_solver.cpp:135-154)."""
    E1 = env["qV0"]
    E2 = E1 - abs_dE
    return jnp.where(
        E2 > 0,
        jnp.exp(s * (E1 ** 1.5 - jnp.where(E2 > 0, E2, 0.0) ** 1.5)),
        jnp.where(E2 < 0, jnp.exp(s * E1 ** 1.5), 0.0),
    )


def wkb_window_T(env, s, abs_dE):
    """contact->trap occupied-energy-window integration
    (src/current_solver.cpp:99-134).  Trip count is static
    (params.tunnel_int_steps); exactness requires >= ceil(max |dE| /
    dE_step) — emitted as a metric for the driver."""
    qV0, dE_step = env["qV0"], env["dE_step"]

    def int_body(kk, acc):
        iv = kk * dE_step
        e1 = qV0 + iv
        e2 = e1 - abs_dE
        term = jnp.where(
            e2 > 0,
            jnp.exp(s * (e1 ** 1.5 - jnp.where(e2 > 0, e2, 0.0) ** 1.5)),
            jnp.where(e2 < 0, jnp.exp(s * e1 ** 1.5), 0.0),
        )
        return acc + jnp.where(iv < abs_dE, term, 0.0)

    return jax.lax.fori_loop(
        0, env["n_int_steps"], int_body, jnp.zeros_like(s)
    )


def tunnel_block(env, pa, cba, oka, pb, cbb, okb, kernel):
    """Negated tunnel-transmission block between two point sets (rows a,
    cols b), chunked over rows when big so elementwise intermediates stay
    bounded (~128 MB).  ``kernel``: wkb_single_T or wkb_window_T."""
    cdtype, prefac, nn = env["cdtype"], env["prefac"], env["nn"]
    ctol, lattice, pbc = env["ctol"], env["lattice"], env["pbc"]
    C_cols = pb.shape[0]

    def rows(pa_c, cba_c, oka_c):
        dist = _dist_blocks(pa_c, pb, lattice, pbc)
        abs_dE = jnp.abs(cba_c[:, None] - cbb[None, :])
        # dist(i,i)=0 < nn_dist, so self-pairs are excluded by ~neighbour
        elig = (
            oka_c[:, None] & okb[None, :] & (abs_dE > ctol) & ~(dist < nn)
        )
        safe_abs = jnp.where(elig, abs_dE, 1.0)
        s = prefac * (dist * 1e-10) / safe_abs
        return jnp.where(elig, -kernel(env, s, safe_abs), 0.0).astype(cdtype)

    R = pa.shape[0]
    if R * C_cols <= TUNNEL_CHUNK_ELEMS:
        return rows(pa, cba, oka)
    # chunk big blocks over rows so elementwise intermediates stay
    # bounded (~128 MB) instead of several copies of a multi-GB block
    chunk = max(8, (TUNNEL_CHUNK_ELEMS // C_cols) // 8 * 8)
    pad = (-R) % chunk
    pa_p = jnp.pad(pa, ((0, pad), (0, 0)))
    cba_p = jnp.pad(cba, (0, pad))
    oka_p = jnp.pad(oka, (0, pad))        # pad rows: ok=False -> zeros
    n_ch = (R + pad) // chunk
    out = jax.lax.map(
        lambda i: rows(
            jax.lax.dynamic_slice(pa_p, (i * chunk, jnp.int32(0)), (chunk, 3)),
            jax.lax.dynamic_slice(cba_p, (i * chunk,), (chunk,)),
            jax.lax.dynamic_slice(oka_p, (i * chunk,), (chunk,)),
        ),
        jnp.arange(n_ch, dtype=jnp.int32),
    )
    return out.reshape(-1, C_cols)[:R]


#: transport_incremental="auto": largest persistent (T_vm + T_vv) footprint
#: [bytes] for which the blocks are kept in SimState.  Above this the
#: per-step state residency (2x transiently, no donation) outweighs the
#: assembly saving — at such scales the solve itself costs seconds and the
#: ~85 ms assembly floor is no longer the bottleneck.
TT_INCR_MAX_BYTES = 512 << 20


def resolve_transport_incremental(
    mode: str, params: PhysParams, n_mp: int
) -> bool:
    """Resolve config transport_incremental ('auto'|'on'|'off') to a bool
    once the final tunnel_vac_cap and n_mp are known (see
    state.attach_tunnel_state)."""
    if mode == "off":
        return False
    vcap = params.tunnel_vac_cap
    eligible = (
        params.solve_current and params.transport == "blocked"
        and vcap > 0 and n_mp > 0
    )
    if not eligible:
        if mode == "on":
            raise ValueError(
                "transport_incremental='on' requires solve_current with "
                "transport='blocked' and tunnel_vac_cap > 0"
            )
        return False
    if mode == "on":
        return True
    itemsize = 4 if (params.mixed or params.dtype == jnp.float32) else 8
    return vcap * (n_mp + vcap) * itemsize <= TT_INCR_MAX_BYTES


def _vm_block(env, vpos, vcb, v_ok, mpos, mcb, params, BR: int = None):
    """The vacancy x metal_p window-integral block through the configured
    kernel (params.tunnel_vm_kernel).  Shared by the full and incremental
    assembly paths so their per-entry values are bit-identical."""
    if getattr(params, "tunnel_vm_kernel", "jnp") == "pallas":
        from ..ops.pairwise_pallas import on_tpu_default_device
        from ..ops.wkb_pallas import wkb_window_block

        kw = {} if BR is None else {"BR": BR}
        return wkb_window_block(
            vpos, vcb, v_ok, mpos, mcb, env,
            interpret=not on_tpu_default_device(), **kw
        ).astype(env["cdtype"])
    ones_m = jnp.ones(mpos.shape[0], dtype=bool)
    return tunnel_block(env, vpos, vcb, v_ok, mpos, mcb, ones_m,
                        wkb_window_T)


def _incremental_vacancy_blocks(
    geom, params, state, vidx, v_ok, vpos, vcb, apos, acb, mpos, mcb, env,
):
    """Persistent-tunnel-block update (params.transport_incremental).

    Row content of T_vm/T_vv depends only on (atom identity, the
    bias-start CB edge): the ascending vacancy bucket is reproduced
    exactly, rows for atoms already present in the previous bucket are
    GATHERED from the stored blocks through the atom -> old-slot map, and
    only atoms that ENTERED the bucket since the last solve (<= 1 per KMC
    event; charge flips change nothing here) are recomputed — through the
    same kernels the full assembly uses, so the assembled blocks are
    BIT-IDENTICAL to the from-scratch path (same entries, same ascending
    layout, same downstream summation order).  More than
    transport_delta_cap new atoms (or an invalid store: first solve of a
    bias point, cap growth, resume) falls back to the full re-assembly —
    exact either way.

    Returns (T_vm, T_vv, slot_atom_new).
    """
    from ..ops.compact import nonzero_fixed

    vcap = params.tunnel_vac_cap
    ccap = params.transport_delta_cap
    Na = geom.N_atom
    cdtype = env["cdtype"]
    slot_atom_new = jnp.where(v_ok, vidx, -1)

    prev = state.tt_slot_atom                      # [vcap] atom ids, -1 free
    amap = jnp.full(Na, -1, dtype=jnp.int32).at[
        jnp.where(prev >= 0, prev, Na)
    ].set(jnp.arange(vcap, dtype=jnp.int32), mode="drop")
    src_slot = jnp.where(v_ok, amap[vidx], -1)
    have = v_ok & (src_slot >= 0) & state.tt_valid
    need = v_ok & ~have
    need_idx, n_need = nonzero_fixed(need, ccap, fill_value=0)
    use_partial = state.tt_valid & (n_need <= ccap)

    BRp = max(8, -(-ccap // 8) * 8)

    def partial(_):
        t_live = (
            jnp.arange(ccap, dtype=jnp.int32) < jnp.minimum(n_need, ccap)
        )
        atoms_t = jnp.where(t_live, vidx[need_idx], 0)
        pos_t = apos[atoms_t]
        cb_t = acb[atoms_t]
        rows_vm = _vm_block(env, pos_t, cb_t, t_live, mpos, mcb, params,
                            BR=BRp)
        rows_vv = tunnel_block(
            env, pos_t, cb_t, t_live, vpos, vcb, v_ok, wkb_single_T
        )
        sg = jnp.clip(src_slot, 0, max(vcap - 1, 0))
        vm = jnp.where(
            have[:, None], state.tt_vm[sg], jnp.asarray(0.0, cdtype)
        )
        vv = jnp.where(
            have[:, None] & have[None, :],
            state.tt_vv[sg][:, sg], jnp.asarray(0.0, cdtype),
        )
        scat = jnp.where(t_live, need_idx, vcap)
        vm = vm.at[scat].set(rows_vm, mode="drop")
        vv = vv.at[scat].set(rows_vv, mode="drop")
        # symmetric column write; (need x need) entries are written twice
        # with bit-equal values (dist/|dE| are exactly symmetric)
        vv = vv.at[:, scat].set(rows_vv.T, mode="drop")
        return vm, vv

    def full(_):
        vm = _vm_block(env, vpos, vcb, v_ok, mpos, mcb, params)
        vv = tunnel_block(env, vpos, vcb, v_ok, vpos, vcb, v_ok,
                          wkb_single_T)
        return vm, vv

    T_vm, T_vv = jax.lax.cond(use_partial, partial, full, None)
    return T_vm, T_vv, slot_atom_new


def assemble_cc_block(geom: Geometry, params: PhysParams, state: SimState):
    """The metal_p x metal_p (c2c) tunnel block alone.

    Within a bias point the CB edges — and therefore this (largest) block —
    are constant: the driver assembles it once per bias point and passes it
    to the superstep as ``cc``, instead of recomputing ~n_mp^2 WKB
    exponentials every superstep.  Under ``transport_cc='fly'`` there is
    nothing to cache (entries are re-derived in-kernel) — returns None."""
    if getattr(params, "transport_cc", "stored") == "fly":
        return None
    blk = assemble_X_blocks(geom, params, state, _cc_only=True)
    return blk["T_cc"]


def assemble_transport_cache(geom: Geometry, params: PhysParams, state: SimState):
    """Per-bias-point cache for the blocked transport solver: the
    metal_p x metal_p tunnel block (see assemble_cc_block).  The deflation
    operators of ``transport_precond == 'deflated'`` are NOT cached here —
    they are rebuilt per superstep from the current operator (a handful of
    [Nsub x K] matmuls riding the block reads the matvec pays anyway),
    because deflation quality degrades with a stale basis while a stale
    ``cc`` block is exact within a bias point."""
    return {"cc": assemble_cc_block(geom, params, state)}


def _coarse_restriction(geom: Geometry, params: PhysParams):
    """0/1 aggregation matrix R [K_tot, Nsub] over the atoms of the
    grounded subsystem — the deflation basis of the A-DEF2 transport
    preconditioner.  Aggregates are ``coarse_slabs`` x-slabs, optionally
    refined ``coarse_yz``-ways in each transverse direction (K_tot =
    slabs * yz^2): the crossbar's slow modes vary along y/z (parallel
    word/bit lines), which x-slab-only vectors cannot represent — the
    round-5 fix for the ~90-iteration globally-smooth charge-flip
    re-solves.  The two virtual nodes belong to NO aggregate (their index
    maps to a zero one-hot row): their loop_G~1e15 rows would put
    kappa(E) near 1e20, beyond any floating inverse — measured to corrupt
    warm starts when they were included — while Jacobi already handles
    them perfectly."""
    K = params.coarse_slabs
    Q = max(1, getattr(params, "coarse_yz", 1))
    Na = geom.N_atom
    apos = geom.coords[geom.atom_ind][: Na - 1].astype(params.dtype)

    def bins(c, nb):
        lo, hi = jnp.min(c), jnp.max(c)
        return jnp.clip(
            ((c - lo) / jnp.maximum(hi - lo, 1e-30) * nb).astype(jnp.int32),
            0, nb - 1,
        )

    slab = bins(apos[:, 0], K)
    agg = slab
    K_tot = K
    if Q > 1:
        agg = (slab * Q + bins(apos[:, 1], Q)) * Q + bins(apos[:, 2], Q)
        K_tot = K * Q * Q
    agg = jnp.concatenate(
        [jnp.asarray([K_tot, K_tot], dtype=jnp.int32), agg]
    )
    return jax.nn.one_hot(agg, K_tot, dtype=params.dtype).T


# _cholesky_small / _cholesky_solve_identity / _invert_coarse moved to
# ops.cg (shared by the transport and boundary-Laplace deflation);
# re-exported here for compatibility
from ..ops.cg import (                                    # noqa: E402
    _cholesky_small, _cholesky_solve_identity, invert_coarse as _invert_coarse,
)


def assemble_X_blocks(
    geom: Geometry, params: PhysParams, state: SimState,
    cc=None, _cc_only: bool = False, band=None,
):
    """Assemble the blocked transport operator (see module comment above).

    Returns a dict with all pieces needed by :func:`_apply_X_blocks`:
    negated off-diagonal values (matching the dense convention) and the
    exact f64 diagonal.  ``cc``: optional precomputed metal_p x metal_p
    block from :func:`assemble_cc_block` (valid within one bias point).
    """
    dtype = params.dtype
    cdtype = jnp.float32 if params.mixed else params.dtype
    ai = geom.atom_ind
    Na = geom.N_atom
    apos = geom.coords[ai].astype(cdtype)
    aelem = state.element[ai]
    acharge = state.charge[ai]
    acb = state.CB_edge[ai].astype(cdtype)
    lattice = geom.lattice.astype(cdtype)

    high_G = params.high_G * 1e5
    low_G = params.low_G
    loop_G = params.high_G * 1e7
    tol = C.Q_C * 0.01
    nn = params.nn_dist.astype(cdtype)

    metal = geom.metal_mask_table[aelem]
    anyvac = aelem == int(Element.VACANCY)
    cvac = anyvac & (acharge == 0)

    # --- ELL neighbour conductances (exact dtype — they set the diagonal) ---
    anb = geom.atom_neigh_idx
    valid = anb >= 0
    safe = jnp.where(valid, anb, 0)
    hi = (metal[:, None] & metal[safe]) | (cvac[:, None] & cvac[safe])
    nb_vals = jnp.where(
        valid, jnp.where(hi, -high_G, -low_G).astype(dtype), 0.0
    )

    # --- active subset ---
    mp = geom.atom_metalp_idx                     # [n_mp] static
    vcap = params.tunnel_vac_cap
    if vcap <= 0:
        raise ValueError("transport='blocked' requires tunnel_vac_cap > 0")
    from ..ops.compact import nonzero_fixed

    vidx, n_vac = nonzero_fixed(anyvac, vcap, fill_value=0)
    v_ok = jnp.arange(vcap, dtype=jnp.int32) < jnp.minimum(n_vac, vcap)

    mpos, mcb = apos[mp], acb[mp]
    vpos, vcb = apos[vidx], acb[vidx]

    env = wkb_env(geom, params)

    cc_fly = getattr(params, "transport_cc", "stored") == "fly"
    if cc_fly and cdtype != jnp.float32:
        raise ValueError(
            "transport_cc='fly' computes f32 entries (the Pallas kernel is "
            "an f32 VPU pipeline); it requires precision 'mixed' or 'f32'"
        )
    ones_m = jnp.ones(mp.shape[0], dtype=bool)
    if cc_fly:
        T_cc = None
    elif cc is not None:
        T_cc = cc.astype(cdtype)
    else:
        T_cc = tunnel_block(env, mpos, mcb, ones_m, mpos, mcb, ones_m,
                            wkb_single_T)
    if _cc_only:
        return dict(T_cc=T_cc)
    tt_slot_new = None
    if getattr(params, "transport_incremental", False):
        T_vm, T_vv, tt_slot_new = _incremental_vacancy_blocks(
            geom, params, state, vidx, v_ok, vpos, vcb, apos, acb,
            mpos, mcb, env,
        )
    else:
        T_vv = tunnel_block(env, vpos, vcb, v_ok, vpos, vcb, v_ok,
                            wkb_single_T)
        T_vm = _vm_block(env, vpos, vcb, v_ok, mpos, mcb, params)

    # exactness check for the static integration trip count: the number of
    # dE_step windows the widest eligible (vac, metal_p) pair needs
    dist_vm = _dist_blocks(vpos, mpos, lattice, geom.pbc)
    abs_vm = jnp.abs(vcb[:, None] - mcb[None, :])
    elig_vm = v_ok[:, None] & (abs_vm > env["ctol"]) & ~(dist_vm < nn)
    int_steps_needed = jnp.ceil(
        jnp.max(jnp.where(elig_vm, abs_vm, 0.0)) / env["dE_step"]
    ).astype(jnp.int32)

    # --- virtual-node rows ---
    idx = jnp.arange(Na, dtype=jnp.int32)
    nsi, nge = params.num_source_inj, params.num_ground_ext
    src_vals = jnp.where(idx < nsi, -high_G, 0.0).astype(dtype)
    # strict ">" keeps the reference's off-by-one (src/current_solver.cpp:187)
    gnd_vals = jnp.where(idx > (Na - nge), -high_G, 0.0).astype(dtype)

    # --- exact f64 diagonal = -(off-diagonal row sums) ---
    row_atoms = jnp.sum(nb_vals, axis=1)
    row_atoms = row_atoms + gnd_vals + src_vals
    # row sums in storage dtype, cast after (a dtype= accumulator would
    # materialise an f64-converted copy of the multi-GB cc block)
    if cc_fly:
        from ..ops.pairwise_pallas import on_tpu_default_device
        from ..ops.wkb_pallas import wkb_fly_matvec

        cc_row = wkb_fly_matvec(
            mpos, mcb, jnp.ones(mp.shape[0], jnp.float32), env,
            interpret=not on_tpu_default_device(),
        ).astype(dtype)
    else:
        cc_row = jnp.sum(T_cc, axis=1).astype(dtype)
    mv_row = jnp.sum(T_vm, axis=0).astype(dtype)     # metal rows, vac cols
    vv_row = jnp.sum(T_vv, axis=1).astype(dtype)
    vm_row = jnp.sum(T_vm, axis=1).astype(dtype)
    row_atoms = row_atoms.at[mp].add(cc_row + mv_row)
    row_atoms = row_atoms.at[vidx].add(jnp.where(v_ok, vv_row + vm_row, 0.0))
    row0 = jnp.sum(gnd_vals) - loop_G
    row1 = jnp.sum(src_vals) - loop_G
    diag = -jnp.concatenate(
        [jnp.stack([row0, row1]), row_atoms]
    )

    out = dict(
        nb_vals=nb_vals, nb_safe=safe,
        T_cc=T_cc, T_vv=T_vv, T_vm=T_vm,
        mp=mp, mp_inv=geom.atom_metalp_inv, vidx=vidx, v_ok=v_ok,
        src_vals=src_vals, gnd_vals=gnd_vals,
        loop_G=loop_G, diag=diag,
        int_steps_needed=int_steps_needed,
        tt_slot_atom=tt_slot_new,
    )
    if cc_fly:
        # everything the on-the-fly kernels need to re-derive cc entries
        out["fly"] = dict(mpos=mpos, mcb=mcb, env=env)
    if band is not None:
        # dynamic complement of the static banded operator: the
        # (high_G - low_G) bump on uncharged-vacancy pairs, supported
        # entirely on the vacancy bucket (see build_banded_nb)
        vnb = anb[vidx]                       # [vcap, max_nn]
        vvalid = vnb >= 0
        vsafe = jnp.where(vvalid, vnb, 0)
        hi_dyn = (
            vvalid & v_ok[:, None] & cvac[vidx][:, None] & cvac[vsafe]
        )
        out["band"] = band
        out["band_dyn_vals"] = jnp.where(
            hi_dyn, -(high_G - low_G), 0.0
        ).astype(jnp.float32)
        out["band_vnb_safe"] = vsafe
    if params.mixed and getattr(params, "transport_bf16_inner", False):
        # (mixed-mode only: without the f64 refinement stream the whole
        # solve would run on the bf16-perturbed operator with no exact
        # residual pass — the twins must never exist in pure-f32/f64 mode)
        # bf16 twins of the tunnel blocks for the f32 INNER iterations
        # only: halves the dominant per-iteration HBM stream (the 2.45 GB
        # metal block) on the MXU's native bf16 path.  The f64 refinement
        # keeps the f32-entried operator, so the converged answer is
        # unchanged — a bf16-perturbed inner operator only caps the
        # per-round contraction (~4e-3) and costs extra outer rounds.
        # (Under transport_cc='fly' the cc block has no stored form to
        # twin — the vacancy blocks still get theirs.)
        if not cc_fly:
            out["T_cc16"] = T_cc.astype(jnp.bfloat16)
        out["T_vv16"] = T_vv.astype(jnp.bfloat16)
        out["T_vm16"] = T_vm.astype(jnp.bfloat16)
    return out


def _apply_X_blocks(blk, x, wd, band_kernel: str = "jnp"):
    """y = X @ x for the blocked operator; x is the full [Na+2] vector.

    ``wd`` is the working dtype of the gather/reduction path; the tunnel
    blocks multiply in their storage dtype with ``wd`` accumulation.
    ``band_kernel`` selects the banded-matvec implementation (static
    choice from params.transport_band_kernel)."""
    x = x.astype(wd)
    x0, x1, xa = x[0], x[1], x[2:]
    if blk.get("band") is not None and wd == jnp.float32:
        # gather-free static banded matvec + the tiny dynamic
        # vacancy-pair correction (f32 inner iterations only; the f64
        # refinement matvec keeps the exact ELL path)
        ya = _banded_nb_matvec(blk["band"], xa, kernel=band_kernel)
        yv = jnp.sum(
            blk["band_dyn_vals"] * xa[blk["band_vnb_safe"]], axis=1
        )
        ya = ya.at[blk["vidx"]].add(jnp.where(blk["v_ok"], yv, 0.0))
    else:
        nb_vals = blk["nb_vals"].astype(wd)
        ya = jnp.sum(nb_vals * xa[blk["nb_safe"]], axis=1)

    # tunnel matmuls run in the blocks' storage dtype (f32 in mixed mode;
    # promoting to f64 would materialise multi-GB converted copies).  The
    # f32-accumulation error (~1e-5 relative of the TUNNEL term only) is
    # negligible against the entries' own f32 assembly error and the
    # high_G-dominated row magnitudes.  The f32 inner iterations read the
    # bf16 twins when present (transport_bf16_inner) with f32 MXU
    # accumulation; the f64 refinement always reads the f32 originals.
    if wd == jnp.float32 and blk.get("T_cc16") is not None:
        T_cc, T_vv, T_vm = blk["T_cc16"], blk["T_vv16"], blk["T_vm16"]
        cd = jnp.bfloat16
    else:
        T_cc, T_vv, T_vm = blk["T_cc"], blk["T_vv"], blk["T_vm"]
        cd = T_vv.dtype
    pt = jnp.float32 if cd == jnp.bfloat16 else None
    xm = xa[blk["mp"]].astype(cd)
    xv = jnp.where(blk["v_ok"], xa[blk["vidx"]], 0.0).astype(cd)
    if blk.get("fly") is not None:
        from ..ops.pairwise_pallas import on_tpu_default_device
        from ..ops.wkb_pallas import wkb_fly_matvec

        f = blk["fly"]
        y_cc = wkb_fly_matvec(
            f["mpos"], f["mcb"], xm.astype(jnp.float32), f["env"],
            interpret=not on_tpu_default_device(),
        ).astype(wd)
    else:
        y_cc = jnp.matmul(T_cc, xm, preferred_element_type=pt).astype(wd)
    y_mv = jnp.matmul(xv, T_vm, preferred_element_type=pt).astype(wd)
    y_vv = jnp.matmul(T_vv, xv, preferred_element_type=pt).astype(wd)
    y_vm = jnp.matmul(T_vm, xm, preferred_element_type=pt).astype(wd)
    # metal_p placement via a static gather (TPU scatters are ~10x slower
    # than gathers and this runs once per CG iteration); vacancy placement
    # keeps the (small, dynamic) scatter
    inv = blk["mp_inv"]
    y_mp_pad = jnp.concatenate([y_cc + y_mv, jnp.zeros(1, dtype=wd)])
    n_mp = blk["mp"].shape[0]
    ya = ya + y_mp_pad[jnp.where(inv >= 0, inv, n_mp)]
    ya = ya.at[blk["vidx"]].add(jnp.where(blk["v_ok"], y_vv + y_vm, 0.0))

    src = blk["src_vals"].astype(wd)
    gnd = blk["gnd_vals"].astype(wd)
    loop_G = blk["loop_G"].astype(wd)
    ya = ya + gnd * x0 + src * x1
    y0 = jnp.dot(gnd, xa) - loop_G * x1
    y1 = jnp.dot(src, xa) - loop_G * x0
    return jnp.concatenate([jnp.stack([y0, y1]), ya]) + blk["diag"].astype(wd) * x


def _apply_X_blocks_mat(blk, X, wd):
    """Y = X_op @ X for a matrix of column vectors X [Na+2, K].

    The multi-RHS twin of :func:`_apply_X_blocks`, used to build the
    deflation basis W = A Z in one pass: the tunnel blocks are read ONCE
    for all K columns (MXU matmuls), and the ELL part runs as max_nn
    row-gathers of [Na, K] panels — K-column cost is marginal over a
    single matvec."""
    X = X.astype(wd)
    x0, x1, Xa = X[0], X[1], X[2:]
    K = X.shape[1]
    nb_vals = blk["nb_vals"].astype(wd)
    Ya = jnp.zeros_like(Xa)
    for s in range(nb_vals.shape[1]):
        Ya = Ya + nb_vals[:, s:s + 1] * Xa[blk["nb_safe"][:, s]]

    cd = blk["T_vv"].dtype
    Xm = Xa[blk["mp"]].astype(cd)
    Xv = jnp.where(blk["v_ok"][:, None], Xa[blk["vidx"]], 0.0).astype(cd)
    if blk.get("fly") is not None:
        from ..ops.pairwise_pallas import on_tpu_default_device
        from ..ops.wkb_pallas import wkb_fly_matmat

        f = blk["fly"]
        Y_cc = wkb_fly_matmat(
            f["mpos"], f["mcb"], Xm.astype(jnp.float32), f["env"],
            interpret=not on_tpu_default_device(),
        ).astype(wd)
    else:
        Y_cc = jnp.matmul(blk["T_cc"], Xm).astype(wd)
    Y_mv = jnp.matmul(blk["T_vm"].T, Xv).astype(wd)
    Y_vv = jnp.matmul(blk["T_vv"], Xv).astype(wd)
    Y_vm = jnp.matmul(blk["T_vm"], Xm).astype(wd)
    inv = blk["mp_inv"]
    n_mp = blk["mp"].shape[0]
    Y_mp_pad = jnp.concatenate([Y_cc + Y_mv, jnp.zeros((1, K), dtype=wd)])
    Ya = Ya + Y_mp_pad[jnp.where(inv >= 0, inv, n_mp)]
    Ya = Ya.at[blk["vidx"]].add(
        jnp.where(blk["v_ok"][:, None], Y_vv + Y_vm, 0.0)
    )

    src = blk["src_vals"].astype(wd)
    gnd = blk["gnd_vals"].astype(wd)
    loop_G = blk["loop_G"].astype(wd)
    Ya = Ya + gnd[:, None] * x0[None, :] + src[:, None] * x1[None, :]
    y0 = gnd @ Xa - loop_G * x1
    y1 = src @ Xa - loop_G * x0
    return (
        jnp.concatenate([jnp.stack([y0, y1]), Ya])
        + blk["diag"].astype(wd)[:, None] * X
    )


def build_banded_nb(
    geom: Geometry, params: PhysParams, state: SimState,
    block: int = 128, max_bytes: int = 3 << 30,
):
    """Static banded-dense neighbour-conductance operator (built ONCE per
    simulation; the gather-free inner-CG matvec).

    The neighbour matrix decomposes exactly as

        nb = -low_G * ADJ  - (high_G-low_G) * MM  - (high_G-low_G) * CVAC2

    where ADJ (atom adjacency) and MM (metal-metal pairs) are STATIC — no
    KMC event touches a metal site (the atom-set invariance,
    structure.py:58) — and CVAC2 (uncharged-vacancy pairs,
    src/current_solver.cpp:86-99) lives entirely on the <=tunnel_vac_cap
    vacancy bucket.  The static part is laid out banded-dense over
    x-sorted atoms (crossbar bandwidth 3,313 vs 7,572 in file order):
    ``C4[r, k, b, j]`` holds the coupling of permuted atom r*B+b to
    permuted atom (r-p+k)*B+j, so the matvec is a sliding-window slice +
    batched MXU matmuls — replacing the [Na x max_nn] dynamic gather that
    dominated every CG iteration (~34 ms/iter at crossbar scale,
    PERFORMANCE.md).  The k axis is zero-padded to a multiple of 8 so the
    pallas kernel (ops/banded_pallas.py) can stream fixed-size k-tiles;
    ``front`` carries the window's leading zero pad (its SHAPE encodes
    p*B, the only static the matvec needs that the C4 shape doesn't give).
    The permutation is internal to this operator: atom ordering
    conventions elsewhere are untouched.

    Returns None when the banded layout exceeds ``max_bytes`` (extreme
    aspect ratios); callers fall back to the ELL gather."""
    anb = np.asarray(geom.atom_neigh_idx)
    Na = int(geom.N_atom)
    ai = np.asarray(geom.atom_ind)
    ax = np.asarray(geom.coords)[ai][:, 0]
    pi = np.argsort(ax, kind="stable").astype(np.int32)
    inv = np.empty_like(pi)
    inv[pi] = np.arange(Na, dtype=np.int32)
    rows = np.repeat(np.arange(Na, dtype=np.int64), anb.shape[1])
    cols = anb.ravel().astype(np.int64)
    msk = cols >= 0
    rows, cols = rows[msk], cols[msk]
    bw = int(np.abs(inv[rows] - inv[cols]).max()) if rows.size else 1
    B = block
    p = -(-bw // B)
    m = 2 * p + 1
    m_pad = m if m < 8 else -(-m // 8) * 8
    R = -(-Na // B)
    if R * B * m_pad * B * 4 > max_bytes:
        return None
    metal = np.asarray(geom.metal_mask_table)[np.asarray(state.element)[ai]]
    high_G = float(params.high_G) * 1e5
    low_G = float(params.low_G)
    vals = np.where(
        metal[rows] & metal[cols], -high_G, -low_G
    ).astype(np.float32)
    C4 = np.zeros((R, m_pad, B, B), dtype=np.float32)
    ri, ci = inv[rows], inv[cols]
    off = ci - (ri // B - p) * B
    C4[ri // B, off // B, ri % B, off % B] = vals
    cd = jnp.float32
    if params.mixed and getattr(params, "transport_bf16_inner", False):
        # the band feeds ONLY the f32 inner-CG matvec (the f64 refinement
        # keeps the exact ELL path), so under the bf16-inner contract it can
        # be STORED bf16 outright: halves both HBM residency and the
        # dominant per-iteration stream, same perturbed-inner-operator
        # argument as the tunnel-block twins (assemble_X_blocks).
        cd = jnp.bfloat16
    return dict(
        C=jnp.asarray(C4).astype(cd),
        front=jnp.zeros(p * B, cd),
        pi=jnp.asarray(pi), inv=jnp.asarray(inv),
    )


def _banded_nb_matvec(band, xa, kernel: str = "jnp"):
    """y = C_static @ x via sliding-window slices + batched MXU matmuls.
    No gathers except the two [Na] permutation reads.  C may be stored
    bf16 (transport_bf16_inner); the MXU accumulates in f32 either way.
    ``kernel="pallas"`` streams C through VMEM exactly once
    (ops/banded_pallas.py) instead of materialising the [R, m_pad, B]
    window stack in HBM each call."""
    C = band["C"]
    R, m_pad, B, _ = C.shape
    Na = band["pi"].shape[0]
    cd = C.dtype
    xperm = xa[band["pi"]].astype(cd)
    front = band["front"]                  # p*B leading zeros (static shape)
    xp = jnp.concatenate([
        front, xperm,
        jnp.zeros((R + m_pad - 1) * B - front.shape[0] - Na, cd),
    ])
    x2 = xp.reshape(R + m_pad - 1, B)
    if kernel == "pallas":
        from ..ops.banded_pallas import banded_matvec_pallas
        from ..ops.pairwise_pallas import on_tpu_default_device

        y = banded_matvec_pallas(
            C, x2, interpret=not on_tpu_default_device()
        )
    else:
        xst = jnp.stack([x2[k:k + R] for k in range(m_pad)], axis=1)
        y = jnp.einsum(
            "rkbj,rkj->rb", C, xst, preferred_element_type=jnp.float32
        )
    return y.astype(jnp.float32).reshape(R * B)[:Na][band["inv"]]


def _deflation_ops(geom: Geometry, params: PhysParams, blk, d):
    """A-DEF2 deflation operators for the blocked transport CG, built in the
    Jacobi-SCALED metric (transport_precond="deflated").

    Round-1 measurements (PERFORMANCE.md) showed every coarse correction
    formulated in the UNSCALED metric loses: the correction is optimal in
    the A-energy norm but worsens the Jacobi-scaled residual norm the
    stopping criterion uses (matching the reference's rule on the
    symmetric-scaled system, src/iterative_solvers_gpu.cu:309-480), so CG
    pays hundreds of iterations re-converging.  The fix is to deflate the
    scaled system A^ = D^-1/2 A D^-1/2 itself with the scaled basis
    Z^ = D^1/2 Z — then the Galerkin matrix E = Z^T A Z is unchanged, the
    projected residual stays in the complement subspace of the metric the
    criterion measures, and warm-started easy solves cannot be hurt (the
    A-DEF2 operator is a projection, not an additive term).

    Returns (Zhat [Nsub,K], W = A^ Z^ [Nsub,K], E_inv [K,K] f64).  The
    preconditioner application is  M^-1 r = r + Z^ E^-1 (Z^^T r - W^T r)
    with the special start vector  x0 = Z^ E^-1 Z^^T b  (Tang/Nabben/Vuik/
    Erlangga's A-DEF2 — the variant proven robust to inexact coarse
    solves, which matters here because E is assembled through f32 blocks)."""
    dtype = params.dtype
    Nsub = geom.N_atom + 1
    Zm = _coarse_restriction(geom, params).T            # [Nsub, K] 0/1
    # AZ in FULL precision even in mixed mode: E's dominant entries come
    # from the f64-exact high_G neighbour couplings (nb_vals/diag are
    # stored f64 precisely because they set the diagonal), and with
    # kappa(E) ~ 1e10 an f32-assembled E makes E^-1 worthless
    # (measured on the timing crossbar: warm solves 10 -> 32 iterations).
    # The tunnel blocks stay f32 inside _apply_X_blocks_mat — their
    # ~1e-14-scale contributions are far below E's f64 floor.
    Xfull = jnp.concatenate(
        [Zm, jnp.zeros((1, Zm.shape[1]), dtype=dtype)], axis=0
    )
    AZ = _apply_X_blocks_mat(blk, Xfull, dtype)[:Nsub]
    E = Zm.T @ AZ                                       # = Z^T A Z
    E_inv = _invert_coarse(E, dtype)

    def coarse_solve(a):
        # one iterative-refinement step on the K x K solve: kappa(E)~1e10
        # leaves the raw Cholesky inverse ~1e-6 accurate, and the residual
        # drift it induces in the inner CG was measured to stall warm
        # solves at ~30 iterations (crossbar)
        c = E_inv @ a
        return c + E_inv @ (a - E @ c)

    ds = jnp.sqrt(jnp.where(d > 0, d, 1.0))
    Zhat = ds[:, None] * Zm
    W = AZ / ds[:, None]
    return Zhat, W, coarse_solve


def _pdisp_rows_cols(E, ms_r, ms_c, Vd, chunk: int = 2048):
    """Forward-current dissipation sums for one stored tunnel block.

    Returns (row_contrib [R], col_contrib [C]): the dense rule
    P_disp[i] += I_neg(i,j) * (Ms_j - Ms_i) evaluated for the stored
    orientation AND its transpose in one sweep (the transpose flips the
    sign of I_cal, src/current_solver.cpp:319-337), chunked over rows so
    no second |E|-sized array is materialised."""
    R = E.shape[0]
    pad = (-R) % chunk
    E_p = jnp.pad(E, ((0, pad), (0, 0)))
    ms_r_p = jnp.pad(ms_r, (0, pad))

    def body(carry, b0):
        col_acc = carry
        rows = jax.lax.dynamic_slice(
            E_p, (b0, jnp.int32(0)), (chunk, E.shape[1])
        ).astype(ms_c.dtype)
        ms_b = jax.lax.dynamic_slice(ms_r_p, (b0,), (chunk,))
        dM = ms_b[:, None] - ms_c[None, :]
        I_cal = rows * dM
        fwd = ((I_cal < 0) & (Vd > 0)) | ((I_cal > 0) & (Vd < 0))
        row_c = jnp.sum(jnp.where(fwd, -I_cal, 0.0) * (-dM), axis=1)
        # transpose orientation: I_cal' = -I_cal, displacement = +dM
        fwd_t = ((I_cal > 0) & (Vd > 0)) | ((I_cal < 0) & (Vd < 0))
        col_acc = col_acc + jnp.sum(jnp.where(fwd_t, I_cal, 0.0) * dM, axis=0)
        return col_acc, row_c

    n_blocks = (R + pad) // chunk
    col_contrib, row_chunks = jax.lax.scan(
        body,
        jnp.zeros(E.shape[1], dtype=ms_c.dtype),
        jnp.arange(n_blocks, dtype=jnp.int32) * chunk,
    )
    return row_chunks.reshape(-1)[:R], col_contrib


def update_power_blocked(
    geom: Geometry,
    params: PhysParams,
    state: SimState,
    Vd,
    cg_tol: float = None,
    cg_maxiter: int = 20000,
    cc=None,
    precond: str = None,
) -> Tuple[SimState, Dict]:
    """update_power with the blocked matrix-free operator (transport="blocked").

    Same physics and outputs as the dense path (Device::updatePower,
    src/current_solver.cpp:4-385); scales to the full reference crossbar
    (75k atoms) where the dense matrix cannot be materialised.  ``cc``:
    optional per-bias-point metal block from :func:`assemble_cc_block`."""
    dtype = params.dtype
    Na = geom.N_atom
    Nsub = Na + 1
    nsi = params.num_source_inj
    if cg_tol is None:
        cg_tol = params.transport_tol
    if params.mixed and getattr(params, "transport_bf16_inner", False):
        # The bf16-perturbed inner operator leaves a larger
        # criterion-invisible error at a given outer tolerance (measured on
        # the oracle device: 9.5e-4 relative on I at tol=1e-8 vs the 4.7e-5
        # mixed-mode floor reached by tol<=1e-12; the f32-band inner reaches
        # the floor at 1e-8 already).  Two extra digits restore the
        # documented mixed-mode envelope for a fraction of the halved
        # per-iteration HBM cost.
        cg_tol = cg_tol * 1e-2

    # cc: either the raw metal block or the assemble_transport_cache dict
    band = None
    if isinstance(cc, dict):
        band = cc.get("band")
        cc = cc.get("cc")
    blk = assemble_X_blocks(geom, params, state, cc=cc, band=band)
    loop_G = blk["loop_G"]
    diag = blk["diag"]

    rhs = jnp.zeros(Nsub, dtype=dtype)
    rhs = rhs.at[0].set(-loop_G * Vd)
    rhs = rhs.at[1].set(loop_G * Vd)

    band_kernel = getattr(params, "transport_band_kernel", "jnp")

    def apply_sub(x_sub, wd):
        x_full = jnp.concatenate([x_sub, jnp.zeros(1, dtype=x_sub.dtype)])
        return _apply_X_blocks(blk, x_full, wd, band_kernel)[:Nsub]

    d = diag[:Nsub]

    x_init = state.virtual_potentials[:Nsub]
    deflate = (precond or params.transport_precond) == "deflated"
    if deflate:
        Zhat, W, esolve = _deflation_ops(geom, params, blk, d)
    if params.mixed:
        # Jacobi-scaled f32 CG + f64 iterative refinement — the same scheme
        # (and measured accuracy, ~4e-7 on I) as the dense mixed path.
        from ..ops.cg import cg_solve_mixed

        dsi = 1.0 / jnp.sqrt(jnp.where(d > 0, d, 1.0))
        dsi32 = dsi.astype(jnp.float32)
        b_s = rhs * dsi
        y0 = x_init / dsi
        inner_precond = inner_start = None
        if deflate:
            Zh32 = Zhat.astype(jnp.float32)
            W32 = W.astype(jnp.float32)

            def _coarse_f32(coeff):
                # the coarse solve stays f64 (kappa(E) ~ 1e10 makes an
                # f32 solve garbage); cast at the boundary only
                return esolve(coeff.astype(dtype)).astype(jnp.float32)

            # per-round gate (see DEFLATION_GATE_REL; shipped always-on)
            def inner_precond(r, gate):
                g = jnp.where(gate, 1.0, 0.0).astype(jnp.float32)
                return r + g * (Zh32 @ _coarse_f32(Zh32.T @ r - W32.T @ r))

            def inner_start(b, gate):
                g = jnp.where(gate, 1.0, 0.0).astype(jnp.float32)
                return g * (Zh32 @ _coarse_f32(Zh32.T @ b))

        res = cg_solve_mixed(
            lambda y: dsi * apply_sub(dsi * y, dtype),
            lambda y: (dsi32 * apply_sub(dsi32 * y, jnp.float32)).astype(
                jnp.float32
            ),
            b_s, x0=y0,
            tol=cg_tol, inner_tol=1e-5, inner_maxiter=400,
            maxiter=cg_maxiter,
            inner_precond=inner_precond, inner_start=inner_start,
            inner_gate_rel=DEFLATION_GATE_REL if deflate else None,
        )
        v = res.x * dsi
        cg_iters = res.iters
    elif deflate:
        # f64 deflated solve on the scaled system.  criterion="r" on the
        # scaled system IS the Jacobi-preconditioned criterion on the
        # unscaled one: ||D^-1/2 (b - A x)|| = sqrt(r' M^-1 r).
        ds = jnp.sqrt(jnp.where(d > 0, d, 1.0))
        dsi = 1.0 / ds
        b_s = rhs * dsi
        y0 = x_init * ds
        y0 = (
            y0
            - Zhat @ esolve(W.T @ y0)           # P^T y0
            + Zhat @ esolve(Zhat.T @ b_s)       # + Z^ E^-1 Z^^T b
        )
        res = cg_solve(
            lambda y: dsi * apply_sub(dsi * y, dtype), b_s,
            x0=y0,
            precond=lambda r: r + Zhat @ esolve(Zhat.T @ r - W.T @ r),
            tol=cg_tol, maxiter=cg_maxiter, criterion="r",
        )
        v = res.x * dsi
        cg_iters = res.iters
    else:
        res = cg_solve(
            lambda x: apply_sub(x, dtype), rhs,
            x0=x_init,
            diag=d, tol=cg_tol, maxiter=cg_maxiter, criterion="pre",
        )
        v = res.x
        cg_iters = res.iters

    contact_drop = jnp.abs(v[nsi] - Vd)

    M = jnp.concatenate([v * G0, jnp.zeros(1, dtype=dtype)])  # [Na+2]
    Matoms = M[2:]
    I_macro = jnp.sum(blk["gnd_vals"] * (M[0] - Matoms))

    # --- dissipated power, block by block ---
    # The reference computes site power ONLY when a heating solver is on
    # (the whole extraction block is guarded, src/current_solver.cpp:279-371)
    # — with heating off site_power stays zero and the power key is not
    # logged.  params flags are static, so this branch resolves at trace
    # time and the extraction work disappears from the compiled program.
    solve_heat = params.solve_heating_global or params.solve_heating_local
    if solve_heat:
        min_V = jnp.min(Matoms)
        Ms = Matoms + jnp.abs(min_V)

        dM_nb = Ms[:, None] - Ms[blk["nb_safe"]]
        I_cal = blk["nb_vals"] * dM_nb
        fwd = ((I_cal < 0) & (Vd > 0)) | ((I_cal > 0) & (Vd < 0))
        P_disp = jnp.sum(jnp.where(fwd, -I_cal, 0.0) * (-dM_nb), axis=1)

        ms_m = Ms[blk["mp"]]
        ms_v = jnp.where(blk["v_ok"], Ms[blk["vidx"]], 0.0)
        if blk.get("fly") is not None:
            from ..ops.pairwise_pallas import on_tpu_default_device
            from ..ops.wkb_pallas import wkb_fly_pdisp

            f = blk["fly"]
            cc_r = wkb_fly_pdisp(
                f["mpos"], f["mcb"], ms_m.astype(jnp.float32), Vd, f["env"],
                interpret=not on_tpu_default_device(),
            ).astype(Ms.dtype)
        else:
            cc_r, _ = _pdisp_rows_cols(blk["T_cc"], ms_m, ms_m, Vd)
        vv_r, _ = _pdisp_rows_cols(blk["T_vv"], ms_v, ms_v, Vd)
        vm_r, vm_c = _pdisp_rows_cols(blk["T_vm"], ms_v, ms_m, Vd)
        inv = blk["mp_inv"]
        pm_pad = jnp.concatenate([cc_r + vm_c, jnp.zeros(1, dtype=P_disp.dtype)])
        P_disp = P_disp + pm_pad[jnp.where(inv >= 0, inv, blk["mp"].shape[0])]
        P_disp = P_disp.at[blk["vidx"]].add(
            jnp.where(blk["v_ok"], vv_r + vm_r, 0.0)
        )

        idx = jnp.arange(Na, dtype=jnp.int32)
        metal = geom.metal_mask_table[state.element[geom.atom_ind]]
        in_range = (idx >= nsi) & (idx < Na - nsi)
        alpha = jnp.where(metal, 0.0, 1.0)
        atom_power = jnp.where(in_range, -alpha * P_disp, 0.0).astype(dtype)

        power = jnp.zeros(geom.N, dtype=dtype).at[geom.atom_ind].set(atom_power)
        P_tot = jnp.sum(power)
    else:
        power = jnp.zeros(geom.N, dtype=dtype)
        P_tot = jnp.zeros((), dtype=dtype)

    new_vp = jnp.concatenate([v, jnp.zeros(1, dtype=dtype)])
    new_state = state.replace(
        power=power,
        I_macro=I_macro.astype(dtype),
        P_tot=P_tot,
        virtual_potentials=new_vp,
    )
    if blk.get("tt_slot_atom") is not None:
        # persist the (bit-exact) incremental tunnel blocks for the next
        # solve (params.transport_incremental)
        new_state = new_state.replace(
            tt_slot_atom=blk["tt_slot_atom"],
            tt_vm=blk["T_vm"], tt_vv=blk["T_vv"],
            tt_valid=jnp.asarray(True),
        )
    n_vac_atoms = jnp.sum(
        state.element[geom.atom_ind] == int(Element.VACANCY), dtype=jnp.int32
    )
    metrics = {
        "n_vac_atoms": n_vac_atoms,
        "Current [uA]": I_macro * 1e6,
        "Conductance [uS]": jnp.abs(I_macro / jnp.where(Vd != 0, Vd, 1.0)) * 1e6,
        "cg_iters_power": cg_iters,
        "transport_rel0": jnp.asarray(getattr(res, "rel0", jnp.nan), dtype),
        # the explicit convergence signal chunked-dispatch drivers loop on
        # (iteration counts alone are ambiguous: cg_solve_mixed can also
        # exit at max_outer refinement rounds with iters < maxiter)
        "transport_converged": res.converged,
        "contact_potential_drop": contact_drop,
        "tunnel_int_steps_needed": blk["int_steps_needed"],
    }
    if solve_heat:
        # logged only when a heating solver is on (reference schema)
        metrics["Total dissipated power [mW]"] = P_tot * 1e3
    return new_state, metrics


def _reuse_transport_metrics(
    geom: Geometry, params: PhysParams, state: SimState, Vd, blocked: bool
) -> Dict:
    """Metrics for an unchanged-network transport skip, reconstructed from
    the stored converged solution — same keys/dtypes as the matching solve
    branch (lax.cond requires identical avals)."""
    dtype = params.dtype
    nsi = params.num_source_inj
    I_macro = state.I_macro.astype(dtype)
    v = state.virtual_potentials
    metrics = {
        "n_vac_atoms": jnp.sum(
            state.element[geom.atom_ind] == int(Element.VACANCY),
            dtype=jnp.int32,
        ),
        "Current [uA]": I_macro * 1e6,
        "Conductance [uS]": jnp.abs(
            I_macro / jnp.where(Vd != 0, Vd, 1.0)
        ) * 1e6,
        "cg_iters_power": jnp.asarray(0, jnp.int32),
        "transport_converged": jnp.asarray(True),
        "contact_potential_drop": jnp.abs(v[nsi] - Vd).astype(dtype),
    }
    if blocked:
        # -1 sentinels: distinguish "skipped" from "converged instantly"
        # in per-step logs (ADVICE r4).  Safe for every consumer: the
        # driver takes a max over steps for the trip-count growth check
        # (the identical network's requirement was verified when it was
        # last solved), and the bench only prints these.
        metrics["transport_rel0"] = jnp.asarray(-1.0, dtype)
        metrics["tunnel_int_steps_needed"] = jnp.asarray(-1, jnp.int32)
    if params.solve_heating_global or params.solve_heating_local:
        metrics["Total dissipated power [mW]"] = state.P_tot.astype(dtype) * 1e3
    return metrics


def update_power(
    geom: Geometry,
    params: PhysParams,
    state: SimState,
    Vd,
    method: str = "cg",
    cg_tol: float = None,
    cg_maxiter: int = 20000,
    cc=None,
    allow_skip: bool = False,
) -> Tuple[SimState, Dict]:
    """Transport dispatcher.  ``allow_skip=True`` (the superstep path)
    enables the exact unchanged-network fast path: X is a function of
    (element, charge) at atom sites, the bias-start CB edge and Vd only —
    when all are unchanged since the last converged solve, that solution
    IS the solution (re-solving from it would exit at 0 iterations) and
    the assembly + setup cost (~180 ms at crossbar scale) is skipped.
    Cold pre-solves and tests call with the default (always solve)."""
    if cg_tol is None:
        cg_tol = params.transport_tol
    blocked = params.transport == "blocked" and method != "direct"
    # the superstep path (allow_skip=True) is the WARM path: its re-solves
    # use transport_warm_precond (jacobi default — with the adaptive inner
    # tolerance they take 2-8 iterations, so the A-DEF2 setup is pure
    # overhead); cold pre-solves keep transport_precond (deflated)
    warm_precond = (
        getattr(params, "transport_warm_precond", None)
        if allow_skip else None
    )
    if blocked:
        def solve_fn(st):
            return update_power_blocked(
                geom, params, st, Vd, cg_tol=cg_tol, cg_maxiter=cg_maxiter,
                cc=cc, precond=warm_precond,
            )
    else:
        def solve_fn(st):
            return _update_power_dense(
                geom, params, st, Vd, method, cg_tol, cg_maxiter
            )

    skip_on = (
        allow_skip
        and getattr(params, "transport_skip_unchanged", True)
        and method != "direct"
    )
    if not skip_on:
        return solve_fn(state)

    dtype = params.dtype
    elem_a = state.element[geom.atom_ind].astype(jnp.int32)
    chg_a = state.charge[geom.atom_ind].astype(jnp.int32)
    Vd_arr = jnp.asarray(Vd, dtype)
    unchanged = (
        jnp.all(elem_a == state.trans_elem_prev)
        & jnp.all(chg_a == state.trans_charge_prev)
        & (state.transport_Vd_prev == Vd_arr)
    )

    def solve_branch(st):
        new_st, m = solve_fn(st)
        return new_st.replace(
            trans_elem_prev=elem_a,
            trans_charge_prev=chg_a,
            transport_Vd_prev=Vd_arr,
        ), m

    def reuse_branch(st):
        return st, _reuse_transport_metrics(geom, params, st, Vd, blocked)

    return jax.lax.cond(unchanged, reuse_branch, solve_branch, state)


def _update_power_dense(
    geom: Geometry,
    params: PhysParams,
    state: SimState,
    Vd,
    method: str,
    cg_tol: float,
    cg_maxiter: int,
) -> Tuple[SimState, Dict]:
    dtype = params.dtype
    Na = geom.N_atom
    Nsub = Na + 1
    nsi = params.num_source_inj

    X, loop_G = assemble_X(geom, params, state, Vd)
    Dsub = X[:Nsub, :Nsub]

    rhs = jnp.zeros(Nsub, dtype=dtype)
    rhs = rhs.at[0].set(-loop_G * Vd)
    rhs = rhs.at[1].set(loop_G * Vd)

    cg_iters = jnp.asarray(0, jnp.int32)
    cg_converged = jnp.asarray(True)
    if method == "direct":
        v = jnp.linalg.solve(Dsub, rhs)
    elif method == "cg_f32scaled" or (method == "cg" and params.mixed):
        # Symmetric Jacobi scaling D^-1/2 X D^-1/2 maps every row to unit
        # diagonal and |off-diag| <= 1 — f32-representable — and, unlike the
        # raw boundary Laplacian, the scaled transport system's condition
        # number is moderate, so f32 CG + f64 iterative-refinement residuals
        # converges to f64 accuracy (measured: I_macro within 4e-7 of the
        # direct solve at ~40 f32 inner iterations).  The MXU matvecs run
        # in f32 at ~8x the f64-emulated rate.
        from ..ops.cg import cg_solve_mixed

        d = jnp.diagonal(Dsub)
        dsi = 1.0 / jnp.sqrt(jnp.where(d > 0, d, 1.0))
        A64 = Dsub * dsi[:, None] * dsi[None, :]
        A32 = A64.astype(jnp.float32)
        b_s = rhs * dsi
        y0 = state.virtual_potentials[:Nsub] / dsi
        res = cg_solve_mixed(
            lambda y: A64 @ y,
            lambda y: (A32 @ y).astype(jnp.float32),
            b_s, x0=y0,
            tol=cg_tol, inner_tol=1e-5, inner_maxiter=400,
            maxiter=cg_maxiter,
        )
        v = res.x * dsi
        cg_iters = res.iters
        cg_converged = res.converged
    else:
        x0 = state.virtual_potentials[:Nsub]
        # "pre" criterion: the matrix rows span ~21 decades (loop_G penalty
        # vs tunnelling), so the plain residual norm is meaningless
        res = cg_solve(
            lambda x: Dsub @ x, rhs, x0=x0, diag=jnp.diagonal(Dsub),
            tol=cg_tol, maxiter=cg_maxiter, criterion="pre",
        )
        v = res.x
        cg_iters = res.iters
        cg_converged = res.converged

    # potential-drop sanity check (src/current_solver.cpp:239-243)
    contact_drop = jnp.abs(v[nsi] - Vd)

    # scale by the conductance quantum; grounded last atom stays at 0
    M = jnp.concatenate([v * G0, jnp.zeros(1, dtype=dtype)])  # [Na+2]

    # macroscopic current through the ground/extraction node
    I_macro = jnp.sum(X[0, 2:] * (M[0] - M[2:]))

    # --- dissipated power ---
    # only when a heating solver is on (reference guards the whole block,
    # src/current_solver.cpp:279-371); static flags -> resolved at trace time
    solve_heat = params.solve_heating_global or params.solve_heating_local
    if solve_heat:
        Matoms = M[2:]
        min_V = jnp.min(Matoms)
        Ms = Matoms + jnp.abs(min_V)

        # P_disp[i] = sum_j I_neg[i,j] * (Ms[j] - Ms[i]) with
        # I_neg(i,j) = -X(i,j)(Ms_i - Ms_j) on forward-current pairs
        # (diagonal fold + gemv, src/current_solver.cpp:319-337).
        # Swept in row blocks so no second N_atom^2 array is materialised
        # alongside X (keeps peak memory ~ |X| at crossbar scale).
        BLK = 1024
        na_pad = (-Na) % BLK
        Xa_p = jnp.pad(X[2:, 2:], ((0, na_pad), (0, 0)))
        Ms_p = jnp.pad(Ms, (0, na_pad))
        idx = jnp.arange(Na, dtype=jnp.int32)

        def block_pdisp(b0):
            rows = jax.lax.dynamic_slice(Xa_p, (b0, jnp.int32(0)), (BLK, Na))
            ms_b = jax.lax.dynamic_slice(Ms_p, (b0,), (BLK,))
            ids = b0 + jnp.arange(BLK, dtype=jnp.int32)
            dMb = ms_b[:, None] - Ms[None, :]
            I_cal = rows * dMb
            fwd = ((I_cal < 0) & (Vd > 0)) | ((I_cal > 0) & (Vd < 0))
            offd = ids[:, None] != idx[None, :]
            I_neg = jnp.where(fwd & offd, -I_cal, 0.0)
            return jnp.sum(I_neg * (-dMb), axis=1)

        n_blocks = (Na + na_pad) // BLK
        P_disp = jax.lax.map(
            block_pdisp, jnp.arange(n_blocks, dtype=jnp.int32) * BLK
        ).reshape(-1)[:Na]

        metal = geom.metal_mask_table[state.element[geom.atom_ind]]
        in_range = (idx >= nsi) & (idx < Na - nsi)
        alpha = jnp.where(metal, 0.0, 1.0)
        atom_power = jnp.where(in_range, -alpha * P_disp, 0.0).astype(dtype)

        power = jnp.zeros(geom.N, dtype=dtype).at[geom.atom_ind].set(atom_power)
        P_tot = jnp.sum(power)
    else:
        power = jnp.zeros(geom.N, dtype=dtype)
        P_tot = jnp.zeros((), dtype=dtype)

    new_vp = jnp.concatenate([v, jnp.zeros(1, dtype=dtype)])
    new_state = state.replace(
        power=power,
        I_macro=I_macro.astype(dtype),
        P_tot=P_tot,
        virtual_potentials=new_vp,
    )
    n_vac_atoms = jnp.sum(
        state.element[geom.atom_ind] == int(Element.VACANCY), dtype=jnp.int32
    )
    metrics = {
        "n_vac_atoms": n_vac_atoms,
        "Current [uA]": I_macro * 1e6,
        "Conductance [uS]": jnp.abs(I_macro / jnp.where(Vd != 0, Vd, 1.0)) * 1e6,
        "cg_iters_power": cg_iters,
        "transport_converged": cg_converged,
        "contact_potential_drop": contact_drop,
    }
    if solve_heat:
        # logged only when a heating solver is on (reference schema)
        metrics["Total dissipated power [mW]"] = P_tot * 1e3
    return new_state, metrics


def compute_bond_currents(
    geom: Geometry,
    params: PhysParams,
    state: SimState,
    Vd,
    method: str = "cg",
    cg_tol: float = 1e-10,
):
    """Per-atom bond-current flow field (analysis tool; reference:
    postprocessing/plot_bond_current.py over a dumped X matrix).

    Returns (I_vec [N_atom,3], I_out [N_atom]) where I_vec is the
    displacement-weighted sum of outgoing bond currents at each atom and
    I_out the total outgoing (positive) current.
    """
    dtype = params.dtype
    Na = geom.N_atom
    Nsub = Na + 1
    X, loop_G = assemble_X(geom, params, state, Vd)
    rhs = jnp.zeros(Nsub, dtype=dtype)
    rhs = rhs.at[0].set(-loop_G * Vd)
    rhs = rhs.at[1].set(loop_G * Vd)
    if method == "direct":
        v = jnp.linalg.solve(X[:Nsub, :Nsub], rhs)
    else:
        res = cg_solve(
            lambda x: X[:Nsub, :Nsub] @ x, rhs,
            x0=state.virtual_potentials[:Nsub],
            diag=jnp.diagonal(X)[:Nsub], tol=cg_tol, maxiter=50000,
        )
        v = res.x
    M = jnp.concatenate([v * G0, jnp.zeros(1, dtype=dtype)])
    Matoms = M[2:]

    apos = geom.coords[geom.atom_ind]
    dM = Matoms[:, None] - Matoms[None, :]
    I_bond = -X[2:, 2:] * dM                 # current from i to j (off-diag)
    idx = jnp.arange(Na, dtype=jnp.int32)
    I_bond = jnp.where(idx[:, None] != idx[None, :], I_bond, 0.0)

    disp = apos[:, None, :] - apos[None, :, :]
    norm = jnp.sqrt(jnp.sum(disp * disp, axis=-1))
    unit = disp / jnp.where(norm > 0, norm, 1.0)[..., None]
    I_vec = jnp.sum(I_bond[..., None] * (-unit), axis=1)
    I_out = jnp.sum(jnp.where(I_bond > 0, I_bond, 0.0), axis=1)
    return I_vec, I_out
