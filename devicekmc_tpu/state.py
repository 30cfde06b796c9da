"""Simulation state pytrees.

The reference mirrors its C++ ``Device`` arrays into a hand-managed GPU SoA
(``GPUBuffers``, src/gpu_buffers.{h,cpp}) and shuttles them over PCIe every
superstep.  The TPU build instead keeps ONE immutable pytree of device arrays
and threads it functionally through jitted supersteps — there is no host
mirror and no sync step.

Three pytrees:

* :class:`Geometry`  — static per-run arrays (coordinates, ELL neighbour
  graph, precomputed pair distances / Coulomb kernels, layer tables).  These
  never change after construction; under jit they are ordinary traced inputs
  with constant shapes.
* :class:`PhysParams` — scalar physics parameters; static integers (problem
  sizes, contact extents) live in non-pytree fields so they are compile-time
  constants.
* :class:`SimState`  — everything that evolves: elements, charges, fields,
  temperature, RNG key, warm-start vectors, accumulated KMC clock.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from . import constants as C
from .config import KMCConfig
from .structure import (
    Element,
    NON_ATOM_ELEMENTS,
    assign_layers,
    build_neighbor_list,
    site_dist,
)


@struct.dataclass
class Geometry:
    coords: Any          # [N,3] float   site positions [Angstrom]
    neigh_idx: Any       # [N,max_nn] int32, pad -1
    neigh_valid: Any     # [N,max_nn] bool
    pair_dist: Any       # [N,max_nn] float  distance to neighbour [Angstrom]
    v2_pair: Any         # [N,max_nn] float  erfc(r/(sigma*sqrt2))*k*q/r per unit charge [V]
    site_layer: Any      # [N] int32
    atom_ind: Any        # [N_atom] int32  site index of each atom slot
    metal_mask_table: Any  # [n_elements] bool: is element a metal
    layer_E: Any         # [n_layers, 4] float: E_gen_0, E_rec_1, E_diff_2, E_diff_3
    lattice: Any         # [3] float

    atom_metalp_idx: Any # [n_mp] int32: atom slots that are "interior metal"
                         # (metal_p, src/current_solver.cpp:86-92) — static
                         # because events never touch metal sites
    atom_metalp_inv: Any # [N_atom] int32: position of atom in the metal_p
                         # list, -1 otherwise — lets the blocked transport
                         # matvec place metal-block results with a gather
                         # instead of a (TPU-slow) scatter
    rev_slot: Any        # [N,max_nn] int32: slot of i within row neigh_idx[i,s]
                         # (reverse edge; -1 at pads) — used by the
                         # incremental event loop's O(max_nn) conflict zeroing
    atom_neigh_idx: Any  # [N_atom,max_nn] int32: atom-index neighbours of
                         # each atom (site neighbours that are atom sites),
                         # pad -1 — the sparse (neighbour-conductance) part
                         # of the transport matrix in blocked/matrix-free mode

    # contact / interior site masks.  Contacts are the first/last
    # num_atoms_first_layer *real* sites (the solvers' positional convention,
    # e.g. src/potential_solver.cpp:294-296); masks rather than index ranges
    # so the site axis can be padded for even mesh sharding.
    # internal <-> file-order site permutation (cfg.site_order).  The
    # reference's conventions (contact extents, atom ordering, snapshot
    # rows) are positional in FILE order; the internal order may differ
    # (e.g. "x": stable x-sort for graph-bandwidth reduction — crossbar
    # bandwidth drops ~88k -> ~5.2k, enabling halo slabs and VMEM-windowed
    # kernels).  Both arrays are identity when site_order="file".
    io_idx: Any          # [N] int32: internal index of file position p
    io_fpos: Any         # [N] int32: file position of internal site k
                         # (pad sites map past N_real)
    left_mask: Any       # [N] bool: Dirichlet left contact
    right_mask: Any      # [N] bool: Dirichlet right contact
    interior_mask: Any   # [N] bool: real non-contact sites
    # boundary-potential (resistive network) Dirichlet masks.  Normally equal
    # to left/right/interior_mask (the reference GPU path pins
    # num_atoms_first_layer sites per side for both Laplace solves), but the
    # reference CPU path pins num_atoms_contact sites for the *boundary*
    # solve only (src/potential_solver.cpp:272 vs :240-241 and :7-8) — config
    # bc_pinned_width="full_contact" reproduces that for cross-validation.
    bp_left_mask: Any    # [N] bool
    bp_right_mask: Any   # [N] bool
    bp_interior_mask: Any  # [N] bool
    inner_mask: Any      # [N] bool: sites [num_atoms_contact, N_real-nac)
    real_mask: Any       # [N] bool: non-padding sites

    # page/lane decomposition of neigh_idx for the Pallas ELL gather kernel
    # (ops/ell_gather_pallas.py) — attached by the engine on the
    # single-device path when ell_gather_kernel="pallas"; None otherwise
    gather_page: Any = None   # [n_rows, 128] int32
    gather_lane: Any = None   # [n_rows, 128] int32

    # static metadata
    N: int = struct.field(pytree_node=False, default=0)        # padded
    N_real: int = struct.field(pytree_node=False, default=0)
    max_nn: int = struct.field(pytree_node=False, default=0)
    N_atom: int = struct.field(pytree_node=False, default=0)
    pbc: bool = struct.field(pytree_node=False, default=False)
    # ELL-gather plan statics (0 when no plan attached)
    gather_mp2: int = struct.field(pytree_node=False, default=0)
    gather_bwpad: int = struct.field(pytree_node=False, default=0)
    gather_wp: int = struct.field(pytree_node=False, default=0)
    gather_rpb: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class PhysParams:
    # traced scalars (changing them does not retrigger compilation)
    freq: Any
    sigma: Any           # [m]
    k: Any               # Coulomb prefactor / epsilon
    nn_dist: Any         # [Angstrom]
    high_G: Any
    low_G: Any
    m_e: Any             # [kg]
    V0: Any              # [eV]
    background_temp: Any
    dissipation_constant: Any
    small_step: Any
    t_ox: Any
    A: Any
    c_p: Any
    delta_t: Any
    tau: Any
    k_th_interface: Any
    k_th_vacancies: Any
    power_adjustment_term: Any

    # static configuration
    N_left_tot: int = struct.field(pytree_node=False, default=0)
    N_right_tot: int = struct.field(pytree_node=False, default=0)
    num_source_inj: int = struct.field(pytree_node=False, default=0)
    num_ground_ext: int = struct.field(pytree_node=False, default=0)
    num_layers_contact: int = struct.field(pytree_node=False, default=0)
    num_atoms_contact: int = struct.field(pytree_node=False, default=0)
    solve_potential: bool = struct.field(pytree_node=False, default=True)
    solve_current: bool = struct.field(pytree_node=False, default=True)
    solve_heating_global: bool = struct.field(pytree_node=False, default=False)
    solve_heating_local: bool = struct.field(pytree_node=False, default=False)
    perturb_structure: bool = struct.field(pytree_node=False, default=True)
    solver_tol: float = struct.field(pytree_node=False, default=1e-12)
    transport_tol: float = struct.field(pytree_node=False, default=1e-8)
    solver_maxiter: int = struct.field(pytree_node=False, default=50000)
    selection: str = struct.field(pytree_node=False, default="two_level")
    event_mode: str = struct.field(pytree_node=False, default="incremental")
    max_events_per_superstep: int = struct.field(pytree_node=False, default=10000)
    poisson_compact_cap: int = struct.field(pytree_node=False, default=0)
    poisson_kernel: str = struct.field(pytree_node=False, default="jnp")
    active_rows_cap: int = struct.field(pytree_node=False, default=0)
    tunnel_vac_cap: int = struct.field(pytree_node=False, default=0)
    transport: str = struct.field(pytree_node=False, default="dense")
    transport_precond: str = struct.field(pytree_node=False, default="jacobi")
    boundary_precond: str = struct.field(pytree_node=False, default="jacobi")
    # incremental-residual fast path for the boundary re-solves (see
    # SimState.boundary_r); cap = max changed sites tracked per superstep
    # (overflow falls back to the full solve — exact either way)
    boundary_incremental: bool = struct.field(pytree_node=False, default=True)
    boundary_delta_cap: int = struct.field(pytree_node=False, default=256)
    transport_bf16_inner: bool = struct.field(pytree_node=False, default=False)
    transport_band_kernel: str = struct.field(pytree_node=False, default="jnp")
    # metal_p x metal_p tunnel block: "stored" materialises it (f32,
    # O(n_mp^2) HBM — 2.45 GB at the reference crossbar, cached per bias
    # point), "fly" re-derives entries inside a Pallas kernel every matvec
    # (ops/wkb_pallas.py: zero HBM residency, the only option beyond ~30k
    # metal atoms where the stored block cannot fit single-chip)
    transport_cc: str = struct.field(pytree_node=False, default="stored")
    # vacancy x metal_p window-integral ASSEMBLY (per superstep): "jnp"
    # (lax.fori over energy steps — one HBM pass over the block per step)
    # | "pallas" (step loop in VMEM per tile, ops/wkb_pallas.py)
    tunnel_vm_kernel: str = struct.field(pytree_node=False, default="jnp")
    # persistent vacancy tunnel blocks (see SimState.tt_*): resolved bool
    # — drivers resolve config "auto" via
    # current.resolve_transport_incremental once caps/n_mp are known, then
    # size the state fields with state.attach_tunnel_state
    transport_incremental: bool = struct.field(pytree_node=False, default=False)
    transport_delta_cap: int = struct.field(pytree_node=False, default=16)
    ell_gather_kernel: str = struct.field(pytree_node=False, default="jnp")
    coarse_slabs: int = struct.field(pytree_node=False, default=16)
    coarse_yz: int = struct.field(pytree_node=False, default=1)
    transport_warm_precond: str = struct.field(
        pytree_node=False, default="jacobi"
    )
    # static trip count of the contact->trap energy-window integration;
    # exact while >= ceil(max |dE_CB| / (q * 0.01 V)) — i.e. ~100 steps per
    # volt of CB-edge spread.  The blocked path emits the needed count as a
    # metric so the driver can detect truncation.
    tunnel_int_steps: int = struct.field(pytree_node=False, default=1024)
    # exact unchanged-network skip for the in-superstep transport solve
    # (see SimState.trans_elem_prev); consulted only on the superstep path
    transport_skip_unchanged: bool = struct.field(
        pytree_node=False, default=True
    )
    mixed: bool = struct.field(pytree_node=False, default=False)
    dtype: Any = struct.field(pytree_node=False, default=jnp.float64)


@struct.dataclass
class SimState:
    element: Any             # [N] int32
    charge: Any              # [N] int32
    potential_boundary: Any  # [N] float [V]
    potential_charge: Any    # [N] float [V]
    CB_edge: Any             # [N] float [J]
    power: Any               # [N] float [W]
    temperature: Any         # [N] float [K]
    T_bg: Any                # scalar [K]
    key: Any                 # jax PRNG key
    kmc_time: Any            # scalar [s] within current bias point
    I_macro: Any             # scalar [A]
    P_tot: Any               # scalar [W]
    virtual_potentials: Any  # [N_atom+2] float — current-solver warm start
    step_count: Any          # scalar int32

    # change-tracking for the boundary-potential solve: the conductance
    # network depends only on the (static) metal mask, the neutral-vacancy
    # set and Vd — when neither changed, the previous solution is exact and
    # the whole solve (including matrix assembly) is skipped.
    cvac_prev: Any           # [N] bool: neutral-vacancy mask at last solve
    Vd_prev: Any             # scalar: bias at last boundary solve

    # incremental-residual fast path (potential.solve_boundary_potential):
    # the TRUE residual b - L x and RHS b of the stored potential_boundary,
    # maintained exactly under sparse conductance changes so churn steps
    # can certify convergence in O(changed rows) instead of paying a full
    # f64 assembly + matvec.  Written by every full solve; only consulted
    # on the single-device/replicated path with boundary_precond="jacobi".
    boundary_r: Any          # [N] float
    boundary_b: Any          # [N] float

    # change-tracking for the transport solve (current.update_power):
    # X depends only on (element, charge) at atom sites, the bias-start
    # CB edge, and Vd — when none changed since the last converged solve,
    # that solution is exact and the whole 'warm' solve (assembly +
    # deflation setup + criterion matvec, ~180 ms at crossbar scale even
    # at 0 CG iterations) is skipped.  The engine resets transport_Vd_prev
    # to NaN at every bias start (the CB edge re-solve makes same-Vd
    # consecutive bias points not bit-comparable).
    trans_elem_prev: Any     # [N_atom] int32: element[atom_ind] at last solve
    trans_charge_prev: Any   # [N_atom] int32: charge[atom_ind] at last solve
    transport_Vd_prev: Any   # scalar: bias at last transport solve

    # persistent vacancy tunnel blocks (params.transport_incremental; sized
    # by attach_tunnel_state, 0-shaped placeholders otherwise).  Row i of
    # tt_vm/tt_vv is the WKB block row of the atom in ascending-bucket slot
    # i at the LAST solve; entries depend only on (atom identity, the
    # bias-start CB edge), so rows survive any superstep that does not
    # change the vacancy set — the solver gathers them through the
    # atom -> old-slot map and recomputes only newly-entered atoms
    # (current.assemble_X_blocks, incremental branch).  tt_valid is
    # cleared at bias boundaries (CB edge changes every entry).
    tt_slot_atom: Any = None  # [vcap] int32: atom occupying slot, -1 empty
    tt_vm: Any = None         # [vcap, n_mp] cdtype: window-integral block
    tt_vv: Any = None         # [vcap, vcap] cdtype: single-shot block
    tt_valid: Any = None      # scalar bool


# ----------------------------------------------------------------------------
# construction
# ----------------------------------------------------------------------------

def build_geometry(
    elements: np.ndarray,
    coords: np.ndarray,
    cfg: KMCConfig,
    max_nn: Optional[int] = None,
    neigh_idx: Optional[np.ndarray] = None,
    pad_to: int = 1,
) -> Geometry:
    """Build the static geometry pytree.  ``pad_to`` rounds the site axis up
    to a multiple (inert DEFECT pad sites with no neighbours) so arrays can
    be evenly sharded over a device mesh."""
    dtype = jnp.float32 if cfg.precision == "f32" else jnp.float64
    lattice = np.asarray(cfg.lattice, dtype=np.float64)
    if neigh_idx is None:
        neigh_idx = build_neighbor_list(coords, lattice, cfg.nn_dist, cfg.pbc, max_nn)

    n_real = len(elements)

    # optional bandwidth-reducing internal permutation (I/O stays in file
    # order through io_idx/io_fpos; all positional reference conventions
    # are evaluated in file coordinates below)
    if getattr(cfg, "site_order", "file") == "x":
        order = np.argsort(coords[:, 0], kind="stable").astype(np.int32)
    else:
        order = np.arange(n_real, dtype=np.int32)
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(n_real, dtype=np.int32)
    if not np.array_equal(order, np.arange(n_real)):
        elements = np.asarray(elements)[order]
        coords = np.asarray(coords)[order]
        nb = neigh_idx[order]
        nb = np.where(nb >= 0, inv_order[np.where(nb >= 0, nb, 0)], -1)
        # keep rows ascending (the reference adjacency order; rev_slot
        # construction below relies on it)
        big = np.iinfo(np.int32).max
        nb = np.sort(np.where(nb < 0, big, nb), axis=1)
        neigh_idx = np.where(nb == big, -1, nb).astype(np.int32)

    n_pad = (-n_real) % max(pad_to, 1)
    if n_pad:
        elements = np.concatenate(
            [elements, np.full(n_pad, int(Element.DEFECT), dtype=elements.dtype)]
        )
        coords = np.concatenate(
            [coords, np.tile(coords[:1], (n_pad, 1))]
        )
        neigh_idx = np.concatenate(
            [neigh_idx, np.full((n_pad, neigh_idx.shape[1]), -1, dtype=neigh_idx.dtype)]
        )
    n, m = neigh_idx.shape
    valid = neigh_idx >= 0
    safe_idx = np.where(valid, neigh_idx, 0)

    # static pair geometry
    pj = coords[safe_idx]                       # [N, max_nn, 3]
    dist = site_dist(coords[:, None, :], pj, lattice, cfg.pbc)
    # guard pads and coincident sites (duplicate coordinates exist in some
    # reference structure files) against 0-division
    degenerate = valid & (dist <= 0.0)
    if degenerate.any():
        import sys

        # known input-data defect: the reference crossbar xyz files carry
        # two duplicated coordinates (see BASELINE.md "Reference data
        # defects"); the guard keeps the kernel exact, so this is an
        # informational note, not a warning
        print(
            f"# note: {int(degenerate.sum())} neighbour pairs at zero "
            "distance (duplicate coordinates in the input structure — a "
            "known reference-data defect, BASELINE.md); their Coulomb "
            "kernel is zeroed",
            file=sys.stderr,
        )
    dead = ~valid | degenerate
    dist = np.where(dead, 1.0, dist)

    # screened-Coulomb self-interaction kernel per unit charge
    # v_solve(r, q) = q * erfc(r/(sigma*sqrt2)) * k * e / r  (src/utils.h:102)
    r_m = dist * 1e-10
    from scipy.special import erfc as np_erfc
    v2 = np_erfc(r_m / (cfg.sigma * np.sqrt(2.0))) * cfg.k * C.Q_C / r_m
    v2 = np.where(dead, 0.0, v2)

    site_layer = assign_layers(coords, cfg.layers)
    layer_E = np.array(
        [[l.E_gen_0, l.E_rec_1, l.E_diff_2, l.E_diff_3] for l in cfg.layers],
        dtype=np.float64,
    )

    metal_ids = {int(Element[m_]) for m_ in cfg.metals}
    metal_table = np.array(
        [i in metal_ids for i in range(len(Element))], dtype=bool
    )

    # file position of each internal site (pads map past n_real), and the
    # reverse map used by I/O (snapshots, restart)
    fpos = np.concatenate(
        [order, n_real + np.arange(n_pad, dtype=np.int32)]
    ).astype(np.int32)
    io_idx = np.concatenate(
        [inv_order, n_real + np.arange(n_pad, dtype=np.int32)]
    ).astype(np.int32)

    atom_mask = ~np.isin(elements, [int(e) for e in NON_ATOM_ELEMENTS])
    # atom slots are ordered by FILE position: the transport solver's
    # positional conventions (injection = first num_source_inj atoms,
    # ground strict->, metal_p extents) are defined on the reference's
    # file order (src/current_solver.cpp:86-99, 181-191)
    _aint = np.nonzero(atom_mask)[0]
    atom_ind = _aint[np.argsort(fpos[_aint], kind="stable")].astype(np.int32)

    # interior-metal atoms for the transport solver's tunnelling rules
    # (metal_p; static since no KMC event changes a metal site)
    metal_ids_arr = np.array([i in metal_ids for i in range(len(Element))])
    aelem0 = elements[atom_ind]
    na = len(atom_ind)
    aidx = np.arange(na)
    nlc, nsi = cfg.num_layers_contact, cfg.num_atoms_first_layer
    metalp = (
        metal_ids_arr[aelem0]
        & (aidx > (nlc - 1) * nsi)
        & (aidx < na - (nlc - 1) * nsi)
    )
    atom_metalp_idx = np.nonzero(metalp)[0].astype(np.int32)
    atom_metalp_inv = np.full(na, -1, dtype=np.int32)
    atom_metalp_inv[atom_metalp_idx] = np.arange(
        len(atom_metalp_idx), dtype=np.int32
    )

    # atom-level neighbour graph: site neighbours restricted to atom sites,
    # re-indexed into atom slots (static — events never change the atom set)
    site_to_atom = np.full(n, -1, dtype=np.int32)
    site_to_atom[atom_ind] = np.arange(na, dtype=np.int32)
    anb_sites = neigh_idx[atom_ind]
    atom_neigh_idx = np.where(
        anb_sites >= 0,
        site_to_atom[np.where(anb_sites >= 0, anb_sites, 0)],
        np.int32(-1),
    ).astype(np.int32)

    # reverse-edge slots: rev_slot[i,s] = t such that neigh_idx[j,t] == i for
    # j = neigh_idx[i,s].  Exists because the neighbour relation is symmetric;
    # rows are ascending so t = #(entries of row j < i).
    rev_slot = np.full((n, m), -1, dtype=np.int32)
    chunk = max(1, (1 << 22) // max(m * m, 1))
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        nb_c = neigh_idx[c0:c1]                       # [C, m]
        jrows = neigh_idx[np.where(nb_c >= 0, nb_c, 0)]   # [C, m, m]
        i_col = np.arange(c0, c1)[:, None, None]
        rev = np.sum((jrows >= 0) & (jrows < i_col), axis=-1, dtype=np.int32)
        rev_slot[c0:c1] = np.where(nb_c >= 0, rev, -1)

    # contact / interior masks are positional in FILE coordinates (the
    # reference's convention: first/last sites of the file are the
    # contacts); evaluated through fpos so any internal order keeps the
    # exact same physical contact sets
    n_left = n_right = cfg.num_atoms_first_layer
    nac = cfg.num_atoms_contact
    left_mask = fpos < n_left
    right_mask = (fpos >= n_real - n_right) & (fpos < n_real)
    interior_mask = (fpos >= n_left) & (fpos < n_real - n_right)
    inner_mask = (fpos >= nac) & (fpos < n_real - nac)
    real_mask = fpos < n_real
    if getattr(cfg, "bc_pinned_width", "first_layer") == "full_contact":
        bp_w = nac
    else:
        bp_w = cfg.num_atoms_first_layer
    bp_left_mask = fpos < bp_w
    bp_right_mask = (fpos >= n_real - bp_w) & (fpos < n_real)
    bp_interior_mask = (fpos >= bp_w) & (fpos < n_real - bp_w)

    return Geometry(
        coords=jnp.asarray(coords, dtype=dtype),
        neigh_idx=jnp.asarray(neigh_idx, dtype=jnp.int32),
        neigh_valid=jnp.asarray(valid),
        pair_dist=jnp.asarray(dist, dtype=dtype),
        v2_pair=jnp.asarray(v2, dtype=dtype),
        site_layer=jnp.asarray(site_layer, dtype=jnp.int32),
        atom_metalp_idx=jnp.asarray(atom_metalp_idx),
        atom_metalp_inv=jnp.asarray(atom_metalp_inv),
        rev_slot=jnp.asarray(rev_slot),
        atom_neigh_idx=jnp.asarray(atom_neigh_idx),
        atom_ind=jnp.asarray(atom_ind),
        metal_mask_table=jnp.asarray(metal_table),
        layer_E=jnp.asarray(layer_E, dtype=dtype),
        lattice=jnp.asarray(lattice, dtype=dtype),
        io_idx=jnp.asarray(io_idx),
        io_fpos=jnp.asarray(fpos),
        left_mask=jnp.asarray(left_mask),
        right_mask=jnp.asarray(right_mask),
        interior_mask=jnp.asarray(interior_mask),
        bp_left_mask=jnp.asarray(bp_left_mask),
        bp_right_mask=jnp.asarray(bp_right_mask),
        bp_interior_mask=jnp.asarray(bp_interior_mask),
        inner_mask=jnp.asarray(inner_mask),
        real_mask=jnp.asarray(real_mask),
        N=int(n),
        N_real=int(n_real),
        max_nn=int(m),
        N_atom=int(atom_mask.sum()),
        pbc=bool(cfg.pbc),
    )


def build_params(cfg: KMCConfig) -> PhysParams:
    if cfg.transport not in ("dense", "blocked"):
        raise ValueError(
            f"unknown transport={cfg.transport!r}; expected 'dense' or 'blocked'"
        )
    if cfg.transport_precond not in ("jacobi", "deflated"):
        raise ValueError(
            f"unknown transport_precond={cfg.transport_precond!r}; "
            "expected 'jacobi' or 'deflated'"
        )
    if getattr(cfg, "boundary_precond", "jacobi") not in ("jacobi", "deflated"):
        raise ValueError(
            f"unknown boundary_precond={cfg.boundary_precond!r}; "
            "expected 'jacobi' or 'deflated'"
        )
    if getattr(cfg, "transport_cc", "auto") not in ("auto", "stored", "fly"):
        raise ValueError(
            f"unknown transport_cc={cfg.transport_cc!r}; "
            "expected 'auto', 'stored' or 'fly'"
        )
    dtype = jnp.float32 if cfg.precision == "f32" else jnp.float64
    s = lambda x: jnp.asarray(x, dtype=dtype)
    return PhysParams(
        freq=s(cfg.freq),
        sigma=s(cfg.sigma),
        k=s(cfg.k),
        nn_dist=s(cfg.nn_dist),
        high_G=s(cfg.high_G),
        low_G=s(cfg.low_G),
        m_e=s(cfg.m_e),
        V0=s(cfg.V0),
        background_temp=s(cfg.background_temp),
        dissipation_constant=s(cfg.dissipation_constant),
        small_step=s(cfg.small_step),
        t_ox=s(cfg.t_ox),
        A=s(cfg.A),
        c_p=s(cfg.c_p),
        delta_t=s(cfg.delta_t),
        tau=s(cfg.tau),
        k_th_interface=s(cfg.k_th_interface),
        k_th_vacancies=s(cfg.k_th_vacancies),
        power_adjustment_term=s(cfg.power_adjustment_term),
        N_left_tot=cfg.num_atoms_first_layer,
        N_right_tot=cfg.num_atoms_first_layer,
        num_source_inj=cfg.num_atoms_first_layer,
        num_ground_ext=cfg.num_atoms_first_layer,
        num_layers_contact=cfg.num_layers_contact,
        num_atoms_contact=cfg.num_atoms_contact,
        solve_potential=cfg.solve_potential,
        solve_current=cfg.solve_current,
        solve_heating_global=cfg.solve_heating_global,
        solve_heating_local=cfg.solve_heating_local,
        perturb_structure=cfg.perturb_structure,
        solver_tol=cfg.solver_tol,
        transport_tol=cfg.transport_tol,
        solver_maxiter=cfg.solver_maxiter,
        selection=cfg.selection,
        event_mode=cfg.event_mode,
        max_events_per_superstep=cfg.max_events_per_superstep,
        poisson_compact_cap=cfg.poisson_compact_cap,
        poisson_kernel=getattr(cfg, "poisson_kernel", "jnp"),
        active_rows_cap=max(cfg.active_rows_cap, 0),
        tunnel_vac_cap=max(cfg.tunnel_vac_cap, 0),
        transport=cfg.transport,
        transport_precond=cfg.transport_precond,
        boundary_precond=getattr(cfg, "boundary_precond", "jacobi"),
        boundary_incremental=getattr(cfg, "boundary_incremental", True),
        boundary_delta_cap=getattr(cfg, "boundary_delta_cap", 256),
        transport_bf16_inner=getattr(cfg, "transport_bf16_inner", False),
        transport_band_kernel=getattr(cfg, "transport_band_kernel", "jnp"),
        transport_cc=getattr(cfg, "transport_cc", "stored"),
        tunnel_vm_kernel=getattr(cfg, "tunnel_vm_kernel", "jnp"),
        # transport_incremental stays False here: drivers resolve the
        # config's "auto"/"on"/"off" once n_mp and the final vcap are known
        # (current.resolve_transport_incremental + attach_tunnel_state)
        transport_delta_cap=getattr(cfg, "transport_delta_cap", 16),
        ell_gather_kernel=getattr(cfg, "ell_gather_kernel", "jnp"),
        coarse_slabs=cfg.coarse_slabs,
        coarse_yz=getattr(cfg, "coarse_yz", 1),
        transport_warm_precond=getattr(
            cfg, "transport_warm_precond", "jacobi"
        ),
        tunnel_int_steps=cfg.tunnel_int_steps,
        transport_skip_unchanged=getattr(
            cfg, "transport_skip_unchanged", True
        ),
        mixed=(cfg.precision == "mixed"),
        dtype=dtype,
    )


def make_substoichiometric(
    elements: np.ndarray, concentration: float, seed: int
) -> np.ndarray:
    """Convert ``concentration * num_O`` random oxygen atoms to vacancies via
    a rejection loop over uniform draws (src/Device.cpp:202-233).  The draw
    targets atom slots (non-defect sites) like the reference's N_atom-indexed
    loop."""
    out = elements.copy()
    atom_ind = np.nonzero(
        ~np.isin(out, [int(e) for e in NON_ATOM_ELEMENTS])
    )[0]
    n_atom = len(atom_ind)
    num_o = int((out == int(Element.O)).sum())
    num_add = int(concentration * num_o)
    rng = np.random.default_rng(seed)
    while num_add > 0:
        loc = int(rng.random() * n_atom)
        site = atom_ind[loc]
        if out[site] == int(Element.O):
            out[site] = int(Element.VACANCY)
            num_add -= 1
    return out


def init_state(
    geom: Geometry, cfg: KMCConfig, elements: np.ndarray
) -> SimState:
    dtype = jnp.float32 if cfg.precision == "f32" else jnp.float64
    n = geom.N
    elements = np.asarray(elements)
    if len(elements) < n:  # site axis padded for sharding
        elements = np.concatenate(
            [elements, np.full(n - len(elements), int(Element.DEFECT),
                               dtype=elements.dtype)]
        )
    # ``elements`` arrives in FILE order; map to the internal site order
    # (identity unless cfg.site_order != "file")
    elements = elements[np.asarray(geom.io_fpos)]
    zeros = jnp.zeros(n, dtype=dtype)
    return SimState(
        element=jnp.asarray(elements, dtype=jnp.int32),
        charge=jnp.zeros(n, dtype=jnp.int32),
        potential_boundary=zeros,
        potential_charge=zeros,
        CB_edge=zeros,
        power=zeros,
        temperature=jnp.full(n, cfg.background_temp, dtype=dtype),
        T_bg=jnp.asarray(cfg.background_temp, dtype=dtype),
        key=jax.random.PRNGKey(cfg.rnd_seed_kmc),
        kmc_time=jnp.asarray(0.0, dtype=dtype),
        I_macro=jnp.asarray(0.0, dtype=dtype),
        P_tot=jnp.asarray(0.0, dtype=dtype),
        virtual_potentials=jnp.zeros(geom.N_atom + 2, dtype=dtype),
        step_count=jnp.asarray(0, dtype=jnp.int32),
        cvac_prev=jnp.ones(n, dtype=bool),     # impossible -> force 1st solve
        Vd_prev=jnp.asarray(jnp.nan, dtype=dtype),
        boundary_r=zeros,
        boundary_b=zeros,
        trans_elem_prev=jnp.full(geom.N_atom, -1, dtype=jnp.int32),
        trans_charge_prev=jnp.zeros(geom.N_atom, dtype=jnp.int32),
        transport_Vd_prev=jnp.asarray(jnp.nan, dtype=dtype),
        tt_slot_atom=jnp.zeros(0, dtype=jnp.int32),
        tt_vm=jnp.zeros((0, 0), dtype=jnp.float32),
        tt_vv=jnp.zeros((0, 0), dtype=jnp.float32),
        tt_valid=jnp.asarray(False),
    )


def attach_tunnel_state(
    state: SimState, geom: Geometry, params: PhysParams
) -> SimState:
    """Size (or clear) the persistent tunnel-block fields for
    ``params.transport_incremental``.  Call after every change to
    tunnel_vac_cap — shapes are (vcap, n_mp).  Always returns an INVALID
    block set (tt_valid=False): the next solve rebuilds every occupied
    row, which is exactly the from-scratch assembly."""
    if not getattr(params, "transport_incremental", False):
        return state.replace(
            tt_slot_atom=jnp.zeros(0, dtype=jnp.int32),
            tt_vm=jnp.zeros((0, 0), dtype=jnp.float32),
            tt_vv=jnp.zeros((0, 0), dtype=jnp.float32),
            tt_valid=jnp.asarray(False),
        )
    cdtype = jnp.float32 if params.mixed else params.dtype
    vcap = params.tunnel_vac_cap
    n_mp = int(geom.atom_metalp_idx.shape[0])
    return state.replace(
        tt_slot_atom=jnp.full(vcap, -1, dtype=jnp.int32),
        tt_vm=jnp.zeros((vcap, n_mp), dtype=cdtype),
        tt_vv=jnp.zeros((vcap, vcap), dtype=cdtype),
        tt_valid=jnp.asarray(False),
    )


def build_simulation(
    cfg: KMCConfig,
    elements: Optional[np.ndarray] = None,
    coords: Optional[np.ndarray] = None,
    pad_to: int = 1,
) -> Tuple[Geometry, PhysParams, SimState]:
    """Full setup: read structure files (or accept arrays), apply shifts and
    substoichiometry, build geometry/params/state.

    Mirrors the construction phase of the reference driver
    (src/kmc_main.cpp:60-124 + src/Device.cpp:17-96).
    """
    from .structure import read_xyz, translate_cell

    if elements is None:
        if cfg.restart:
            import os

            if not os.path.exists(cfg.restart_xyz_file):
                # graceful message like the reference (kmc_main.cpp:67-74)
                raise FileNotFoundError(
                    f"ERROR: Restart file {cfg.restart_xyz_file} not found!"
                )
            elements, coords = read_xyz(cfg.restart_xyz_file)
        else:
            e1, c1 = read_xyz(cfg.atom_xyz_file)
            e2, c2 = read_xyz(cfg.interstitial_xyz_file)
            elements = np.concatenate([e1, e2])
            coords = np.concatenate([c1, c2])
    elements = np.asarray(elements, dtype=np.int32)
    coords = np.asarray(coords, dtype=np.float64)

    if cfg.shift:
        coords = translate_cell(coords, cfg.lattice, cfg.shifts)

    if cfg.pristine and not cfg.restart:
        elements = make_substoichiometric(
            elements, cfg.initial_vacancy_concentration, cfg.rnd_seed
        )

    geom = build_geometry(elements, coords, cfg, pad_to=pad_to)
    params = build_params(cfg)
    state = init_state(geom, cfg, elements)
    return geom, params, state
