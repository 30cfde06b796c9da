"""Simulation configuration.

Parses the reference's ``parameters.txt`` format (line-oriented ``key = value``
with ``//`` comments; reference: src/input_parser.cpp) into a typed
:class:`KMCConfig`, and owns the device *layer table* which the reference
hard-codes at compile time (src/structure_input.h:8-50).  Here the layer table
is data: the reference's table is the default and every field can be
overridden from the parameter file via ``num_layers`` / ``layer_<i>_<key>``
keys or programmatically.

Deliberate differences from the reference parser (quirks we do NOT replicate,
documented in SURVEY.md §2.2):
  * keys are matched as whole tokens, not substrings,
  * ``verbose`` does not clobber ``log_to_file`` (input_parser.cpp:46-48),
  * explicit ``0.0`` values are accepted (input_parser.cpp:330-334 rejects
    them).
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import List, Optional

from .constants import COULOMB_K, M_0


@dataclass
class Layer:
    """One device layer with zero-field activation energies [eV].

    Mirrors the reference ``Layer`` struct (src/utils.h:63-72) plus its
    compile-time initialisation (src/structure_input.h).
    """

    type: str = "oxide"
    E_gen_0: float = 0.0
    E_rec_1: float = 0.0
    E_diff_2: float = 0.0
    E_diff_3: float = 0.0
    start_x: float = 0.0
    end_x: float = 0.0


def default_layers() -> List[Layer]:
    """The reference's TiN-HfO2/Ti-TiN stack (src/structure_input.h:10-50)."""
    return [
        Layer("contact", 0.0, 0.0, 0.0, 0.76, -22.0, 0.0),
        Layer("interface", 3.93, 0.0, 1.09, 0.76, 0.0, 3.0),
        Layer("oxide", 3.93, 0.0, 1.09, 0.76, 3.0, 48.1431),
        Layer("interface", 1.66, 0.0, 1.09, 0.76, 48.1431, 52.6431),
        Layer("contact", 1.73, 0.0, 0.0, 2.8, 52.6431, 90.0),
    ]


@dataclass
class KMCConfig:
    # random seeds
    rnd_seed: int = 1                      # device RNG (substoichiometric init)
    rnd_seed_kmc: int = 1                  # KMC event RNG (structure_input.h:8)

    # restart
    restart: bool = False
    restart_xyz_file: str = ""

    # I/O
    log_freq: int = 1
    output_freq: int = 1
    log_to_file: bool = True
    verbose: bool = False
    output_dir: str = "."

    # structure
    atom_xyz_file: str = ""
    interstitial_xyz_file: str = ""
    pristine: bool = False
    initial_vacancy_concentration: float = 0.0
    lattice: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    freq: float = 10e13                    # attempt frequency [1/s]
    nn_dist: float = 3.5                   # neighbour cutoff [Angstrom]
    pbc: bool = False
    shift: bool = False
    shifts: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])

    # contact geometry
    num_atoms_first_layer: int = 0
    num_layers_contact: int = 0
    num_atoms_contact: int = 0
    num_atoms_reservoir: int = 0
    metals: List[str] = field(default_factory=lambda: ["Ti", "N"])

    # module toggles
    solve_potential: bool = False
    solve_current: bool = False
    solve_heating_global: bool = False
    solve_heating_local: bool = False
    perturb_structure: bool = False

    # biasing
    V_switch: List[float] = field(default_factory=list)    # [V]
    t_switch: List[float] = field(default_factory=list)    # [s]
    Icc: float = 1e30                      # compliance current [uA]
    Rs: float = 0.0                        # series resistance [Ohm]

    # potential solver
    G_coeff: float = 1.0
    sigma: float = 3.5e-10                 # gaussian broadening [m]
    epsilon: float = 23.0                  # relative permittivity [1]

    # current solver (tunneling)
    m_r: float = 0.85                      # relative effective mass [1]
    V0: float = 1.6                        # defect state energy [eV]
    alpha: List[float] = field(default_factory=lambda: [0.1])

    # temperature solver
    k_therm: float = 1.1                   # [W/mK]
    background_temp: float = 300.0         # [K]
    dissipation_constant: float = 1e-13    # global model [J/Ks]
    small_step: float = 1e-17              # [s]
    event_time: float = 0.0
    delta_t: float = 1e-13                 # local model step [s]
    delta: float = 1.0
    power_adjustment_term: float = 1.0
    L_char: float = 3.5e-10                # characteristic length [m]
    k_th_metal: float = 29.0               # [W/mK]
    k_th_non_vacancy: float = 0.5          # [W/mK]
    k_th_vacancies: float = 5.0            # [W/mK]
    c_p: float = 1.92                      # [J/K cm^3]
    t_ox: float = 52.6838e-10              # oxide thickness [m]
    A: float = 0.0                         # device area [m^2]

    # layer table (replaces the reference's compile-time structure_input.h)
    layers: List[Layer] = field(default_factory=default_layers)

    # --- framework extensions (not in the reference) ---
    precision: str = "f64"                 # "f64" | "f32" compute precision
    solver_tol: float = 1e-12              # CG relative tolerance
    transport_tol: float = 1e-8            # transport (power) CG tolerance, in the
                                           # Jacobi-preconditioned residual norm.
                                           # 1e-8 gives I_macro within ~3e-5 of the
                                           # reference's exact dense solve; 1e-12
                                           # matches it to ~1e-9 (cross-validated
                                           # against the CPU reference binary,
                                           # tests/test_cross_validation.py)
    solver_maxiter: int = 50000            # CG iteration cap (reference warns at 50k)
    selection: str = "two_level"           # "two_level" | "flat" event selection
    event_mode: str = "incremental"        # "incremental" | "scan" residence-time loop
    heat_solver: str = "dense"             # "dense" (reference-style inverses) | "cg" (matrix-free, scales)
    max_events_per_superstep: int = 10000  # safety bound for the on-device loop
    poisson_compact_cap: int = -1          # -1 auto-bucket; 0 dense O(N^2); >0 fixed compaction size
    active_rows_cap: int = -1              # event-source row compaction: -1 auto, 0 full table, >0 fixed
    tunnel_vac_cap: int = -1               # contact->trap integral vacancy compaction: -1 auto, 0 dense, >0 fixed
    tunnel_int_steps: int = 1024           # energy-window integration trip count
                                           # (exact while >= 100 * max CB-edge spread [V])
    site_order: str = "file"               # internal site ordering: "file" keeps the
                                           # structure file's order (bit-compatible with
                                           # the reference's positional conventions);
                                           # "x" applies a stable x-sort internally
                                           # (graph bandwidth drops ~17x on crossbars,
                                           # enabling halo slabs and banded kernels) —
                                           # I/O stays in file order via Geometry.io_idx.
                                           # Trajectories under "x" are statistically
                                           # equivalent, not bit-equal (different
                                           # selection ordering at equal rates).
    bc_pinned_width: str = "first_layer"   # boundary-potential Dirichlet width:
                                           # "first_layer" pins num_atoms_first_layer sites
                                           # per side (reference GPU path,
                                           # src/potential_solver.cpp:240-241);
                                           # "full_contact" pins num_atoms_contact sites
                                           # (reference CPU path, :272 and :294-296 —
                                           # a genuine CPU/GPU divergence in the
                                           # reference; use this for cross-validation
                                           # against the CPU binary)
    transport_precond: str = "deflated"    # "jacobi" | "deflated": A-DEF2 deflation of the
                                           # blocked transport CG in the Jacobi-scaled
                                           # metric (x-slab Galerkin coarse space; cuts
                                           # hard re-solve iterations without hurting
                                           # warm-started steps)
    boundary_precond: str = "jacobi"       # IN-SUPERSTEP boundary/CB solves: "jacobi" |
                                           # "deflated".  Warm re-solves are SETUP-dominated
                                           # (the deflation's [N x K] basis build costs
                                           # ~0.34 s/step at 110k sites vs ~0 CG iterations),
                                           # so jacobi is the right default here; the engine
                                           # always pre-solves the COLD bias-start systems
                                           # with deflation (186 -> 72 iters / 15.2 -> 6.5 s
                                           # on the crossbar), where the setup amortises.
    boundary_incremental: bool = True      # maintain the boundary solve's TRUE residual
                                           # under sparse conductance changes so churn
                                           # steps certify convergence in O(changed rows)
                                           # instead of a full f64 assembly + matvec
                                           # (~0.3 s/step at 110k sites).  Exact: the same
                                           # plain-r criterion, computed incrementally.
    boundary_delta_cap: int = 256          # max changed neutral-vacancy sites tracked per
                                           # superstep (overflow -> full solve, still exact)
    coarse_slabs: int = 16                 # number of x-slab aggregates for "deflated"
    transport_warm_precond: str = "jacobi" # IN-SUPERSTEP transport re-solve preconditioning
                                           # ("jacobi" | "deflated").  With the adaptive
                                           # inner tolerance the warm re-solves take 2-8
                                           # Jacobi iterations (the smooth charge-flip
                                           # rounds only need a ~3x reduction), so the
                                           # A-DEF2 setup (~24 ms/step) is pure overhead
                                           # there — while COLD bias-start solves keep
                                           # transport_precond (deflated: 329 vs ~1000+
                                           # iterations).  Measured r5: crossbar median
                                           # 0.486 -> 0.363 s/step
    coarse_yz: int = 1                     # transverse refinement of the transport coarse
                                           # space: each x-slab splits into coarse_yz^2
                                           # (y, z) blocks (K_tot = slabs * yz^2); >1 lets
                                           # deflation capture smooth modes that vary
                                           # across the crossbar wires
    solver_chunk_iters: int = 0            # >0: pre-solve cold bias-start Laplace systems
                                           # as a host loop of bounded-maxiter CG dispatches
                                           # (keeps every dispatch under the axon relay's
                                           # ~2-minute kill; needed for full physics at
                                           # 500k+ sites).  0 = single-dispatch solves.
    transport: str = "dense"               # "dense" (materialised X, MXU matvec) | "blocked"
                                           # (matrix-free: ELL neighbour part + dense tunnel
                                           # blocks over {vacancy, interior-metal} only —
                                           # O(N_atom*max_nn + |active|^2) memory, enables
                                           # full physics at crossbar scale)
    poisson_kernel: str = "jnp"            # compacted-Poisson pair sweep: "jnp" (blocked
                                           # lax.map) | "pallas" (VMEM-resident charged set,
                                           # ops/pairwise_pallas.py; the driver test-compiles
                                           # it and falls back to jnp if the TPU Mosaic
                                           # compiler rejects it)
    transport_bf16_inner: bool = False     # blocked transport: bf16 twins of the tunnel
                                           # blocks for the f32 inner iterations (halves
                                           # their HBM stream; +50% block memory) and the
                                           # static band STORED bf16 outright (only the f32
                                           # inner reads it; halves its stream AND memory).
                                           # The f64 refinement keeps the f32/ELL operator,
                                           # and the outer tolerance auto-tightens 1e-2 to
                                           # keep the mixed-mode accuracy envelope (see
                                           # update_power_blocked) — opt-in pending a TPU win
    transport_skip_unchanged: bool = True  # exact skip of the in-superstep transport solve
                                           # when (element, charge) at atom sites and Vd are
                                           # unchanged since the last converged solve — the
                                           # 'warm' solve costs ~180 ms at crossbar scale
                                           # even at 0 CG iterations (assembly + deflation
                                           # setup + criterion matvec).  Bit-exact: an
                                           # identical network solved from its own converged
                                           # solution returns it unchanged.
    ell_gather_kernel: str = "jnp"         # ELL neighbour gather (rate table + charge rule):
                                           # "jnp" (XLA row gather) | "pallas" (page-shuffle
                                           # window sweep, ops/ell_gather_pallas.py; measured
                                           # 14.7 -> 4.8 ms / 39.8 -> 3.0 ms at crossbar
                                           # scale; test-compiled with jnp fallback)
    transport_band_kernel: str = "jnp"     # banded-matvec implementation: "jnp" (einsum over
                                           # an HBM window stack) | "pallas" (single-pass
                                           # VMEM streaming, ops/banded_pallas.py; the driver
                                           # test-compiles it and falls back to jnp if the
                                           # TPU Mosaic compiler rejects it)
    transport_cc: str = "auto"             # metal_p x metal_p tunnel block: "stored"
                                           # (materialised f32, per-bias cache — fastest
                                           # while it fits), "fly" (re-derived inside a
                                           # Pallas kernel every matvec, zero HBM residency
                                           # — the only single-chip option beyond ~30k
                                           # metal atoms), "auto" (stored under ~3 GB,
                                           # fly beyond; current.resolve_transport_cc)
    tunnel_vm_kernel: str = "jnp"          # vacancy x metal window-integral assembly:
                                           # "jnp" | "pallas" (VMEM step loop,
                                           # ops/wkb_pallas.py; test-compiled w/ fallback)
    transport_incremental: str = "auto"    # persistent vacancy tunnel blocks (blocked
                                           # transport): keep T_vm/T_vv in SimState and on
                                           # each solve GATHER unchanged rows from the
                                           # previous block (row content depends only on
                                           # the atom + the bias-start CB edge), recomputing
                                           # only atoms that ENTERED the bucket — the ~85 ms
                                           # per-superstep window-integral re-assembly
                                           # (profile_transport_warm) drops to O(changed).
                                           # Ascending bucket order is preserved, so the
                                           # assembled operator is BIT-IDENTICAL to the
                                           # from-scratch path.  "auto" = on for blocked
                                           # single-device runs while the stored blocks fit
                                           # (~512 MB); "on" | "off" force it
    transport_delta_cap: int = 16          # incremental transport: max newly-entered bucket
                                           # atoms recomputed per solve (static shape);
                                           # overflow falls back to the full (still exact)
                                           # re-assembly for that step
    transport_banded: bool = True          # blocked transport: replace the per-iteration
                                           # [Na x max_nn] neighbour gather with a static
                                           # banded-dense matvec over x-sorted atoms plus a
                                           # vacancy-bucket correction (current.build_banded_nb);
                                           # auto-disabled when the band exceeds ~3 GB
    batch_steps: int = 1                   # supersteps per device dispatch (amortizes dispatch latency)

    # ------------------------------------------------------------------
    # derived parameters (reference: input_parser.cpp:391-398)
    # ------------------------------------------------------------------
    @property
    def high_G(self) -> float:
        return self.G_coeff * 1.0

    @property
    def low_G(self) -> float:
        return self.G_coeff * 1e-8

    @property
    def k(self) -> float:
        """Screened Coulomb prefactor [N m^2 / C^2]."""
        return COULOMB_K / self.epsilon

    @property
    def k_th_interface(self) -> float:
        return self.k_th_non_vacancy + (
            self.k_th_vacancies - self.k_th_non_vacancy
        ) * self.initial_vacancy_concentration

    @property
    def tau(self) -> float:
        """Thermal rate constant [1/s]."""
        return self.k_th_interface / (self.L_char * self.L_char * self.c_p * 1e6)

    @property
    def m_e(self) -> float:
        """Effective electron mass [kg]."""
        return self.m_r * M_0


_BOOL_KEYS = {
    "restart", "pristine", "shift", "pbc", "log_to_file", "verbose",
    "solve_potential", "solve_current", "solve_heating_global",
    "solve_heating_local", "perturb_structure", "transport_banded",
    "transport_bf16_inner", "boundary_incremental",
    "transport_skip_unchanged",
}
_INT_KEYS = {
    "rnd_seed", "rnd_seed_kmc", "log_freq", "output_freq", "batch_steps",
    "num_atoms_first_layer", "num_layers_contact", "num_atoms_contact",
    "num_atoms_reservoir", "solver_maxiter", "max_events_per_superstep",
    "num_layers", "poisson_compact_cap", "active_rows_cap", "tunnel_vac_cap",
    "tunnel_int_steps", "coarse_slabs", "coarse_yz", "solver_chunk_iters",
    "boundary_delta_cap", "transport_delta_cap",
}
_FLOAT_KEYS = {
    "initial_vacancy_concentration", "nn_dist", "Icc", "Rs", "sigma",
    "epsilon", "m_r", "V0", "k_therm", "background_temp",
    "dissipation_constant", "small_step", "event_time", "delta_t", "delta",
    "power_adjustment_term", "L_char", "k_th_metal", "k_th_non_vacancy",
    "k_th_vacancies", "c_p", "t_ox", "G_coeff", "solver_tol",
    "transport_tol",
}
_VEC_FLOAT_KEYS = {"lattice", "shifts", "V_switch", "t_switch", "alpha", "A"}
_VEC_STR_KEYS = {"metals"}
_STR_KEYS = {
    "restart_xyz_file", "atom_xyz_file", "interstitial_xyz_file",
    "precision", "selection", "output_dir", "event_mode", "heat_solver",
    "transport", "transport_precond", "boundary_precond", "bc_pinned_width",
    "site_order", "poisson_kernel", "transport_band_kernel",
    "ell_gather_kernel", "transport_cc", "tunnel_vm_kernel",
    "transport_incremental", "transport_warm_precond",
}
# reference key name -> config field name
_ALIASES = {"attempt_frequency": "freq"}

_LAYER_KEY = re.compile(r"^layer_(\d+)_(type|E_gen_0|E_rec_1|E_diff_2|E_diff_3|start_x|end_x)$")


def _parse_value(key: str, raw: str):
    raw = raw.replace(";", " ")
    toks = raw.split()
    if key in _BOOL_KEYS:
        return bool(int(float(toks[0])))
    if key in _INT_KEYS:
        return int(float(toks[0]))
    if key in _FLOAT_KEYS or key in _ALIASES:
        return float(toks[0])
    if key in _VEC_FLOAT_KEYS:
        vals = []
        for t in toks:
            t = t.rstrip(",").rstrip(";")
            if not t:
                continue
            try:
                vals.append(float(t))
            except ValueError:
                continue  # e.g. the "*" in "A = w * h" (input_parser.cpp:351-366)
        return vals
    if key in _VEC_STR_KEYS:
        return list(toks)
    if key in _STR_KEYS:
        return toks[-1] if toks else ""
    return None


def parse_parameters(path: str) -> KMCConfig:
    """Parse a reference-compatible ``parameters.txt`` into a KMCConfig.

    Compatible with the reference format (src/input_parser.cpp): ``//``
    comments, ``key = value`` lines, vectors as whitespace/comma separated
    floats.  The special key ``A`` multiplies its components together
    (input_parser.cpp:235-241).  Extra keys unknown to the reference (layer
    table, precision, solver knobs) are also accepted.
    """
    cfg = KMCConfig()
    layer_overrides = {}
    num_layers: Optional[int] = None

    with open(path) as f:
        for line in f:
            line = line.split("//", 1)[0].strip()
            if not line or "=" not in line:
                continue
            key, raw = line.split("=", 1)
            key = key.strip()
            raw = raw.strip()
            if not key or not raw:
                continue

            m = _LAYER_KEY.match(key)
            if m:
                idx, fname = int(m.group(1)), m.group(2)
                layer_overrides.setdefault(idx, {})[fname] = (
                    raw.split()[0] if fname == "type" else float(raw.split()[0])
                )
                continue
            if key == "num_layers":
                num_layers = int(float(raw.split()[0]))
                continue

            field_name = _ALIASES.get(key, key)
            if field_name not in {f.name for f in dataclasses.fields(KMCConfig)}:
                continue
            val = _parse_value(key, raw)
            if val is None:
                continue
            if key == "A":
                prod = 1.0
                for v in val:
                    prod *= v
                val = prod
            setattr(cfg, field_name, val)

    # assemble the layer table
    if num_layers is not None:
        base = default_layers()
        cfg.layers = [
            base[i] if i < len(base) else Layer() for i in range(num_layers)
        ]
    for idx, over in sorted(layer_overrides.items()):
        while idx >= len(cfg.layers):
            cfg.layers.append(Layer())
        for fname, v in over.items():
            setattr(cfg.layers[idx], fname, v)

    return cfg
