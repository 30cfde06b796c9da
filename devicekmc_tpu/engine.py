"""Simulation driver: bias sweep, superstep composition, logging, snapshots.

Mirrors the reference main loop (src/kmc_main.cpp:26-299): for each bias
point (V_switch[i], t_switch[i]) solve the CB-edge Laplace problem once, then
run KMC supersteps — charge -> potential -> KMC events -> power -> heat —
until the accumulated KMC clock exceeds t_switch[i] or the compliance
current trips.  Output goes to ``output.txt`` with reference-compatible keys
(consumed by the postprocessing suite) and periodic xyz snapshots per bias
point in ``Results_<Vd>/``.

TPU design: each phase is a jitted pure function threading one SimState
pytree; ``fused=True`` compiles the whole superstep into a single XLA
program (no host sync between phases — the per-phase timing keys are then
reported as a single fused time).  The reference's GPUBuffers host<->device
shuttling (src/gpu_buffers.cpp) has no equivalent here: state lives on
device, and snapshots pull it back only every ``log_freq`` steps.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import KMCConfig
from .physics import charge as charge_mod
from .physics import current as current_mod
from .physics import events as events_mod
from .physics import heat as heat_mod
from .physics import potential as potential_mod
from .state import Geometry, PhysParams, SimState, build_simulation
from .structure import write_xyz


# ----------------------------------------------------------------------------
# jitted phases (used by the modular, per-phase-timed driver mode)
# ----------------------------------------------------------------------------

@jax.jit
def _phase_charge(geom, state):
    return charge_mod.update_charge(geom, state)


@jax.jit
def _phase_boundary(geom, params, state, Vd):
    return potential_mod.solve_boundary_potential(geom, params, state, Vd)


@jax.jit
def _phase_poisson(geom, params, state):
    if params.poisson_compact_cap > 0:
        state, n = potential_mod.poisson_gridless_compact(
            geom, params, state, cap=params.poisson_compact_cap
        )
        return state, {"n_charged_sites": n}
    return potential_mod.poisson_gridless(geom, params, state), {}


@jax.jit
def _phase_cb_edge(geom, params, state, Vd):
    return potential_mod.solve_cb_edge(geom, params, state, Vd)


@jax.jit
def _phase_events(geom, params, state):
    return events_mod.execute_superstep(geom, params, state)


@jax.jit
def _phase_power(geom, params, state, Vd, cc=None):
    return current_mod.update_power(geom, params, state, Vd, cc=cc)


@jax.jit
def _phase_transport_cache(geom, params, state):
    return current_mod.assemble_transport_cache(geom, params, state)


@functools.partial(jax.jit, static_argnames=("cg_maxiter",))
def _phase_power_chunk(geom, params, state, Vd, cc=None, cg_maxiter=20000):
    return current_mod.update_power(
        geom, params, state, Vd, cg_maxiter=cg_maxiter, cc=cc
    )


@jax.jit
def _phase_heat(geom, params, heat, state, step_time):
    return heat_mod.update_temperature(geom, params, heat, state, step_time)


# bounded-substep pieces of the matrix-free LOCAL heat model, for
# phase-per-dispatch drivers (the in-superstep transient can need ~1000
# CG substeps — unbounded, that single dispatch exceeds the relay
# watchdog at crossbar scale)
@jax.jit
def _phase_heat_window(geom, params, heat, state, temp, n_sub):
    return heat_mod.local_cg_transient_window(
        geom, params, heat, state, temp, n_sub
    )


@jax.jit
def _phase_heat_steady(geom, params, heat, state, temp):
    return heat_mod.local_cg_steady(geom, params, heat, state, temp)


@jax.jit
def _phase_heat_finish(geom, params, state, temp):
    return heat_mod.finish_local_temperature(geom, params, state, temp)


#: transient local-heat substeps per dispatch in chunked/phased drivers
HEAT_SUBSTEPS_PER_DISPATCH = 64


def run_heat_phase_chunked(geom, params, heat, state, step_time):
    """Local-cg heat phase as bounded-substep dispatches (host loop);
    falls through to the single-dispatch path for the global/dense
    models.  Returns (state, metrics)."""
    if not (
        params.solve_heating_local and not params.solve_heating_global
        and heat is not None and heat.method == "cg" and heat.n_interface
    ):
        return _phase_heat(geom, params, heat, state, step_time)
    st_f = float(step_time)
    dt = float(params.delta_t)
    temp = state.temperature
    if st_f > 1e3 * dt:
        temp = _phase_heat_steady(geom, params, heat, state, temp)
    else:
        n_sub = int(st_f / dt) + 1
        W = HEAT_SUBSTEPS_PER_DISPATCH
        for k0 in range(0, n_sub, W):
            temp = _phase_heat_window(
                geom, params, heat, state, temp,
                jnp.asarray(min(W, n_sub - k0), jnp.int32),
            )
    return _phase_heat_finish(geom, params, state, temp)


def make_superstep(geom: Geometry, params: PhysParams, heat):
    """Build the fused jitted superstep: all enabled phases in one XLA
    program.  Returns (state, step_time, metrics).

    geom/heat are passed as traced arguments (not closure constants) so the
    compiled program does not embed the big static arrays as literals.
    """
    from .superstep import superstep_impl

    jitted = jax.jit(superstep_impl)

    def superstep(state: SimState, Vd, cc=None):
        return jitted(geom, params, heat, state, Vd, cc)

    return superstep


def make_modular_superstep(
    geom: Geometry, params: PhysParams, heat, chunk_iters: int = 0
):
    """Per-phase superstep with host syncs between phases, emitting the
    reference's per-module timing keys (src/kmc_main.cpp:272-277,
    consumed by the timing postprocessing).

    ``chunk_iters > 0`` additionally replaces the two unbounded
    in-superstep CG solves (boundary re-solve, transport re-solve) with
    host loops of bounded-maxiter segments (restarted CG) so no single
    device dispatch runs long — the 500k+ multi-step driver (pair with
    ``cfg.solver_chunk_iters`` for the bias-start cold solves).
    Converged results equal the fused path to solver tolerance."""

    def superstep(state: SimState, Vd, cc=None):
        metrics: Dict = {}

        def timed(key, fn, *a):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            metrics[f"Z - calculation time - {key} [s]"] = (
                time.perf_counter() - t0
            )
            return out

        if params.solve_potential:
            state, m = timed("charge", _phase_charge, geom, state)
            metrics.update(m)
            if chunk_iters > 0:
                t0 = time.perf_counter()
                pchunk = params.replace(solver_maxiter=chunk_iters)
                total_b = 0
                for _ in range(1000):
                    state, m = _phase_boundary(geom, pchunk, state, Vd)
                    it = int(m["cg_iters_boundary"])
                    total_b += it
                    if it < chunk_iters:
                        break
                    # defeat the exact-skip for the next segment (it would
                    # see an unchanged network and return the unconverged
                    # field)
                    state = state.replace(
                        Vd_prev=jnp.full_like(state.Vd_prev, jnp.nan)
                    )
                else:
                    raise RuntimeError(
                        "chunked boundary re-solve failed to converge"
                    )
                m["cg_iters_boundary"] = jnp.asarray(total_b, jnp.int32)
                metrics["Z - calculation time - potential from boundaries "
                        "[s]"] = time.perf_counter() - t0
            else:
                state, m = timed(
                    "potential from boundaries", _phase_boundary,
                    geom, params, state, Vd,
                )
            metrics.update(m)
            state, m = timed(
                "potential from charges", _phase_poisson, geom, params, state
            )
            metrics.update(m)

        step_time = jnp.asarray(0.0, params.dtype)
        if params.perturb_structure:
            res = timed("kmc events", _phase_events, geom, params, state)
            state, step_time = res.state, res.step_time
            metrics["n_events"] = res.n_events
            metrics["n_active_rows"] = res.n_active

        if params.solve_current:
            if chunk_iters > 0:
                # pre-converge the transport network in bounded segments,
                # committing the warm start (+ the deterministic
                # incremental tunnel store) between dispatches; the final
                # timed dispatch does the extraction from a converged start
                t0 = time.perf_counter()
                total_t = 0
                for _ in range(1000):
                    st, m = _phase_power_chunk(
                        geom, params, state, Vd, cc=cc,
                        cg_maxiter=chunk_iters,
                    )
                    rep = {"virtual_potentials": st.virtual_potentials}
                    if getattr(params, "transport_incremental", False):
                        rep.update(
                            tt_slot_atom=st.tt_slot_atom, tt_vm=st.tt_vm,
                            tt_vv=st.tt_vv, tt_valid=st.tt_valid,
                        )
                    state = state.replace(**rep)
                    total_t += int(m["cg_iters_power"])
                    if bool(m["transport_converged"]):
                        break
                else:
                    raise RuntimeError(
                        "chunked transport re-solve failed to converge"
                    )
                state, m = _phase_power_chunk(
                    geom, params, state, Vd, cc=cc, cg_maxiter=chunk_iters
                )
                m["cg_iters_power"] = jnp.asarray(
                    total_t + int(m["cg_iters_power"]), jnp.int32
                )
                metrics["Z - calculation time - dissipated power [s]"] = (
                    time.perf_counter() - t0
                )
            else:
                (state, m) = timed(
                    "dissipated power", _phase_power, geom, params, state,
                    Vd, cc,
                )
            metrics.update(m)
            if params.solve_heating_global or params.solve_heating_local:
                if chunk_iters > 0:
                    state, m = timed(
                        "temperature", run_heat_phase_chunked,
                        geom, params, heat, state, step_time,
                    )
                else:
                    state, m = timed(
                        "temperature", _phase_heat, geom, params, heat,
                        state, step_time,
                    )
                metrics.update(m)

        return state, step_time, metrics

    return superstep


# ----------------------------------------------------------------------------
# driver
# ----------------------------------------------------------------------------

class Simulation:
    """End-to-end KMC simulation (reference: src/kmc_main.cpp main loop)."""

    def __init__(
        self,
        cfg: KMCConfig,
        elements: Optional[np.ndarray] = None,
        coords: Optional[np.ndarray] = None,
        fused: bool = True,
        mesh=None,
        decomposition: str = "replicate",
    ):
        """``mesh``: an optional 1-D jax.sharding.Mesh ("sites" axis).

        ``decomposition`` (with a mesh):
          * ``"replicate"`` — pair arrays sharded by site row, field vectors
            replicated (parallel/sharding.py); exact, memory cost O(N) per
            device.
          * ``"halo"`` — x-slab domain decomposition with halo exchange for
            every phase (parallel/halo_superstep.py); memory cost O(N/ndev)
            per device.  Requires graph bandwidth <= slab size.  Carries
            the full pipeline: transport needs ``transport='blocked'`` and
            local heating needs ``heat_solver='cg'`` (the dense variants
            cannot shard and are rejected loudly).
        """
        self.cfg = cfg
        self.mesh = mesh
        self.decomposition = decomposition if mesh is not None else "none"
        ndev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        if self.decomposition == "halo":
            from .physics.events import _BLOCK

            pad_to = ndev * _BLOCK
        else:
            pad_to = ndev
        self.geom, self.params, self.state = build_simulation(
            cfg, elements=elements, coords=coords, pad_to=pad_to
        )
        self._halo_width = None
        if self.decomposition == "halo":
            from .parallel.halo_superstep import (
                required_halo, shard_halo_simulation,
            )

            self._halo_width = required_halo(self.geom)
            self.geom, self.state = shard_halo_simulation(
                self.geom, self.state, mesh
            )
        elif mesh is not None:
            from .parallel.sharding import shard_simulation

            self.geom, self.state = shard_simulation(self.geom, self.state, mesh)
        if cfg.solve_heating_local:
            elems_np = np.asarray(self.state.element)
            self.heat = heat_mod.build_heat_model(
                self.geom, self.params, cfg, elems_np,
                np.asarray(self.geom.neigh_idx),
                method=getattr(cfg, "heat_solver", "dense"),
            )
        else:
            self.heat = heat_mod.empty_heat_model(self.params)
        self.fused = fused
        if cfg.poisson_compact_cap == -1:
            self.params = self.params.replace(
                poisson_compact_cap=self._auto_poisson_cap()
            )
        if cfg.active_rows_cap == -1:
            self.params = self.params.replace(
                active_rows_cap=self._auto_active_cap()
            )
        if cfg.tunnel_vac_cap == -1 and cfg.solve_current:
            # n_vac <= V+Od species count, the same bound the Poisson
            # bucket uses
            self.params = self.params.replace(
                tunnel_vac_cap=self._auto_poisson_cap()
            )
        if (
            cfg.solve_current and self.params.transport == "blocked"
            and getattr(self.params, "transport_cc", "stored") != "stored"
        ):
            # resolve "auto" (stored while the metal block fits, on-the-fly
            # Pallas kernel beyond — current.resolve_transport_cc) and
            # test-compile the fly kernel with the usual fallback contract
            mode = current_mod.resolve_transport_cc(
                self.params.transport_cc,
                int(self.geom.atom_metalp_idx.shape[0]),
                self.params.mixed or self.params.dtype == jnp.float32,
            )
            if mode == "fly":
                try:
                    from .ops.pairwise_pallas import on_tpu_default_device
                    from .ops.wkb_pallas import wkb_fly_matvec

                    _env = current_mod.wkb_env(self.geom, self.params)
                    _y = wkb_fly_matvec(
                        jnp.arange(24, dtype=jnp.float32).reshape(8, 3),
                        jnp.zeros(8, jnp.float32), jnp.ones(8, jnp.float32),
                        _env, interpret=not on_tpu_default_device(),
                    )
                    jax.block_until_ready(_y)
                except Exception as e:
                    import sys

                    print(
                        f"WARNING: pallas on-the-fly WKB kernel unavailable "
                        f"({type(e).__name__}); falling back to the stored "
                        f"metal block (may not fit at this scale)",
                        file=sys.stderr,
                    )
                    mode = "stored"
            self.params = self.params.replace(transport_cc=mode)
        if cfg.solve_current and self.params.transport == "blocked" \
                and mesh is None:
            # persistent tunnel blocks: resolve "auto" now that the final
            # vcap and n_mp are known, then size the state fields.  Halo
            # runs keep it off (the halo path has its own transport).
            inc = current_mod.resolve_transport_incremental(
                getattr(cfg, "transport_incremental", "auto"),
                self.params, int(self.geom.atom_metalp_idx.shape[0]),
            )
            self.params = self.params.replace(transport_incremental=inc)
        from .state import attach_tunnel_state

        self.state = attach_tunnel_state(self.state, self.geom, self.params)
        if self.params.poisson_kernel == "pallas":
            # the remote Mosaic compiler is not always available: test-compile
            # the kernel on a tiny problem and fall back to the jnp sweep
            try:
                from .ops.pairwise_pallas import (
                    on_tpu_default_device, poisson_pairwise_pallas,
                )

                _v = poisson_pairwise_pallas(
                    jnp.zeros((8, 3)) + jnp.arange(8)[:, None],
                    jnp.arange(8, dtype=jnp.int32),
                    jnp.ones(8), jnp.asarray(3.5e-10), jnp.asarray(1.0),
                    jnp.asarray([20.0, 20.0, 20.0]), False,
                    interpret=not on_tpu_default_device(),
                )
                jax.block_until_ready(_v)
            except Exception as e:   # Mosaic rejection / unsupported device
                import sys

                print(
                    f"WARNING: pallas Poisson kernel unavailable "
                    f"({type(e).__name__}); falling back to jnp",
                    file=sys.stderr,
                )
                self.params = self.params.replace(poisson_kernel="jnp")

        if getattr(self.params, "transport_band_kernel", "jnp") == "pallas":
            # same contract as the Poisson kernel: test-compile a tiny band
            # and fall back to the jnp einsum if Mosaic rejects it
            try:
                from .ops.banded_pallas import banded_matvec_pallas
                from .ops.pairwise_pallas import on_tpu_default_device

                _y = banded_matvec_pallas(
                    jnp.zeros((2, 3, 128, 128), jnp.float32),
                    jnp.zeros((4, 128), jnp.float32),
                    interpret=not on_tpu_default_device(),
                )
                jax.block_until_ready(_y)
            except Exception as e:
                import sys

                print(
                    f"WARNING: pallas banded-matvec kernel unavailable "
                    f"({type(e).__name__}); falling back to jnp",
                    file=sys.stderr,
                )
                self.params = self.params.replace(transport_band_kernel="jnp")

        if getattr(self.params, "tunnel_vm_kernel", "jnp") == "pallas":
            try:
                from .ops.pairwise_pallas import on_tpu_default_device
                from .ops.wkb_pallas import wkb_window_block

                _env = current_mod.wkb_env(self.geom, self.params)
                _t = wkb_window_block(
                    jnp.arange(24, dtype=jnp.float32).reshape(8, 3),
                    jnp.zeros(8, jnp.float32), jnp.ones(8, bool),
                    jnp.arange(24, dtype=jnp.float32).reshape(8, 3) + 50.0,
                    jnp.zeros(8, jnp.float32),
                    _env, interpret=not on_tpu_default_device(),
                )
                jax.block_until_ready(_t)
            except Exception as e:
                import sys

                print(
                    f"WARNING: pallas window-integral kernel unavailable "
                    f"({type(e).__name__}); falling back to jnp",
                    file=sys.stderr,
                )
                self.params = self.params.replace(tunnel_vm_kernel="jnp")

        if (
            getattr(self.params, "ell_gather_kernel", "jnp") == "pallas"
            and mesh is None
        ):
            # attach the page/lane gather plan to the geometry: its presence
            # IS the switch read by charge.update_charge and
            # events.build_rate_table (single-device only — the halo and
            # replicated superstep shard geometry arrays by site rows, which
            # the flat plan layout does not follow)
            try:
                from .ops.ell_gather_pallas import (
                    build_ell_gather_plan, ell_gather_pallas,
                )
                from .ops.pairwise_pallas import on_tpu_default_device

                plan = build_ell_gather_plan(np.asarray(self.geom.neigh_idx))
                if plan is None:
                    raise ValueError("window too wide for the page sweep")
                _g = ell_gather_pallas(
                    plan, [jnp.zeros(self.geom.N, jnp.float32)],
                    interpret=not on_tpu_default_device(),
                )
                jax.block_until_ready(_g)
                self.geom = self.geom.replace(
                    gather_page=plan["page"], gather_lane=plan["lane"],
                    gather_mp2=plan["mp2"], gather_bwpad=plan["bwpad"],
                    gather_wp=plan["wp"], gather_rpb=plan["rows_per_block"],
                )
            except Exception as e:
                import sys

                print(
                    f"WARNING: pallas ELL-gather kernel unavailable "
                    f"({type(e).__name__}: {e}); falling back to jnp",
                    file=sys.stderr,
                )
                self.params = self.params.replace(ell_gather_kernel="jnp")

        if self.decomposition == "halo":
            from .parallel.halo_superstep import make_halo_superstep

            self._tstat = self._tspec = self._tsizes = None
            self._halo_cc_fn = None
            if cfg.solve_current:
                if self.params.transport != "blocked":
                    raise ValueError(
                        "halo decomposition requires transport='blocked' "
                        "(the dense X matrix cannot shard); set "
                        "transport = blocked"
                    )
                from .parallel.halo_transport import build_transport_static

                self._tstat, self._tspec, self._tsizes = (
                    build_transport_static(
                        self.geom, self.params,
                        np.asarray(self.state.element), mesh,
                    )
                )
            self._make = lambda g, p, h: make_halo_superstep(
                g, p, h, mesh, self._halo_width,
                tstat=self._tstat, tspec=self._tspec, tsizes=self._tsizes,
            )
        elif mesh is not None:
            from .parallel.sharding import make_sharded_superstep

            self._make = lambda g, p, h: make_sharded_superstep(g, p, h, mesh)
        elif fused:
            self._make = make_superstep
        else:
            # modular mode chains to the chunked in-superstep re-solves
            # when cfg.solver_chunk_iters is set (the 500k+ driver)
            self._make = lambda g, p, h: make_modular_superstep(
                g, p, h, chunk_iters=getattr(cfg, "solver_chunk_iters", 0)
            )
        self._use_batched = (
            getattr(cfg, "batch_steps", 1) > 1 and fused and mesh is None
        )
        self._rebuild_supersteps()
        self._buffer = []
        # per-bias-point metal-block cache for the blocked transport
        # operator (CB edges are constant within a bias point)
        self._cc = None
        # static banded neighbour operator for the blocked transport inner
        # CG (current.build_banded_nb); built once — metal sites and the
        # atom graph never change
        self._band = None
        if (
            cfg.solve_current and cfg.transport == "blocked"
            and getattr(cfg, "transport_banded", False) and mesh is None
        ):
            self._band = current_mod.build_banded_nb(
                self.geom, self.params, self.state
            )
        # driver position for checkpoint/resume: (bias index, step within
        # that bias point)
        self._pos = (0, 0)
        self._async_ckptr = None        # lazy orbax AsyncCheckpointer
        self.output_path = os.path.join(cfg.output_dir, "output.txt")

    def _rebuild_supersteps(self):
        """(Re)jit the per-step and batched superstep entry points for the
        current params (called at init and after any compaction-cap
        growth)."""
        if getattr(self.params, "transport_incremental", False):
            # tunnel_vac_cap growth resizes the persistent tunnel blocks;
            # a fresh (invalid) store makes the next solve a full rebuild
            vcap = self.params.tunnel_vac_cap
            if tuple(self.state.tt_vm.shape) != (
                vcap, int(self.geom.atom_metalp_idx.shape[0])
            ):
                from .state import attach_tunnel_state

                self.state = attach_tunnel_state(
                    self.state, self.geom, self.params
                )
        self._superstep = self._make(self.geom, self.params, self.heat)
        self._msuperstep = None
        if self._use_batched:
            from functools import partial

            from .superstep import multi_superstep_impl

            mj = jax.jit(
                partial(multi_superstep_impl, n_steps=self.cfg.batch_steps)
            )
            self._msuperstep = (
                lambda st, Vd, icc, t_end, limit: mj(
                    self.geom, self.params, self.heat, st, Vd, icc, t_end,
                    cc=self._cc, limit=limit,
                )
            )

    def _auto_poisson_cap(self) -> int:
        """Power-of-two bucket covering every chargeable site (V / Od species
        count bounds the charged count, so compaction stays exact); grown by
        the driver when events approach the bucket."""
        e = np.asarray(self.state.element)
        from .structure import Element

        n_species = int(
            ((e == int(Element.VACANCY)) | (e == int(Element.OXYGEN_DEFECT))).sum()
        )
        cap = 256
        while cap < min(self.geom.N, int(1.3 * n_species) + 8):
            cap *= 2
        return min(cap, self.geom.N)

    def _auto_active_cap(self) -> int:
        """Power-of-two bucket over candidate event-source rows
        (elements in {d, Od, V}); grown (with a redo) if exceeded."""
        from .structure import Element

        e = np.asarray(self.state.element)
        n_src = int(
            ((e == int(Element.DEFECT))
             | (e == int(Element.OXYGEN_DEFECT))
             | (e == int(Element.VACANCY))).sum()
        )
        if n_src > self.geom.N // 8:
            # compaction gathers outweigh the smaller table when the
            # candidate set is a large fraction of N (measured) — use the
            # full table
            return 0
        cap = 1024
        while cap < min(self.geom.N, int(1.25 * n_src) + 16):
            cap *= 2
        return min(cap, self.geom.N)

    @staticmethod
    def _metric_max(metrics: Dict, key: str):
        """Max of a metric over the dispatch (scalar in per-step mode,
        [batch_steps] array in batched mode); None if absent."""
        v = metrics.get(key)
        if v is None:
            return None
        return int(np.max(np.asarray(v)))

    def _maybe_grow_active_cap(self, metrics: Dict) -> bool:
        """Returns True if the last dispatch may have been computed with an
        overflowing row bucket and must be redone."""
        n_active = self._metric_max(metrics, "n_active_rows")
        cap = self.params.active_rows_cap
        if n_active is None or cap <= 0:
            return False
        overflow = n_active >= cap
        if self.cfg.active_rows_cap != -1:
            if overflow:
                raise RuntimeError(
                    f"active-row bucket overflow: n_active={n_active} >= "
                    f"fixed active_rows_cap={cap}; raise the cap (or set -1 "
                    "for automatic growth)"
                )
            return False
        if overflow or n_active > 0.75 * cap:
            new_cap = min(max(cap * 2, 1024), self.geom.N)
            if new_cap != cap:
                self.params = self.params.replace(active_rows_cap=new_cap)
                self._rebuild_supersteps()
        return overflow

    def _maybe_grow_tunnel_cap(self, metrics: Dict) -> bool:
        n_vac = self._metric_max(metrics, "n_vac_atoms")
        cap = self.params.tunnel_vac_cap
        if n_vac is None or cap <= 0:
            return False
        overflow = n_vac >= cap
        if self.cfg.tunnel_vac_cap != -1:
            if overflow:
                raise RuntimeError(
                    f"tunnel vacancy bucket overflow: n_vac={n_vac} >= fixed "
                    f"tunnel_vac_cap={cap}; raise the cap (or set -1)"
                )
            return False
        if overflow or n_vac > 0.75 * cap:
            new_cap = min(max(cap * 2, 256), self.geom.N_atom)
            if new_cap != cap:
                self.params = self.params.replace(tunnel_vac_cap=new_cap)
                self._rebuild_supersteps()
        return overflow

    def _maybe_grow_poisson_cap(self, metrics: Dict) -> bool:
        """Charged-site compaction bucket.  ``n_charged_sites`` is the TRUE
        charged count (potential.poisson_gridless_compact); if it exceeded
        the cap the pair sweep already dropped charges, so the dispatch must
        be redone — the overflow-redo the round-1 driver lacked."""
        cap = self.params.poisson_compact_cap
        if cap <= 0:
            return False
        n_charged = self._metric_max(metrics, "n_charged_sites")
        overflow = n_charged is not None and n_charged > cap
        if self.cfg.poisson_compact_cap != -1:
            if overflow:
                raise RuntimeError(
                    f"Poisson charged-site bucket overflow: "
                    f"n_charged={n_charged} > fixed poisson_compact_cap="
                    f"{cap}; raise the cap (or set -1)"
                )
            return False
        # growth trigger: the V/Od species count (an upper bound on the
        # charged-site count) approaching the bucket, or an actual overflow
        try:
            n_species = sum(
                self._metric_max(metrics, k)
                for k in ("Charged vacancies", "Uncharged vacancies",
                          "Charged oxygen ions", "Uncharged oxygen ions")
            )
        except TypeError:
            n_species = None
        need = max(n_charged or 0, n_species or 0)
        if overflow or (n_species is not None and n_species > 0.75 * cap):
            new_cap = cap
            while new_cap < min(self.geom.N, max(int(1.3 * need) + 8, 256)):
                new_cap *= 2
            new_cap = min(new_cap, self.geom.N)
            if new_cap != cap:
                self.params = self.params.replace(poisson_compact_cap=new_cap)
                self._rebuild_supersteps()
        return overflow

    def _maybe_grow_tunnel_int_steps(self, metrics: Dict) -> bool:
        """Energy-window integration trip count (blocked transport).  The
        solver emits the trip count the contact->trap integral actually
        needed (ceil(max |dE_CB| / 0.01 V)); if it exceeds the static trip
        count the integral was silently truncated — grow to the next power
        of two and redo.  (Round 1 emitted the metric but never checked
        it.)"""
        needed = self._metric_max(metrics, "tunnel_int_steps_needed")
        cur = self.params.tunnel_int_steps
        if needed is None or needed <= cur:
            return False
        new = cur
        while new < needed:
            new *= 2
        self.params = self.params.replace(tunnel_int_steps=new)
        self._rebuild_supersteps()
        return True

    def _redo_exhausted_msg(self, metrics: Dict) -> str:
        """The never-silently-truncate contract: a bucket that still
        overflows after 4 grow-and-redo attempts must fail loudly."""
        counts = {
            k: self._metric_max(metrics, k)
            for k in ("n_active_rows", "n_vac_atoms", "n_charged_sites",
                      "tunnel_int_steps_needed")
            if k in metrics
        }
        caps = {
            k: getattr(self.params, k)
            for k in ("active_rows_cap", "tunnel_vac_cap",
                      "poisson_compact_cap", "tunnel_int_steps")
        }
        return (
            "compaction bucket still overflowing after 4 grow-and-redo "
            f"attempts; counts={counts}, caps={caps}"
        )

    def _check_caps(self, metrics: Dict) -> bool:
        """Grow any overflowing/near-full compaction bucket; True = the
        dispatch was computed on a truncated set and must be redone."""
        redo = self._maybe_grow_active_cap(metrics)
        redo = self._maybe_grow_tunnel_cap(metrics) or redo
        redo = self._maybe_grow_poisson_cap(metrics) or redo
        redo = self._maybe_grow_tunnel_int_steps(metrics) or redo
        return redo

    # -- watchdog-bounded cold solves -------------------------------------
    # The axon relay kills single device dispatches over ~2 minutes; at
    # 500k+ sites a cold bias-change Laplace solve exceeds that in one
    # dispatch.  cfg.solver_chunk_iters > 0 pre-solves the CB-edge and
    # boundary networks at bias start as a host loop of bounded-maxiter CG
    # dispatches (each warm-starting from the last partial solution —
    # restarted CG, more total iterations but every dispatch is short).
    # The first superstep then finds the boundary network converged and
    # takes its exact-skip path.
    def _chunked_cb_edge(self, Vd: float, chunk: int, base_params=None):
        pchunk = (base_params or self.params).replace(solver_maxiter=chunk)
        for _ in range(1000):
            self.state, m = _phase_cb_edge(self.geom, pchunk, self.state, Vd)
            if int(m["cg_iters_cb_edge"]) < chunk:
                return
        raise RuntimeError("chunked CB-edge solve failed to converge")

    def _chunked_boundary(self, Vd: float, chunk: int, base_params=None):
        pchunk = (base_params or self.params).replace(solver_maxiter=chunk)
        # the conductance network needs the current charge state
        self.state, _ = _phase_charge(self.geom, self.state)
        for _ in range(1000):
            self.state, m = _phase_boundary(self.geom, pchunk, self.state, Vd)
            if int(m["cg_iters_boundary"]) < chunk:
                return
            # defeat the exact-skip path for the next chunk (it would see
            # an unchanged network and return the unconverged potential)
            self.state = self.state.replace(
                Vd_prev=jnp.full_like(self.state.Vd_prev, jnp.nan)
            )
        raise RuntimeError("chunked boundary solve failed to converge")

    def _chunked_transport(self, Vd: float, chunk: int):
        """Pre-solve the transport network in bounded-maxiter CG dispatches.

        Commits ONLY the ``virtual_potentials`` warm start — power/I_macro
        stay untouched so the first superstep's IR drop and trajectory are
        identical to an unchunked run; its in-jit transport solve then
        starts converged (or nearly) instead of paying the cold solve in
        one >2-minute dispatch."""
        for _ in range(1000):
            st, m = _phase_power_chunk(
                self.geom, self.params, self.state, Vd,
                cc=self._cc, cg_maxiter=chunk,
            )
            self.state = self.state.replace(
                virtual_potentials=st.virtual_potentials
            )
            # loop on the explicit convergence signal, NOT the iteration
            # count: cg_solve_mixed also exits at max_outer refinement
            # rounds with total inner iters < chunk while the residual is
            # still above tolerance (ADVICE r2)
            if bool(m["transport_converged"]):
                return
        raise RuntimeError("chunked transport solve failed to converge")

    # -- logging ---------------------------------------------------------
    def _log(self, text: str):
        self._buffer.append(text)

    def _flush(self):
        if self._buffer:
            with open(self.output_path, "a") as f:
                f.write("".join(self._buffer))
            self._buffer = []

    def write_snapshot(
        self, step_count: int, folder: str, elem_state=None, field_state=None
    ):
        """Write ``snapshot_<step>.xyz`` (element, x, y, z, phi_total, power
        — reference format src/Device.cpp:236-252).

        The reference writes the step-k snapshot mid-superstep: after the
        field solve but *before* KMC events (src/kmc_main.cpp:198-205), so it
        pairs pre-event elements/power with the current step's potential.
        The fused superstep reproduces that exactly by combining the
        pre-superstep state (``elem_state``: elements, power) with the
        post-superstep state (``field_state``: potentials — events never
        modify the potential fields)."""
        os.makedirs(folder, exist_ok=True)
        es = self.state if elem_state is None else elem_state
        fs = self.state if field_state is None else field_state
        nr = self.geom.N_real
        # rows in FILE order regardless of the internal site ordering
        io = np.asarray(self.geom.io_idx)[:nr]
        phi = np.asarray(fs.potential_boundary + fs.potential_charge)[io]
        power = np.asarray(es.power)[io]
        write_xyz(
            os.path.join(folder, f"snapshot_{step_count}.xyz"),
            np.asarray(es.element)[io],
            np.asarray(self.geom.coords)[io],
            extra_cols=[phi, power],
        )

    # -- checkpointing (full state, beyond the reference's xyz restart) --
    _CKPT_STATE_FIELDS = (
        "element", "charge", "potential_boundary",
        "potential_charge", "CB_edge", "power", "temperature",
        "T_bg", "key", "kmc_time", "I_macro", "P_tot",
        "virtual_potentials", "step_count", "cvac_prev", "Vd_prev",
        "boundary_r", "boundary_b",
        "trans_elem_prev", "trans_charge_prev", "transport_Vd_prev",
    )
    _CKPT_CAP_FIELDS = (
        # compaction caps grown by _check_caps: must survive a resume or
        # the redone growth sequence could diverge from the original run
        "active_rows_cap", "tunnel_vac_cap", "poisson_compact_cap",
        "tunnel_int_steps",
    )

    def _checkpoint_payload(self) -> Dict:
        p = {
            f: np.asarray(getattr(self.state, f))
            for f in self._CKPT_STATE_FIELDS
        }
        for f in self._CKPT_CAP_FIELDS:
            p[f"cap_{f}"] = np.asarray(getattr(self.params, f))
        p["pos_bias_index"] = np.asarray(self._pos[0])
        p["pos_bias_step"] = np.asarray(self._pos[1])
        return p

    def _restore_payload(self, data: Dict):
        kw = {}
        caps = {}
        for f, arr in data.items():
            if f.startswith("cap_"):
                caps[f[4:]] = int(arr)
                continue
            if f == "pos_bias_index":
                self._pos = (int(arr), self._pos[1])
                continue
            if f == "pos_bias_step":
                self._pos = (self._pos[0], int(arr))
                continue
            arr = jnp.asarray(np.asarray(arr))
            cur = getattr(self.state, f)
            if hasattr(cur, "dtype") and f != "key":
                arr = arr.astype(cur.dtype)
            kw[f] = arr
        if "boundary_r" not in data and "Vd_prev" in kw:
            # pre-round-3 checkpoint without the residual anchor: force a
            # full boundary solve on resume (stale-zero r/b must never
            # certify an incremental skip)
            kw["Vd_prev"] = jnp.full_like(kw["Vd_prev"], jnp.nan)
        self.state = self.state.replace(**kw)
        # persistent tunnel blocks are NOT checkpointed (their values are
        # a pure function of the restored element/CB state — the ascending
        # layout makes a full rebuild bit-identical); a live store may be
        # from a later state, so invalidate it
        self.state = self.state.replace(tt_valid=jnp.asarray(False))
        if caps and any(
            caps[k] != getattr(self.params, k) for k in caps
        ):
            self.params = self.params.replace(**caps)
            self._rebuild_supersteps()

    def save_checkpoint(self, path: str, backend: Optional[str] = None):
        """Full-state checkpoint: state arrays + grown compaction caps +
        driver position (bias index / step), enough for a bit-exact resume
        through a bias-point boundary.  ``backend``: "npz" (single file,
        default for *.npz paths), "orbax" (directory; multi-host-aware —
        the production choice at crossbar scale) or "orbax_async"
        (background write: the host snapshot is taken synchronously, the
        disk write overlaps the next supersteps; ``wait_for_checkpoint``
        blocks on the in-flight write — called automatically before the
        next async save and at driver exit)."""
        if backend is None:
            backend = "npz" if path.endswith(".npz") else "orbax"
        payload = self._checkpoint_payload()
        if backend == "npz":
            np.savez(path, **payload)
        elif backend == "orbax":
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(os.path.abspath(path), payload, force=True)
        elif backend == "orbax_async":
            import orbax.checkpoint as ocp

            # one async checkpointer per engine: serialise in-flight writes
            # (orbax requires wait_until_finished before the next save)
            self.wait_for_checkpoint()
            if self._async_ckptr is None:
                self._async_ckptr = ocp.AsyncCheckpointer(
                    ocp.PyTreeCheckpointHandler()
                )
            self._async_ckptr.save(
                os.path.abspath(path), payload, force=True
            )
        else:
            raise ValueError(f"unknown checkpoint backend {backend!r}")

    def wait_for_checkpoint(self):
        """Block until an in-flight ``orbax_async`` save has committed to
        disk.  No-op when none is pending."""
        if getattr(self, "_async_ckptr", None) is not None:
            self._async_ckptr.wait_until_finished()

    def load_checkpoint(self, path: str, backend: Optional[str] = None):
        if backend is None:
            backend = "npz" if path.endswith(".npz") else "orbax"
        self.wait_for_checkpoint()      # an in-flight async save may be
        if backend == "orbax_async":    # the very checkpoint being loaded
            backend = "orbax"
        if backend == "npz":
            data = np.load(path)
            self._restore_payload({f: data[f] for f in data.files})
        elif backend == "orbax":
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            self._restore_payload(ckptr.restore(os.path.abspath(path)))
        else:
            raise ValueError(f"unknown checkpoint backend {backend!r}")

    # -- main loop -------------------------------------------------------
    def run(self, max_steps_per_bias: Optional[int] = None) -> None:
        cfg = self.cfg
        resume_bias, resume_step = self._pos
        if resume_bias == 0 and resume_step == 0:
            if os.path.exists(self.output_path):
                os.remove(self.output_path)

        for vt in range(resume_bias, len(cfg.V_switch)):
            Vd = float(cfg.V_switch[vt])
            t_end = float(cfg.t_switch[vt])
            self._pos = (vt, resume_step if vt == resume_bias else 0)
            summary = self.run_bias_point(
                Vd, t_end, max_steps=max_steps_per_bias,
                resume_step=self._pos[1],
            )
            if not summary.get("completed", True):
                # interrupted by max_steps: leave _pos mid-bias so a
                # checkpoint taken now resumes HERE, not at the next bias
                break
            self._pos = (vt + 1, 0)
        self._flush()
        self.wait_for_checkpoint()

    def run_bias_point(
        self, Vd: float, t_end: float, max_steps: Optional[int] = None,
        resume_step: int = 0,
    ) -> Dict:
        """``resume_step`` > 0 resumes this bias point mid-flight from a
        checkpoint: the CB-edge solve is SKIPPED (the checkpointed CB_edge
        is the bias-start solution — recomputing it from the mid-bias
        element state would diverge from an uninterrupted run), the
        transport metal-block cache is rebuilt from that saved CB edge
        (deterministic), and kmc_time continues from the saved value."""
        cfg, params = self.cfg, self.params
        self._log("--------------------------------\n")
        self._log(f"Applied Voltage = {Vd:g} V\n")
        self._log("--------------------------------\n")

        chunk = getattr(cfg, "solver_chunk_iters", 0)
        # cold bias-start solves run DEFLATED here (the basis-build setup
        # amortises over the many cold iterations: crossbar 186 -> 72 its /
        # 15.2 -> 6.5 s), while the in-superstep re-solves keep
        # cfg.boundary_precond (jacobi default: they are setup-dominated)
        cold_params = self.params.replace(boundary_precond="deflated")
        if params.solve_current:
            # invalidate the unchanged-network transport skip across the
            # bias boundary: consecutive equal biases re-solve the CB edge
            # iteratively, so the networks are not bit-comparable
            self.state = self.state.replace(
                transport_Vd_prev=jnp.full_like(
                    self.state.transport_Vd_prev, jnp.nan
                )
            )
            if getattr(self.params, "transport_incremental", False):
                # the new CB edge changes every tunnel entry: drop the
                # persistent blocks (next solve rebuilds all rows)
                self.state = self.state.replace(tt_valid=jnp.asarray(False))
            if resume_step == 0:
                t0 = time.perf_counter()
                if chunk > 0:
                    self._chunked_cb_edge(Vd, chunk, cold_params)
                else:
                    self.state, _ = _phase_cb_edge(
                        self.geom, cold_params, self.state, Vd
                    )
                jax.block_until_ready(self.state.CB_edge)
                self._log(
                    f"Z - calculation time - CB edge [s]: "
                    f"{time.perf_counter() - t0:.6g}\n"
                )
            if params.transport == "blocked":
                if self.decomposition == "halo":
                    # sharded per-bias metal-block row cache
                    if self._halo_cc_fn is None:
                        from .parallel.halo_superstep import make_halo_cc_cache

                        self._halo_cc_fn = make_halo_cc_cache(
                            self.geom, self.params, self.mesh,
                            self._tstat, self._tspec, self._tsizes,
                        )
                    self._cc = {"cc": self._halo_cc_fn(params, self.state)}
                else:
                    cache = dict(
                        _phase_transport_cache(self.geom, params, self.state)
                    )
                    if self._band is not None:
                        cache["band"] = self._band
                    self._cc = cache
        if params.solve_potential and resume_step == 0:
            # pre-solve the boundary network so the first superstep takes
            # its exact-skip path instead of paying the cold solve in-jit
            self._chunked_boundary(
                Vd, chunk if chunk > 0 else self.params.solver_maxiter,
                cold_params,
            )
        if params.solve_current and chunk > 0 and resume_step == 0 \
                and self.decomposition != "halo":
            # same watchdog-proofing for the cold transport solve (at 75k+
            # atoms a cold blocked-CG solve can exceed the ~2-minute relay
            # dispatch limit in one jitted superstep).  The halo path skips
            # this: its per-device work is already 1/ndev of a dispatch.
            self._chunked_transport(Vd, chunk)

        folder = os.path.join(cfg.output_dir, f"Results_{Vd:.6f}")
        os.makedirs(folder, exist_ok=True)
        self._log(f"Created folder: {folder}\n")

        if resume_step == 0:
            self.state = self.state.replace(
                kmc_time=jnp.zeros_like(self.state.kmc_time)
            )
        I_macro = float(self.state.I_macro)
        step_count = resume_step
        kmc_time = float(self.state.kmc_time)
        summary: Dict = {}

        if self._msuperstep is not None:
            return self._run_bias_point_batched(
                Vd, t_end, folder, max_steps=max_steps,
                resume_step=resume_step,
            )

        while kmc_time < t_end:
            t_start = time.perf_counter()
            self._log("--------------\n")
            self._log(f"KMC step count: {step_count}\n")
            V_vcm = Vd - I_macro * cfg.Rs
            self._log(f"V_vcm: {V_vcm:g}\n")

            prev_state = self.state
            self.state, step_time, metrics = self._superstep(self.state, Vd, self._cc)
            for attempt in range(5):
                # a compaction bucket overflowed: redo the step with the
                # larger cap(s) until every bucket fits
                if not self._check_caps(metrics):
                    break
                if attempt == 4:
                    raise RuntimeError(self._redo_exhausted_msg(metrics))
                self.state = prev_state
                self.state, step_time, metrics = self._superstep(self.state, Vd, self._cc)

            if step_count % cfg.log_freq == 0:
                # reference snapshot semantics: written after the field solve,
                # before events (see write_snapshot docstring)
                self.write_snapshot(
                    step_count, folder,
                    elem_state=prev_state, field_state=self.state,
                )
            step_time = float(step_time)
            jax.block_until_ready(self.state.element)
            dt_step = time.perf_counter() - t_start

            if params.perturb_structure:
                kmc_time += step_time
            else:
                # field-solver debug mode: force-end after 10 steps
                # (src/kmc_main.cpp:212-218)
                if step_count > 10:
                    kmc_time = t_end
            self.state = self.state.replace(
                kmc_time=jnp.asarray(kmc_time, params.dtype)
            )

            I_macro = float(self.state.I_macro)
            result = {k: float(v) for k, v in metrics.items()}

            # solver-divergence warning (reference: 50k-iteration warning,
            # src/iterative_solvers_gpu.cu:452-454)
            for key in ("cg_iters_boundary", "cg_iters_power"):
                if result.get(key, 0) >= self.params.solver_maxiter:
                    self._log(f"WARNING: {key} hit the iteration cap "
                              f"({self.params.solver_maxiter}) — solver may "
                              "not have converged.\n")
            result["Z - calculation time - KMC superstep [s]"] = dt_step
            summary = result

            self._log(f"KMC time is: {kmc_time:g}\n")
            for k in sorted(result):
                self._log(f"{k}: {result[k]:.10g}\n")

            if step_count % cfg.output_freq == 0:
                self._flush()
            step_count += 1
            self._pos = (self._pos[0], step_count)

            if I_macro > cfg.Icc * 1e-6:
                self._log("I_macro > Icc, compliance current reached.\n")
                break
            if max_steps is not None and step_count >= max_steps:
                break
            self._log("--------------------------------------\n")

        self.write_snapshot(step_count, folder)
        self._flush()
        summary["steps"] = step_count
        summary["kmc_time"] = kmc_time
        summary["completed"] = (
            kmc_time >= t_end or I_macro > cfg.Icc * 1e-6
        )
        return summary

    def _run_bias_point_batched(
        self, Vd: float, t_end: float, folder: str,
        max_steps: Optional[int] = None, resume_step: int = 0,
    ) -> Dict:
        """Batched main loop: ``batch_steps`` supersteps per device
        dispatch, with the time-window and compliance checks running
        on-device (superstep.multi_superstep_impl).  Logging granularity is
        unchanged: per-step V_vcm uses the RUNNING I_macro (reconstructed
        from the stacked per-step current metric) and per-step KMC times
        accumulate the stacked step_times, exactly as the per-step driver
        logs them.  Snapshot steps run through the per-step path (batches
        stop at snapshot boundaries via the traced ``limit``), so snapshots
        keep the reference's mid-superstep element/potential pairing
        (src/kmc_main.cpp:198-205)."""
        cfg, params = self.cfg, self.params
        icc_A = cfg.Icc * 1e-6
        step_count = resume_step
        summary: Dict = {}
        kmc_time = float(self.state.kmc_time)
        I_macro = float(self.state.I_macro)
        lf = max(cfg.log_freq, 1)
        next_snap = -(-resume_step // lf) * lf

        while kmc_time < t_end:
            if max_steps is not None and step_count >= max_steps:
                break

            if step_count == next_snap:
                # snapshot step: per-step path for exact reference pairing
                self._log("--------------\n")
                self._log(f"KMC step count: {step_count}\n")
                self._log(f"V_vcm: {Vd - I_macro * cfg.Rs:g}\n")
                t0 = time.perf_counter()
                prev_state = self.state
                self.state, step_time, metrics = self._superstep(
                    self.state, Vd, self._cc
                )
                for attempt in range(5):
                    if not self._check_caps(metrics):
                        break
                    if attempt == 4:
                        raise RuntimeError(self._redo_exhausted_msg(metrics))
                    self.state = prev_state
                    self.state, step_time, metrics = self._superstep(
                        self.state, Vd, self._cc
                    )
                self.write_snapshot(
                    step_count, folder,
                    elem_state=prev_state, field_state=self.state,
                )
                jax.block_until_ready(self.state.element)
                dt = time.perf_counter() - t0
                kmc_time += float(step_time)
                self.state = self.state.replace(
                    kmc_time=jnp.asarray(kmc_time, params.dtype)
                )
                I_macro = float(self.state.I_macro)
                result = {k: float(v) for k, v in metrics.items()}
                result["Z - calculation time - KMC superstep [s]"] = dt
                summary = result
                self._log(f"KMC time is: {kmc_time:g}\n")
                for k in sorted(result):
                    self._log(f"{k}: {result[k]:.10g}\n")
                self._log("--------------------------------------\n")
                step_count += 1
                next_snap += lf
                self._pos = (self._pos[0], step_count)
                self._flush()
                if I_macro > icc_A:
                    self._log("I_macro > Icc, compliance current reached.\n")
                    break
                continue

            # batched dispatch, stopped at the next snapshot boundary
            lim = min(next_snap - step_count, cfg.batch_steps)
            if max_steps is not None:
                lim = min(lim, max_steps - step_count)
            lim_a = jnp.asarray(lim, jnp.int32)

            t0 = time.perf_counter()
            prev_state = self.state
            kmc_start, I_start = kmc_time, I_macro
            self.state, step_times, ms = self._msuperstep(
                self.state, Vd, icc_A, t_end, lim_a
            )
            jax.block_until_ready(self.state.element)
            for attempt in range(5):
                # bucket overflow mid-batch: the whole batch was computed on
                # a truncated set — restore the pre-batch state, grow the
                # cap(s) (recompiles), redo.
                if not self._check_caps(ms):
                    break
                if attempt == 4:
                    raise RuntimeError(self._redo_exhausted_msg(ms))
                self.state = prev_state
                self.state, step_times, ms = self._msuperstep(
                    self.state, Vd, icc_A, t_end, lim_a
                )
                jax.block_until_ready(self.state.element)
            dt_batch = time.perf_counter() - t0

            active = np.asarray(ms["active"])
            n_done = int(active.sum())
            kmc_time = float(self.state.kmc_time)
            I_macro = float(self.state.I_macro)
            st_np = np.asarray(step_times)
            rows = {
                k: np.asarray(v) for k, v in ms.items() if k != "active"
            }
            I_hist = rows.get("Current [uA]")
            t_run, I_run = kmc_start, I_start
            for r in range(n_done):
                self._log("--------------\n")
                self._log(f"KMC step count: {step_count}\n")
                self._log(f"V_vcm: {Vd - I_run * cfg.Rs:g}\n")
                result = {k: float(v[r]) for k, v in rows.items()}
                result["Z - calculation time - KMC superstep [s]"] = (
                    dt_batch / max(n_done, 1)
                )
                summary = result
                t_run += float(st_np[r])
                if I_hist is not None:
                    I_run = float(I_hist[r]) * 1e-6
                self._log(f"KMC time is: {t_run:g}\n")
                for k in sorted(result):
                    self._log(f"{k}: {result[k]:.10g}\n")
                self._log("--------------------------------------\n")
                step_count += 1
            self._pos = (self._pos[0], step_count)
            self._flush()
            if n_done == 0:
                break
            if I_macro > icc_A:
                self._log("I_macro > Icc, compliance current reached.\n")
                break

        self.write_snapshot(step_count, folder)
        self._flush()
        summary["steps"] = step_count
        summary["kmc_time"] = kmc_time
        summary["completed"] = (
            kmc_time >= t_end
            or float(self.state.I_macro) > icc_A
        )
        return summary
