#!/usr/bin/env python
"""Headline benchmark: KMC supersteps/second on the reference's own timing
configuration — the 110,813-site (75,360-atom) 10nm/5-pitch crossbar, restart
snapshot, Vd = 1 V, modules: charge + boundary-potential CG + gridless
Poisson + KMC events (exactly what the committed reference timing log ran:
structures/crossbars/timing_10nm_5pitch/{parameters.txt,output_initial.txt};
solve_current = solve_heating_* = 0).

Baseline: reference GPU build on a P100-class GPU, median superstep wall time
2.04 s => 0.490 supersteps/s (BASELINE.md).

Prints ONE JSON line:
  {"metric": "kmc_supersteps_per_s", "value": ..., "unit": "steps/s",
   "vs_baseline": ...}

Usage: python bench.py [--steps N] [--warmup N] [--precision f32|f64]
       [--structure PATH.xyz] [--synthetic N_SITES]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

BASELINE_STEPS_PER_S = 1.0 / 2.04

CROSSBAR_DIR = "/root/reference/structures/crossbars/timing_10nm_5pitch"
CROSSBAR_XYZ = os.path.join(CROSSBAR_DIR, "reordered_crossbar_10_5_initial.xyz")
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def build_crossbar_sim(precision: str, pad_to: int = 1, site_order: str = "file"):
    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.physics import heat as heat_mod
    from devicekmc_tpu.state import build_geometry, build_params, init_state
    from devicekmc_tpu.structure import build_neighbor_list, read_xyz

    cfg = KMCConfig(
        site_order=site_order,
        lattice=[108.98, 102.3, 102.3],
        nn_dist=3.5,
        pbc=False,
        num_atoms_first_layer=144,
        num_layers_contact=10,
        num_atoms_contact=11520,
        solve_potential=True,
        solve_current=False,
        solve_heating_global=False,
        solve_heating_local=False,
        perturb_structure=True,
        precision=precision,
        # the timing restart snapshot has zero V/Od species; each superstep
        # adds at most a few — 256 slots is exact for any bench length
        # (verified per step via the n_charged_sites metric)
        poisson_compact_cap=256,
        # active-row compaction measured net-negative here (n_active ~ N/3;
        # the compaction gathers outweigh the smaller table)
        active_rows_cap=0,
        solver_tol=1e-8,
    )
    elements, coords = read_xyz(CROSSBAR_XYZ)

    # crossbar sites span x in [-21.02, ~87.9]; widen the default layer table
    # x-extents to cover the full span (the reference's compile-time table
    # covers -22..90, structure_input.h)
    cfg.layers[0].start_x = float(coords[:, 0].min()) - 1.0
    cfg.layers[-1].end_x = float(coords[:, 0].max()) + 1.0

    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, f"nb_crossbar_{len(elements)}.npz")
    if os.path.exists(cache):
        neigh_idx = np.load(cache)["neigh_idx"]
    else:
        t0 = time.time()
        neigh_idx = build_neighbor_list(coords, cfg.lattice, cfg.nn_dist, cfg.pbc)
        print(f"# neighbor list built in {time.time()-t0:.1f}s "
              f"(max_nn={neigh_idx.shape[1]})", file=sys.stderr)
        np.savez_compressed(cache, neigh_idx=neigh_idx)

    geom = build_geometry(
        elements, coords, cfg, neigh_idx=neigh_idx, pad_to=pad_to
    )
    params = build_params(cfg)
    state = init_state(geom, cfg, elements)
    heat = heat_mod.empty_heat_model(params)
    return geom, params, heat, state


def build_full_crossbar_sim(precision: str, vd: float, precond: str = "deflated",
                            bf16_inner: bool = False,
                            pad_to: int = 1, site_order: str = "file",
                            local_heat: bool = False):
    """FULL physics (charge + potentials + KMC + transport + heat) on the
    75,360-atom reference crossbar — beyond the reference's demonstrated
    envelope (its committed crossbar timing runs exclude the current solve;
    the dense X matrix would need 45 GB).  Uses the blocked matrix-free
    transport operator."""
    from devicekmc_tpu.physics import heat as heat_mod
    from devicekmc_tpu.state import build_params, init_state

    geom, params, heat, state = build_crossbar_sim(
        precision, pad_to=pad_to, site_order=site_order
    )
    # re-derive params with the transport/heat modules on
    from devicekmc_tpu.config import KMCConfig

    cfg = KMCConfig(
        lattice=[108.98, 102.3, 102.3], nn_dist=3.5, pbc=False,
        num_atoms_first_layer=144, num_layers_contact=10,
        num_atoms_contact=11520,
        solve_potential=True, solve_current=True,
        # site-resolved local heating (matrix-free CG model) on demand —
        # a regime the reference could not reach at crossbar scale (its
        # dense interface inverse would be [88k]^2, heat_solver.cpp:40-246)
        solve_heating_global=not local_heat,
        solve_heating_local=local_heat, heat_solver="cg",
        perturb_structure=True, precision=precision,
        poisson_compact_cap=256, active_rows_cap=0,
        solver_tol=1e-8,
        transport="blocked",
        # "deflated" = A-DEF2 deflation in the Jacobi-scaled metric
        # (opt in with --precond deflated; the round-1 unscaled coarse
        # variants measured net-slower and were removed, PERFORMANCE.md)
        transport_precond=precond,
        coarse_slabs=24,
        tunnel_vac_cap=256,          # forming run starts vacancy-free
        # window count must cover the CB-edge spread (~Vd + band offsets);
        # checked every step via the tunnel_int_steps_needed metric
        tunnel_int_steps=max(256, int(100 * (abs(vd) + 1.5))),
        transport_bf16_inner=bf16_inner,
        A=102.3e-10 * 102.3e-10,
    )
    params = build_params(cfg)
    if local_heat:
        t0 = time.time()
        from devicekmc_tpu.physics.heat import _num_in_contact_left

        elems_np = np.asarray(state.element)
        # symmetric plate-contact spans: the crossbar's interior metal
        # (interconnect wires) must stay INSIDE the heat domain (see
        # build_heat_model docstring)
        n_l = _num_in_contact_left(elems_np, cfg.num_atoms_contact)
        n_r = _num_in_contact_left(elems_np[::-1], cfg.num_atoms_contact)
        heat = heat_mod.build_heat_model(
            geom, params, cfg, elems_np,
            np.asarray(geom.neigh_idx), method="cg",
            contact_spans=(n_l, n_r),
        )
        print(f"# local-heat cg model: {heat.n_interface} interface sites "
              f"({time.time()-t0:.1f}s build)", file=sys.stderr)
    else:
        heat = heat_mod.empty_heat_model(params)
    return geom, params, heat, state, cfg


TEST1_DIR = "/root/reference/depreciated/tests/1-potential"


def build_full_physics_sim(precision: str):
    """Full coupled pipeline (charge + potentials + KMC + transport + heat)
    on the reference's 9030-site / 5268-atom single device at Vd = 5 V."""
    from devicekmc_tpu.config import parse_parameters
    from devicekmc_tpu.physics import heat as heat_mod
    from devicekmc_tpu.state import build_geometry, build_params, init_state
    from devicekmc_tpu.structure import read_xyz

    cfg = parse_parameters(os.path.join(TEST1_DIR, "parameters.txt"))
    cfg.restart_xyz_file = os.path.join(TEST1_DIR, "snapshot_init.xyz")
    cfg.solve_current = True
    cfg.solve_heating_global = True
    cfg.perturb_structure = True
    cfg.precision = precision
    cfg.solver_tol = 1e-8
    cfg.A = 26.914773122e-10 * 26.6371955996e-10
    cfg.tunnel_vac_cap = 512    # structure has ~100 vacancies; headroom
    cfg.poisson_compact_cap = 512
    cfg.active_rows_cap = 8192  # ~3.9k d/Od/V sites + headroom
    elements, coords = read_xyz(cfg.restart_xyz_file)
    geom = build_geometry(elements, coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elements)
    return geom, params, heat_mod.empty_heat_model(params), state


def build_synthetic_sim(n_sites: int, precision: str):
    """Synthetic stack of comparable size when the reference tree is absent."""
    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.physics import heat as heat_mod
    from devicekmc_tpu.state import (
        build_geometry, build_params, init_state, make_substoichiometric,
    )
    from devicekmc_tpu.structure import make_test_structure

    ny = nz = max(4, int((n_sites / 18) ** (1 / 3)))
    nx_ox = max(8, n_sites // (ny * nz) - 6)
    s = make_test_structure(nx_contact=3, nx_oxide=nx_ox, ny=ny, nz=nz, seed=1)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=False,
        perturb_structure=True, precision=precision,
        poisson_compact_cap=8192, solver_tol=1e-8,
    )
    elems = make_substoichiometric(s.elements, 0.05, seed=5)
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    return geom, params, build_params(cfg), heat_mod.empty_heat_model(params), state


def build_synthetic_crossbar_sim(
    n_sites: int, precision: str, pad_to: int = 1, site_order: str = "file",
    full: bool = False, vd: float = 1.0, precond: str = "deflated",
    substoich: float = 0.02, bar_pitch: int = 0, bar_x_pitch: int = 6,
):
    """Synthetic crossbar (structure.make_crossbar_structure) scaled to
    ~n_sites, same modules as the headline bench (charge + potentials +
    events).  Matches the reference crossbar's composition and neighbour
    statistics (~110.8k sites, max_nn ~52-55, mean_nn ~27) so the
    200k-750k scaling study does not depend on reference xyz files.

    ``full=True`` additionally enables blocked transport + global heating
    (the build_full_crossbar_sim module set) — the ≥500k full-physics
    scaling demonstrations.  The plate-contact synthetic composition
    keeps n_mp (interior metal) modest (~16k at 500k sites), so the
    stored metal block fits; geometries with interior metal at the
    reference crossbar's fraction would need --cc-kernel fly (the
    on-the-fly kernel, ops/wkb_pallas.py) or the halo decomposition
    (--mesh N --decomposition halo), which shards the block by rows."""
    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.physics import heat as heat_mod
    from devicekmc_tpu.state import (
        build_geometry, build_params, init_state, make_substoichiometric,
    )
    from devicekmc_tpu.structure import build_neighbor_list, make_crossbar_structure

    # sites/cell along the stack: 2*nxc + nx_ox*(1 + f) per ny*nz column
    nxc, nxo, f = 10, 24, 0.74
    col = 2 * nxc + nxo * (1 + f)
    ny = nz = max(8, int(round((n_sites / col) ** 0.5)))
    s = make_crossbar_structure(nx_contact=nxc, nx_oxide=nxo, ny=ny, nz=nz,
                                seed=1, bar_pitch=bar_pitch,
                                bar_x_pitch=bar_x_pitch)
    elems = make_substoichiometric(s.elements, substoich, seed=5)
    extra = {}
    if full:
        from devicekmc_tpu.structure import Element

        n_vac = int((elems == int(Element.VACANCY)).sum())
        extra = dict(
            solve_current=True, solve_heating_global=True,
            transport="blocked", transport_precond=precond,
            coarse_slabs=24,
            # vacancy bucket sized from the actual substoichiometric count
            # (grow-and-redo still covers forming growth)
            tunnel_vac_cap=-(-max(n_vac * 2, 256) // 256) * 256,
            tunnel_int_steps=max(256, int(100 * (abs(vd) + 1.5))),
            A=float(s.lattice[1]) * 1e-10 * float(s.lattice[2]) * 1e-10,
        )
    base = dict(
        lattice=list(s.lattice), nn_dist=3.5, pbc=False,
        site_order=site_order,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=False,
        perturb_structure=True, precision=precision,
        poisson_compact_cap=8192, solver_tol=1e-8,
    )
    base.update(extra)
    cfg = KMCConfig(**base)
    os.makedirs(CACHE_DIR, exist_ok=True)
    bar_tag = f"_bars{bar_pitch}x{bar_x_pitch}" if bar_pitch else ""
    cache = os.path.join(CACHE_DIR, f"nb_syncb_{len(elems)}{bar_tag}.npz")
    if os.path.exists(cache):
        neigh_idx = np.load(cache)["neigh_idx"]
    else:
        t0 = time.time()
        neigh_idx = build_neighbor_list(s.coords, cfg.lattice, cfg.nn_dist, cfg.pbc)
        print(f"# neighbor list built in {time.time()-t0:.1f}s "
              f"(max_nn={neigh_idx.shape[1]})", file=sys.stderr)
        np.savez_compressed(cache, neigh_idx=neigh_idx)
    geom = build_geometry(
        elems, s.coords, cfg, neigh_idx=neigh_idx, pad_to=pad_to
    )
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    return geom, params, heat_mod.empty_heat_model(params), state


def make_phased_step(chunk: int):
    """Phase-per-dispatch superstep with CHUNKED in-superstep re-solves.

    At 500k+ sites a single fused-superstep dispatch can exceed the axon
    relay's ~2-minute kill when a post-event boundary or transport
    re-solve goes cold-ish (the round-4 750k blocker).  This driver runs
    each phase as its own dispatch and replaces the two unbounded CG
    solves with host loops of bounded-maxiter segments (restarted CG —
    more total iterations, every dispatch short):

      charge | boundary (chunked) | Poisson | events |
      transport pre-solve (chunked, commits warm start + incremental
      tunnel store) | power (final converged dispatch, extraction) | heat

    Converged results equal the fused path to solver tolerance (restarted
    CG changes the iterate path, not the fixed point).
    """
    import jax
    import jax.numpy as jnp

    from devicekmc_tpu.engine import (
        _phase_boundary, _phase_charge, _phase_events,
        _phase_poisson, _phase_power_chunk, run_heat_phase_chunked,
    )

    def step(geom, params, heat, state, Vd, cc=None):
        metrics = {}
        pchunk = params.replace(solver_maxiter=chunk)
        step_time = jnp.asarray(0.0, params.dtype)
        if params.solve_potential:
            state, m = _phase_charge(geom, state)
            metrics.update(m)
            total_b = 0
            for _ in range(1000):
                state, m = _phase_boundary(geom, pchunk, state, Vd)
                it = int(m["cg_iters_boundary"])
                total_b += it
                if it < chunk:
                    break
                # defeat the exact-skip for the next segment (it would see
                # an unchanged network and return the unconverged field)
                state = state.replace(
                    Vd_prev=jnp.full_like(state.Vd_prev, jnp.nan)
                )
            else:
                raise RuntimeError("chunked boundary re-solve: no converge")
            metrics.update(m)
            metrics["cg_iters_boundary"] = total_b
            state, m = _phase_poisson(geom, params, state)
            metrics.update(m)
        if params.perturb_structure:
            res = _phase_events(geom, params, state)
            state, step_time = res.state, res.step_time
            metrics["n_events"] = res.n_events
            metrics["n_active_rows"] = res.n_active
        if params.solve_current:
            total_t = 0
            for _ in range(1000):
                st, m = _phase_power_chunk(
                    geom, params, state, Vd, cc=cc, cg_maxiter=chunk
                )
                rep = {"virtual_potentials": st.virtual_potentials}
                if params.transport_incremental:
                    # commit the (deterministic) incremental tunnel store
                    # so later segments skip the full re-assembly
                    rep.update(
                        tt_slot_atom=st.tt_slot_atom, tt_vm=st.tt_vm,
                        tt_vv=st.tt_vv, tt_valid=st.tt_valid,
                    )
                state = state.replace(**rep)
                total_t += int(m["cg_iters_power"])
                if bool(m["transport_converged"]):
                    break
            else:
                raise RuntimeError("chunked transport re-solve: no converge")
            # final converged dispatch: extraction (I_macro, power) from the
            # committed warm start — a handful of iterations at most
            state, m = _phase_power_chunk(
                geom, params, state, Vd, cc=cc, cg_maxiter=chunk
            )
            total_t += int(m["cg_iters_power"])
            metrics.update(m)
            metrics["cg_iters_power"] = total_t
            if params.solve_heating_global or params.solve_heating_local:
                # local-cg heat runs as bounded-substep dispatches (the
                # transient can need ~1000 CG substeps when the KMC step
                # time approaches 1e3*delta_t)
                state, m = run_heat_phase_chunked(
                    geom, params, heat, state, step_time
                )
                metrics.update(m)
        jax.block_until_ready(state.element)
        return state, step_time, metrics

    return step


def run_selftest() -> int:
    """On-device fly-vs-stored WKB parity (REAL Mosaic compile when a TPU
    is the default backend, interpret mode otherwise): one matvec, one
    matmat, one pdisp sweep and one window-integral assembly compared
    against the stored tunnel_block path on the live chip.  Catches Mosaic
    lowering regressions that the CPU-interpret test suite
    (tests/test_wkb_fly.py) structurally cannot (VERDICT r4).  Prints one
    JSON line; returns 0 on pass."""
    import jax
    import jax.numpy as jnp

    from devicekmc_tpu import constants as C
    from devicekmc_tpu.ops.pairwise_pallas import on_tpu_default_device
    from devicekmc_tpu.ops.wkb_pallas import (
        wkb_fly_matmat, wkb_fly_matvec, wkb_fly_pdisp, wkb_window_block,
    )
    from devicekmc_tpu.physics.current import (
        _pdisp_rows_cols, tunnel_block, wkb_single_T, wkb_window_T,
    )

    interp = not on_tpu_default_device()
    print(f"# selftest: backend={jax.default_backend()}, "
          f"mosaic={'interpret' if interp else 'native'}", file=sys.stderr)

    rng = np.random.default_rng(1234)
    n = 768
    lattice = np.array([110.0, 70.0, 70.0])
    pos = (rng.random((n, 3)) * lattice).astype(np.float32)
    cb = (rng.random(n) * C.Q_C * 2 - C.Q_C).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    m_e = 0.85 * 9.1093837015e-31
    env = dict(
        cdtype=jnp.float32,
        prefac=jnp.float32(-(np.sqrt(2 * m_e) / C.H_BAR) * (2 / 3)),
        qV0=jnp.float32(C.Q_C * 1.6),
        dE_step=jnp.float32(C.Q_C * 0.01),
        ctol=jnp.float32(C.Q_C * 0.01),
        nn=jnp.float32(3.5),
        lattice=jnp.asarray(lattice, jnp.float32),
        pbc=False,
        n_int_steps=64,
    )
    ones = jnp.ones(n, bool)
    posj, cbj, xj = jnp.asarray(pos), jnp.asarray(cb), jnp.asarray(x)

    # --- host f64 oracle: the exact WKB block (src/current_solver.cpp:
    # 135-154 branch rule) so stored-path and fly-path errors can be
    # attributed independently (XLA lowers x**1.5 to exp(1.5*log x) on
    # TPU; the fly kernels spell it x*sqrt(x) — both are compared to
    # the correctly-rounded numpy value, not to each other)
    def oracle_T(pa, cba, oka, pb, cbb, okb, window=False):
        pa, pb = pa.astype(np.float64), pb.astype(np.float64)
        cba, cbb = cba.astype(np.float64), cbb.astype(np.float64)
        d = pa[:, None, :] - pb[None, :, :]
        dist = np.sqrt((d * d).sum(-1))
        abs_dE = np.abs(cba[:, None] - cbb[None, :])
        elig = (oka[:, None] & okb[None, :] & (abs_dE > float(env["ctol"]))
                & ~(dist < float(env["nn"])))
        safe = np.where(elig, abs_dE, 1.0)
        s = float(env["prefac"]) * (dist * 1e-10) / safe
        qV0 = float(env["qV0"])

        def branch(E1):
            E2 = E1 - safe
            return np.where(
                E2 > 0,
                np.exp(s * (E1 ** 1.5 - np.where(E2 > 0, E2, 0.0) ** 1.5)),
                np.where(E2 < 0, np.exp(s * E1 ** 1.5), 0.0),
            )

        if window:
            acc = np.zeros_like(s)
            for kk in range(env["n_int_steps"]):
                iv = kk * float(env["dE_step"])
                acc += np.where(iv < safe, _branch_at(s, qV0 + iv, safe), 0.0)
            T = acc
        else:
            T = branch(qV0)
        return np.where(elig, -T, 0.0)

    def _branch_at(s, E1, safe):
        E2 = E1 - safe
        return np.where(
            E2 > 0,
            np.exp(s * (E1 ** 1.5 - np.where(E2 > 0, E2, 0.0) ** 1.5)),
            np.where(E2 < 0, np.exp(s * E1 ** 1.5), 0.0),
        )

    ones_np = np.ones(n, bool)
    T_exact = oracle_T(pos, cb, ones_np, pos, cb, ones_np)
    x64 = x.astype(np.float64)

    T_stored = np.asarray(
        tunnel_block(env, posj, cbj, ones, posj, cbj, ones, wkb_single_T)
    ).astype(np.float64)

    errs = {}

    def rel(a, b):
        return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-300))

    # context line: how far the STORED path itself sits from the oracle on
    # this backend (not gated — it is the baseline the blocks always carry)
    errs["stored_block(ctx)"] = rel(T_stored, T_exact)

    y_exact = T_exact @ x64
    y_fly = np.asarray(wkb_fly_matvec(posj, cbj, xj, env, interpret=interp))
    errs["matvec"] = rel(y_fly, y_exact)
    y_sym = np.asarray(wkb_fly_matvec(posj, cbj, xj, env, interpret=interp,
                                      symmetric=True))
    errs["matvec_sym"] = rel(y_sym, y_exact)

    X = rng.standard_normal((n, 8)).astype(np.float32)
    Y_exact = T_exact @ X.astype(np.float64)
    Y_fly = np.asarray(wkb_fly_matmat(posj, cbj, jnp.asarray(X), env,
                                      interpret=interp))
    errs["matmat"] = rel(Y_fly, Y_exact)

    ms = np.abs(x64)
    dM = ms[:, None] - ms[None, :]
    I_cal = T_exact * dM
    fwd = I_cal < 0                     # Vd = 1 > 0
    r_exact = (np.where(fwd, -I_cal, 0.0) * (-dM)).sum(1)
    r_fly = np.asarray(wkb_fly_pdisp(posj, cbj, jnp.abs(xj), 1.0, env,
                                     interpret=interp))
    errs["pdisp"] = rel(r_fly, r_exact)

    nv = 96
    vpos = (rng.random((nv, 3)) * lattice).astype(np.float32)
    vcb = (rng.random(nv) * C.Q_C * 2 - C.Q_C).astype(np.float32)
    v_ok_np = np.arange(nv) < nv - 5
    Tw_exact = oracle_T(vpos, vcb, v_ok_np, pos, cb, ones_np, window=True)
    T_w = np.asarray(wkb_window_block(
        jnp.asarray(vpos), jnp.asarray(vcb), jnp.asarray(v_ok_np),
        posj, cbj, env, interpret=interp,
    ))
    errs["window"] = rel(T_w, Tw_exact)

    # gate: every fly kernel must sit within 10x of the stored path's own
    # f32 distance from the oracle (regression canary, not a precision
    # spec — a Mosaic lowering bug shows up orders of magnitude out)
    tol = max(1e-5, 10.0 * errs["stored_block(ctx)"])
    gated = {k: v for k, v in errs.items() if not k.endswith("(ctx)")}
    ok = all(e <= tol for e in gated.values())
    for k, e in sorted(errs.items()):
        status = "" if k.endswith("(ctx)") else (
            " OK" if e <= tol else " FAIL"
        )
        print(f"# selftest {k}: max rel err vs f64 oracle {e:.2e}{status}",
              file=sys.stderr)
    print(f"# selftest gate: {tol:.2e}", file=sys.stderr)
    print(json.dumps({
        "metric": "fly_selftest_max_rel_err",
        "value": max(gated.values()),
        "unit": "rel",
        "vs_baseline": 1.0 if ok else 0.0,
    }))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument(
        "--precision", default="mixed", choices=["f32", "f64", "mixed"],
        help="mixed = f32 kernels + f64 iterative-refinement solves "
             "(validated against f64, tools/precision_study.py)",
    )
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--synthetic-crossbar", type=int, default=0,
                    help="headline modules on a synthetic crossbar of "
                         "~N sites (scaling studies without reference xyz)")
    ap.add_argument("--full", action="store_true",
                    help="full coupled pipeline (incl. transport+heat) on the "
                         "9030-site reference device; combined with "
                         "--synthetic-crossbar N it enables blocked "
                         "transport + global heat on the synthetic "
                         "structure (the >=500k full-physics scaling runs)")
    ap.add_argument("--full-crossbar", action="store_true",
                    help="full coupled pipeline on the 75,360-atom crossbar "
                         "via the blocked matrix-free transport operator")
    ap.add_argument("--vd", type=float, default=None)
    ap.add_argument("--precond", default="deflated", choices=["jacobi", "deflated"],
                    help="blocked-transport COLD-solve CG preconditioning "
                         "(full-crossbar)")
    ap.add_argument("--warm-precond", default="jacobi",
                    choices=["jacobi", "deflated"],
                    help="IN-SUPERSTEP transport re-solve preconditioning "
                         "(jacobi default: the adaptive inner tolerance "
                         "leaves warm re-solves at 2-8 iterations, making "
                         "the A-DEF2 setup pure overhead — measured "
                         "0.486 -> 0.363 s/step on the full crossbar)")
    ap.add_argument("--bf16-inner", action="store_true",
                    help="store the static band + tunnel-block twins bf16 "
                         "for the f32 inner transport iterations "
                         "(full-crossbar; halves the per-iteration HBM "
                         "stream, auto-tightens the outer tolerance)")
    ap.add_argument("--no-banded", action="store_true",
                    help="disable the static banded neighbour matvec "
                         "(full-crossbar; falls back to the ELL gather)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the superstep over an N-device mesh "
                         "(sharded-path overhead measurement; headline "
                         "modules only)")
    ap.add_argument("--decomposition", default="replicate",
                    choices=["replicate", "halo"],
                    help="mesh decomposition: replicated field vectors vs "
                         "x-slab halo exchange (forces site_order=x)")
    ap.add_argument("--chunk-cold", type=int, default=0,
                    help=">0: pre-solve the cold boundary network as a "
                         "host loop of bounded-maxiter CG dispatches "
                         "(keeps dispatches under the ~2 min relay "
                         "watchdog; enables full modules at 500k+ sites)")
    ap.add_argument("--chunk-transport", type=int, default=0,
                    help=">0: pre-solve the cold transport network as a "
                         "host loop of bounded-maxiter CG dispatches "
                         "(watchdog-proofs the first full-crossbar "
                         "superstep, e.g. under --bf16-inner)")
    ap.add_argument("--events-only", action="store_true",
                    help="disable the potential solves (KMC events module "
                         "alone; bounds dispatch length at 500k+ sites "
                         "under the ~2 min axon relay watchdog)")
    ap.add_argument("--boundary-precond", default="jacobi",
                    choices=["jacobi", "deflated"],
                    help="IN-SUPERSTEP boundary/CB Laplace preconditioning "
                         "(jacobi default: warm re-solves are setup-"
                         "dominated and the incremental-residual fast path "
                         "needs the plain-r criterion; cold solves are "
                         "chunk-dispatched separately)")
    ap.add_argument("--poisson-kernel", default="jnp", choices=["jnp", "pallas"],
                    help="compacted-Poisson pair sweep implementation "
                         "(pallas: VMEM-resident Mosaic kernel, TPU only)")
    ap.add_argument("--cc-kernel", default="auto",
                    choices=["auto", "stored", "fly"],
                    help="metal_p tunnel block: stored (materialised f32, "
                         "per-bias cache) | fly (re-derived in a Pallas "
                         "kernel every matvec — zero HBM residency, the "
                         "only single-chip option beyond ~30k metal atoms) "
                         "| auto (stored under ~3 GB, fly beyond)")
    ap.add_argument("--substoich", type=float, default=0.02,
                    help="synthetic-crossbar initial vacancy fraction of "
                         "oxygen sites (sets the forming-start vacancy "
                         "count and the tunnel_vac_cap bucket; the "
                         "in-superstep window-integral assembly is "
                         "O(vcap * n_mp * int_steps))")
    ap.add_argument("--bars", type=int, default=0, metavar="PITCH",
                    help="synthetic-crossbar interior metal bars: embed "
                         "stacked Ti/N word/bit lines in the oxide at the "
                         "given y/z pitch (3D X-point composition; interior "
                         "metal scales with volume, the transport_cc=fly "
                         "design regime).  0 = plate contacts only")
    ap.add_argument("--bars-x", type=int, default=6, metavar="XPITCH",
                    help="interior-bar x-plane pitch (with --bars): every "
                         "XPITCH-th oxide plane pair becomes a bar plane; "
                         "3 = densest non-shorting packing (single-plane "
                         "oxide gaps, 2a > nn_dist) — used to push n_mp "
                         "past 100k for the cc=fly design-scale runs")
    ap.add_argument("--vm-kernel", default="jnp", choices=["jnp", "pallas"],
                    help="vacancy x metal window-integral assembly (pallas: "
                         "energy-step loop in VMEM per tile, TPU only)")
    ap.add_argument("--band-kernel", default="jnp", choices=["jnp", "pallas"],
                    help="banded transport matvec implementation (pallas: "
                         "single-pass VMEM streaming, TPU only)")
    ap.add_argument("--ell-kernel", default="auto",
                    choices=["auto", "jnp", "pallas"],
                    help="ELL neighbour gather (rate table + charge rule): "
                         "pallas = page-shuffle window sweep (doubles the "
                         "deep-forming headline, 12.3 -> 24.3 steps/s); "
                         "auto = pallas on a real TPU, jnp elsewhere")
    ap.add_argument("--site-order", default="file", choices=["file", "x"],
                    help="internal site ordering (x = bandwidth-reducing "
                         "permutation, I/O stays file-ordered; implied by "
                         "--decomposition halo and --ell-kernel pallas)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (use with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                         "for virtual-mesh runs)")
    ap.add_argument("--batch", type=int, default=1,
                    help="supersteps per device dispatch (amortizes the "
                         "transport's ~90 ms execution-latency floor; "
                         "1 = classic per-step dispatch)")
    ap.add_argument("--local-heat", action="store_true",
                    help="full-crossbar: replace the lumped global "
                         "temperature with the SITE-RESOLVED local heat "
                         "model (matrix-free CG, heat_solver=cg) — a "
                         "regime the reference's dense interface inverse "
                         "([88k]^2 at this scale) cannot reach")
    ap.add_argument("--phase-dispatch", type=int, default=0, metavar="CHUNK",
                    help=">0: phase-per-dispatch superstep with chunked "
                         "in-superstep boundary/transport re-solves "
                         "(bounded-maxiter CG segments; keeps every "
                         "dispatch under the ~2-min relay watchdog — the "
                         "750k+ multi-step driver)")
    ap.add_argument("--coarse-yz", type=int, default=1,
                    help="transverse refinement of the transport deflation "
                         "space: each x-slab splits into N^2 (y,z) blocks "
                         "(captures smooth modes across the crossbar "
                         "wires; targets the ~90-iteration charge-flip "
                         "re-solves)")
    ap.add_argument("--incremental", default="auto",
                    choices=["auto", "on", "off"],
                    help="persistent vacancy tunnel blocks: reuse unchanged "
                         "T_vm/T_vv rows across supersteps (bit-identical "
                         "to from-scratch assembly; kills the ~85 ms "
                         "re-assembly floor).  auto = on for single-device "
                         "blocked transport while the store fits")
    ap.add_argument("--selftest", action="store_true",
                    help="on-device fly-vs-stored WKB parity check (real "
                         "Mosaic when a TPU is present) and exit")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    if args.bf16_inner and args.precision != "mixed":
        # the bf16 twins feed the f32 INNER iterations only and rely on the
        # mixed path's f64 refinement for correctness; in pure f32/f64 mode
        # the whole solve would run on the bf16-perturbed operator with no
        # exact residual pass
        ap.error("--bf16-inner requires --precision mixed")

    import jax

    if args.cpu:
        # the axon register forces jax_platforms="axon,cpu"; force it back
        # so --cpu never touches (or blocks on) the remote TPU backend
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        except RuntimeError:
            pass
    else:
        # backend-init watchdog: a wedged axon relay session makes the
        # PJRT client block forever in make_c_api_client — fail loudly
        # instead of hanging the caller
        import threading

        _ok = threading.Event()
        threading.Thread(
            target=lambda: (jax.devices(), _ok.set()), daemon=True
        ).start()
        if not _ok.wait(600):
            print("# FATAL: accelerator backend init did not complete in "
                  "600 s (axon relay session wedged?) — rerun later or "
                  "use --cpu", file=sys.stderr)
            sys.exit(1)

    if args.selftest:
        sys.exit(run_selftest())

    from devicekmc_tpu.superstep import superstep_impl

    pad_to = 1
    full_transport_scale = args.full_crossbar or (
        args.full and args.synthetic_crossbar
    )
    if args.ell_kernel == "auto":
        from devicekmc_tpu.ops.pairwise_pallas import on_tpu_default_device

        args.ell_kernel = (
            "pallas" if (on_tpu_default_device() and not args.mesh)
            else "jnp"
        )
    if args.phase_dispatch > 0 and (args.mesh or args.batch > 1):
        ap.error("--phase-dispatch is a single-device per-step driver "
                 "(no --mesh/--batch)")
    if args.mesh:
        if (args.full and not args.synthetic_crossbar) or args.batch > 1:
            ap.error("--mesh covers the headline modules (no --full/--batch)")
        if full_transport_scale and args.decomposition != "halo":
            ap.error("--mesh with full transport requires --decomposition "
                     "halo (the replicated mesh path has no sharded "
                     "transport)")
        if args.decomposition == "halo":
            from devicekmc_tpu.physics.events import _BLOCK

            pad_to = args.mesh * _BLOCK
        else:
            pad_to = args.mesh
    site_order = args.site_order
    if args.mesh and args.decomposition == "halo":
        site_order = "x"           # halo slabs are x-contiguous by design
    elif args.ell_kernel == "pallas" and site_order == "file":
        # the page-shuffle gather needs the bandwidth-reducing internal
        # x-sort (file-order crossbar bandwidth ~89k sites: window too wide)
        site_order = "x"
        print("# ell-kernel pallas: forcing site_order=x", file=sys.stderr)

    if args.full_crossbar:
        vd0 = args.vd if args.vd is not None else 1.0
        geom, params, heat, state, _ = build_full_crossbar_sim(
            args.precision, vd0, precond=args.precond,
            bf16_inner=args.bf16_inner,
            pad_to=pad_to, site_order=site_order,
            local_heat=args.local_heat,
        )
    elif args.synthetic_crossbar:
        geom, params, heat, state = build_synthetic_crossbar_sim(
            args.synthetic_crossbar, args.precision,
            pad_to=pad_to, site_order=site_order,
            full=args.full, vd=args.vd if args.vd is not None else 1.0,
            precond=args.precond, substoich=args.substoich,
            bar_pitch=args.bars, bar_x_pitch=args.bars_x,
        )
    elif args.full:
        geom, params, heat, state = build_full_physics_sim(args.precision)
    elif args.synthetic or not os.path.exists(CROSSBAR_XYZ):
        geom, params, _, heat, state = build_synthetic_sim(
            args.synthetic or 100_000, args.precision
        )
    else:
        geom, params, heat, state = build_crossbar_sim(
            args.precision, pad_to=pad_to, site_order=site_order
        )

    if args.poisson_kernel != "jnp":
        params = params.replace(poisson_kernel=args.poisson_kernel)
    if args.coarse_yz > 1:
        params = params.replace(coarse_yz=args.coarse_yz)
    if params.solve_current:
        params = params.replace(transport_warm_precond=args.warm_precond)
    if params.solve_current and params.transport == "blocked":
        from devicekmc_tpu.physics.current import resolve_transport_cc

        n_mp = int(geom.atom_metalp_idx.shape[0])
        cc_mode = resolve_transport_cc(
            args.cc_kernel, n_mp, args.precision in ("mixed", "f32")
        )
        params = params.replace(transport_cc=cc_mode)
        print(f"# transport_cc: {cc_mode} (n_mp={n_mp})", file=sys.stderr)
        if not args.mesh:
            from devicekmc_tpu.physics.current import (
                resolve_transport_incremental,
            )
            from devicekmc_tpu.state import attach_tunnel_state

            inc = resolve_transport_incremental(
                args.incremental, params, n_mp
            )
            params = params.replace(transport_incremental=inc)
            state = attach_tunnel_state(state, geom, params)
            print(f"# transport_incremental: {inc}", file=sys.stderr)
    if args.band_kernel != "jnp":
        params = params.replace(transport_band_kernel=args.band_kernel)
    if args.vm_kernel != "jnp":
        params = params.replace(tunnel_vm_kernel=args.vm_kernel)
    if args.ell_kernel == "pallas" and args.mesh:
        ap.error("--ell-kernel pallas is single-device only (the flat "
                 "page/lane plan does not follow the mesh row sharding)")
    if args.ell_kernel == "pallas":
        from devicekmc_tpu.ops.ell_gather_pallas import build_ell_gather_plan

        plan = build_ell_gather_plan(np.asarray(geom.neigh_idx))
        if plan is None:
            print("# ell-kernel pallas: window too wide, keeping jnp",
                  file=sys.stderr)
        else:
            geom = geom.replace(
                gather_page=plan["page"], gather_lane=plan["lane"],
                gather_mp2=plan["mp2"], gather_bwpad=plan["bwpad"],
                gather_wp=plan["wp"], gather_rpb=plan["rows_per_block"],
            )
    params = params.replace(boundary_precond=args.boundary_precond)
    if args.events_only:
        params = params.replace(solve_potential=False)

    print(f"# N={geom.N} sites, max_nn={geom.max_nn}, "
          f"backend={jax.default_backend()}, precision={args.precision}",
          file=sys.stderr)

    from functools import partial

    import jax.numpy as jnp

    from devicekmc_tpu.superstep import multi_superstep_impl

    if args.mesh:
        from devicekmc_tpu.parallel import (
            make_mesh, make_sharded_superstep, shard_simulation,
        )

        mesh = make_mesh(args.mesh)
        if args.decomposition == "halo":
            from devicekmc_tpu.parallel.halo_superstep import (
                make_halo_superstep, required_halo, shard_halo_simulation,
            )

            halo = required_halo(geom)
            print(f"# halo decomposition: {args.mesh} slabs, "
                  f"halo width {halo}", file=sys.stderr)
            geom, state = shard_halo_simulation(geom, state, mesh)
            halo_transport_tables = None
            if full_transport_scale:
                from devicekmc_tpu.parallel.halo_transport import (
                    build_transport_static,
                )

                halo_transport_tables = build_transport_static(
                    geom, params, np.asarray(state.element), mesh
                )
                tstat, tspec, tsizes = halo_transport_tables
                sfn = make_halo_superstep(
                    geom, params, heat, mesh, halo,
                    tstat=tstat, tspec=tspec, tsizes=tsizes,
                )
            else:
                sfn = make_halo_superstep(geom, params, heat, mesh, halo)
        else:
            geom, state = shard_simulation(geom, state, mesh)
            sfn = make_sharded_superstep(geom, params, heat, mesh)

        def step(geom, params, heat, state, Vd, cc=None):
            return sfn(state, Vd, cc)
    elif args.batch > 1:
        mstep = jax.jit(partial(multi_superstep_impl, n_steps=args.batch))

        def step(geom, params, heat, state, Vd, cc=None):
            st, dts, ms = mstep(geom, params, heat, state, Vd,
                                jnp.inf, jnp.inf, cc=cc)
            last = {k: v[-1] for k, v in ms.items() if k != "active"}
            last["batch_events"] = ms["n_events"].sum()
            return st, dts[-1], last
    elif args.phase_dispatch > 0:
        step = make_phased_step(args.phase_dispatch)
    else:
        step = jax.jit(superstep_impl)
    # default bias: 5 V on the 9030-site reference device (--full), 1 V on
    # crossbar-class runs — MUST match the vd used to size tunnel_int_steps
    # in the builders (a 5 V drive against a 1 V-sized window truncates the
    # contact->trap integral; the tunnel_int_steps_needed warning fires)
    if args.vd is not None:
        Vd = args.vd
    elif args.full and not args.synthetic_crossbar:
        Vd = 5.0
    else:
        Vd = 1.0
    if args.chunk_cold > 0 and params.solve_potential:
        from devicekmc_tpu.physics.charge import update_charge
        from devicekmc_tpu.physics.potential import solve_boundary_potential

        pchunk = params.replace(solver_maxiter=args.chunk_cold)
        state, _ = jax.jit(update_charge)(geom, state)
        fsolve = jax.jit(solve_boundary_potential)
        t0 = time.time()
        total = 0
        for _ in range(1000):
            state, m = fsolve(geom, pchunk, state, Vd)
            it = int(m["cg_iters_boundary"])
            total += it
            if it < args.chunk_cold:
                break
            state = state.replace(
                Vd_prev=jnp.full_like(state.Vd_prev, jnp.nan)
            )
        else:
            raise RuntimeError(
                "chunked cold boundary solve failed to converge in 1000 "
                "dispatches"
            )
        print(f"# chunked cold boundary solve: {total} iterations in "
              f"{time.time()-t0:.0f}s ({args.chunk_cold}/dispatch)",
              file=sys.stderr)
    cc = None
    if args.full or args.full_crossbar:
        from devicekmc_tpu.physics.potential import solve_cb_edge
        if args.chunk_cold > 0:
            # the cold CB-edge solve needs the same watchdog-proofing as
            # the boundary network (engine._chunked_cb_edge): at 500k+ a
            # single cold f64 Laplace dispatch exceeds the ~2-minute relay
            # limit and CRASHES the TPU worker
            fcb = jax.jit(solve_cb_edge)
            pchunk = params.replace(solver_maxiter=args.chunk_cold)
            t0 = time.time()
            total = 0
            for _ in range(1000):
                state, m = fcb(geom, pchunk, state, Vd)
                it = int(m["cg_iters_cb_edge"])
                total += it
                if it < args.chunk_cold:
                    break
            else:
                raise RuntimeError(
                    "chunked CB-edge solve failed to converge in 1000 "
                    "dispatches"
                )
            print(f"# chunked CB-edge solve: {total} iterations in "
                  f"{time.time()-t0:.0f}s ({args.chunk_cold}/dispatch)",
                  file=sys.stderr)
        else:
            state, _ = jax.jit(solve_cb_edge)(geom, params, state, Vd)
        if args.mesh and args.decomposition == "halo":
            # sharded per-bias-point metal-block row cache
            from devicekmc_tpu.parallel.halo_superstep import (
                make_halo_cc_cache,
            )

            tstat, tspec, tsizes = halo_transport_tables
            cc_fn = make_halo_cc_cache(
                geom, params, mesh, tstat, tspec, tsizes
            )
            cc = {"cc": cc_fn(params, state)}
        elif params.transport == "blocked":
            # per-bias-point cache: the metal_p x metal_p tunnel block
            from devicekmc_tpu.physics.current import (
                assemble_transport_cache, build_banded_nb,
            )
            cc = dict(jax.jit(assemble_transport_cache)(geom, params, state))
            if not args.no_banded:
                band = build_banded_nb(geom, params, state)
                if band is not None:
                    cc["band"] = band
                print(f"# banded nb operator: "
                      f"{'on, C=' + str(tuple(band['C'].shape)) if band else 'off (too large)'}",
                      file=sys.stderr)
        if args.chunk_transport > 0 and not args.mesh:
            # pre-solve the transport network in bounded-maxiter dispatches
            # (relay watchdog kills single dispatches over ~2 min; the cold
            # blocked solve under --bf16-inner's tightened tolerance can
            # exceed that inside the first warmup superstep).  Commit ONLY
            # the warm start — trajectory identical to unchunked.
            import functools

            from devicekmc_tpu.physics.current import update_power

            fpow = jax.jit(
                functools.partial(update_power,
                                  cg_maxiter=args.chunk_transport)
            )
            t0 = time.time()
            total = 0
            for _ in range(1000):
                st, m = fpow(geom, params, state, Vd, cc=cc)
                state = state.replace(
                    virtual_potentials=st.virtual_potentials
                )
                total += int(m["cg_iters_power"])
                # explicit convergence signal (iteration count alone is
                # ambiguous when cg_solve_mixed's max_outer binds first)
                if bool(m["transport_converged"]):
                    break
            else:
                raise RuntimeError(
                    "chunked cold transport solve failed to converge in "
                    "1000 dispatches"
                )
            print(f"# chunked cold transport solve: {total} iterations in "
                  f"{time.time()-t0:.0f}s ({args.chunk_transport}/dispatch)",
                  file=sys.stderr)

    t0 = time.time()
    try:
        for _ in range(args.warmup):
            state, st, metrics = step(geom, params, heat, state, Vd, cc)
        jax.block_until_ready(state.element)
    except Exception as e:
        if args.batch > 1:
            # batched program failed to compile (e.g. XLA scoped-vmem issue
            # on large scans) — fall back to per-step dispatch
            print(f"# batch={args.batch} failed ({type(e).__name__}); "
                  "falling back to per-step", file=sys.stderr)
            args.batch = 1
            step = jax.jit(superstep_impl)
            for _ in range(args.warmup):
                state, st, metrics = step(geom, params, heat, state, Vd, cc)
            jax.block_until_ready(state.element)
        else:
            raise
    print(f"# warmup ({args.warmup} steps incl. compile): {time.time()-t0:.2f}s",
          file=sys.stderr)

    times = []
    total_events = 0
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, st, metrics = step(geom, params, heat, state, Vd, cc)
        jax.block_until_ready(state.element)
        dt = time.perf_counter() - t0
        times.append(dt)
        total_events += int(metrics.get("batch_events", metrics["n_events"]))
        if args.verbose:
            extra = ""
            if "cg_iters_power" in metrics:
                extra += f", cg_pow={int(metrics['cg_iters_power'])}"
            if "transport_rel0" in metrics:
                extra += f", rel0={float(metrics['transport_rel0']):.2e}"
            if "tunnel_int_steps_needed" in metrics:
                extra += f", int_steps={int(metrics['tunnel_int_steps_needed'])}"
            if "n_vac_atoms" in metrics:
                extra += f", vac={int(metrics['n_vac_atoms'])}"
            print(f"# step {i}: {dt:.4f}s, events={int(metrics['n_events'])}, "
                  f"cg={int(metrics.get('cg_iters_boundary', -1))}, "
                  f"charged={int(metrics.get('n_charged_sites', -1))}" + extra,
                  file=sys.stderr)
        nch = metrics.get("n_charged_sites")
        if nch is not None and int(nch) >= params.poisson_compact_cap:
            print("# WARNING: charged sites reached compaction cap",
                  file=sys.stderr)
        tin = metrics.get("tunnel_int_steps_needed")
        if tin is not None and int(tin) > params.tunnel_int_steps:
            print(f"# WARNING: tunnel window needs {int(tin)} steps > "
                  f"tunnel_int_steps={params.tunnel_int_steps} (truncated)",
                  file=sys.stderr)
        nva = metrics.get("n_vac_atoms")
        if nva is not None and 0 < params.tunnel_vac_cap <= int(nva):
            print("# WARNING: vacancy count reached tunnel_vac_cap",
                  file=sys.stderr)

    median = float(np.median(times))
    steps_per_s = args.batch / median
    print(f"# median dispatch {median:.4f}s ({args.batch} supersteps), mean {np.mean(times):.4f}s, "
          f"{total_events} events in {args.steps} steps", file=sys.stderr)
    metric_name = "kmc_supersteps_per_s"
    if args.full and args.synthetic_crossbar:
        metric_name = "full_synthetic_crossbar_supersteps_per_s"
    elif args.full:
        metric_name = "full_pipeline_supersteps_per_s"
    elif args.full_crossbar:
        metric_name = "full_crossbar_supersteps_per_s"
    print(json.dumps({
        "metric": metric_name,
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
