"""Persistent vacancy tunnel blocks (params.transport_incremental).

Contract: the incremental assembly — gather rows whose atom was already in
the previous ascending bucket, recompute only newly-entered atoms — is
BIT-IDENTICAL to the from-scratch assembly (same per-entry kernels, same
ascending layout, same downstream summation order).  Reference physics
being preserved: the tunnel rows of Device::updatePower
(src/current_solver.cpp:86-154), which in the reference are rebuilt from
scratch on every call.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.physics import current as current_mod
from devicekmc_tpu.physics import heat as heat_mod
from devicekmc_tpu.state import (
    attach_tunnel_state, build_geometry, build_params, init_state,
)
from devicekmc_tpu.structure import Element, make_test_structure
from devicekmc_tpu.superstep import superstep_impl


def _build(incremental: bool, delta_cap: int = 16, vcap: int = 32):
    s = make_test_structure(nx_contact=2, nx_oxide=8, ny=3, nz=3, seed=3)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True,
        transport="blocked", tunnel_vac_cap=vcap, precision="mixed",
        A=6.25e-19,
    )
    elems = s.elements.copy()
    rng = np.random.default_rng(7)
    oxide = np.nonzero(elems == int(Element.O))[0]
    elems[rng.choice(oxide, size=10, replace=False)] = int(Element.VACANCY)
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg).replace(
        transport_incremental=incremental, transport_delta_cap=delta_cap,
    )
    state = attach_tunnel_state(init_state(geom, cfg, elems), geom, params)
    return geom, params, state


def _run(incremental, n_steps=6, Vd=8.0, delta_cap=16):
    geom, params, state = _build(incremental, delta_cap=delta_cap)
    heat = heat_mod.empty_heat_model(params)
    step = jax.jit(superstep_impl)
    # bias-start CB edge (entries depend on it)
    from devicekmc_tpu.physics.potential import solve_cb_edge

    state, _ = jax.jit(solve_cb_edge)(geom, params, state, Vd)
    ms = []
    for _ in range(n_steps):
        state, _, m = step(geom, params, heat, state, Vd)
        ms.append(m)
    return geom, params, state, ms


def test_incremental_trajectory_identical():
    """incremental on == off through supersteps with events (vacancies
    entering/leaving the bucket).  Discrete trajectory (elements, charges,
    RNG stream, iteration counts) must be EQUAL; continuous fields agree
    to XLA program-variant rounding (the two configurations compile to
    different fused programs, whose elementwise rounding can differ at the
    last f32 ulp — measured 2e-13 absolute on I_macro; the store itself is
    bit-exact against the full assembly, see the next test)."""
    g_on, p_on, st_on, m_on = _run(True)
    _, _, st_off, m_off = _run(False)
    for f in ("element", "charge", "key", "kmc_time"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_on, f)), np.asarray(getattr(st_off, f)), f
        )
    for f in ("I_macro", "P_tot", "T_bg", "virtual_potentials", "power"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_on, f)), np.asarray(getattr(st_off, f)),
            rtol=1e-5, atol=1e-8, err_msg=f,
        )
    for a, b in zip(m_on, m_off):
        np.testing.assert_array_equal(
            np.asarray(a["cg_iters_power"]), np.asarray(b["cg_iters_power"])
        )
        np.testing.assert_array_equal(
            np.asarray(a["n_events"]), np.asarray(b["n_events"])
        )
    # events actually fired (the bucket churned) — otherwise this test
    # proves nothing
    assert sum(int(m["n_events"]) for m in m_on) >= 3


def test_incremental_store_matches_full_assembly():
    """At every churn step the partial update equals the full rebuild of
    the same state, entry for entry — exercised through the SAME compiled
    superstep program via an invalidated-store twin (tt_valid=False takes
    the full-rebuild branch).  [A standalone jitted-assembly reference
    compiled at this point in the suite reproducibly segfaults XLA:CPU's
    backend_compile — jaxlib environment bug, values verified identical
    when it does compile.]"""
    geom, params, state, _ = _run(True, n_steps=2)
    heat = heat_mod.empty_heat_model(params)
    step = jax.jit(superstep_impl)
    nan_prev = jnp.full_like(state.transport_Vd_prev, jnp.nan)
    churned = 0
    for _ in range(4):
        st_full, _, _ = step(
            geom, params, heat,
            state.replace(tt_valid=jnp.asarray(False),
                          transport_Vd_prev=nan_prev), 8.0,
        )
        state, _, m = step(
            geom, params, heat,
            state.replace(transport_Vd_prev=nan_prev), 8.0,
        )
        np.testing.assert_array_equal(
            np.asarray(state.tt_vm), np.asarray(st_full.tt_vm)
        )
        np.testing.assert_array_equal(
            np.asarray(state.tt_vv), np.asarray(st_full.tt_vv)
        )
        np.testing.assert_array_equal(
            np.asarray(state.tt_slot_atom), np.asarray(st_full.tt_slot_atom)
        )
        churned += int(m["n_events"])
    assert churned >= 1                      # the bucket actually churned
    # and the store is marked valid with the ascending bucket recorded
    assert bool(state.tt_valid)
    sa = np.asarray(state.tt_slot_atom)
    occ = sa[sa >= 0]
    assert occ.size == 0 or (np.diff(occ) > 0).all()   # ascending, unique


def test_incremental_delta_cap_overflow_falls_back():
    """delta_cap=0 forces the full-rebuild branch whenever any atom entered
    the bucket — trajectory must still be bit-identical."""
    _, _, st_a, _ = _run(True, delta_cap=0)
    _, _, st_b, _ = _run(False)
    for f in ("element", "I_macro", "virtual_potentials"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_a, f)), np.asarray(getattr(st_b, f)), f
        )


def test_incremental_invalidation_rebuilds():
    """tt_valid=False (bias boundary / resume) forces a full rebuild that
    leaves the same state as never having invalidated."""
    geom, params, state, _ = _run(True, n_steps=3)
    heat = heat_mod.empty_heat_model(params)
    step = jax.jit(superstep_impl)
    st_inv = state.replace(
        tt_valid=jnp.asarray(False),
        # defeat the exact unchanged-network skip so the solve actually
        # runs and rebuilds the store
        transport_Vd_prev=jnp.full_like(state.transport_Vd_prev, jnp.nan),
    )
    st_cont = state.replace(
        transport_Vd_prev=jnp.full_like(state.transport_Vd_prev, jnp.nan),
    )
    st1, _, _ = step(geom, params, heat, st_inv, 8.0)
    st2, _, _ = step(geom, params, heat, st_cont, 8.0)
    for f in ("element", "I_macro", "virtual_potentials", "tt_vm", "tt_vv"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st1, f)), np.asarray(getattr(st2, f)), f
        )


def test_resolve_transport_incremental():
    geom, params, _ = _build(False)
    n_mp = int(geom.atom_metalp_idx.shape[0])
    assert current_mod.resolve_transport_incremental("auto", params, n_mp)
    assert not current_mod.resolve_transport_incremental("off", params, n_mp)
    # dense transport is ineligible
    pd = params.replace(transport="dense")
    assert not current_mod.resolve_transport_incremental("auto", pd, n_mp)
    with pytest.raises(ValueError):
        current_mod.resolve_transport_incremental("on", pd, n_mp)
    # memory gate
    big = params.replace(tunnel_vac_cap=1 << 20)
    assert not current_mod.resolve_transport_incremental(
        "auto", big, 1 << 20
    )


def test_engine_auto_resolves_and_runs(tmp_path):
    """Simulation resolves 'auto' on for blocked runs, drives a bias point,
    and matches an incremental-off run bit for bit."""
    s = make_test_structure(nx_contact=2, nx_oxide=8, ny=3, nz=3, seed=3)

    def build(mode):
        from devicekmc_tpu.engine import Simulation

        d = tmp_path / mode
        d.mkdir(exist_ok=True)
        cfg = KMCConfig(
            lattice=list(s.lattice), nn_dist=3.0,
            num_atoms_first_layer=s.num_atoms_first_layer,
            num_layers_contact=s.num_layers_contact,
            num_atoms_contact=s.num_atoms_contact, layers=s.layers,
            solve_potential=True, solve_current=True,
            solve_heating_global=True, perturb_structure=True,
            transport="blocked", tunnel_vac_cap=64, precision="mixed",
            transport_incremental=mode, A=6.25e-19,
            pristine=True, initial_vacancy_concentration=0.1,
            V_switch=[8.0, 8.0], t_switch=[1.0, 2.0],
            output_dir=str(d),
        )
        return Simulation(cfg, elements=s.elements, coords=s.coords)

    sim_on = build("auto")
    assert sim_on.params.transport_incremental
    sim_off = build("off")
    assert not sim_off.params.transport_incremental
    # two bias points: exercises the bias-boundary invalidation
    for sim in (sim_on, sim_off):
        sim.run(max_steps_per_bias=3)
    for f in ("element", "charge", "I_macro", "virtual_potentials"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sim_on.state, f)),
            np.asarray(getattr(sim_off.state, f)), f,
        )
