"""Exact unchanged-network skip of the in-superstep transport solve
(current.update_power allow_skip): when (element, charge) at atom sites
and Vd match the last converged solve, the stored solution is reused
bit-for-bit instead of paying assembly + setup + criterion matvec.

Reference semantics being preserved: the solve X(element, charge,
CB_edge) v = b of Device::updatePower (src/current_solver.cpp:4-385) run
on an identical network from its own converged warm start returns that
start unchanged — the skip is a no-op by construction."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.physics import current as current_mod
from devicekmc_tpu.state import build_geometry, build_params, init_state
from devicekmc_tpu.structure import Element, make_test_structure
from devicekmc_tpu.superstep import superstep_impl
from devicekmc_tpu.physics import heat as heat_mod


def _build(perturb: bool, skip: bool):
    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=perturb,
        transport_skip_unchanged=skip,
        A=6.25e-19,
    )
    elems = s.elements.copy()
    rng = np.random.default_rng(7)
    oxide = np.nonzero(elems == int(Element.O))[0]
    elems[rng.choice(oxide, size=8, replace=False)] = int(Element.VACANCY)
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    return geom, params, state


def _run(perturb, skip, n_steps=4, Vd=2.0):
    geom, params, state = _build(perturb, skip)
    heat = heat_mod.empty_heat_model(params)
    step = jax.jit(superstep_impl)
    metrics_seq = []
    for _ in range(n_steps):
        state, _, m = step(geom, params, heat, state, Vd)
        metrics_seq.append(m)
    return state, metrics_seq


def test_skip_trajectory_identical_perturb_off():
    """perturb off: every post-first superstep has an identical network, so
    the skip fires on all of them — trajectories must still be bit-equal."""
    st_on, m_on = _run(perturb=False, skip=True)
    st_off, m_off = _run(perturb=False, skip=False)
    for f in ("element", "charge", "I_macro", "P_tot", "T_bg",
              "virtual_potentials", "power"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_on, f)), np.asarray(getattr(st_off, f)), f
        )
    # the skip actually fired: steps 1+ report the reuse sentinel while the
    # no-skip run re-certifies with a real (0-iteration) solve
    assert all(int(m["cg_iters_power"]) == 0 for m in m_on[1:])
    if "transport_rel0" in m_on[1]:
        # -1 sentinel: "skipped", not "converged instantly" (ADVICE r4)
        assert float(m_on[1]["transport_rel0"]) == -1.0
        assert int(m_on[1]["tunnel_int_steps_needed"]) == -1
    # currents logged on skipped steps equal the solved ones
    for a, b in zip(m_on, m_off):
        np.testing.assert_allclose(
            float(a["Current [uA]"]), float(b["Current [uA]"]), rtol=0, atol=0
        )


def test_skip_trajectory_identical_perturb_on():
    """With events firing, solve steps and (rare) skip steps interleave;
    the trajectory must be bit-identical to always-solving."""
    st_on, _ = _run(perturb=True, skip=True, n_steps=5)
    st_off, _ = _run(perturb=True, skip=False, n_steps=5)
    for f in ("element", "charge", "I_macro", "kmc_time",
              "virtual_potentials", "T_bg"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_on, f)), np.asarray(getattr(st_off, f)), f
        )


def test_skip_invalidated_by_element_change():
    """Mutating an atom element between supersteps must force a re-solve
    (the gate compares against the network at the last solve)."""
    geom, params, state = _build(perturb=False, skip=True)
    heat = heat_mod.empty_heat_model(params)
    step = jax.jit(superstep_impl)
    state, _, _ = step(geom, params, heat, state, 2.0)
    I_before = float(state.I_macro)

    # flip one oxide O atom to a vacancy by hand
    ai = np.asarray(geom.atom_ind)
    elem = np.asarray(state.element).copy()
    cand = [i for i in ai if elem[i] == int(Element.O)]
    elem[cand[len(cand) // 2]] = int(Element.VACANCY)
    state = state.replace(element=jnp.asarray(elem))

    state, _, m = step(geom, params, heat, state, 2.0)
    # the solve branch ran: the stored markers reflect the NEW network
    # (I itself may be bit-unchanged if the warm start still certifies)
    np.testing.assert_array_equal(
        np.asarray(state.trans_elem_prev),
        np.asarray(state.element)[np.asarray(geom.atom_ind)],
    )
    del I_before
    # and the next step skips again against the updated markers
    state2, _, m2 = step(geom, params, heat, state, 2.0)
    np.testing.assert_array_equal(
        np.asarray(state2.I_macro), np.asarray(state.I_macro)
    )


def test_skip_blocked_path_branch_avals():
    """The blocked operator's skip: jitting superstep_impl with
    transport='blocked' exercises the lax.cond branch-aval match for the
    blocked-only metrics (transport_rel0 / tunnel_int_steps_needed, with
    their mixed dtypes) — previously verified by inspection only
    (ADVICE r4).  Also asserts skip-on == skip-off trajectories."""
    def build(skip):
        s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
        cfg = KMCConfig(
            lattice=list(s.lattice), nn_dist=3.0, pbc=False,
            num_atoms_first_layer=s.num_atoms_first_layer,
            num_layers_contact=s.num_layers_contact,
            num_atoms_contact=s.num_atoms_contact,
            layers=s.layers,
            solve_potential=True, solve_current=True,
            solve_heating_global=True,
            perturb_structure=False,
            transport="blocked", tunnel_vac_cap=16, precision="mixed",
            transport_skip_unchanged=skip,
            A=6.25e-19,
        )
        elems = s.elements.copy()
        rng = np.random.default_rng(7)
        oxide = np.nonzero(elems == int(Element.O))[0]
        elems[rng.choice(oxide, size=8, replace=False)] = int(Element.VACANCY)
        geom = build_geometry(elems, s.coords, cfg)
        return geom, build_params(cfg), init_state(geom, cfg, elems)

    def run(skip):
        geom, params, state = build(skip)
        heat = heat_mod.empty_heat_model(params)
        step = jax.jit(superstep_impl)
        ms = []
        for _ in range(3):
            state, _, m = step(geom, params, heat, state, 2.0)
            ms.append(m)
        return state, ms

    st_on, m_on = run(True)
    st_off, m_off = run(False)
    for f in ("element", "I_macro", "P_tot", "virtual_potentials"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_on, f)), np.asarray(getattr(st_off, f)), f
        )
    # steps 1+ took the reuse branch: sentinel metrics, 0 iters
    assert all(int(m["cg_iters_power"]) == 0 for m in m_on[1:])
    assert float(m_on[1]["transport_rel0"]) == -1.0
    assert int(m_on[1]["tunnel_int_steps_needed"]) == -1
    # the solve steps of the no-skip run report real diagnostics
    assert int(m_off[1]["tunnel_int_steps_needed"]) >= 0


def test_direct_calls_never_skip():
    """update_power without allow_skip always solves (cold pre-solve and
    test call sites keep their semantics)."""
    geom, params, state = _build(perturb=False, skip=True)
    state1, m1 = current_mod.update_power(geom, params, state, 2.0)
    state2, m2 = current_mod.update_power(geom, params, state1, 2.0)
    # second direct call re-certifies: markers were never written
    assert np.isnan(float(state2.transport_Vd_prev))
