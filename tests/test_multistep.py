"""Batched multi-superstep == sequential supersteps, with on-device
time-window and compliance termination."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.physics import heat as heat_mod
from devicekmc_tpu.physics.potential import solve_cb_edge
from devicekmc_tpu.state import build_geometry, build_params, init_state, make_substoichiometric
from devicekmc_tpu.structure import make_test_structure
from devicekmc_tpu.superstep import multi_superstep_impl, superstep_impl


@pytest.fixture(scope="module")
def sim():
    s = make_test_structure(nx_contact=2, nx_oxide=8, ny=4, nz=4, seed=11)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, A=1e-18, rnd_seed_kmc=7,
    )
    elems = make_substoichiometric(s.elements, 0.08, seed=3)
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    state, _ = jax.jit(solve_cb_edge)(geom, params, state, 2.5)
    heat = heat_mod.empty_heat_model(params)
    return geom, params, heat, state


def test_batched_matches_sequential(sim):
    geom, params, heat, state = sim
    K = 5
    st_seq = state
    seq_events = []
    step = jax.jit(superstep_impl)
    for _ in range(K):
        st_seq, dt, m = step(geom, params, heat, st_seq, 2.5)
        seq_events.append(int(m["n_events"]))

    mstep = jax.jit(partial(multi_superstep_impl, n_steps=K))
    st_b, dts, ms = mstep(geom, params, heat, state, 2.5, jnp.inf, jnp.inf)
    np.testing.assert_array_equal(
        np.asarray(st_seq.element), np.asarray(st_b.element)
    )
    assert float(st_seq.kmc_time) == pytest.approx(float(st_b.kmc_time), rel=1e-12)
    assert np.asarray(ms["n_events"]).tolist() == seq_events
    assert np.asarray(ms["active"]).all()


def test_batched_time_window_termination(sim):
    geom, params, heat, state = sim
    # first superstep's clock exceeds a tiny window -> later steps no-op
    mstep = jax.jit(partial(multi_superstep_impl, n_steps=4))
    st_b, dts, ms = mstep(geom, params, heat, state, 2.5, jnp.inf, 1e-30)
    active = np.asarray(ms["active"])
    assert active[0] and not active[1:].any()
    st_one, dt1, _ = jax.jit(superstep_impl)(geom, params, heat, state, 2.5)
    np.testing.assert_array_equal(
        np.asarray(st_one.element), np.asarray(st_b.element)
    )


def test_batched_compliance_termination(sim):
    geom, params, heat, state = sim
    mstep = jax.jit(partial(multi_superstep_impl, n_steps=4))
    # compliance threshold of 0: trips as soon as any positive current flows
    st_b, dts, ms = mstep(geom, params, heat, state, 2.5, 0.0, jnp.inf)
    active = np.asarray(ms["active"])
    if float(st_b.I_macro) > 0:
        assert not active[-1]


def test_driver_batched_mode(tmp_path):
    """Simulation with batch_steps>1 produces equivalent physics and the
    same output schema as per-step mode."""
    import os

    from devicekmc_tpu.engine import Simulation
    from devicekmc_tpu.structure import make_test_structure

    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    base = dict(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, pristine=True,
        initial_vacancy_concentration=0.1, A=6.25e-19,
        V_switch=[2.0], t_switch=[1e-12], log_freq=2,
    )
    cfg1 = KMCConfig(**base, output_dir=str(tmp_path / "a"), batch_steps=1)
    cfg4 = KMCConfig(**base, output_dir=str(tmp_path / "b"), batch_steps=4)
    os.makedirs(cfg1.output_dir); os.makedirs(cfg4.output_dir)

    s1 = Simulation(cfg1, elements=s.elements, coords=s.coords)
    r1 = s1.run_bias_point(2.0, 1e-12, max_steps=8)
    s4 = Simulation(cfg4, elements=s.elements, coords=s.coords)
    r4 = s4.run_bias_point(2.0, 1e-12, max_steps=8)

    np.testing.assert_array_equal(
        np.asarray(s1.state.element), np.asarray(s4.state.element)
    )
    assert r1["kmc_time"] == pytest.approx(r4["kmc_time"], rel=1e-12)
    out = open(os.path.join(cfg4.output_dir, "output.txt")).read()
    assert "Current [uA]:" in out and "KMC step count:" in out

    # batched logging fidelity: every physics line (V_vcm with the RUNNING
    # I_macro, per-step KMC times, metric values) must match the per-step
    # driver's output.txt exactly; only wall-clock timing lines may differ
    def _physics_lines(path):
        return [
            ln for ln in open(path).read().splitlines()
            if not ln.startswith("Z - calculation time")
            and not ln.startswith("-")
            and not ln.startswith("Created folder")
        ]

    assert _physics_lines(os.path.join(cfg4.output_dir, "output.txt")) == \
        _physics_lines(os.path.join(cfg1.output_dir, "output.txt"))

    # batched snapshots keep the reference's mid-superstep element/potential
    # pairing: every snapshot file must be byte-identical to per-step mode
    d1 = os.path.join(cfg1.output_dir, "Results_2.000000")
    d4 = os.path.join(cfg4.output_dir, "Results_2.000000")
    snaps = sorted(f for f in os.listdir(d1) if f.startswith("snapshot"))
    assert snaps and snaps == sorted(
        f for f in os.listdir(d4) if f.startswith("snapshot")
    )
    for f in snaps:
        assert (
            open(os.path.join(d4, f)).read()
            == open(os.path.join(d1, f)).read()
        ), f"snapshot mismatch: {f}"
