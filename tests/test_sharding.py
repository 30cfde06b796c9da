"""Sharded superstep == single-device superstep, on an 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.engine import make_superstep
from devicekmc_tpu.parallel import make_mesh, make_sharded_superstep, shard_simulation
from devicekmc_tpu.physics import heat as heat_mod
from devicekmc_tpu.physics import potential as potential_mod
from devicekmc_tpu.state import build_geometry, build_params, init_state
from devicekmc_tpu.structure import Element, make_test_structure


@pytest.fixture(scope="module")
def sim_pieces():
    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    elems = s.elements.copy()
    rng = np.random.default_rng(7)
    oxide = np.nonzero(elems == int(Element.O))[0]
    elems[rng.choice(oxide, size=8, replace=False)] = int(Element.VACANCY)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True,
        solve_heating_global=True, perturb_structure=True,
        A=6.25e-19,
    )
    # pad the site axis to a multiple of 8 so it shards evenly
    geom = build_geometry(elems, s.coords, cfg, pad_to=8)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    heat = heat_mod.empty_heat_model(params)
    return cfg, geom, params, state, heat


def test_sharded_matches_single(sim_pieces, cpu_devices):
    cfg, geom, params, state, heat = sim_pieces
    Vd = 2.0

    # single-device reference
    state0, _ = jax.jit(potential_mod.solve_cb_edge)(geom, params, state, Vd)
    step = make_superstep(geom, params, heat)
    ref_state, ref_dt, ref_metrics = step(state0, Vd)

    # sharded over 8 CPU devices
    mesh = make_mesh(8, devices=cpu_devices)
    geom_s, state_s = shard_simulation(geom, state, mesh)
    from devicekmc_tpu.parallel.sharding import solve_cb_edge_sharded

    state_s, _ = solve_cb_edge_sharded(geom_s, params, state_s, Vd, mesh)
    sstep = make_sharded_superstep(geom_s, params, heat, mesh)
    sh_state, sh_dt, sh_metrics = sstep(state_s, Vd)

    # identical trajectories: same RNG stream, same selection, same physics
    np.testing.assert_array_equal(
        np.asarray(ref_state.element), np.asarray(sh_state.element)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_state.charge), np.asarray(sh_state.charge)
    )
    np.testing.assert_allclose(
        np.asarray(ref_state.potential_boundary),
        np.asarray(sh_state.potential_boundary), rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        float(ref_state.I_macro), float(sh_state.I_macro), rtol=1e-6
    )
    assert float(ref_dt) == pytest.approx(float(sh_dt), rel=1e-12)
    assert int(ref_metrics["n_events"]) == int(sh_metrics["n_events"])


def test_mesh_helper(cpu_devices):
    mesh = make_mesh(4, devices=cpu_devices)
    assert mesh.devices.shape == (4,)
    assert mesh.axis_names == ("sites",)


def test_simulation_with_mesh(tmp_path, cpu_devices):
    """End-to-end Simulation driver over a 4-device mesh."""
    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.engine import Simulation
    from devicekmc_tpu.structure import make_test_structure

    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, pristine=True,
        initial_vacancy_concentration=0.1, A=6.25e-19,
        output_dir=str(tmp_path),
    )
    mesh = make_mesh(4, devices=cpu_devices)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords, mesh=mesh)
    summary = sim.run_bias_point(2.0, 1e-12, max_steps=3)
    assert summary["steps"] >= 1
    import os

    assert os.path.exists(os.path.join(tmp_path, "output.txt"))

    # same trajectory as the single-device driver
    sim1 = Simulation(cfg, elements=s.elements, coords=s.coords)
    # pad single-device geometry to match (mesh run pads to 4)
    summary1 = sim1.run_bias_point(2.0, 1e-12, max_steps=3)
    assert summary["steps"] == summary1["steps"]
