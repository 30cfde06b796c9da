"""End-to-end driver tests on the small synthetic structure."""

import os

import numpy as np
import pytest

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.engine import Simulation
from devicekmc_tpu.structure import Element, make_test_structure, read_xyz


def _make_cfg(tmp_path, **over):
    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    base = dict(
        lattice=list(s.lattice),
        nn_dist=3.0,
        pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True,
        solve_current=True,
        solve_heating_global=True,
        perturb_structure=True,
        pristine=True,
        initial_vacancy_concentration=0.1,
        A=6.25e-19,
        V_switch=[2.0],
        t_switch=[1e-12],
        log_freq=2,
        output_dir=str(tmp_path),
    )
    base.update(over)
    cfg = KMCConfig(**base)
    return cfg, s


def test_end_to_end_run(tmp_path):
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    summary = sim.run_bias_point(2.0, 1e-12, max_steps=5)
    assert summary["steps"] >= 1
    assert summary["kmc_time"] > 0

    out = open(os.path.join(tmp_path, "output.txt")).read()
    assert "Applied Voltage = 2 V" in out
    assert "Current [uA]:" in out
    assert "Charged vacancies:" in out
    assert "Global temperature [K]:" in out
    assert "KMC time is:" in out
    assert "Z - calculation time - KMC superstep [s]:" in out

    # snapshots written
    folder = os.path.join(tmp_path, "Results_2.000000")
    assert os.path.exists(os.path.join(folder, "snapshot_0.xyz"))
    elems, coords = read_xyz(os.path.join(folder, "snapshot_0.xyz"))
    assert len(elems) == len(s.elements)


def test_full_run_multiple_bias_points(tmp_path):
    cfg, s = _make_cfg(tmp_path, V_switch=[1.0, 2.0], t_switch=[1e-13, 1e-13])
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim.run(max_steps_per_bias=3)
    assert os.path.exists(os.path.join(tmp_path, "Results_1.000000"))
    assert os.path.exists(os.path.join(tmp_path, "Results_2.000000"))


def test_field_solver_debug_mode(tmp_path):
    """perturb_structure=0: fields only, force-end after 10 steps
    (src/kmc_main.cpp:212-218)."""
    cfg, s = _make_cfg(tmp_path, perturb_structure=False)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    summary = sim.run_bias_point(2.0, 1.0)
    assert summary["steps"] == 12  # 0..11 inclusive, then forced end
    # structure unchanged
    np.testing.assert_array_equal(
        np.asarray(sim.state.element),
        Simulation(cfg, elements=s.elements, coords=s.coords).state.element,
    )


def test_restart_roundtrip(tmp_path):
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim.run_bias_point(2.0, 1e-12, max_steps=3)
    folder = os.path.join(tmp_path, "Results_2.000000")
    final = sorted(
        (f for f in os.listdir(folder)),
        key=lambda f: int(f.split("_")[1].split(".")[0]),
    )[-1]

    cfg2, _ = _make_cfg(tmp_path, restart=True,
                        restart_xyz_file=os.path.join(folder, final),
                        pristine=False)
    sim2 = Simulation(cfg2)
    # element configuration carried over through the snapshot
    np.testing.assert_array_equal(
        np.asarray(sim2.state.element), np.asarray(sim.state.element)
    )


def test_checkpoint_roundtrip(tmp_path):
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim.run_bias_point(2.0, 1e-12, max_steps=2)
    ckpt = os.path.join(tmp_path, "ckpt.npz")
    sim.save_checkpoint(ckpt)

    sim2 = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim2.load_checkpoint(ckpt)
    np.testing.assert_array_equal(
        np.asarray(sim2.state.element), np.asarray(sim.state.element)
    )
    np.testing.assert_array_equal(
        np.asarray(sim2.state.key), np.asarray(sim.state.key)
    )
    assert float(sim2.state.T_bg) == float(sim.state.T_bg)


def test_modular_driver_emits_timing_keys(tmp_path):
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords, fused=False)
    sim.run_bias_point(2.0, 1e-12, max_steps=2)
    out = open(os.path.join(tmp_path, "output.txt")).read()
    for key in ("charge", "potential from boundaries", "potential from charges",
                "kmc events", "dissipated power"):
        assert f"Z - calculation time - {key} [s]:" in out, key


def test_simulation_blocked_transport_matches_dense(tmp_path):
    """Simulation with transport='blocked' (incl. the per-bias-point metal
    block cache) reproduces the dense-transport trajectory."""
    import dataclasses

    import numpy as np

    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.engine import Simulation
    from devicekmc_tpu.structure import make_test_structure

    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=9)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, pristine=True,
        initial_vacancy_concentration=0.1, A=6.25e-19,
        V_switch=[3.0], t_switch=[1e-12],
        output_dir=str(tmp_path / "blocked"),
        transport="blocked",
    )
    sim_b = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim_b.run(max_steps_per_bias=4)
    assert sim_b._cc is not None          # per-bias cache was built

    cfg_d = dataclasses.replace(
        cfg, transport="dense", output_dir=str(tmp_path / "dense")
    )
    sim_d = Simulation(cfg_d, elements=s.elements, coords=s.coords)
    sim_d.run(max_steps_per_bias=4)
    np.testing.assert_array_equal(
        np.asarray(sim_b.state.element), np.asarray(sim_d.state.element)
    )
    np.testing.assert_allclose(
        float(sim_b.state.I_macro), float(sim_d.state.I_macro), rtol=1e-6
    )
