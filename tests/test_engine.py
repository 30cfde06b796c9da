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


def test_checkpoint_resume_bit_exact_through_bias_boundary(tmp_path):
    """A run checkpointed mid-bias-point and resumed in a FRESH Simulation
    must reproduce the uninterrupted trajectory bit-exactly: same element
    state, RNG key, warm-start caches, kmc_time and final snapshot.  This
    covers the three resume hazards: the bias-start CB edge must NOT be
    recomputed from the mid-bias element state, the per-bias transport
    cache must be rebuilt from the saved CB edge, and grown compaction
    caps must survive the restart."""
    T = 1e30   # step caps, not the time window, bound every segment
    mk = lambda d: _make_cfg(d, V_switch=[2.0, 2.1], t_switch=[T, T])

    # --- uninterrupted run A: 1 step of bias 0, 4 steps of bias 1
    da = tmp_path / "a"; da.mkdir()
    cfg_a, s = mk(da)
    sim_a = Simulation(cfg_a, elements=s.elements, coords=s.coords)
    sim_a.run_bias_point(2.0, T, max_steps=1)
    sim_a._pos = (1, 0)
    ra = sim_a.run_bias_point(2.1, T, max_steps=4)
    assert ra["steps"] == 4

    # --- run B: same trajectory, interrupted 2 steps into bias 1
    db = tmp_path / "b"; db.mkdir()
    cfg_b, _ = mk(db)
    sim_b = Simulation(cfg_b, elements=s.elements, coords=s.coords)
    sim_b.run_bias_point(2.0, T, max_steps=1)
    ck_boundary = os.path.join(tmp_path, "boundary.npz")
    sim_b._pos = (1, 0)
    sim_b.save_checkpoint(ck_boundary)        # exactly at the boundary
    sim_b.run_bias_point(2.1, T, max_steps=2)
    assert sim_b._pos == (1, 2)
    ckpt = os.path.join(tmp_path, "mid.npz")
    sim_b.save_checkpoint(ckpt)

    # --- run C: FRESH simulation resumed mid-bias from the checkpoint
    dc = tmp_path / "c"; dc.mkdir()
    cfg_c, _ = mk(dc)
    sim_c = Simulation(cfg_c, elements=s.elements, coords=s.coords)
    sim_c.load_checkpoint(ckpt)
    assert sim_c._pos == (1, 2)
    sim_c.run_bias_point(2.1, T, max_steps=4, resume_step=2)

    # --- run D: resumed AT the bias boundary through run() (skips bias 0)
    dd = tmp_path / "d"; dd.mkdir()
    cfg_d, _ = mk(dd)
    sim_d = Simulation(cfg_d, elements=s.elements, coords=s.coords)
    sim_d.load_checkpoint(ck_boundary)
    assert sim_d._pos == (1, 0)
    sim_d.run(max_steps_per_bias=4)

    for sim_x, tag in ((sim_c, "mid-bias"), (sim_d, "boundary")):
        for f in ("element", "charge", "key", "kmc_time", "I_macro",
                  "virtual_potentials", "T_bg", "cvac_prev", "Vd_prev",
                  "CB_edge"):
            np.testing.assert_array_equal(
                np.asarray(getattr(sim_x.state, f)),
                np.asarray(getattr(sim_a.state, f)),
                err_msg=f"{tag}:{f}",
            )
    # bias-1 snapshots from the resume point on are byte-identical
    fa = os.path.join(da, "Results_2.100000")
    fc = os.path.join(dc, "Results_2.100000")
    snaps_c = sorted(
        os.listdir(fc), key=lambda f: int(f.split("_")[1].split(".")[0])
    )
    assert len(snaps_c) >= 2
    for snap in snaps_c:
        assert open(os.path.join(fa, snap)).read() == \
            open(os.path.join(fc, snap)).read(), snap


def test_checkpoint_orbax_backend(tmp_path):
    """Orbax directory checkpoints round-trip the full payload (state +
    caps + driver position) identically to npz."""
    pytest.importorskip("orbax.checkpoint")
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim.run_bias_point(2.0, 1e-12, max_steps=2)
    sim._pos = (0, 2)
    sim.save_checkpoint(str(tmp_path / "ck_orbax"), backend="orbax")
    sim.save_checkpoint(str(tmp_path / "ck.npz"))

    sim2 = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim2.load_checkpoint(str(tmp_path / "ck_orbax"), backend="orbax")
    sim3 = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim3.load_checkpoint(str(tmp_path / "ck.npz"))
    assert sim2._pos == sim3._pos == (0, 2)
    for f in ("element", "key", "kmc_time", "virtual_potentials"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sim2.state, f)),
            np.asarray(getattr(sim3.state, f)), err_msg=f,
        )


def test_checkpoint_orbax_async_backend(tmp_path):
    """``orbax_async`` overlaps the disk write with subsequent compute;
    a second save (and load) must serialise against the in-flight write
    and the restored payload must match the synchronous backends."""
    pytest.importorskip("orbax.checkpoint")
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim.run_bias_point(2.0, 1e-12, max_steps=2)
    sim._pos = (0, 2)
    sim.save_checkpoint(str(tmp_path / "ck_a1"), backend="orbax_async")
    # immediate second async save: must wait for the first, not crash
    sim.run_bias_point(2.0, 1e-12, max_steps=1)
    sim._pos = (0, 3)
    sim.save_checkpoint(str(tmp_path / "ck_a2"), backend="orbax_async")
    sim.save_checkpoint(str(tmp_path / "ck.npz"))
    sim.wait_for_checkpoint()

    sim2 = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim2.load_checkpoint(str(tmp_path / "ck_a2"), backend="orbax_async")
    sim3 = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim3.load_checkpoint(str(tmp_path / "ck.npz"))
    assert sim2._pos == sim3._pos == (0, 3)
    for f in ("element", "charge", "key", "kmc_time", "virtual_potentials"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sim2.state, f)),
            np.asarray(getattr(sim3.state, f)), err_msg=f,
        )


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


def test_chunked_cold_solves_converge(tmp_path):
    """solver_chunk_iters > 0: the bias-start CB-edge and boundary solves
    run as a host loop of bounded-maxiter dispatches and converge to the
    same fields as single-dispatch solves."""
    cfg_a, s = _make_cfg(tmp_path / "a", perturb_structure=False)
    (tmp_path / "a").mkdir()
    sim_a = Simulation(cfg_a, elements=s.elements, coords=s.coords)
    sim_a.run_bias_point(2.0, 1.0, max_steps=1)

    cfg_b, _ = _make_cfg(tmp_path / "b", perturb_structure=False,
                         solver_chunk_iters=5)
    (tmp_path / "b").mkdir()
    sim_b = Simulation(cfg_b, elements=s.elements, coords=s.coords)
    sim_b.run_bias_point(2.0, 1.0, max_steps=1)

    np.testing.assert_allclose(
        np.asarray(sim_b.state.CB_edge), np.asarray(sim_a.state.CB_edge),
        rtol=1e-6, atol=1e-25,
    )
    np.testing.assert_allclose(
        np.asarray(sim_b.state.potential_boundary),
        np.asarray(sim_a.state.potential_boundary),
        rtol=1e-5, atol=1e-8,
    )


def test_chunked_transport_presolve_trajectory_neutral(tmp_path):
    """solver_chunk_iters > 0 also pre-solves the transport network in
    bounded-maxiter dispatches (relay-watchdog-proofing for 75k+-atom cold
    solves).  Only the warm start is committed, so the KMC trajectory and
    I_macro must be identical to the unchunked run."""
    cfg_a, s = _make_cfg(tmp_path / "a")
    (tmp_path / "a").mkdir(exist_ok=True)
    sim_a = Simulation(cfg_a, elements=s.elements, coords=s.coords)
    sim_a.run_bias_point(2.0, 1e-12, max_steps=4)

    cfg_b, _ = _make_cfg(tmp_path / "b", solver_chunk_iters=4)
    (tmp_path / "b").mkdir(exist_ok=True)
    sim_b = Simulation(cfg_b, elements=s.elements, coords=s.coords)
    sim_b.run_bias_point(2.0, 1e-12, max_steps=4)

    # the chunked (restarted) boundary pre-solve converges to a potential
    # that differs from the unchunked one at the solver-tolerance level,
    # which perturbs the rates; an exact per-element trajectory match is
    # therefore not guaranteed by construction (a tolerance-level rate
    # shift can flip an event selection against the shared RNG stream) —
    # compare species populations instead of bitwise element arrays
    ha = np.bincount(np.asarray(sim_a.state.element), minlength=16)
    hb = np.bincount(np.asarray(sim_b.state.element), minlength=16)
    np.testing.assert_array_equal(hb, ha)
    # a different (pre-solved) warm start changes CG's path, so the
    # converged solutions agree only to the solver-tolerance envelope
    # (criterion-invisible residual ~1e-5 relative; same contract as the
    # mixed-precision floor)
    np.testing.assert_allclose(
        float(sim_b.state.I_macro), float(sim_a.state.I_macro), rtol=1e-4
    )
    # the tolerance-level I_macro difference feeds back through the IR
    # drop (V_vcm = Vd - I_macro*Rs) into the rates, so kmc_time agrees to
    # the same envelope, not bitwise
    np.testing.assert_allclose(
        float(sim_b.state.kmc_time), float(sim_a.state.kmc_time), rtol=1e-5
    )
