"""Compaction-bucket overflow handling.

Every fixed-size bucket (active event rows, Poisson charged sites, tunnel
vacancies, WKB energy-window trip count) must either grow-and-redo (auto
mode) or fail loudly (user-fixed cap) when the live count exceeds it —
never silently truncate.  These tests force each bucket past its cap
mid-run and assert the trajectory equals the uncompacted reference run.
"""

import numpy as np
import pytest

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.engine import Simulation
from devicekmc_tpu.structure import make_test_structure


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
        V_switch=[4.0],
        t_switch=[1.0],  # huge window: the step count is capped by
                         # max_steps, not the KMC clock
        log_freq=1000,
        output_dir=str(tmp_path),
    )
    base.update(over)
    return KMCConfig(**base), s


def _trajectory(sim, steps=6):
    sim.run_bias_point(float(sim.cfg.V_switch[0]), float(sim.cfg.t_switch[0]),
                       max_steps=steps)
    return (
        np.asarray(sim.state.element),
        np.asarray(sim.state.charge),
        float(sim.state.kmc_time),
        float(sim.state.I_macro),
    )


@pytest.fixture(scope="module")
def reference_run(tmp_path_factory):
    """Uncompacted ground truth: full event table, dense Poisson, dense
    tunnel integral."""
    tmp = tmp_path_factory.mktemp("ref")
    cfg, s = _make_cfg(
        tmp, poisson_compact_cap=0, active_rows_cap=0, tunnel_vac_cap=0
    )
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    return _trajectory(sim), (cfg, s)


def _assert_equal_traj(got, want):
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    assert got[2] == pytest.approx(want[2], rel=1e-12)
    assert got[3] == pytest.approx(want[3], rel=1e-9)


def test_poisson_cap_overflow_redo(tmp_path, reference_run):
    """Start with a charged-site bucket far below the live count: the first
    dispatch must be detected as truncated, regrown and redone."""
    want, _ = reference_run
    cfg, s = _make_cfg(tmp_path)  # auto caps
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    # simulate a bad initial estimate (cfg stays -1 => auto growth allowed)
    sim.params = sim.params.replace(poisson_compact_cap=2)
    sim._rebuild_supersteps()
    got = _trajectory(sim)
    assert sim.params.poisson_compact_cap > 2, "bucket never grew"
    _assert_equal_traj(got, want)


def test_active_rows_cap_overflow_redo(tmp_path, reference_run):
    want, _ = reference_run
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim.params = sim.params.replace(active_rows_cap=4)
    sim._rebuild_supersteps()
    got = _trajectory(sim)
    assert sim.params.active_rows_cap > 4
    _assert_equal_traj(got, want)


def test_tunnel_vac_cap_overflow_redo(tmp_path, reference_run):
    want, _ = reference_run
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim.params = sim.params.replace(tunnel_vac_cap=2)
    sim._rebuild_supersteps()
    got = _trajectory(sim)
    assert sim.params.tunnel_vac_cap > 2
    _assert_equal_traj(got, want)


def test_batched_driver_checks_caps(tmp_path, reference_run):
    """The batched (multi-superstep per dispatch) driver must apply the same
    grow-and-redo logic — round 1 skipped it entirely."""
    want, _ = reference_run
    cfg, s = _make_cfg(tmp_path, batch_steps=3)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    assert sim._msuperstep is not None
    sim.params = sim.params.replace(poisson_compact_cap=2, tunnel_vac_cap=2)
    sim._rebuild_supersteps()
    got = _trajectory(sim)
    assert sim.params.poisson_compact_cap > 2
    assert sim.params.tunnel_vac_cap > 2
    _assert_equal_traj(got, want)


def test_tunnel_int_steps_growth(tmp_path):
    """If the contact->trap energy-window integral needs more trip counts
    than the static cap, the driver must grow it and redo (round 1 emitted
    ``tunnel_int_steps_needed`` but never checked it)."""
    cfg, s = _make_cfg(tmp_path, tunnel_int_steps=64)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    assert sim._check_caps({"tunnel_int_steps_needed": 70}) is True
    assert sim.params.tunnel_int_steps == 128
    assert sim._check_caps({"tunnel_int_steps_needed": 70}) is False


def test_redo_exhaustion_raises(tmp_path):
    """A pathological growth sequence that never fits must fail loudly
    after 4 grow-and-redo attempts — never silently truncate."""
    cfg, s = _make_cfg(tmp_path)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim._check_caps = lambda metrics: True      # "still overflowing" forever
    with pytest.raises(RuntimeError, match="grow-and-redo"):
        _trajectory(sim, steps=1)


def test_redo_exhaustion_raises_batched(tmp_path):
    """Same contract on the batched driver's batch-dispatch redo loop."""
    cfg, s = _make_cfg(tmp_path, batch_steps=3, log_freq=1000)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    assert sim._msuperstep is not None
    # step 0 is a snapshot step (per-step path); fail only on batched
    # dispatches, whose stacked metrics carry the "active" mask
    sim._check_caps = lambda metrics: "active" in metrics
    with pytest.raises(RuntimeError, match="grow-and-redo"):
        _trajectory(sim, steps=3)


def test_fixed_cap_overflow_raises(tmp_path):
    """A user-fixed cap that overflows must fail loudly, not truncate."""
    cfg, s = _make_cfg(tmp_path, poisson_compact_cap=2)
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    with pytest.raises(RuntimeError, match="overflow"):
        _trajectory(sim)
