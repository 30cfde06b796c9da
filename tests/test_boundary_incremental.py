"""Incremental-residual fast path for the boundary Laplace re-solves.

Deep-forming supersteps are dominated by 0-CG-iteration boundary re-solves
whose cost is the f64 assembly + one matvec (~0.3 s/step at 110k sites);
`boundary_incremental` replaces that with an exact O(changed rows) update
of the stored TRUE residual (potential._incremental_boundary_residual).
The decision rule is identical, so trajectories must match the
always-assemble path bit-for-bit.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.engine import Simulation
from devicekmc_tpu.structure import make_test_structure


def _cfg(tmp_path, s, **over):
    base = dict(
        lattice=list(s.lattice), nn_dist=3.0, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact, layers=s.layers,
        solve_potential=True, perturb_structure=True, pristine=True,
        initial_vacancy_concentration=0.15,
        V_switch=[4.0], t_switch=[1.0], log_freq=1000,
        output_dir=str(tmp_path), active_rows_cap=0,
        event_mode="incremental",
    )
    base.update(over)
    return KMCConfig(**base)


def _run(tmp_path, s, sub, **over):
    d = tmp_path / sub
    d.mkdir()
    sim = Simulation(_cfg(d, s, **over), elements=s.elements, coords=s.coords)
    sim.run_bias_point(4.0, 1.0, max_steps=10)
    return sim


def test_incremental_trajectory_identical(tmp_path):
    s = make_test_structure(nx_contact=2, nx_oxide=28, ny=2, nz=2, seed=5)
    simA = _run(tmp_path, s, "off", boundary_incremental=False)
    simB = _run(tmp_path, s, "on", boundary_incremental=True)
    nr = simA.geom.N_real
    np.testing.assert_array_equal(
        np.asarray(simA.state.element)[:nr], np.asarray(simB.state.element)[:nr]
    )
    np.testing.assert_array_equal(
        np.asarray(simA.state.charge)[:nr], np.asarray(simB.state.charge)[:nr]
    )
    # the incremental path certifies convergence without touching phi, so
    # the potentials (and hence the KMC clock) are bit-identical
    np.testing.assert_array_equal(
        np.asarray(simA.state.potential_boundary),
        np.asarray(simB.state.potential_boundary),
    )
    assert float(simA.state.kmc_time) == float(simB.state.kmc_time)


def test_residual_anchor_is_true_residual(tmp_path):
    """After a run, the stored boundary_r/boundary_b must equal a fresh
    full-assembly evaluation of b - L_II x to round-off."""
    from devicekmc_tpu.physics import potential as pot

    s = make_test_structure(nx_contact=2, nx_oxide=28, ny=2, nz=2, seed=5)
    sim = _run(tmp_path, s, "run", boundary_incremental=True)
    st, geom, params = sim.state, sim.geom, sim.params
    Vd = 4.0
    eg = pot._edge_conductance_boundary(geom, st, params)
    interior = geom.bp_interior_mask
    safe = jnp.maximum(geom.neigh_idx, 0)
    nbv = jnp.where(
        geom.bp_left_mask[safe], -Vd / 2,
        jnp.where(geom.bp_right_mask[safe], Vd / 2, 0.0),
    )
    b = jnp.where(interior, jnp.sum(eg * nbv, axis=1), 0.0)
    diag = jnp.sum(eg, axis=1)
    xm = jnp.where(interior, st.potential_boundary, 0.0)
    y = diag * xm - jnp.sum(eg * interior[safe] * xm[safe], axis=1)
    r_fresh = np.asarray(jnp.where(interior, b - y, 0.0))

    scale = max(np.linalg.norm(np.asarray(b)), 1.0)
    assert np.abs(np.asarray(st.boundary_r) - r_fresh).max() / scale < 1e-14
    np.testing.assert_allclose(
        np.asarray(st.boundary_b), np.asarray(b), rtol=0, atol=1e-12 * scale
    )


def test_cap_overflow_falls_back_to_full_solve(tmp_path):
    """boundary_delta_cap=1 overflows on any multi-site change; the driver
    must take the (exact) full-solve branch and still match."""
    s = make_test_structure(nx_contact=2, nx_oxide=28, ny=2, nz=2, seed=5)
    simA = _run(tmp_path, s, "off", boundary_incremental=False)
    simB = _run(
        tmp_path, s, "tiny", boundary_incremental=True, boundary_delta_cap=1
    )
    nr = simA.geom.N_real
    np.testing.assert_array_equal(
        np.asarray(simA.state.element)[:nr], np.asarray(simB.state.element)[:nr]
    )
    assert float(simA.state.kmc_time) == float(simB.state.kmc_time)


def test_legacy_checkpoint_forces_full_solve(tmp_path):
    """Restoring a checkpoint without the residual anchor must invalidate
    Vd_prev so a stale-zero boundary_r can never certify a skip."""
    s = make_test_structure(nx_contact=2, nx_oxide=28, ny=2, nz=2, seed=5)
    sim = _run(tmp_path, s, "ck", boundary_incremental=True)
    path = str(tmp_path / "legacy.npz")
    payload = sim._checkpoint_payload()
    payload.pop("boundary_r")
    payload.pop("boundary_b")
    np.savez(path, **payload)

    d2 = tmp_path / "resume"; d2.mkdir()
    sim2 = Simulation(
        _cfg(d2, s, boundary_incremental=True),
        elements=s.elements, coords=s.coords,
    )
    sim2.load_checkpoint(path)
    assert np.isnan(float(sim2.state.Vd_prev))
