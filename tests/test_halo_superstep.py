"""Halo-exchange full-superstep decomposition vs single device.

The halo path (parallel/halo_superstep.py) runs charge, boundary potential,
gridless Poisson and the KMC residence-time loop fully distributed over an
8-device (virtual CPU) mesh: slab-sharded vectors, ppermute halo reads,
psum-reduced CG dots and a one-all_gather-per-event hierarchical selection.
Selection arithmetic is shared with the single-device engine, so fixed-seed
trajectories must come out identical (CG round-off cannot flip discrete
event picks at these tolerances)."""

import os

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.engine import Simulation
from devicekmc_tpu.structure import make_test_structure

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual CPU devices"
)


def _mesh():
    return Mesh(np.array(jax.devices("cpu")[:8]), ("sites",))


def _cfg(tmp_path, s, **over):
    base = dict(
        lattice=list(s.lattice), nn_dist=3.0, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact, layers=s.layers,
        solve_potential=True, solve_current=False, perturb_structure=True,
        pristine=True, initial_vacancy_concentration=0.15,
        V_switch=[4.0], t_switch=[1.0], log_freq=1000,
        output_dir=str(tmp_path), active_rows_cap=0,
        event_mode="incremental",
    )
    base.update(over)
    return KMCConfig(**base)


def test_halo_superstep_trajectory_equals_single_device(tmp_path):
    # long thin structure: bandwidth ~14 << slab 128
    s = make_test_structure(nx_contact=2, nx_oxide=28, ny=2, nz=2, seed=5)

    d1 = tmp_path / "single"; d1.mkdir()
    sim1 = Simulation(_cfg(d1, s), elements=s.elements, coords=s.coords)
    sim1.run_bias_point(4.0, 1.0, max_steps=8)

    d2 = tmp_path / "halo"; d2.mkdir()
    sim2 = Simulation(
        _cfg(d2, s), elements=s.elements, coords=s.coords,
        mesh=_mesh(), decomposition="halo",
    )
    assert sim2._halo_width <= sim2.geom.N // 8
    sim2.run_bias_point(4.0, 1.0, max_steps=8)

    nr = sim1.geom.N_real
    np.testing.assert_array_equal(
        np.asarray(sim1.state.element)[:nr], np.asarray(sim2.state.element)[:nr]
    )
    np.testing.assert_array_equal(
        np.asarray(sim1.state.charge)[:nr], np.asarray(sim2.state.charge)[:nr]
    )
    # fields agree to CG tolerance; KMC clock to rate round-off
    p1 = np.asarray(sim1.state.potential_boundary)[:nr]
    p2 = np.asarray(sim2.state.potential_boundary)[:nr]
    assert np.abs(p1 - p2).max() < 1e-8
    assert float(sim2.state.kmc_time) == pytest.approx(
        float(sim1.state.kmc_time), rel=1e-6
    )


@pytest.mark.skipif(
    not os.path.exists("/root/reference/depreciated/tests/1-potential"),
    reason="reference structure not available",
)
def test_halo_superstep_9k_reference_device(tmp_path):
    """The 9030-site reference device: 10 supersteps at Vd=20 carry ~950
    events — any selection/zeroing divergence would show up here."""
    from devicekmc_tpu.config import parse_parameters

    src = "/root/reference/depreciated/tests/1-potential"
    cfg = parse_parameters(os.path.join(src, "parameters.txt"))
    cfg.restart_xyz_file = os.path.join(src, "snapshot_init.xyz")
    cfg.perturb_structure = True
    cfg.t_switch = [1.0]
    cfg.active_rows_cap = 0

    d1 = tmp_path / "single"; d1.mkdir()
    cfg.output_dir = str(d1)
    sim1 = Simulation(cfg)
    sim1.run_bias_point(20.0, 1.0, max_steps=6)

    d2 = tmp_path / "halo"; d2.mkdir()
    cfg.output_dir = str(d2)
    sim2 = Simulation(cfg, mesh=_mesh(), decomposition="halo")
    sim2.run_bias_point(20.0, 1.0, max_steps=6)

    nr = sim1.geom.N_real
    np.testing.assert_array_equal(
        np.asarray(sim1.state.element)[:nr], np.asarray(sim2.state.element)[:nr]
    )
    np.testing.assert_array_equal(
        np.asarray(sim1.state.charge)[:nr], np.asarray(sim2.state.charge)[:nr]
    )


def test_halo_rejects_oversized_halo(tmp_path):
    """Bandwidth > slab size must be rejected loudly."""
    s = make_test_structure(nx_contact=2, nx_oxide=4, ny=8, nz=8, seed=1)
    with pytest.raises(ValueError, match="halo width"):
        Simulation(
            _cfg(tmp_path, s), elements=s.elements, coords=s.coords,
            mesh=_mesh(), decomposition="halo",
        )


def test_halo_rejects_transport_configs(tmp_path):
    s = make_test_structure(nx_contact=2, nx_oxide=28, ny=2, nz=2, seed=5)
    with pytest.raises(NotImplementedError, match="halo"):
        Simulation(
            _cfg(tmp_path, s, solve_current=True, A=6.25e-19),
            elements=s.elements, coords=s.coords,
            mesh=_mesh(), decomposition="halo",
        )
