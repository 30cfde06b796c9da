"""Internal x-sort site permutation (cfg.site_order="x").

The permutation is I/O-transparent: snapshots, restart files, contact
conventions and the transport atom ordering are all evaluated in FILE
coordinates (Geometry.io_idx / io_fpos), so a field-solver run must produce
identical physics (up to CG round-off) and byte-compatible snapshot rows
whatever the internal order.  Internally, a bandwidth-reducing order is
what enables halo slabs and VMEM-windowed kernels on crossbars
(measured: timing-crossbar bandwidth ~88k -> ~5.2k)."""

import numpy as np
import pytest

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.engine import Simulation
from devicekmc_tpu.parallel.halo import compute_halo_width
from devicekmc_tpu.structure import make_test_structure


def _scrambled_structure():
    """A structure whose FILE order is x-sorted only at the contacts (the
    interior rows are shuffled) — so the internal x-sort is a non-trivial
    permutation while the positional contact conventions still hold."""
    s = make_test_structure(nx_contact=2, nx_oxide=8, ny=3, nz=3, seed=11)
    n = len(s.elements)
    nsi = s.num_atoms_first_layer
    rng = np.random.default_rng(3)
    mid = np.arange(nsi, n - nsi)
    perm = np.concatenate(
        [np.arange(nsi), rng.permutation(mid), np.arange(n - nsi, n)]
    )
    return s, s.elements[perm], s.coords[perm]


def _cfg(tmp_path, s, **over):
    base = dict(
        lattice=list(s.lattice), nn_dist=3.0, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact, layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=False,
        pristine=True, initial_vacancy_concentration=0.12,
        A=6.25e-19, V_switch=[2.0], t_switch=[1e-12],
        log_freq=5, output_dir=str(tmp_path),
    )
    base.update(over)
    return KMCConfig(**base)


def test_x_order_reduces_bandwidth():
    s, elems, coords = _scrambled_structure()
    cfg_f = KMCConfig(lattice=list(s.lattice), nn_dist=3.0,
                      layers=s.layers, site_order="file")
    cfg_x = KMCConfig(lattice=list(s.lattice), nn_dist=3.0,
                      layers=s.layers, site_order="x")
    from devicekmc_tpu.state import build_geometry

    gf = build_geometry(elems, coords, cfg_f)
    gx = build_geometry(elems, coords, cfg_x)
    bw_f = compute_halo_width(np.asarray(gf.neigh_idx))
    bw_x = compute_halo_width(np.asarray(gx.neigh_idx))
    assert bw_x < bw_f / 3
    # the permutation round-trips
    io = np.asarray(gx.io_idx)
    fp = np.asarray(gx.io_fpos)
    np.testing.assert_array_equal(fp[io], np.arange(gx.N))
    # file-order element recovery
    np.testing.assert_array_equal(
        np.asarray(gx.coords)[io[:len(elems)]], coords
    )


def test_x_order_identical_fields_and_snapshots(tmp_path):
    """Full field pipeline (charge + potentials + CB edge + transport +
    heat), debug mode: file-order and x-order runs must write identical
    snapshot rows and log identical metrics."""
    s, elems, coords = _scrambled_structure()

    d1 = tmp_path / "file"; d1.mkdir()
    sim1 = Simulation(_cfg(d1, s, site_order="file"),
                      elements=elems, coords=coords)
    r1 = sim1.run_bias_point(2.0, 1.0)

    d2 = tmp_path / "x"; d2.mkdir()
    sim2 = Simulation(_cfg(d2, s, site_order="x"),
                      elements=elems, coords=coords)
    r2 = sim2.run_bias_point(2.0, 1.0)

    assert r1["steps"] == r2["steps"]
    for k in ("Current [uA]", "Conductance [uS]", "Charged vacancies",
              "Total dissipated power [mW]"):
        assert r1[k] == pytest.approx(r2[k], rel=1e-6, abs=1e-12), k

    import os

    for snap in sorted(os.listdir(d1 / "Results_2.000000")):
        a = open(d1 / "Results_2.000000" / snap).read().splitlines()
        b = open(d2 / "Results_2.000000" / snap).read().splitlines()
        assert len(a) == len(b)
        # element + coordinate columns identical; field columns to
        # round-off
        for la, lb in zip(a[2:], b[2:]):
            ta, tb = la.split(), lb.split()
            assert ta[:4] == tb[:4]
            for va, vb in zip(ta[4:], tb[4:]):
                assert float(va) == pytest.approx(
                    float(vb), rel=1e-6, abs=1e-12
                )


def test_x_order_events_run(tmp_path):
    """KMC events under the internal order execute and conserve species
    (trajectories are statistically equivalent, not bit-equal)."""
    s, elems, coords = _scrambled_structure()
    cfg = _cfg(tmp_path, s, site_order="x", perturb_structure=True,
               solve_current=False, solve_heating_global=False,
               t_switch=[1.0])
    sim = Simulation(cfg, elements=elems, coords=coords)
    sim.run_bias_point(4.0, 1.0, max_steps=5)
    from devicekmc_tpu.structure import Element

    e = np.asarray(sim.state.element)[:sim.geom.N_real]
    e0 = elems
    # d + Od count and O + V count are invariants of the event set
    for grp in ([int(Element.DEFECT), int(Element.OXYGEN_DEFECT)],
                [int(Element.O), int(Element.VACANCY)]):
        assert np.isin(e, grp).sum() == np.isin(e0, grp).sum()
