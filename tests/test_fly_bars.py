"""transport_cc='fly' end-to-end on an interior-metal-bars crossbar.

The interior-bar composition (structure.make_crossbar_structure bar_pitch>0)
is the fly kernel's design regime: n_mp scales with volume, and at
production scale the stored metal_p block cannot exist in HBM
(ops/wkb_pallas.py).  This CPU-scale test locks the end-to-end contract:
the full pipeline driven with cc='fly' (interpret-mode kernels) follows the
SAME trajectory as cc='stored' on a structure where interior bars dominate
n_mp.  Entry values differ only in the x**1.5 == x*sqrt(x) spelling
(<= 1 ulp), so the discrete trajectory must be identical over a short run.

Reference being exceeded: the tunnel assembly of
src/current_solver.cpp:86-154, which always materialises the pairs.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.physics import heat as heat_mod
from devicekmc_tpu.physics.potential import solve_cb_edge
from devicekmc_tpu.state import (
    attach_tunnel_state, build_geometry, build_params, init_state,
    make_substoichiometric,
)
from devicekmc_tpu.structure import Element, make_crossbar_structure
from devicekmc_tpu.superstep import superstep_impl


def _build(cc: str):
    s = make_crossbar_structure(
        nx_contact=4, nx_oxide=12, ny=10, nz=10, seed=2, bar_pitch=4,
    )
    elems = make_substoichiometric(s.elements, 0.04, seed=5)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.5, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact, layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, precision="mixed",
        transport="blocked", transport_cc=cc, tunnel_vac_cap=128,
        poisson_compact_cap=1024,
        A=float(s.lattice[1]) * 1e-10 * float(s.lattice[2]) * 1e-10,
    )
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = attach_tunnel_state(init_state(geom, cfg, elems), geom, params)
    return geom, params, state


def _run(cc: str, n_steps: int = 3, Vd: float = 2.0):
    geom, params, state = _build(cc)
    heat = heat_mod.empty_heat_model(params)
    state, _ = jax.jit(solve_cb_edge)(geom, params, state, Vd)
    step = jax.jit(superstep_impl)
    for _ in range(n_steps):
        state, _, m = step(geom, params, heat, state, Vd)
    return geom, state, m


def test_bars_structure_has_volume_metal():
    """The bar structure's n_mp is dominated by interior (non-plate) metal
    — the composition the fly kernel exists for."""
    geom, params, state = _build("stored")
    n_mp = int(geom.atom_metalp_idx.shape[0])
    # interior-bar atoms: metal_p atoms whose x lies inside the oxide
    ai = np.asarray(geom.atom_ind)
    mp = np.asarray(geom.atom_metalp_idx)
    x = np.asarray(geom.coords)[ai[mp], 0]
    a = 2.13
    ox_lo, ox_hi = 4 * a, (4 + 12) * a
    n_interior = int(((x > ox_lo - 0.5 * a) & (x < ox_hi - 0.01)).sum())
    assert n_mp > 0 and n_interior > 0.4 * n_mp, (n_mp, n_interior)


def test_fly_vs_stored_trajectory_on_bars():
    """Full pipeline, cc='fly' (interpret kernels) vs cc='stored': the
    discrete trajectory is identical; currents/power agree to the <=1-ulp
    entry-spelling difference amplified by the solve (measured ~2e-4 on the
    near-cancelling leakage current)."""
    _, st_f, m_f = _run("fly")
    _, st_s, m_s = _run("stored")
    np.testing.assert_array_equal(
        np.asarray(st_f.element), np.asarray(st_s.element)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.charge), np.asarray(st_s.charge)
    )
    np.testing.assert_array_equal(np.asarray(st_f.key), np.asarray(st_s.key))
    # I_macro here is a tiny pre-forming leakage current formed by
    # near-cancellation — ulp-level entry differences and the solver's
    # criterion-level residual amplify to ~2e-3 on it (the discrete
    # trajectory and P_tot above/below are the tight contracts)
    np.testing.assert_allclose(
        float(st_f.I_macro), float(st_s.I_macro), rtol=5e-3
    )
    np.testing.assert_allclose(
        float(st_f.P_tot), float(st_s.P_tot), rtol=1e-3, atol=1e-30
    )
    # pointwise potentials are the loosest observable: both solves meet
    # the 1e-8 preconditioned-residual tolerance but against operators
    # perturbed ~1 ulp relative to each other, and the network's
    # high_G/low_G conditioning amplifies that to ~1e-3 on interior nodes
    # (the physical observables above agree 10-100x tighter)
    np.testing.assert_allclose(
        np.asarray(st_f.virtual_potentials),
        np.asarray(st_s.virtual_potentials), rtol=1e-2, atol=2e-3,
    )
