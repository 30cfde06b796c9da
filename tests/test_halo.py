"""Halo-exchange distributed Laplace solve == replicated solver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.parallel import make_mesh
from devicekmc_tpu.parallel.halo import compute_halo_width, make_halo_laplace_solver
from devicekmc_tpu.physics import charge as charge_mod
from devicekmc_tpu.physics.potential import (
    _edge_conductance_boundary, solve_boundary_potential,
)
from devicekmc_tpu.state import build_geometry, build_params, init_state
from devicekmc_tpu.structure import Element, make_test_structure


def test_halo_laplace_matches_replicated(cpu_devices):
    # x-sorted synthetic structure -> bounded graph bandwidth
    s = make_test_structure(nx_contact=2, nx_oxide=10, ny=4, nz=4, seed=2)
    elems = s.elements.copy()
    rng = np.random.default_rng(3)
    oxide = np.nonzero(elems == int(Element.O))[0]
    elems[rng.choice(oxide, 10, replace=False)] = int(Element.VACANCY)
    n_dev = 4
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers, solve_potential=True,
    )
    geom = build_geometry(elems, s.coords, cfg, pad_to=n_dev)
    # pin plain Jacobi CG: this test validates the halo exchange against
    # the replicated solver running the SAME algorithm (the deflated
    # default converges to the same solution but under a different
    # stopping criterion, ~5e-8 apart — outside this test's tolerance)
    params = build_params(cfg).replace(boundary_precond="jacobi")
    state = init_state(geom, cfg, elems)
    state, _ = charge_mod.update_charge(geom, state)
    Vd = 2.0

    # reference: replicated-vector solver
    ref_state, info = solve_boundary_potential(geom, params, state, Vd)
    ref = np.asarray(ref_state.potential_boundary)

    # distributed: slab decomposition with halo exchange
    nb = np.asarray(geom.neigh_idx)
    halo = compute_halo_width(nb)
    S = geom.N // n_dev
    assert halo <= S, "bandwidth must fit a slab for this structure"

    mesh = make_mesh(n_dev, devices=cpu_devices)
    solver = make_halo_laplace_solver(mesh, halo=halo, tol=1e-12)
    edge_g = _edge_conductance_boundary(geom, state, params)
    with mesh:
        phi, iters = solver(
            edge_g, geom.neigh_idx, geom.interior_mask,
            geom.left_mask, geom.right_mask,
            state.potential_boundary,
            jnp.asarray(-Vd / 2, params.dtype), jnp.asarray(Vd / 2, params.dtype),
        )
    np.testing.assert_allclose(np.asarray(phi), ref, rtol=1e-6, atol=1e-9)
    assert int(iters) > 0
