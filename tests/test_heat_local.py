"""Local heat solver: dense (reference-style) vs numpy oracle vs CG variant."""

import numpy as np
import pytest

import jax.numpy as jnp

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.physics import heat as heat_mod
from devicekmc_tpu.state import build_geometry, build_params, init_state
from devicekmc_tpu.structure import Element, make_test_structure

@pytest.fixture(scope="module")
def heat_sim():
    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    elems = s.elements.copy()
    rng = np.random.default_rng(7)
    oxide = np.nonzero(elems == int(Element.O))[0]
    elems[rng.choice(oxide, size=6, replace=False)] = int(Element.VACANCY)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True,
        solve_heating_local=True, solve_heating_global=False,
        A=6.25e-19,
    )
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    # give the sites some power
    rngp = np.random.default_rng(11)
    power = jnp.asarray(rngp.uniform(0, 1e-6, geom.N), dtype=params.dtype)
    state = state.replace(power=power)
    return s, cfg, geom, params, state, elems

def test_dense_local_temperature_vs_oracle(heat_sim):
    s, cfg, geom, params, state, elems = heat_sim
    nb = np.asarray(geom.neigh_idx)
    heat = heat_mod.build_heat_model(geom, params, cfg, elems, nb, "dense")
    step_time = 2.5 * cfg.delta_t  # -> 3 transient substeps (int(2.5)+1)
    new_state, m = heat_mod.update_temperature_local(
        geom, params, heat, state, jnp.asarray(step_time, params.dtype)
    )

    # numpy oracle
    from devicekmc_tpu import constants as C

    ni = heat.n_interface
    iidx = np.asarray(heat.interface_idx)
    Linv = np.asarray(heat.L_inv)
    T0 = cfg.background_temp
    scale = C.T_1 - T0
    denom = (cfg.nn_dist * 1e-10) * (C.T_1 - cfg.background_temp)
    p_vac = 1.0 / (cfg.k_th_interface * denom)
    p_non = 1.0 / (cfg.k_th_vacancies * denom)
    p_t = np.where(elems[iidx] == int(Element.VACANCY), p_vac, p_non)
    P = np.asarray(state.power)[iidx]
    temp = np.asarray(state.temperature).copy()
    sub_dt = cfg.delta_t * cfg.tau
    for _ in range(int(step_time / cfg.delta_t) + 1):
        t_vec = (temp[iidx] - T0) / scale
        rhs = t_vec + P * p_t * sub_dt
        temp[iidx] = (Linv @ rhs) * scale + T0
    np.testing.assert_allclose(
        np.asarray(new_state.temperature), temp, rtol=1e-10, atol=1e-10
    )
    nac = cfg.num_atoms_contact
    T_bg_ref = temp[nac: geom.N - nac].mean()
    assert np.isclose(float(new_state.T_bg), T_bg_ref, rtol=1e-12)

def test_cg_local_matches_dense(heat_sim):
    s, cfg, geom, params, state, elems = heat_sim
    nb = np.asarray(geom.neigh_idx)
    dense = heat_mod.build_heat_model(geom, params, cfg, elems, nb, "dense")
    cg = heat_mod.build_heat_model(geom, params, cfg, elems, nb, "cg")

    for step_time in (2.5 * cfg.delta_t, 5e3 * cfg.delta_t):  # transient + ss
        st = jnp.asarray(step_time, params.dtype)
        d_state, _ = heat_mod.update_temperature_local(
            geom, params, dense, state, st
        )
        c_state, _ = heat_mod.update_temperature_local_cg(
            geom, params, cg, state, st, tol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(c_state.temperature), np.asarray(d_state.temperature),
            rtol=1e-7, atol=1e-8,
        )
