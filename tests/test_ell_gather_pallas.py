"""ops/ell_gather_pallas.py: the page-shuffle ELL gather equals the XLA
row-gather bit-for-bit on valid slots, and the physics stages that use it
(rate table, charge rule) produce identical results with the plan attached
(interpret mode on CPU; real-TPU timing recorded in PERFORMANCE.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

import devicekmc_tpu.ops.ell_gather_pallas as eg
from devicekmc_tpu.ops.ell_gather_pallas import (
    build_ell_gather_plan, ell_gather_pallas,
)


@pytest.fixture(scope="module")
def small_sim():
    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.state import build_geometry, build_params, init_state
    from devicekmc_tpu.structure import Element, make_test_structure

    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact, layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        A=6.25e-19,
    )
    elems = s.elements.copy()
    rng = np.random.default_rng(7)
    oxide = np.nonzero(elems == int(Element.O))[0]
    elems[rng.choice(oxide, size=8, replace=False)] = int(Element.VACANCY)
    defects = np.nonzero(elems == int(Element.DEFECT))[0]
    elems[rng.choice(defects, size=4, replace=False)] = (
        int(Element.OXYGEN_DEFECT))
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    return s, cfg, geom, params, state, elems


@pytest.fixture
def interp_kernel(monkeypatch):
    """Route the kernel through the interpreter for CPU tests."""
    orig = eg.ell_gather_pallas

    def wrapper(plan, values, interpret=False):
        return orig(plan, values, interpret=True)

    monkeypatch.setattr(eg, "ell_gather_pallas", wrapper)
    return wrapper


def _random_graph(rng, N, max_nn, bw):
    site = np.arange(N)[:, None]
    nb = np.clip(site + rng.integers(-bw, bw + 1, (N, max_nn)), 0, N - 1)
    nb[rng.random((N, max_nn)) < 0.15] = -1
    return nb


@pytest.mark.parametrize("N,max_nn,bw", [(1000, 13, 200), (128, 5, 40),
                                         (515, 52, 510)])
def test_gather_matches_xla(N, max_nn, bw):
    rng = np.random.default_rng(N)
    nb = _random_graph(rng, N, max_nn, bw)
    plan = build_ell_gather_plan(nb)
    assert plan is not None
    v = rng.standard_normal(N).astype(np.float32)
    c = rng.integers(0, 1 << 16, N).astype(np.int32)
    out_v, out_c = ell_gather_pallas(
        plan, [jnp.asarray(v), jnp.asarray(c).astype(jnp.float32)],
        interpret=True,
    )
    out_c = np.asarray(out_c).astype(np.int32)
    valid = nb >= 0
    safe = np.maximum(nb, 0)
    np.testing.assert_array_equal(np.asarray(out_v)[valid], v[safe][valid])
    np.testing.assert_array_equal(out_c[valid], c[safe][valid])


def test_window_too_wide_returns_none():
    rng = np.random.default_rng(0)
    N = 4096
    nb = rng.integers(0, N, (N, 4))    # unsorted: bandwidth ~ N
    assert build_ell_gather_plan(nb, max_window_pages=8) is None


def _plan_geom(small_sim):
    s, cfg, geom, params, state, elems = small_sim
    plan = build_ell_gather_plan(np.asarray(geom.neigh_idx))
    assert plan is not None
    geom_p = geom.replace(
        gather_page=plan["page"], gather_lane=plan["lane"],
        gather_mp2=plan["mp2"], gather_bwpad=plan["bwpad"],
        gather_wp=plan["wp"], gather_rpb=plan["rows_per_block"],
    )
    return geom, geom_p, params, state


def test_charge_update_identical(small_sim, interp_kernel):
    from devicekmc_tpu.physics import charge as charge_mod

    geom, geom_p, params, state = _plan_geom(small_sim)
    st_a, m_a = charge_mod.update_charge(geom, state)
    st_b, m_b = charge_mod.update_charge(geom_p, state)
    np.testing.assert_array_equal(
        np.asarray(st_b.charge), np.asarray(st_a.charge))
    for k in m_a:
        assert int(m_a[k]) == int(m_b[k]), k


def test_rate_table_identical(small_sim, interp_kernel):
    from devicekmc_tpu.physics import events as events_mod

    geom, geom_p, params, state = _plan_geom(small_sim)
    pm = params.replace(mixed=True)     # f32 table: the kernel-eligible mode
    p_a = events_mod.build_rate_table(geom, pm, state)
    p_b = events_mod.build_rate_table(geom_p, pm, state)
    np.testing.assert_array_equal(np.asarray(p_b), np.asarray(p_a))

    # active-row compacted build
    cap = 64
    aidx = jnp.arange(cap, dtype=jnp.int32)
    p_a = events_mod.build_rate_table(geom, pm, state, active_idx=aidx)
    p_b = events_mod.build_rate_table(geom_p, pm, state, active_idx=aidx)
    np.testing.assert_array_equal(np.asarray(p_b), np.asarray(p_a))
