"""KMC event engine: rate table vs oracle, superstep semantics, reproducibility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.physics import charge as charge_mod
from devicekmc_tpu.physics import events as events_mod
from devicekmc_tpu.physics import potential as potential_mod
from devicekmc_tpu.state import build_geometry, build_params, init_state
from devicekmc_tpu.structure import Element

import oracles
from test_fields import small_sim  # noqa: F401  (fixture reuse)


def _prepared(small_sim, Vd=1.0):
    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    state, _ = potential_mod.solve_boundary_potential(geom, params, state, Vd)
    state = potential_mod.poisson_gridless(geom, params, state)
    return s, cfg, geom, params, state, elems


def test_rate_table_vs_oracle(small_sim):
    s, cfg, geom, params, state, elems = _prepared(small_sim)
    P = events_mod.build_rate_table(geom, params, state)
    phi = np.asarray(state.potential_boundary + state.potential_charge)
    ref = oracles.rate_table_oracle(
        s.coords, s.lattice, cfg.pbc, np.asarray(geom.neigh_idx),
        elems, np.asarray(state.charge), phi,
        np.asarray(geom.site_layer), cfg.layers,
        cfg.sigma, cfg.k, float(state.T_bg), cfg.freq,
    )
    np.testing.assert_allclose(np.asarray(P), ref, rtol=1e-10, atol=1e-30)
    assert float(jnp.sum(P)) > 0  # some events must be possible


@pytest.mark.parametrize("selection", ["flat", "two_level"])
def test_superstep_runs_and_advances_clock(small_sim, selection):
    s, cfg, geom, params, state, elems = _prepared(small_sim)
    params = params.replace(selection=selection)
    res = events_mod.execute_superstep(geom, params, state)
    assert float(res.step_time) >= 1.0 / cfg.freq
    assert int(res.n_events) >= 1
    # elements must remain a permutation of species classes:
    # generation/recombination swap within {d,Od} x {O,V}, diffusion swaps
    e0, e1 = elems, np.asarray(res.state.element)
    assert (np.isin(e1, [int(Element.DEFECT), int(Element.OXYGEN_DEFECT)]).sum()
            == np.isin(e0, [int(Element.DEFECT), int(Element.OXYGEN_DEFECT)]).sum())
    # oxygen conservation: #O + #Od + #V pairs consistent
    assert ((e1 == int(Element.OXYGEN_DEFECT)).sum()
            - (e0 == int(Element.OXYGEN_DEFECT)).sum()
            == (e1 == int(Element.VACANCY)).sum()
            - (e0 == int(Element.VACANCY)).sum())


def test_superstep_reproducible(small_sim):
    s, cfg, geom, params, state, elems = _prepared(small_sim)
    r1 = events_mod.execute_superstep(geom, params, state)
    r2 = events_mod.execute_superstep(geom, params, state)
    np.testing.assert_array_equal(
        np.asarray(r1.state.element), np.asarray(r2.state.element)
    )
    assert float(r1.step_time) == float(r2.step_time)
    # different key -> different trajectory (statistically)
    state_b = state.replace(key=jax.random.PRNGKey(123))
    r3 = events_mod.execute_superstep(geom, params, state_b)
    assert float(r3.step_time) != float(r1.step_time)


def test_conflict_zeroing_semantics():
    """Hand-built 4-site chain: after executing an event on (i, j), every
    pair touching i or j must be dead (reference: KMCProcess.cpp:327-352)."""
    # sites: 0=d, 1=O, 2=O, 3=d arranged in a line, nn within 1.1
    coords = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], float)
    elems = np.array(
        [int(Element.DEFECT), int(Element.O), int(Element.O), int(Element.DEFECT)],
        np.int32,
    )
    from devicekmc_tpu.config import Layer

    cfg = KMCConfig(
        lattice=[10.0, 10.0, 10.0], nn_dist=1.1, pbc=False,
        num_atoms_first_layer=0,
        layers=[Layer("oxide", 1.0, 0.0, 1.0, 1.0, -1.0, 4.0)],
    )
    geom = build_geometry(elems, coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)

    prob = events_mod.build_rate_table(geom, params, state)
    p_np = np.asarray(prob)
    # generation possible: (0->1) and (3->2); d-d and O-O pairs are dead
    assert p_np[0, 0] > 0  # site0 (d) with neighbour site1 (O)
    assert p_np[3, 0] > 0
    nz = {(i, int(geom.neigh_idx[i, s])) for i, s in zip(*np.nonzero(p_np))}
    assert nz == {(0, 1), (3, 2)}


def test_null_superstep_when_no_events():
    """All-metal structure: no events possible, Psum = 0, the loop must
    terminate with infinite step_time and zero events."""
    coords = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], float)
    elems = np.full(3, int(Element.Ti), np.int32)
    from devicekmc_tpu.config import Layer

    cfg = KMCConfig(
        lattice=[10.0, 10.0, 10.0], nn_dist=1.1,
        num_atoms_first_layer=0,
        layers=[Layer("contact", 0, 0, 0, 0, -1.0, 3.0)],
    )
    geom = build_geometry(elems, coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    res = events_mod.execute_superstep(geom, params, state)
    assert int(res.n_events) == 0
    assert np.isinf(float(res.step_time))


def test_incremental_matches_scan(small_sim):
    """The incremental O(max_nn) event loop must reproduce the full-scan
    loop's trajectory (same RNG stream; selection identical in exact
    arithmetic, FP differences only at measure-zero boundaries)."""
    s, cfg, geom, params, state, elems = _prepared(small_sim)
    p_scan = params.replace(event_mode="scan")
    p_inc = params.replace(event_mode="incremental")
    for step in range(4):
        r_scan = events_mod.execute_superstep(geom, p_scan, state)
        r_inc = events_mod.execute_superstep(geom, p_inc, state)
        assert int(r_scan.n_events) == int(r_inc.n_events), step
        np.testing.assert_array_equal(
            np.asarray(r_scan.state.element), np.asarray(r_inc.state.element)
        )
        np.testing.assert_array_equal(
            np.asarray(r_scan.state.charge), np.asarray(r_inc.state.charge)
        )
        assert float(r_scan.step_time) == pytest.approx(
            float(r_inc.step_time), rel=1e-12
        )
        state = r_scan.state


def test_rates_finite_under_extreme_fields(small_sim):
    """Mixed/f32 rate tables must stay finite (and summable) even with
    barrierless events under large potential differences — regression for
    the f32 overflow that derailed selection."""
    s, cfg, geom, params, state, elems = _prepared(small_sim, Vd=20.0)
    pm = params.replace(mixed=True)
    # exaggerate: charge everything chargeable
    state = state.replace(
        charge=jnp.where(state.element == int(Element.VACANCY), 2,
                         jnp.where(state.element == int(Element.OXYGEN_DEFECT),
                                   -2, 0)).astype(jnp.int32)
    )
    P = events_mod.build_rate_table(geom, pm, state)
    assert P.dtype == jnp.float32
    assert bool(jnp.isfinite(P).all())
    assert bool(jnp.isfinite(jnp.sum(P.astype(jnp.float64))))
    # the superstep must terminate
    res = events_mod.execute_superstep(geom, pm, state)
    assert int(res.n_events) < pm.max_events_per_superstep


def test_active_row_compaction_matches_full(small_sim):
    """Row-compacted incremental loop == full-table incremental loop
    (identical RNG stream; compaction over candidate sources is exact)."""
    s, cfg, geom, params, state, elems = _prepared(small_sim)
    n_src = int(np.isin(elems, [0, 1, 2]).sum())
    p_full = params.replace(active_rows_cap=0)
    p_cmp = params.replace(active_rows_cap=max(64, n_src + 16))
    for _ in range(3):
        r_full = events_mod.execute_superstep(geom, p_full, state)
        r_cmp = events_mod.execute_superstep(geom, p_cmp, state)
        assert int(r_full.n_events) == int(r_cmp.n_events)
        np.testing.assert_array_equal(
            np.asarray(r_full.state.element), np.asarray(r_cmp.state.element)
        )
        np.testing.assert_array_equal(
            np.asarray(r_full.state.charge), np.asarray(r_cmp.state.charge)
        )
        assert float(r_full.step_time) == pytest.approx(
            float(r_cmp.step_time), rel=1e-12
        )
        assert int(r_cmp.n_active) <= p_cmp.active_rows_cap
        state = r_full.state


def test_mixed_rate_table_matches_f64_where_representable(small_sim):
    """The f32 (mixed) rate path — packed single-gather — must agree with
    f64 for every rate representable in f32 (tiny rates may flush to zero;
    they are never selected in practice)."""
    s, cfg, geom, params, state, elems = _prepared(small_sim)
    P64 = np.asarray(events_mod.build_rate_table(geom, params, state))
    P32 = np.asarray(
        events_mod.build_rate_table(geom, params.replace(mixed=True), state)
    )
    # representable: exp factor above the f32 denormal floor (rate = 1e14*exp)
    big = P64 > 1e-20
    # exp amplifies f32 rounding by |EA/kT| (~150x)
    np.testing.assert_allclose(P32[big], P64[big], rtol=5e-5)
    # zeros only where f64 is (sub-f32) tiny
    assert (P64[(P32 == 0) & (P64 > 0)] < 1e-20).all()
