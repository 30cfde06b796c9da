"""Field solvers (charge, potentials, current, heat) vs numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from devicekmc_tpu import constants as C
from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.physics import charge as charge_mod
from devicekmc_tpu.physics import current as current_mod
from devicekmc_tpu.physics import heat as heat_mod
from devicekmc_tpu.physics import potential as potential_mod
from devicekmc_tpu.state import build_geometry, build_params, init_state
from devicekmc_tpu.structure import Element, make_test_structure

import oracles


@pytest.fixture(scope="module")
def small_sim():
    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    cfg = KMCConfig(
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
        A=6.25e-19,
    )
    # seed some defect species so every rule fires
    elems = s.elements.copy()
    rng = np.random.default_rng(7)
    oxide = np.nonzero(elems == int(Element.O))[0]
    vac_sites = rng.choice(oxide, size=8, replace=False)
    elems[vac_sites] = int(Element.VACANCY)
    defects = np.nonzero(elems == int(Element.DEFECT))[0]
    od_sites = rng.choice(defects, size=4, replace=False)
    elems[od_sites] = int(Element.OXYGEN_DEFECT)

    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    return s, cfg, geom, params, state, elems


def test_charge_vs_oracle(small_sim):
    s, cfg, geom, params, state, elems = small_sim
    new_state, metrics = charge_mod.update_charge(geom, state)
    ref = oracles.charge_oracle(
        elems, np.asarray(geom.neigh_idx), np.asarray(geom.metal_mask_table)
    )
    np.testing.assert_array_equal(np.asarray(new_state.charge), ref)
    n_v = (elems == int(Element.VACANCY)).sum()
    assert (
        int(metrics["Charged vacancies"]) + int(metrics["Uncharged vacancies"])
        == n_v
    )


def test_boundary_potential_vs_oracle(small_sim):
    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    Vd = 2.0
    state2, info = potential_mod.solve_boundary_potential(geom, params, state, Vd)
    ref = oracles.laplace_oracle(
        s.coords, s.lattice, cfg.pbc, cfg.nn_dist, elems,
        np.asarray(state.charge), np.asarray(geom.metal_mask_table),
        cfg.high_G, cfg.low_G,
        cfg.num_atoms_first_layer, cfg.num_atoms_first_layer,
        -Vd / 2, Vd / 2, "boundary",
    )
    # CG vs direct: pointwise agreement is bounded by kappa(A)*tol with
    # kappa ~ high_G/low_G = 1e8, so allow a few ulps of that
    np.testing.assert_allclose(
        np.asarray(state2.potential_boundary), ref, rtol=2e-5, atol=1e-7
    )


def test_cb_edge_vs_oracle(small_sim):
    s, cfg, geom, params, state, elems = small_sim
    Vd = 2.0
    state2, _ = potential_mod.solve_cb_edge(geom, params, state, Vd)
    ref = oracles.laplace_oracle(
        s.coords, s.lattice, cfg.pbc, cfg.nn_dist, elems,
        np.asarray(state.charge), np.asarray(geom.metal_mask_table),
        cfg.high_G, cfg.low_G,
        cfg.num_atoms_first_layer, cfg.num_atoms_first_layer,
        Vd / 2, -Vd / 2, "cb",
    )
    np.testing.assert_allclose(
        np.asarray(state2.CB_edge), ref * C.EV_TO_J, rtol=1e-6, atol=1e-25
    )


def test_poisson_vs_oracle(small_sim):
    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    state2 = potential_mod.poisson_gridless(geom, params, state, block=64)
    ref = oracles.poisson_oracle(
        s.coords, s.lattice, cfg.pbc, np.asarray(state.charge),
        cfg.sigma, cfg.k,
    )
    np.testing.assert_allclose(
        np.asarray(state2.potential_charge), ref, rtol=1e-10, atol=1e-12
    )


def _current_ready_state(small_sim, Vd):
    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    state, _ = potential_mod.solve_cb_edge(geom, params, state, Vd)
    return s, cfg, geom, params, state, elems


@pytest.mark.parametrize("method", ["direct", "cg"])
def test_current_power_vs_oracle(small_sim, method):
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    state2, metrics = current_mod.update_power(
        geom, params, state, Vd, method=method, cg_tol=1e-13
    )
    ai = np.asarray(geom.atom_ind)
    I_ref, atom_power_ref, X_ref, M_ref = oracles.transmission_oracle(
        s.coords[ai], s.lattice, cfg.pbc,
        elems[ai], np.asarray(state.charge)[ai],
        np.asarray(state.CB_edge)[ai],
        np.asarray(geom.metal_mask_table), cfg, Vd,
    )
    # X assembly parity
    X, _ = current_mod.assemble_X(geom, params, state, Vd)
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-9, atol=1e-30)
    # current + power parity
    np.testing.assert_allclose(
        float(state2.I_macro), I_ref, rtol=1e-5 if method == "cg" else 1e-9
    )
    power = np.asarray(state2.power)[ai]
    np.testing.assert_allclose(
        power, atom_power_ref,
        rtol=1e-4 if method == "cg" else 1e-7,
        atol=1e-18,
    )


def test_global_temperature():
    cfg = KMCConfig(A=6.25e-19)
    params = build_params(cfg)
    s = make_test_structure(nx_contact=2, nx_oxide=4, ny=2, nz=2)
    geom = build_geometry(s.elements, s.coords, KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0, A=6.25e-19,
    ))
    state = init_state(geom, cfg, s.elements)
    state = state.replace(power=jnp.ones(geom.N, dtype=params.dtype) * 1e-6)
    step_time = 1e-9
    new_state, m = heat_mod.update_temperature_global(params, state, step_time)
    # oracle (reference: heat_solver.cpp:316-350, using current T_bg)
    P_tot = geom.N * 1e-6
    C_th = cfg.A * cfg.t_ox * cfg.c_p * 1e6
    a = cfg.dissipation_constant / C_th
    c = a * 300.0 + P_tot / C_th
    T_ref = c / a + (300.0 - c / a) * np.exp(-a * step_time)
    assert np.isclose(float(new_state.T_bg), T_ref, rtol=1e-12)
    assert float(new_state.T_bg) > 300.0


def test_poisson_compact_matches_dense(small_sim):
    from devicekmc_tpu.physics import charge as charge_mod

    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    dense = potential_mod.poisson_gridless(geom, params, state, block=64)
    compact, n_charged = potential_mod.poisson_gridless_compact(
        geom, params, state, cap=64, block=64
    )
    assert int(n_charged) <= 64
    np.testing.assert_allclose(
        np.asarray(compact.potential_charge),
        np.asarray(dense.potential_charge),
        rtol=1e-12, atol=1e-14,
    )


def test_bond_currents(small_sim):
    """Bond-current field export: net injected ~ net extracted, finite."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    I_vec, I_out = current_mod.compute_bond_currents(
        geom, params, state, Vd, method="direct"
    )
    assert I_vec.shape == (geom.N_atom, 3)
    assert bool(jnp.isfinite(I_vec).all()) and bool(jnp.isfinite(I_out).all())
    assert float(I_out.max()) > 0


def test_pallas_poisson_interpret_matches_jnp():
    """Pallas pairwise kernel (interpret mode) == jnp compact Poisson."""
    import jax

    from devicekmc_tpu.ops.pairwise_pallas import poisson_pairwise_pallas
    from devicekmc_tpu.physics.potential import _poisson_rows_compact

    rng = np.random.default_rng(0)
    N, cap = 700, 128
    coords = jnp.asarray(rng.uniform(0, 30, (N, 3)), jnp.float32)
    charge = np.zeros(N, np.int32)
    charge[rng.choice(N, 40, replace=False)] = rng.choice([-2, 2], 40)
    charge = jnp.asarray(charge)
    lattice = jnp.asarray([30.0, 30.0, 30.0], jnp.float32)
    sigma, k = jnp.float32(3.5e-10), jnp.float32(8.987552e9 / 23)

    for pbc in (False, True):
        ref, n_ch = _poisson_rows_compact(
            coords, charge, lattice, sigma, k, pbc, 256, cap
        )
        (cidx,) = jnp.nonzero(charge != 0, size=cap, fill_value=0)
        ok = jnp.arange(cap) < n_ch
        cq = jnp.where(ok, charge[cidx], 0).astype(jnp.float32)
        got = poisson_pairwise_pallas(
            coords, cidx.astype(jnp.int32), cq, sigma, k, lattice, pbc,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-6 * float(jnp.abs(ref).max())
        )


def test_tunnel_vac_compaction_matches_dense(small_sim):
    """Compact (vac x metal_p) contact->trap integral == dense path."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    X_dense, _ = current_mod.assemble_X(
        geom, params.replace(tunnel_vac_cap=0), state, Vd
    )
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    X_cmp, _ = current_mod.assemble_X(
        geom, params.replace(tunnel_vac_cap=max(16, n_vac + 4)), state, Vd
    )
    np.testing.assert_allclose(
        np.asarray(X_cmp), np.asarray(X_dense), rtol=1e-12, atol=0
    )


def test_mixed_transport_assembly_close_to_f64(small_sim):
    """f32 pairwise X assembly (mixed mode) ~ f64 within elementwise f32
    error; structural zeros identical."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    X64, _ = current_mod.assemble_X(geom, params, state, Vd)
    Xm, _ = current_mod.assemble_X(geom, params.replace(mixed=True), state, Vd)
    X64, Xm = np.asarray(X64), np.asarray(Xm)
    # exponentials amplify f32 rounding by the exponent magnitude; the
    # worst entries (near-cancelling trapezoidal barriers) reach ~0.7%,
    # which propagates to ~5e-5 on I_macro and ~0.3% on site power —
    # beneath KMC sampling noise (measured; see PERFORMANCE.md)
    nz = X64 != 0
    rel = np.abs(Xm[nz] - X64[nz]) / np.abs(X64[nz])
    assert rel.max() < 2e-2, rel.max()
    # no spurious structure: zero where f64 is zero, except f32-flushed tiny
    assert (np.abs(X64[(Xm == 0) & nz]) < 1e-30).all()


def test_mixed_scaled_cg_transport_matches_direct(small_sim):
    """Mixed-mode transport solve (f32 CG on the Jacobi-scaled system with
    f64 refinement) reaches f64-direct accuracy."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    st_d, _ = current_mod.update_power(geom, params, state, Vd, method="direct")
    pm_mixed = params.replace(mixed=True)
    st_m, mm = current_mod.update_power(geom, pm_mixed, state, Vd, method="cg")
    # mixed assembly contributes ~5e-5; the solver itself ~4e-7
    np.testing.assert_allclose(
        float(st_m.I_macro), float(st_d.I_macro), rtol=2e-4
    )
    assert int(mm["cg_iters_power"]) < 500


def test_blocked_operator_matches_dense_X(small_sim):
    """The blocked matrix-free operator (ELL neighbour part + tunnel blocks
    over {vacancy, metal_p}) applied to random vectors == dense X @ x."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    pb = params.replace(transport="blocked", tunnel_vac_cap=max(16, n_vac + 4))
    X, _ = current_mod.assemble_X(geom, params, state, Vd)
    blk = current_mod.assemble_X_blocks(geom, pb, state)
    # diagonal parity
    np.testing.assert_allclose(
        np.asarray(blk["diag"]), np.diagonal(np.asarray(X)),
        rtol=1e-12, atol=0,
    )
    rng = np.random.default_rng(11)
    for _ in range(3):
        x = rng.standard_normal(geom.N_atom + 2)
        y_dense = np.asarray(X) @ x
        y_blk = np.asarray(
            current_mod._apply_X_blocks(blk, jnp.asarray(x), jnp.float64)
        )
        scale = np.abs(y_dense).max()
        np.testing.assert_allclose(y_blk, y_dense, rtol=1e-12, atol=1e-12 * scale)


def test_blocked_update_power_matches_dense(small_sim):
    """End-to-end update_power with transport='blocked' == dense direct."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    st_d, md = current_mod.update_power(geom, params, state, Vd, method="direct")
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    pb = params.replace(transport="blocked", tunnel_vac_cap=max(16, n_vac + 4))
    st_b, mb = current_mod.update_power(geom, pb, state, Vd, cg_tol=1e-13)
    np.testing.assert_allclose(
        float(st_b.I_macro), float(st_d.I_macro), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st_b.power), np.asarray(st_d.power),
        rtol=1e-5, atol=1e-9 * float(np.abs(np.asarray(st_d.power)).max() + 1e-300),
    )
    assert int(mb["n_vac_atoms"]) == n_vac


def test_blocked_update_power_mixed(small_sim):
    """Mixed-precision blocked transport (f32 blocks + scaled-IR CG) stays
    within the dense-mixed accuracy envelope."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    st_d, _ = current_mod.update_power(geom, params, state, Vd, method="direct")
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    pb = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4), mixed=True
    )
    st_b, mb = current_mod.update_power(geom, pb, state, Vd)
    np.testing.assert_allclose(
        float(st_b.I_macro), float(st_d.I_macro), rtol=2e-4
    )
    assert int(mb["cg_iters_power"]) < 2000


def test_blocked_chunked_assembly_matches_direct(small_sim, monkeypatch):
    """Row-chunked tunnel-block assembly (big-block path) == direct."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    pb = params.replace(transport="blocked", tunnel_vac_cap=max(16, n_vac + 4))
    blk_direct = current_mod.assemble_X_blocks(geom, pb, state)
    monkeypatch.setattr(current_mod, "TUNNEL_CHUNK_ELEMS", 64)
    blk_chunk = current_mod.assemble_X_blocks(geom, pb, state)
    for k in ("T_cc", "T_vv", "T_vm", "diag"):
        np.testing.assert_allclose(
            np.asarray(blk_chunk[k]), np.asarray(blk_direct[k]),
            rtol=1e-13, atol=0, err_msg=k,
        )
    # the integration-window metric must cover the actual CB-edge spread
    needed = int(blk_direct["int_steps_needed"])
    assert 0 <= needed <= current_mod.MAX_TUNNEL_STEPS


def test_banded_nb_matvec_matches_ell(small_sim):
    """The static banded matvec + vacancy-bucket correction equals the
    f32 ELL neighbour gather term exactly (same values, different
    summation order -> f32 round-off tolerance)."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    pb = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4), mixed=True
    )
    band = current_mod.build_banded_nb(geom, pb, state, block=32)
    blk = current_mod.assemble_X_blocks(geom, pb, state, band=band)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(geom.N_atom + 2), dtype=jnp.float32)
    y_band = current_mod._apply_X_blocks(blk, x, jnp.float32)
    blk.pop("band")
    y_ell = current_mod._apply_X_blocks(blk, x, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(y_band), np.asarray(y_ell), rtol=1e-5,
        atol=1e-5 * float(np.abs(np.asarray(y_ell)).max()),
    )


def test_blocked_banded_update_power_matches_dense(small_sim):
    """End-to-end banded blocked transport == dense direct (the banded
    operator only changes the f32 inner iterations; f64 refinement uses
    the exact ELL path, so accuracy is unchanged)."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    st_d, _ = current_mod.update_power(geom, params, state, Vd, method="direct")
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    pb = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4), mixed=True,
        transport_precond="deflated", coarse_slabs=8,
    )
    band = current_mod.build_banded_nb(geom, pb, state, block=32)
    st_b, mb = current_mod.update_power(
        geom, pb, state, Vd, cc={"band": band}
    )
    np.testing.assert_allclose(
        float(st_b.I_macro), float(st_d.I_macro), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_b.power), np.asarray(st_d.power),
        rtol=1e-2, atol=1e-6 * float(np.abs(np.asarray(st_d.power)).max() + 1e-300),
    )
    assert int(mb["cg_iters_power"]) < 2000


def test_blocked_deflated_precond_matches_dense(small_sim):
    """A-DEF2 deflated blocked solve (scaled-metric x-slab deflation) ==
    dense, in both f64 and mixed modes, and the cold solve takes FEWER
    iterations than plain Jacobi (the whole point of deflation)."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    st_d, _ = current_mod.update_power(geom, params, state, Vd, method="direct")
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    base = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4),
        transport_precond="deflated", coarse_slabs=8,
    )
    st_c, mc = current_mod.update_power(geom, base, state, Vd, cg_tol=1e-13)
    np.testing.assert_allclose(
        float(st_c.I_macro), float(st_d.I_macro), rtol=1e-6
    )
    st_m, mm = current_mod.update_power(geom, base.replace(mixed=True), state, Vd)
    np.testing.assert_allclose(
        float(st_m.I_macro), float(st_d.I_macro), rtol=2e-4
    )
    # cold-solve iteration comparison vs Jacobi, same tolerance
    _, mj = current_mod.update_power(
        geom, base.replace(transport_precond="jacobi"), state, Vd,
        cg_tol=1e-13,
    )
    assert int(mc["cg_iters_power"]) < int(mj["cg_iters_power"])
    assert int(mc["cg_iters_power"]) < 2000
    assert int(mm["cg_iters_power"]) < 2000


def test_poisson_compact_pallas_matches_jnp(small_sim):
    """poisson_gridless_compact with the pallas kernel (interpret mode on
    CPU) == the jnp blocked sweep."""
    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    pj = params.replace(mixed=True)
    st_jnp, n1 = potential_mod.poisson_gridless_compact(geom, pj, state, cap=64)
    st_pal, n2 = potential_mod.poisson_gridless_compact(
        geom, pj.replace(poisson_kernel="pallas"), state, cap=64
    )
    assert int(n1) == int(n2)
    a = np.asarray(st_jnp.potential_charge)
    b = np.asarray(st_pal.potential_charge)
    np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-6 * np.abs(a).max())


def test_boundary_deflated_matches_jacobi(small_sim):
    """A-DEF2 deflated boundary/CB Laplace solves == plain Jacobi CG (both
    converge to the same Dirichlet solution), cold-start iterations lower."""
    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    Vd = 2.0
    pj = params.replace(boundary_precond="jacobi")
    pd = params.replace(boundary_precond="deflated", coarse_slabs=8)
    stj, mj = potential_mod.solve_boundary_potential(geom, pj, state, Vd)
    std, md = potential_mod.solve_boundary_potential(geom, pd, state, Vd)
    a = np.asarray(stj.potential_boundary)
    b = np.asarray(std.potential_boundary)
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6 * np.abs(a).max())
    assert int(md["cg_iters_boundary"]) < int(mj["cg_iters_boundary"])

    cj, mj2 = potential_mod.solve_cb_edge(geom, pj, state, Vd)
    cd, md2 = potential_mod.solve_cb_edge(geom, pd, state, Vd)
    np.testing.assert_allclose(
        np.asarray(cd.CB_edge), np.asarray(cj.CB_edge),
        rtol=1e-4, atol=1e-6 * float(np.abs(np.asarray(cj.CB_edge)).max()),
    )
    assert int(md2["cg_iters_cb_edge"]) < int(mj2["cg_iters_cb_edge"])


def test_blocked_bf16_inner_matches_dense(small_sim):
    """transport_bf16_inner: bf16 tunnel twins for the f32 inner
    iterations; the f64 refinement keeps the f32 operator so the result
    stays within the mixed-mode accuracy envelope."""
    Vd = 2.0
    s, cfg, geom, params, state, elems = _current_ready_state(small_sim, Vd)
    st_d, _ = current_mod.update_power(geom, params, state, Vd, method="direct")
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    pb = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4), mixed=True,
        transport_bf16_inner=True,
    )
    st_b, mb = current_mod.update_power(geom, pb, state, Vd)
    np.testing.assert_allclose(
        float(st_b.I_macro), float(st_d.I_macro), rtol=2e-4
    )
    assert int(mb["cg_iters_power"]) < 4000
    # bf16-inner also stores the static band bf16 (the f64 refinement keeps
    # the exact ELL path, so the converged result is unchanged)
    band = current_mod.build_banded_nb(geom, pb, state, block=32)
    assert band["C"].dtype == jnp.bfloat16
    st_bb, mbb = current_mod.update_power(
        geom, pb, state, Vd, cc={"band": band}
    )
    np.testing.assert_allclose(
        float(st_bb.I_macro), float(st_d.I_macro), rtol=2e-4
    )
    assert int(mbb["cg_iters_power"]) < 4000
