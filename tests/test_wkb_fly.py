"""On-the-fly WKB tunnel kernels (ops/wkb_pallas.py) vs the stored block.

The fly kernels re-derive the metal_p x metal_p tunnel entries inside the
matvec (interpret mode on CPU); the stored reference path is
current.tunnel_block — the same physics (src/current_solver.cpp:135-154)
assembled into a materialised block.  Entries agree except for the
x**1.5 == x*sqrt(x) spelling (<= 1 ulp) and summation order (f32 noise).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from devicekmc_tpu.config import KMCConfig
from devicekmc_tpu.ops.wkb_pallas import (
    wkb_fly_matmat, wkb_fly_matvec, wkb_fly_pdisp,
)
from devicekmc_tpu.physics import charge as charge_mod
from devicekmc_tpu.physics import current as current_mod
from devicekmc_tpu.physics import potential as potential_mod
from devicekmc_tpu.physics.current import (
    _pdisp_rows_cols, resolve_transport_cc, tunnel_block, wkb_single_T,
)
from devicekmc_tpu.state import build_geometry, build_params, init_state
from devicekmc_tpu.structure import Element, make_test_structure

Q = 1.602176634e-19
HBAR = 1.054571817e-34
M0 = 9.1093837015e-31


def _rand_env(pbc: bool):
    return dict(
        cdtype=jnp.float32,
        prefac=jnp.float32(-(np.sqrt(2 * 0.85 * M0) / HBAR) * (2 / 3)),
        qV0=jnp.float32(Q * 1.6),
        dE_step=jnp.float32(Q * 0.01),
        ctol=jnp.float32(Q * 0.01),
        nn=jnp.float32(3.5),
        lattice=jnp.asarray([100.0, 60.0, 60.0], jnp.float32),
        pbc=pbc,
        n_int_steps=64,
    )


@pytest.fixture(scope="module")
def rand_points():
    rng = np.random.default_rng(42)
    n = 300
    pos = (rng.random((n, 3)) * np.array([100.0, 60.0, 60.0])).astype(
        np.float32
    )
    cb = (rng.random(n) * Q * 2 - Q).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    return pos, cb, x, rng


@pytest.mark.parametrize("pbc", [False, True])
@pytest.mark.parametrize("symmetric", [False, True])
def test_fly_matvec_matches_stored(rand_points, pbc, symmetric):
    pos, cb, x, _ = rand_points
    env = _rand_env(pbc)
    n = pos.shape[0]
    ones = jnp.ones(n, bool)
    T = tunnel_block(env, jnp.asarray(pos), jnp.asarray(cb), ones,
                     jnp.asarray(pos), jnp.asarray(cb), ones, wkb_single_T)
    y_ref = np.asarray(T).astype(np.float64) @ x.astype(np.float64)
    y_fly = np.asarray(wkb_fly_matvec(
        jnp.asarray(pos), jnp.asarray(cb), jnp.asarray(x), env,
        interpret=True, symmetric=symmetric,
    ))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_fly, y_ref, atol=1e-5 * scale)


@pytest.mark.parametrize("pbc", [False, True])
def test_fly_matmat_matches_stored(rand_points, pbc):
    pos, cb, _, rng = rand_points
    env = _rand_env(pbc)
    n = pos.shape[0]
    ones = jnp.ones(n, bool)
    T = tunnel_block(env, jnp.asarray(pos), jnp.asarray(cb), ones,
                     jnp.asarray(pos), jnp.asarray(cb), ones, wkb_single_T)
    X = rng.standard_normal((n, 12)).astype(np.float32)
    Y_ref = np.asarray(T).astype(np.float64) @ X.astype(np.float64)
    Y_fly = np.asarray(wkb_fly_matmat(
        jnp.asarray(pos), jnp.asarray(cb), jnp.asarray(X), env,
        interpret=True,
    ))
    scale = np.abs(Y_ref).max()
    np.testing.assert_allclose(Y_fly, Y_ref, atol=1e-5 * scale)


@pytest.mark.parametrize("vd", [1.0, -2.0])
def test_fly_pdisp_matches_stored(rand_points, vd):
    pos, cb, x, _ = rand_points
    env = _rand_env(False)
    n = pos.shape[0]
    ones = jnp.ones(n, bool)
    T = tunnel_block(env, jnp.asarray(pos), jnp.asarray(cb), ones,
                     jnp.asarray(pos), jnp.asarray(cb), ones, wkb_single_T)
    ms = jnp.abs(jnp.asarray(x))
    r_ref, _ = _pdisp_rows_cols(T, ms, ms, vd)
    r_fly = np.asarray(wkb_fly_pdisp(
        jnp.asarray(pos), jnp.asarray(cb), ms, vd, env, interpret=True,
    ))
    scale = max(float(np.abs(np.asarray(r_ref)).max()), 1e-30)
    np.testing.assert_allclose(r_fly, np.asarray(r_ref), atol=1e-5 * scale)


@pytest.mark.parametrize("pbc", [False, True])
def test_window_block_matches_stored(rand_points, pbc):
    """The VMEM window-integral assembly kernel == tunnel_block(window)."""
    from devicekmc_tpu.ops.wkb_pallas import wkb_window_block
    from devicekmc_tpu.physics.current import wkb_window_T

    pos, cb, _, rng = rand_points
    env = _rand_env(pbc)
    nv = 24
    vpos = jnp.asarray(pos[:nv] + 0.5)
    vcb = jnp.asarray(cb[:nv] * 0.7)
    v_ok = jnp.asarray(np.arange(nv) < nv - 5)
    T_ref = tunnel_block(
        env, vpos, vcb, v_ok, jnp.asarray(pos), jnp.asarray(cb),
        jnp.ones(pos.shape[0], bool), wkb_window_T,
    )
    T_fly = wkb_window_block(
        vpos, vcb, v_ok, jnp.asarray(pos), jnp.asarray(cb), env,
        interpret=True,
    )
    scale = max(float(jnp.max(jnp.abs(T_ref))), 1e-30)
    np.testing.assert_allclose(
        np.asarray(T_fly), np.asarray(T_ref), atol=1e-5 * scale
    )
    # masked vacancy rows are exactly zero
    assert (np.asarray(T_fly)[nv - 5:] == 0).all()


def test_blocked_vm_pallas_matches_jnp(blocked_sim):
    """assemble_X_blocks with tunnel_vm_kernel='pallas' == 'jnp'."""
    geom, params, state, Vd, n_vac = blocked_sim
    base = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4), mixed=True
    )
    blk_j = current_mod.assemble_X_blocks(geom, base, state)
    blk_p = current_mod.assemble_X_blocks(
        geom, base.replace(tunnel_vm_kernel="pallas"), state
    )
    scale = max(float(np.abs(np.asarray(blk_j["T_vm"])).max()), 1e-30)
    np.testing.assert_allclose(
        np.asarray(blk_p["T_vm"]), np.asarray(blk_j["T_vm"]),
        atol=1e-5 * scale,
    )


def test_resolve_transport_cc():
    assert resolve_transport_cc("stored", 10 ** 6, True) == "stored"
    assert resolve_transport_cc("fly", 10, True) == "fly"
    assert resolve_transport_cc("auto", 24_768, True) == "stored"
    assert resolve_transport_cc("auto", 112_000, True) == "fly"
    # pure-f64 entries cannot fly
    assert resolve_transport_cc("auto", 112_000, False) == "stored"


# ---------------------------------------------------------------------------
# end-to-end: blocked transport with transport_cc='fly' vs 'stored'
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def blocked_sim():
    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0, pbc=False,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        A=6.25e-19,
    )
    elems = s.elements.copy()
    rng = np.random.default_rng(7)
    oxide = np.nonzero(elems == int(Element.O))[0]
    elems[rng.choice(oxide, size=8, replace=False)] = int(Element.VACANCY)
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    Vd = 2.0
    state, _ = charge_mod.update_charge(geom, state)
    state, _ = potential_mod.solve_cb_edge(geom, params, state, Vd)
    n_vac = int((elems[np.asarray(geom.atom_ind)] == int(Element.VACANCY)).sum())
    return geom, params, state, Vd, n_vac


def test_blocked_fly_matches_stored_mixed(blocked_sim):
    geom, params, state, Vd, n_vac = blocked_sim
    base = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4), mixed=True
    )
    st_s, ms = current_mod.update_power(
        geom, base.replace(transport_cc="stored"), state, Vd
    )
    st_f, mf = current_mod.update_power(
        geom, base.replace(transport_cc="fly"), state, Vd
    )
    np.testing.assert_allclose(
        float(st_f.I_macro), float(st_s.I_macro), rtol=1e-5
    )
    p_s, p_f = np.asarray(st_s.power), np.asarray(st_f.power)
    np.testing.assert_allclose(
        p_f, p_s, rtol=1e-4, atol=1e-6 * float(np.abs(p_s).max() + 1e-300)
    )
    # the fly block never exists: the per-bias cache has nothing to store
    assert current_mod.assemble_cc_block(
        geom, base.replace(transport_cc="fly"), state
    ) is None


def test_blocked_fly_deflated_matches_direct(blocked_sim):
    """fly + A-DEF2 deflation (the matmat kernel builds W = A Z)."""
    geom, params, state, Vd, n_vac = blocked_sim
    st_d, _ = current_mod.update_power(geom, params, state, Vd, method="direct")
    pb = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4), mixed=True,
        transport_precond="deflated", coarse_slabs=8, transport_cc="fly",
    )
    st_f, mf = current_mod.update_power(geom, pb, state, Vd)
    np.testing.assert_allclose(
        float(st_f.I_macro), float(st_d.I_macro), rtol=2e-4
    )
    assert bool(mf["transport_converged"])


def test_fly_requires_f32_entries(blocked_sim):
    geom, params, state, Vd, n_vac = blocked_sim
    pb = params.replace(
        transport="blocked", tunnel_vac_cap=max(16, n_vac + 4),
        mixed=False, transport_cc="fly",
    )
    with pytest.raises(ValueError, match="transport_cc='fly'"):
        current_mod.update_power(geom, pb, state, Vd)
