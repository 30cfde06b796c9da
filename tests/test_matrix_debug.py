import numpy as np

from devicekmc_tpu.io import (
    boundary_matrix_dense,
    check_matrix_match,
    dump_csr_txt,
    ell_to_csr,
    load_csr_txt,
    save_csr_format,
)
from devicekmc_tpu.physics import charge as charge_mod
from devicekmc_tpu.physics.potential import _edge_conductance_boundary

from test_fields import small_sim  # noqa: F401
import oracles


def test_dense_matrix_matches_oracle(small_sim):
    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    K = boundary_matrix_dense(geom, params, state)
    # oracle dense K (same construction as laplace_oracle's internals)
    from devicekmc_tpu.structure import site_dist
    n = geom.N
    dist = site_dist(s.coords[:, None, :], s.coords[None, :, :],
                     s.lattice, cfg.pbc)
    neighbor = (dist < cfg.nn_dist) & ~np.eye(n, dtype=bool)
    metal = np.asarray(geom.metal_mask_table)[elems]
    cvac = (elems == 2) & (np.asarray(state.charge) == 0)
    hi = (metal[:, None] & metal[None, :]) | (cvac[:, None] & cvac[None, :])
    K_ref = np.where(neighbor, np.where(hi, -cfg.high_G, -cfg.low_G), 0.0)
    np.fill_diagonal(K_ref, 0.0)
    K_ref[np.arange(n), np.arange(n)] = -K_ref.sum(axis=1)
    np.testing.assert_allclose(K, K_ref, atol=1e-14)


def test_csr_roundtrip_and_match(small_sim, tmp_path):
    s, cfg, geom, params, state, elems = small_sim
    state, _ = charge_mod.update_charge(geom, state)
    edge_g = np.asarray(_edge_conductance_boundary(geom, state, params))
    diag = edge_g.sum(axis=1)
    vals, cols, row_ptr = ell_to_csr(np.asarray(geom.neigh_idx), -edge_g, diag)

    dump_csr_txt(row_ptr, cols, vals, step=3, prefix=str(tmp_path))
    rp2, c2, v2 = load_csr_txt(3, prefix=str(tmp_path))
    np.testing.assert_array_equal(rp2, row_ptr)
    np.testing.assert_array_equal(c2, cols)
    assert check_matrix_match(v2, vals)
    assert not check_matrix_match(v2 + 1e-3, vals)

    K = boundary_matrix_dense(geom, params, state)
    save_csr_format(K, 4, 4, str(tmp_path / "K.txt"))
    lines = open(tmp_path / "K.txt").read().strip().split("\n")
    assert len(lines) == 3
