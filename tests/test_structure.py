import numpy as np
import os
import pytest

from devicekmc_tpu.structure import (
    Element,
    build_neighbor_list,
    element_from_str,
    element_to_str,
    make_test_structure,
    read_xyz,
    site_dist,
    translate_cell,
    write_xyz,
    assign_layers,
)


def brute_force_neighbors(coords, lattice, nn_dist, pbc):
    n = len(coords)
    d = site_dist(coords[:, None, :], coords[None, :, :], np.asarray(lattice), pbc)
    mask = (d < nn_dist) & ~np.eye(n, dtype=bool)
    max_nn = int(mask.sum(1).max())
    out = np.full((n, max_nn), -1, dtype=np.int32)
    for i in range(n):
        nb = np.nonzero(mask[i])[0]
        out[i, : len(nb)] = nb
    return out


def test_element_roundtrip():
    for s in ["d", "Od", "V", "O", "Hf", "Ni", "Ti", "Pt", "N"]:
        assert element_to_str(element_from_str(s)) == s


def test_site_dist_pbc():
    lattice = np.array([100.0, 10.0, 10.0])
    a = np.array([0.0, 9.5, 0.0])
    b = np.array([0.0, 0.5, 0.0])
    # periodic in y: distance wraps to 1.0
    assert np.isclose(site_dist(a, b, lattice, True), 1.0)
    assert np.isclose(site_dist(a, b, lattice, False), 9.0)
    # x never wraps
    c = np.array([99.0, 0.0, 0.0])
    d = np.array([1.0, 0.0, 0.0])
    assert np.isclose(site_dist(c, d, lattice, True), 98.0)


def test_neighbor_list_matches_bruteforce():
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 20, size=(300, 3))
    lattice = [20.0, 20.0, 20.0]
    for pbc in (False, True):
        ref = brute_force_neighbors(coords, lattice, 3.0, pbc)
        got = build_neighbor_list(coords, lattice, 3.0, pbc)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def test_neighbor_list_pbc_wraps():
    # two atoms separated only through the periodic y boundary
    coords = np.array([[0.0, 0.2, 0.0], [0.0, 9.8, 0.0], [5.0, 5.0, 5.0]])
    lattice = [10.0, 10.0, 10.0]
    nb = build_neighbor_list(coords, lattice, 1.0, True)
    assert nb[0, 0] == 1 and nb[1, 0] == 0
    nb_open = build_neighbor_list(coords, lattice, 1.0, False)
    assert (nb_open == -1).all()


def test_xyz_roundtrip(tmp_path):
    s = make_test_structure(nx_contact=2, nx_oxide=4, ny=2, nz=2)
    path = tmp_path / "s.xyz"
    write_xyz(str(path), s.elements, s.coords, comment="Cell: 1 2 3")
    e2, c2 = read_xyz(str(path))
    np.testing.assert_array_equal(e2, s.elements)
    np.testing.assert_allclose(c2, s.coords, atol=1e-5)


REF_XYZ = "/root/reference/structures/single_devices/2.5nm/device_2.5.xyz"


@pytest.mark.skipif(not os.path.exists(REF_XYZ), reason="no reference")
def test_read_reference_xyz():
    elems, coords = read_xyz(REF_XYZ)
    assert len(elems) == 6420
    assert coords.shape == (6420, 3)
    # first site is N at x=-21.0212 (contact)
    assert elems[0] == int(Element.N)
    assert np.isclose(coords[0, 0], -21.0212)


def test_translate_cell_shape_preserved():
    rng = np.random.default_rng(1)
    coords = rng.uniform(0, 10, size=(50, 3))
    out = translate_cell(coords, [10.0, 10.0, 10.0], [0.0, 0.5, 0.5])
    assert out.shape == coords.shape
    # x untouched up to centering
    np.testing.assert_allclose(out[:, 0], coords[:, 0])


def test_generated_structure_sane():
    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3)
    lay = assign_layers(s.coords, s.layers)
    assert lay.min() >= 0 and lay.max() == 4
    # contacts are prefix/suffix after the x-sort
    assert (lay[: s.num_atoms_first_layer] == 0).all()
    # neighbour list has no isolated sites at this density
    nb = build_neighbor_list(s.coords, s.lattice, 3.0, False)
    assert (nb[:, 0] >= 0).all()


def test_native_matches_numpy_neighbor_list():
    import importlib

    from devicekmc_tpu import structure as st

    if st._native is None:
        import pytest

        pytest.skip("native extension not built")
    rng = np.random.default_rng(5)
    coords = rng.uniform(0, 25, size=(800, 3))
    lattice = [25.0, 25.0, 25.0]
    for pbc in (False, True):
        a = st._native.build_neighbor_list(
            coords, np.asarray(lattice), 3.0, int(pbc), 0
        )
        b = st._build_neighbor_list_numpy(coords, lattice, 3.0, pbc)
        np.testing.assert_array_equal(a, b)


def test_make_crossbar_structure():
    """Synthetic crossbar generator: reference-like composition (Hf:O =
    1:2, TiN plate contacts, 'd' interstitials), x-sorted with the
    prefix/suffix contact convention, and reference-like neighbour
    statistics under nn_dist=3.5."""
    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.state import build_geometry
    from devicekmc_tpu.structure import Element, make_crossbar_structure

    s = make_crossbar_structure(nx_contact=4, nx_oxide=8, ny=10, nz=10, seed=2)
    e = s.elements
    n_hf = (e == int(Element.Hf)).sum()
    n_o = (e == int(Element.O)).sum()
    assert abs(n_o / n_hf - 2.0) < 0.2
    assert (e == int(Element.DEFECT)).sum() > 0
    # contacts are file-prefix/suffix
    nc = s.num_atoms_contact
    metals = {int(Element.Ti), int(Element.N)}
    assert set(e[:nc].tolist()) <= metals
    assert set(e[-nc:].tolist()) <= metals
    assert set(e[nc:-nc].tolist()).isdisjoint(metals)
    assert s.num_atoms_first_layer == 100

    cfg = KMCConfig(lattice=list(s.lattice), nn_dist=3.5, pbc=False,
                    num_atoms_first_layer=s.num_atoms_first_layer,
                    num_layers_contact=s.num_layers_contact,
                    num_atoms_contact=s.num_atoms_contact, layers=s.layers)
    geom = build_geometry(s.elements, s.coords, cfg)
    nb = np.asarray(geom.neigh_idx)
    mean_nn = float((nb >= 0).sum(1).mean())
    assert 15 < mean_nn < 40        # reference crossbar: ~27
    assert nb.shape[1] < 80         # reference: 52


def test_make_crossbar_structure_interior_bars():
    """3D X-point variant: bar_pitch embeds interior Ti/N word/bit lines
    in the oxide (metal scales with volume — the transport_cc=fly design
    regime), without shorting the contacts along x or changing the total
    site count."""
    from devicekmc_tpu.structure import Element, make_crossbar_structure

    a = 2.13
    base = make_crossbar_structure(nx_contact=4, nx_oxide=12, ny=12, nz=12,
                                   seed=2)
    bars = make_crossbar_structure(nx_contact=4, nx_oxide=12, ny=12, nz=12,
                                   seed=2, bar_pitch=4)
    assert len(bars.elements) == len(base.elements)

    metals = {int(Element.Ti), int(Element.N)}
    is_m = np.isin(bars.elements, list(metals))
    ox_lo, ox_hi = 4 * a, (4 + 12) * a
    x = bars.coords[:, 0]
    in_oxide = (x > ox_lo + 0.5 * a) & (x < ox_hi - 0.5 * a)
    n_int = int(np.sum(is_m & in_oxide))
    base_int = int(np.sum(np.isin(base.elements, list(metals))
                          & (base.coords[:, 0] > ox_lo + 0.5 * a)
                          & (base.coords[:, 0] < ox_hi - 0.5 * a)))
    assert base_int == 0
    assert n_int > 0.05 * np.sum(in_oxide)

    # no x-spanning short: every bar plane pair is separated from the
    # next metal x-plane by > nn_dist of pure oxide
    # ADVICE r4: interior bars must stay > nn_dist clear of BOTH plate
    # contacts (contact-adjacent metal fuses galvanically to the plates
    # through nn high_G links, inflating effective contact area) — checked
    # over the full oxide window, no x filter that could hide edge planes
    nn_dist = 3.5
    xm_int = x[is_m & (x > ox_lo - 0.5 * a) & (x < ox_hi - 0.01)]
    assert xm_int.size > 0
    assert (xm_int - (ox_lo - a)).min() > nn_dist   # clear of source plate
    assert (ox_hi - xm_int).min() > nn_dist         # clear of drain plate

    mx = np.unique(np.round(x[is_m] / a).astype(int))
    ox_planes = [p for p in mx if ox_lo / a < p < ox_hi / a - 0.5]
    runs, cur = [], [ox_planes[0]]
    for p in ox_planes[1:]:
        if p == cur[-1] + 1:
            cur.append(p)
        else:
            runs.append(cur)
            cur = [p]
    runs.append(cur)
    assert all(len(r) <= 2 for r in runs)   # pairs only, never a bridge
