"""Atomic structure handling: elements, xyz I/O, PBC geometry, neighbour lists.

The simulation domain is an irregular atomic graph: N *sites* = lattice atoms
plus interstitial "defect" sites.  Geometry is static for the whole run — only
site *elements* and *charges* evolve — so the neighbour list, pair distances
and layer assignment are computed once up front and treated as constants by
the jitted compute path.

TPU-first design notes:
  * the neighbour graph is built directly in padded ELL form
    ``neigh_idx[N, max_nn]`` (pad = -1), which is the layout every downstream
    kernel consumes (rate table, SpMV, charge rule) — no CSR conversion step;
  * periodicity is y/z-only minimum-image (x is the transport axis), matching
    the reference semantics (src/utils.cpp:100-174).

Reference behaviours covered here: read_xyz (src/utils.cpp:72-98), site_dist
(src/utils.cpp:100-174), translate_cell/center_coords (src/utils.cpp:244-299),
constructSiteNeighborList (src/Device.cpp:98-136).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


class Element(enum.IntEnum):
    """Site occupants (reference: src/utils.h:37-44)."""

    DEFECT = 0          # "d"  — empty interstitial site
    OXYGEN_DEFECT = 1   # "Od" — oxygen ion on an interstitial site
    VACANCY = 2         # "V"  — oxygen vacancy on a lattice site
    O = 3
    Hf = 4
    Ni = 5
    Ti = 6
    Pt = 7
    N = 8
    NULL = 9


_STR_TO_ELEMENT = {
    "d": Element.DEFECT,
    "Od": Element.OXYGEN_DEFECT,
    "V": Element.VACANCY,
    "O": Element.O,
    "Hf": Element.Hf,
    "Ni": Element.Ni,
    "Ti": Element.Ti,
    "Pt": Element.Pt,
    "N": Element.N,
}
_ELEMENT_TO_STR = {v: k for k, v in _STR_TO_ELEMENT.items()}

#: elements that never occupy a lattice-atom slot.  Sites holding anything
#: else are "atoms" for the transport solver; crucially this *atom mask is
#: invariant under all four KMC events* (generation maps d->Od and O->V,
#: recombination the inverse, diffusions swap within the same class), so the
#: transport problem size is static — a property the TPU build exploits that
#: the reference rediscovers every step (src/Device.cpp:138-172).
NON_ATOM_ELEMENTS = (Element.DEFECT, Element.OXYGEN_DEFECT)


def element_from_str(s: str) -> Element:
    try:
        return _STR_TO_ELEMENT[s]
    except KeyError:
        raise ValueError(f"Unknown element symbol: {s!r}")


def element_to_str(e) -> str:
    return _ELEMENT_TO_STR[Element(int(e))]


# ----------------------------------------------------------------------------
# xyz I/O
# ----------------------------------------------------------------------------

def read_xyz(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read an xyz file -> (elements[N] int32, coords[N,3] float64).

    Format: first line = count, second line = comment (often "Cell: x y z"),
    then ``element x y z [extra columns ignored]`` per line
    (reference: src/utils.cpp:72-98).
    """
    with open(path) as f:
        n = int(f.readline().split()[0])
        f.readline()
        elements = np.empty(n, dtype=np.int32)
        coords = np.empty((n, 3), dtype=np.float64)
        for i in range(n):
            parts = f.readline().split()
            elements[i] = int(element_from_str(parts[0]))
            coords[i] = [float(parts[1]), float(parts[2]), float(parts[3])]
    return elements, coords


def write_xyz(
    path: str,
    elements: np.ndarray,
    coords: np.ndarray,
    extra_cols: Sequence[np.ndarray] = (),
    comment: str = "",
) -> None:
    """Write an xyz snapshot; extra per-site columns are appended
    (reference snapshot format: element x y z potential power,
    src/Device.cpp:236-252)."""
    n = len(elements)
    cols = [np.asarray(c) for c in extra_cols]
    with open(path, "w") as f:
        f.write(f"{n}\n{comment}\n")
        for i in range(n):
            row = [
                element_to_str(elements[i]),
                _fmt(coords[i, 0]), _fmt(coords[i, 1]), _fmt(coords[i, 2]),
            ]
            row += [_fmt(c[i]) for c in cols]
            f.write("   ".join(row) + "\n")


def _fmt(x: float) -> str:
    return f"{x:.10g}"


# ----------------------------------------------------------------------------
# geometry
# ----------------------------------------------------------------------------

def pair_displacement(
    pos_i: np.ndarray, pos_j: np.ndarray, lattice: np.ndarray, pbc: bool
) -> np.ndarray:
    """Displacement i-j with y/z-only minimum image (x = transport axis, open).

    Broadcasts over leading dimensions; matches reference site_dist
    (src/utils.cpp:100-174).
    """
    d = pos_i - pos_j
    if pbc:
        d = np.array(d, copy=True)
        for ax in (1, 2):
            frac = d[..., ax] / lattice[ax]
            d[..., ax] = (frac - np.round(frac)) * lattice[ax]
    return d


def site_dist(
    pos_i: np.ndarray, pos_j: np.ndarray, lattice: np.ndarray, pbc: bool
) -> np.ndarray:
    """Pairwise distance [Angstrom] with y/z periodicity."""
    d = pair_displacement(np.asarray(pos_i, dtype=np.float64),
                          np.asarray(pos_j, dtype=np.float64),
                          np.asarray(lattice, dtype=np.float64), pbc)
    return np.sqrt((d * d).sum(axis=-1))


def center_coords(coords: np.ndarray, dims: Sequence[bool]) -> np.ndarray:
    out = coords.copy()
    for ax in range(3):
        if dims[ax]:
            out[:, ax] -= out[:, ax].min()
    return out


def translate_cell(
    coords: np.ndarray, lattice: Sequence[float], shifts: Sequence[float]
) -> np.ndarray:
    """Shift the cell across its periodic boundary (src/utils.cpp:244-299)."""
    lattice = np.asarray(lattice, dtype=np.float64)
    shifts = np.asarray(shifts, dtype=np.float64)
    dims = shifts != 0.0
    out = center_coords(coords, dims)
    cut = lattice * shifts
    for ax in range(3):
        if dims[ax]:
            wrap = out[:, ax] < cut[ax]
            out[wrap, ax] += lattice[ax]
    return center_coords(out, dims)


# ----------------------------------------------------------------------------
# neighbour list (padded ELL)
# ----------------------------------------------------------------------------

try:
    import devicekmc_native as _native
except ImportError:  # optional C++ runtime (build: python setup.py build_ext)
    _native = None


def build_neighbor_list(
    coords: np.ndarray,
    lattice: Sequence[float],
    nn_dist: float,
    pbc: bool,
    max_nn: Optional[int] = None,
    block: int = 2048,
) -> np.ndarray:
    """Build the padded neighbour index array ``neigh_idx[N, max_nn]``.

    Neighbour = distance < nn_dist and i != j (src/Device.cpp:175-199).
    Spatial-binned O(N * local) construction; pad value is -1.  Neighbour
    order within a row is ascending site index, matching the reference's
    adjacency-list construction order (its inner j loop runs 0..N).

    Uses the OpenMP C++ builder from ``devicekmc_native`` when available,
    else the numpy implementation below.
    """
    if _native is not None:
        return _native.build_neighbor_list(
            np.ascontiguousarray(coords, dtype=np.float64),
            np.ascontiguousarray(lattice, dtype=np.float64),
            float(nn_dist), int(bool(pbc)),
            int(max_nn) if max_nn else 0,
        )
    return _build_neighbor_list_numpy(coords, lattice, nn_dist, pbc, max_nn, block)


def _build_neighbor_list_numpy(
    coords: np.ndarray,
    lattice: Sequence[float],
    nn_dist: float,
    pbc: bool,
    max_nn: Optional[int] = None,
    block: int = 2048,
) -> np.ndarray:
    coords = np.asarray(coords, dtype=np.float64)
    lattice = np.asarray(lattice, dtype=np.float64)
    n = len(coords)

    # spatial binning on a grid of cell size >= nn_dist
    mins = coords.min(axis=0)
    spans = np.maximum(coords.max(axis=0) - mins, 1e-9)
    ncell = np.maximum((spans // nn_dist).astype(int), 1)
    if pbc:
        # bins must tile the periodic cell exactly in y/z
        ncell[1] = max(int(lattice[1] // nn_dist), 1)
        ncell[2] = max(int(lattice[2] // nn_dist), 1)
        spans = spans.copy()
        spans[1], spans[2] = lattice[1], lattice[2]
    cell_of = np.minimum(
        ((coords - mins) / (spans / ncell)).astype(int), ncell - 1
    )
    cell_id = (cell_of[:, 0] * ncell[1] + cell_of[:, 1]) * ncell[2] + cell_of[:, 2]

    order = np.argsort(cell_id, kind="stable")
    sorted_cells = cell_id[order]
    # bucket boundaries
    uniq, starts = np.unique(sorted_cells, return_index=True)
    bucket_start = dict(zip(uniq.tolist(), starts.tolist()))
    bucket_end = dict(zip(uniq.tolist(), np.append(starts[1:], n).tolist()))

    def bucket_members(cx, cy, cz):
        if cx < 0 or cx >= ncell[0]:
            return None
        if pbc:
            cy %= ncell[1]
            cz %= ncell[2]
        elif cy < 0 or cy >= ncell[1] or cz < 0 or cz >= ncell[2]:
            return None
        cid = (cx * ncell[1] + cy) * ncell[2] + cz
        if cid not in bucket_start:
            return None
        return order[bucket_start[cid]:bucket_end[cid]]

    neigh_lists: List[np.ndarray] = [None] * n  # type: ignore
    counts = np.zeros(n, dtype=np.int64)

    for b0 in range(0, n, block):
        idx = np.arange(b0, min(b0 + block, n))
        # candidate set: union of 27-neighbourhood buckets of this block
        cand_set: List[np.ndarray] = []
        cells_here = np.unique(
            (cell_of[idx][:, 0] * ncell[1] + cell_of[idx][:, 1]) * ncell[2]
            + cell_of[idx][:, 2]
        )
        seen = set()
        for cid in cells_here.tolist():
            cx, rem = divmod(cid, ncell[1] * ncell[2])
            cy, cz = divmod(rem, ncell[2])
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        m = bucket_members(cx + dx, cy + dy, cz + dz)
                        if m is not None:
                            key = (cx + dx, (cy + dy) % ncell[1] if pbc else cy + dy,
                                   (cz + dz) % ncell[2] if pbc else cz + dz)
                            if key not in seen:
                                seen.add(key)
                                cand_set.append(m)
        cand = np.unique(np.concatenate(cand_set)) if cand_set else np.empty(0, int)
        d = site_dist(coords[idx][:, None, :], coords[cand][None, :, :], lattice, pbc)
        mask = (d < nn_dist) & (idx[:, None] != cand[None, :])
        for r, i in enumerate(idx):
            nb = cand[mask[r]]
            neigh_lists[i] = np.sort(nb)
            counts[i] = len(nb)

    observed_max = int(counts.max()) if n else 0
    if max_nn is None:
        max_nn = observed_max
    elif observed_max > max_nn:
        raise ValueError(
            f"max_nn={max_nn} too small: a site has {observed_max} neighbours"
        )

    neigh_idx = np.full((n, max_nn), -1, dtype=np.int32)
    for i in range(n):
        neigh_idx[i, : counts[i]] = neigh_lists[i]
    return neigh_idx


def assign_layers(coords: np.ndarray, layers) -> np.ndarray:
    """Map each site to a layer index by x-coordinate; later layers win ties
    (reference scan order, src/KMCProcess.cpp:34-50).  Raises if any site is
    outside every layer."""
    n = len(coords)
    lay = np.full(n, -1, dtype=np.int32)
    for li, layer in enumerate(layers):
        in_layer = (coords[:, 0] >= layer.start_x) & (coords[:, 0] <= layer.end_x)
        lay[in_layer] = li
    if (lay < 0).any():
        bad = int(np.argmax(lay < 0))
        raise ValueError(
            f"Site {bad} at x={coords[bad, 0]} is outside every device layer"
        )
    return lay


# ----------------------------------------------------------------------------
# synthetic structure generator (for tests and scaling runs)
# ----------------------------------------------------------------------------

@dataclass
class GeneratedStructure:
    elements: np.ndarray   # [N] int32
    coords: np.ndarray     # [N,3] float64
    lattice: np.ndarray    # [3] float64
    layers: list           # List[Layer]
    num_atoms_first_layer: int
    num_atoms_contact: int
    num_layers_contact: int


def make_test_structure(
    nx_contact: int = 3,
    nx_oxide: int = 8,
    ny: int = 4,
    nz: int = 4,
    a: float = 2.5,
    interstitial_fraction: float = 0.5,
    seed: int = 0,
) -> GeneratedStructure:
    """Generate a small TiN / HfO2 / TiN stack on a cubic lattice with
    interstitial (DEFECT) sites — structurally equivalent to the reference's
    devices (contact / interface / oxide / interface / contact along x) but
    synthetic, for unit tests and benchmarks at arbitrary size."""
    from .config import Layer

    rng = np.random.default_rng(seed)
    elems: List[int] = []
    coords: List[List[float]] = []

    nx_total = 2 * nx_contact + nx_oxide
    for ix in range(nx_total):
        for iy in range(ny):
            for iz in range(nz):
                x, y, z = ix * a, iy * a, iz * a
                if ix < nx_contact or ix >= nx_contact + nx_oxide:
                    e = Element.Ti if (ix + iy + iz) % 2 else Element.N
                else:
                    e = Element.Hf if (ix + iy + iz) % 2 else Element.O
                elems.append(int(e))
                coords.append([x, y, z])

    # interstitial defect sites inside the oxide, off-lattice
    ox_lo, ox_hi = nx_contact * a, (nx_contact + nx_oxide - 1) * a
    n_inter = int(interstitial_fraction * nx_oxide * ny * nz)
    for _ in range(n_inter):
        x = rng.uniform(ox_lo + 0.3 * a, ox_hi - 0.3 * a)
        y = rng.uniform(0, (ny - 1) * a)
        z = rng.uniform(0, (nz - 1) * a)
        elems.append(int(Element.DEFECT))
        coords.append([x, y, z])

    coords_np = np.array(coords, dtype=np.float64)
    elems_np = np.array(elems, dtype=np.int32)
    # sort by x (contacts first/last) to match the prefix/suffix contact
    # indexing convention the solvers rely on
    order = np.lexsort((coords_np[:, 2], coords_np[:, 1], coords_np[:, 0]))
    coords_np, elems_np = coords_np[order], elems_np[order]

    lattice = np.array([nx_total * a, ny * a, nz * a], dtype=np.float64)
    eps = 0.5 * a
    layers = [
        Layer("contact", 0.0, 0.0, 0.0, 0.76, -eps, ox_lo - eps),
        Layer("interface", 3.93, 0.0, 1.09, 0.76, ox_lo - eps, ox_lo + a + eps),
        Layer("oxide", 3.93, 0.0, 1.09, 0.76, ox_lo + a + eps, ox_hi - a - eps),
        Layer("interface", 1.66, 0.0, 1.09, 0.76, ox_hi - a - eps, ox_hi + eps),
        Layer("contact", 1.73, 0.0, 0.0, 2.8, ox_hi + eps, nx_total * a + eps),
    ]
    return GeneratedStructure(
        elements=elems_np,
        coords=coords_np,
        lattice=lattice,
        layers=layers,
        num_atoms_first_layer=ny * nz,
        num_atoms_contact=nx_contact * ny * nz,
        num_layers_contact=nx_contact,
    )


def make_crossbar_structure(
    nx_contact: int = 10,
    nx_oxide: int = 24,
    ny: int = 42,
    nz: int = 42,
    a: float = 2.13,
    jitter: float = 0.25,
    interstitial_fraction: float = 0.74,
    seed: int = 0,
    bar_pitch: int = 0,
    bar_width: int = 2,
    bar_x_pitch: int = 6,
) -> GeneratedStructure:
    """Synthetic crossbar-class structure at arbitrary scale.

    Mirrors the composition of the reference's timing crossbar
    (structures/crossbars/timing_10nm_5pitch/crossbar_10_5.xyz: TiN plate
    contacts of 10 x-planes, amorphous HfO2 oxide with Hf:O = 1:2, plus a
    separate interstitial ('d') population at ~0.74 per oxide cell —
    75,360 lattice + 35,453 interstitial = 110,813 sites) without
    depending on the reference xyz files: contacts are crystalline
    Ti/N planes; the oxide is a jittered cubic HfO2-like lattice (1 Hf +
    2 O per cell, Gaussian ``jitter`` making the neighbour count
    distribution amorphous-like); interstitials are uniform in the oxide
    region.  Defaults give ~115k sites; scale ny/nz/nx_oxide for the
    200k-750k scaling studies.

    ``bar_pitch > 0`` embeds interior metal lines in the oxide — the 3D
    X-point composition (stacked word/bit lines) where interior metal
    scales with VOLUME instead of the plates' cross-section.  Every
    ``bar_x_pitch``-th oxide x-plane pair becomes a bar plane whose
    orientation alternates (lines along y, then along z); within a bar
    plane, cells with ``iz % bar_pitch < bar_width`` (resp. ``iy``) are
    crystalline Ti/N instead of jittered HfO2.  Bars never span x, so the
    contacts are not shorted.  This is the geometry class that exercises
    ``transport_cc='fly'`` at its design scale: n_mp grows ~N rather than
    ~N^(2/3), and the stored metal_p x metal_p tunnel block
    (O(n_mp^2) bytes) stops fitting in HBM long before N does."""
    from .config import Layer

    rng = np.random.default_rng(seed)
    elems: List[int] = []
    coords: List[List[float]] = []

    nx_total = 2 * nx_contact + nx_oxide
    ox_lo, ox_hi = nx_contact * a, (nx_contact + nx_oxide) * a
    for ix in range(nx_total):
        in_left = ix < nx_contact
        in_right = ix >= nx_contact + nx_oxide
        for iy in range(ny):
            for iz in range(nz):
                x, y, z = ix * a, iy * a, iz * a
                if in_left or in_right:
                    e = Element.Ti if (ix + iy + iz) % 2 else Element.N
                    elems.append(int(e))
                    coords.append([x, y, z])
                else:
                    ox_ix = ix - nx_contact
                    in_bar = False
                    # bar planes are phase-offset into the oxide interior
                    # and kept >= 2 planes (2a > nn_dist) clear of both
                    # plate contacts: a contact-adjacent bar plane would
                    # fuse galvanically to the plate through nn
                    # metal-metal high_G links, inflating effective
                    # contact area instead of volume-scaling interior
                    # metal (ADVICE r4)
                    if (
                        bar_pitch > 0 and 2 <= ox_ix <= nx_oxide - 3
                        and (ox_ix - bar_x_pitch // 2) % bar_x_pitch < 2
                    ):
                        # bar plane pair; orientation alternates per pair
                        along_y = (ox_ix // bar_x_pitch) % 2 == 0
                        t = iz if along_y else iy
                        in_bar = t % bar_pitch < bar_width
                    if in_bar:
                        e = Element.Ti if (ix + iy + iz) % 2 else Element.N
                        elems.append(int(e))
                        coords.append([x, y, z])
                        continue
                    # HfO2-like: one jittered site per cell, Hf:O = 1:2
                    # (matches the reference oxide's ~0.09 sites/A^3)
                    e = Element.Hf if (ix + iy + iz) % 3 == 0 else Element.O
                    j = rng.normal(0.0, jitter, 3)
                    px = float(np.clip(x + j[0], ox_lo + 0.1,
                                       ox_hi - a * 0.5 - 0.1))
                    elems.append(int(e))
                    coords.append([px, y + j[1], z + j[2]])

    n_inter = int(interstitial_fraction * nx_oxide * ny * nz)
    ix_ = rng.uniform(ox_lo + 0.3 * a, ox_hi - 0.8 * a, n_inter)
    iy_ = rng.uniform(0, (ny - 1) * a, n_inter)
    iz_ = rng.uniform(0, (nz - 1) * a, n_inter)
    for k in range(n_inter):
        elems.append(int(Element.DEFECT))
        coords.append([float(ix_[k]), float(iy_[k]), float(iz_[k])])

    coords_np = np.array(coords, dtype=np.float64)
    elems_np = np.array(elems, dtype=np.int32)
    order = np.lexsort((coords_np[:, 2], coords_np[:, 1], coords_np[:, 0]))
    coords_np, elems_np = coords_np[order], elems_np[order]

    lattice = np.array([nx_total * a, ny * a, nz * a], dtype=np.float64)
    eps = 0.5 * a
    layers = [
        Layer("contact", 0.0, 0.0, 0.0, 0.76, -eps, ox_lo - eps),
        Layer("interface", 3.93, 0.0, 1.09, 0.76, ox_lo - eps, ox_lo + a + eps),
        Layer("oxide", 3.93, 0.0, 1.09, 0.76, ox_lo + a + eps, ox_hi - a - eps),
        Layer("interface", 1.66, 0.0, 1.09, 0.76, ox_hi - a - eps, ox_hi + eps),
        Layer("contact", 1.73, 0.0, 0.0, 2.8, ox_hi + eps, nx_total * a + eps),
    ]
    return GeneratedStructure(
        elements=elems_np,
        coords=coords_np,
        lattice=lattice,
        layers=layers,
        num_atoms_first_layer=ny * nz,
        num_atoms_contact=nx_contact * ny * nz,
        num_layers_contact=nx_contact,
    )
