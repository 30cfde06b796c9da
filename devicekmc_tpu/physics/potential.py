"""Electrostatic potential solvers.

Three pieces, as in the reference:

1. **Boundary (resistive-network) potential** — Laplace solve over the site
   conductance graph with Dirichlet contacts at -Vd/2 / +Vd/2, conductance
   high_G for metal-metal or neutral-vacancy-pair edges, else low_G.
   Reference: Device::background_potential (src/potential_solver.cpp:289-410)
   and background_potential_gpu_sparse (src/potential_solver_gpu.cu:696-781).

2. **CB-edge Laplace solve** — same graph but conductance high_G if *either*
   endpoint is metal, contacts at +Vd/2 / -Vd/2, solution scaled to Joules.
   Solved once per bias point.  Reference: Device::setLaplacePotential
   (src/potential_solver.cpp:4-139), update_CB_edge_gpu_sparse
   (src/potential_solver_gpu.cu:595-694).

3. **Gridless Poisson** — O(N^2) superposition of screened-Coulomb solutions
   from every charged site.  Reference: poisson_gridless
   (src/potential_solver.cpp:412-432, GPU :907-978).

TPU design: both Laplace solves are Dirichlet-eliminated CG on the ELL graph
(interior subspace; boundary columns folded into the RHS), warm-started from
the previous solution.  The Poisson sum is a blocked row-sweep (lax.map over
row tiles) so the N x N interaction never materialises; a Pallas kernel
version lives in ops/pairwise (used when available).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from .. import constants as C
from ..ops.cg import cg_solve, cg_solve_mixed
from ..ops.ell import ell_matvec
from ..state import Geometry, PhysParams, SimState
from ..structure import Element


def _edge_conductance_boundary(geom: Geometry, state: SimState, params: PhysParams):
    """Per-edge conductance for the boundary-potential network:
    high_G iff (metal,metal) or (neutral vacancy, neutral vacancy)."""
    elem = state.element
    safe = jnp.maximum(geom.neigh_idx, 0)
    metal_i = geom.metal_mask_table[elem][:, None]
    metal_j = geom.metal_mask_table[elem[safe]]
    cvac_i = ((elem == int(Element.VACANCY)) & (state.charge == 0))[:, None]
    cvac_j = (elem[safe] == int(Element.VACANCY)) & (state.charge[safe] == 0)
    high = (metal_i & metal_j) | (cvac_i & cvac_j)
    g = jnp.where(high, params.high_G, params.low_G)
    return jnp.where(geom.neigh_valid, g, 0.0).astype(params.dtype)


def _edge_conductance_cb(geom: Geometry, state: SimState, params: PhysParams):
    """Per-edge conductance for the CB-edge network: high_G iff either
    endpoint is metal (src/potential_solver.cpp:58-70)."""
    elem = state.element
    safe = jnp.maximum(geom.neigh_idx, 0)
    metal_i = geom.metal_mask_table[elem][:, None]
    metal_j = geom.metal_mask_table[elem[safe]]
    g = jnp.where(metal_i | metal_j, params.high_G, params.low_G)
    return jnp.where(geom.neigh_valid, g, 0.0).astype(params.dtype)


def _dirichlet_laplace_solve(
    geom: Geometry,
    edge_g,             # [N, max_nn] conductances (0 at pads)
    v_left,
    v_right,
    x0,                 # [N] warm start (full-length; boundary part ignored)
    tol: float,
    maxiter: int,
    mixed: str = "",
    masks=None,         # (left, right, interior) override; default geom masks
    deflate_slabs: int = 0,
    want_residual: bool = False,
):
    """Solve the graph Laplacian with Dirichlet contacts (geom.left_mask /
    geom.right_mask, or the ``masks`` override).  Returns the full-length
    potential vector.

    ``mixed="ir"`` runs the CG iterations in f32 with f64
    iterative-refinement residuals (see ops.cg.cg_solve_mixed).  NOTE:
    measured on the 110k-site crossbar, kappa(D^-1/2 A D^-1/2) * eps_f32 > 1
    and the refinement stalls (11k+ inner iterations vs 471 plain f64) — so
    mixed precision keeps these solves in f64 and spends its f32 budget on
    the rate/Poisson kernels instead."""
    if masks is None:
        is_left, is_right, interior = (
            geom.left_mask, geom.right_mask, geom.interior_mask
        )
    else:
        is_left, is_right, interior = masks

    diag = jnp.sum(edge_g, axis=1)          # row sum of conductances
    safe = jnp.maximum(geom.neigh_idx, 0)
    nb_left = is_left[safe]
    nb_right = is_right[safe]
    nb_boundary_v = jnp.where(
        nb_left, v_left, jnp.where(nb_right, v_right, 0.0)
    ).astype(edge_g.dtype)

    # RHS: b_i = sum_{j in boundary} G_ij * V_j   (Dirichlet elimination)
    b = jnp.where(interior, jnp.sum(edge_g * nb_boundary_v, axis=1), 0.0)

    # interior operator: (L_II x)_i = diag_i x_i - sum_{j interior} G_ij x_j
    neg_vals = -edge_g * (interior[safe])

    def matvec(x):
        xm = jnp.where(interior, x, 0.0)
        y = ell_matvec(diag, neg_vals, geom.neigh_idx, xm)
        return jnp.where(interior, y, 0.0)

    x0_int = jnp.where(interior, x0, 0.0)
    pre_diag = jnp.where(interior, diag, 1.0)

    if mixed == "ir":
        diag32 = diag.astype(jnp.float32)
        vals32 = neg_vals.astype(jnp.float32)
        int32m = interior

        def matvec32(x):
            xm = jnp.where(int32m, x, jnp.float32(0.0))
            y = ell_matvec(diag32, vals32, geom.neigh_idx, xm)
            return jnp.where(int32m, y, jnp.float32(0.0))

        res = cg_solve_mixed(
            matvec, matvec32, b, x0=x0_int, diag=pre_diag,
            tol=tol, maxiter=maxiter,
        )
    elif deflate_slabs > 0:
        # A-DEF2 x-slab deflation in the Jacobi-scaled metric — the same
        # construction that cut the blocked-transport re-solves (see
        # current._deflation_ops): the Laplacian's smooth long-range error
        # modes (kappa ~ high_G/low_G = 1e8) are exactly what the slab
        # basis captures, and cold solves at bias changes are this
        # solver's dominant cost (~471 f64 iterations at 110k sites).
        # criterion="r" on the scaled system == the Jacobi-scaled rule —
        # the reference's own criterion on its symmetric-scaled system
        # (src/iterative_solvers_gpu.cu:309-480).
        from ..ops.cg import invert_coarse

        K = deflate_slabs
        ax = geom.coords[:, 0].astype(edge_g.dtype)
        big = jnp.asarray(jnp.finfo(edge_g.dtype).max, edge_g.dtype)
        xmin = jnp.min(jnp.where(interior, ax, big))
        xmax = jnp.max(jnp.where(interior, ax, -big))
        slab = jnp.clip(
            ((ax - xmin) / jnp.maximum(xmax - xmin, 1e-30) * K)
            .astype(jnp.int32), 0, K - 1,
        )
        agg = jnp.where(interior, slab, K)      # contacts: no aggregate
        Zm = jax.nn.one_hot(agg, K, dtype=edge_g.dtype)   # [N, K]

        # LZ in one pass: diag term + max_nn column panels
        LZ = pre_diag[:, None] * Zm
        safe_nb = jnp.maximum(geom.neigh_idx, 0)
        for s in range(neg_vals.shape[1]):
            LZ = LZ + neg_vals[:, s:s + 1] * Zm[safe_nb[:, s]]
        LZ = jnp.where(interior[:, None], LZ, 0.0)
        E = Zm.T @ LZ
        E_inv = invert_coarse(E, edge_g.dtype)
        ds = jnp.sqrt(jnp.where(interior & (diag > 0), diag, 1.0))
        dsi = 1.0 / ds
        Zhat = ds[:, None] * Zm
        W = dsi[:, None] * LZ

        def esolve(a):
            c = E_inv @ a
            return c + E_inv @ (a - E @ c)

        b_s = dsi * b
        y0 = ds * x0_int
        y0 = y0 - Zhat @ esolve(W.T @ y0) + Zhat @ esolve(Zhat.T @ b_s)
        res = cg_solve(
            lambda y: dsi * matvec(dsi * y), b_s, x0=y0,
            precond=lambda r: r + Zhat @ esolve(Zhat.T @ r - W.T @ r),
            tol=tol, maxiter=maxiter, criterion="r",
        )
        res = res._replace(x=res.x * dsi)
    else:
        res = cg_solve(
            matvec, b, x0=x0_int, diag=pre_diag, tol=tol, maxiter=maxiter
        )

    phi = jnp.where(
        is_left, v_left, jnp.where(is_right, v_right, res.x)
    ).astype(edge_g.dtype)
    if want_residual:
        # TRUE residual of the returned solution (not CG's recursion
        # residual, which drifts by ~eps*kappa over the iterations) — the
        # anchor the incremental fast path updates exactly
        r_true = jnp.where(interior, b - matvec(res.x), 0.0)
        return phi, res, r_true, b
    return phi, res


def _incremental_boundary_residual(
    geom: Geometry, params: PhysParams, state: SimState, cvac, changed,
    v_left, v_right,
):
    """Exact O(changed rows) update of the stored boundary residual/RHS.

    An event changes the conductance network only on rows touching a site
    whose neutral-vacancy membership flipped, so ``r = b - L_II x`` and
    ``b`` change only on those rows and their neighbours.  Recompute
    exactly those rows with the same arithmetic as
    :func:`_dirichlet_laplace_solve` (f64 row gathers, O(cap * max_nn))
    and re-evaluate the plain-r convergence criterion — the identical
    decision a fresh assembly + matvec would make, at ~1/1000 the cost.

    Returns ``(r_new, b_new, converged)``; ``converged`` is False when the
    changed set overflows ``boundary_delta_cap`` (the caller then takes the
    full-solve branch, which is exact either way).
    """
    from ..ops.compact import nonzero_fixed

    dtype = params.dtype
    cap = int(params.boundary_delta_cap)
    n_changed = jnp.sum(changed, dtype=jnp.int32)
    fits = n_changed <= cap

    ch_idx, _ = nonzero_fixed(changed, cap, fill_value=0)
    ch_ok = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(n_changed, cap)

    # affected rows = changed sites + their neighbours (a row's entries
    # involve only the row site and its neighbour sites)
    aff = jnp.zeros(geom.N, dtype=bool).at[ch_idx].max(ch_ok)
    nb = geom.neigh_idx[ch_idx]                       # [cap, max_nn]
    nb_ok = ch_ok[:, None] & (nb >= 0)
    aff = aff.at[jnp.where(nb_ok, nb, 0)].max(nb_ok)

    cap2 = cap * (geom.neigh_idx.shape[1] + 1)
    rows, _ = nonzero_fixed(aff, cap2, fill_value=0)
    # padded slots recompute row 0 exactly — harmless duplicate writes

    elem = state.element
    metal = geom.metal_mask_table[elem]
    interior = geom.bp_interior_mask
    xm = jnp.where(interior, state.potential_boundary, 0.0)

    rnb = geom.neigh_idx[rows]                        # [cap2, max_nn]
    rvalid = rnb >= 0
    rsafe = jnp.where(rvalid, rnb, 0)
    hi = ((metal[rows][:, None] & metal[rsafe])
          | (cvac[rows][:, None] & cvac[rsafe]))
    g = jnp.where(hi, params.high_G, params.low_G)
    g = jnp.where(rvalid, g, 0.0).astype(dtype)

    nb_left = geom.bp_left_mask[rsafe]
    nb_right = geom.bp_right_mask[rsafe]
    nbv = jnp.where(
        nb_left, v_left, jnp.where(nb_right, v_right, 0.0)
    ).astype(dtype)
    int_rows = interior[rows]
    b_rows = jnp.where(int_rows, jnp.sum(g * nbv, axis=1), 0.0)

    # (L_II x) on the affected rows: diag_i x_i - sum_{j interior} G_ij x_j
    diag_rows = jnp.sum(g, axis=1)
    y_rows = diag_rows * xm[rows] - jnp.sum(
        g * interior[rsafe] * xm[rsafe], axis=1
    )
    r_rows = jnp.where(int_rows, b_rows - y_rows, 0.0)

    r_new = state.boundary_r.at[rows].set(r_rows)
    b_new = state.boundary_b.at[rows].set(b_rows)

    rn2 = jnp.dot(r_new, r_new)
    ref = jnp.sqrt(jnp.dot(b_new, b_new))
    thresh = params.solver_tol * jnp.where(ref > 0, ref, 1.0)
    return r_new, b_new, fits & (rn2 <= thresh * thresh)


def solve_boundary_potential(
    geom: Geometry, params: PhysParams, state: SimState, Vd
) -> Tuple[SimState, dict]:
    """Update ``site_potential_boundary``: contacts at -Vd/2 (left) and +Vd/2
    (right), matching both CPU (src/potential_solver.cpp:311-319) and GPU
    sparse (src/potential_solver_gpu.cu:734-771) paths.

    Two exact fast paths:
      * the conductance network is a function of the static metal mask and
        the neutral-vacancy set only — if that set and Vd are unchanged
        since the previous solve, the previous potential *is* the solution
        and assembly + CG are skipped entirely;
      * when the set changed sparsely (``boundary_incremental``), the
        stored TRUE residual is updated on exactly the affected rows and
        the plain-r criterion re-checked — if the warm solution still
        satisfies the tolerance (the common case deep into forming: 0-CG-
        iteration re-solves dominate the superstep otherwise), the full f64
        assembly + matvec is skipped.  Identical decision rule, so
        trajectories match the always-assemble path."""
    Vd = jnp.asarray(Vd, dtype=params.dtype)
    elem = state.element
    cvac = (elem == int(Element.VACANCY)) & (state.charge == 0)
    changed = cvac != state.cvac_prev
    same_vd = Vd == state.Vd_prev
    unchanged = jnp.all(~changed) & same_vd
    vl = (-Vd / 2.0).astype(params.dtype)
    vr = (Vd / 2.0).astype(params.dtype)

    inc_on = (
        getattr(params, "boundary_incremental", True)
        and getattr(params, "boundary_precond", "jacobi") == "jacobi"
    )

    def solve(state):
        edge_g = _edge_conductance_boundary(geom, state, params)
        phi, res, r_true, b = _dirichlet_laplace_solve(
            geom, edge_g, vl, vr,
            x0=state.potential_boundary,
            tol=params.solver_tol, maxiter=params.solver_maxiter,
            masks=(geom.bp_left_mask, geom.bp_right_mask,
                   geom.bp_interior_mask),
            deflate_slabs=(
                params.coarse_slabs
                if getattr(params, "boundary_precond", "jacobi") == "deflated"
                else 0
            ),
            want_residual=True,
        )
        return phi, res.iters, r_true, b

    def pure_skip(state):
        # network identical: the stored potential/residual anchor are
        # bit-exact; no delta work at all
        return (state.potential_boundary, jnp.asarray(0, jnp.int32),
                state.boundary_r, state.boundary_b)

    if inc_on:
        def on_change(state):
            r_inc, b_inc, inc_conv = _incremental_boundary_residual(
                geom, params, state, cvac, changed, vl, vr
            )

            def inc_skip(state):
                return (state.potential_boundary, jnp.asarray(0, jnp.int32),
                        r_inc, b_inc)

            return jax.lax.cond(same_vd & inc_conv, inc_skip, solve, state)

        phi, iters, r, b = jax.lax.cond(unchanged, pure_skip, on_change, state)
    else:
        phi, iters, r, b = jax.lax.cond(unchanged, pure_skip, solve, state)

    new_state = state.replace(
        potential_boundary=phi, cvac_prev=cvac, Vd_prev=Vd,
        boundary_r=r, boundary_b=b,
    )
    return new_state, {"cg_iters_boundary": iters}


def solve_cb_edge(
    geom: Geometry, params: PhysParams, state: SimState, Vd
) -> Tuple[SimState, dict]:
    """Update ``site_CB_edge`` [J]: contacts at +q*Vd/2 (left), -q*Vd/2
    (right).  The linear solve runs in volts and the result is scaled by
    eV_to_J, as the GPU path does (src/potential_solver_gpu.cu:634-674)."""
    edge_g = _edge_conductance_cb(geom, state, params)
    vl = jnp.asarray(Vd / 2.0, dtype=params.dtype)
    vr = jnp.asarray(-Vd / 2.0, dtype=params.dtype)
    x0 = state.CB_edge / C.EV_TO_J
    phi, res = _dirichlet_laplace_solve(
        geom, edge_g, vl, vr,
        x0=x0, tol=params.solver_tol, maxiter=params.solver_maxiter,
        deflate_slabs=(
            params.coarse_slabs
            if getattr(params, "boundary_precond", "jacobi") == "deflated"
            else 0
        ),
    )
    return (
        state.replace(CB_edge=phi * C.EV_TO_J),
        {"cg_iters_cb_edge": res.iters},
    )


# ----------------------------------------------------------------------------
# gridless Poisson (pairwise screened Coulomb)
# ----------------------------------------------------------------------------

def _pairwise_dist(coords_i, coords_j, lattice, pbc: bool):
    """[B,3] x [M,3] -> [B,M] distances with y/z minimum image."""
    d = coords_i[:, None, :] - coords_j[None, :, :]
    if pbc:
        dy = d[..., 1] - jnp.round(d[..., 1] / lattice[1]) * lattice[1]
        dz = d[..., 2] - jnp.round(d[..., 2] / lattice[2]) * lattice[2]
        d = jnp.stack([d[..., 0], dy, dz], axis=-1)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


@partial(jax.jit, static_argnames=("pbc", "block"))
def _poisson_rows(coords, charge_f, lattice, sigma, k, pbc: bool, block: int):
    N = coords.shape[0]
    n_pad = (-N) % block
    coords_p = jnp.pad(coords, ((0, n_pad), (0, 0)))
    row_ids = jnp.arange(N + n_pad, dtype=jnp.int32)
    col_ids = jnp.arange(N, dtype=jnp.int32)

    inv_s = 1.0 / (sigma * jnp.sqrt(2.0))

    def one_block(args):
        rows_c, rows_i = args                     # [block,3], [block]
        dist = _pairwise_dist(rows_c, coords, lattice, pbc) * 1e-10  # [m]
        # exclude self-pairs and coincident pad sites (zero distance)
        dead = (rows_i[:, None] == col_ids[None, :]) | (dist <= 0.0)
        dist = jnp.where(dead, 1.0, dist)
        contrib = charge_f[None, :] * erfc(dist * inv_s) * k * C.Q_C / dist
        contrib = jnp.where(dead, 0.0, contrib)
        return jnp.sum(contrib, axis=1)

    blocks_c = coords_p.reshape(-1, block, 3)
    blocks_i = row_ids.reshape(-1, block)
    out = jax.lax.map(one_block, (blocks_c, blocks_i))
    return out.reshape(-1)[:N]


def poisson_gridless(
    geom: Geometry, params: PhysParams, state: SimState, block: int = 256
) -> SimState:
    """V_i = sum_{j != i, q_j != 0} v_solve(r_ij, q_j)
    (src/potential_solver.cpp:412-432).  Full O(N^2) row sweep."""
    cdtype = jnp.float32 if params.mixed else params.dtype
    charge_f = state.charge.astype(cdtype)
    v = _poisson_rows(
        geom.coords.astype(cdtype), charge_f, geom.lattice.astype(cdtype),
        params.sigma.astype(cdtype), params.k.astype(cdtype),
        geom.pbc, block,
    )
    return state.replace(potential_charge=v.astype(params.dtype))


@partial(jax.jit, static_argnames=("pbc", "block", "cap"))
def _poisson_rows_compact(
    coords, charge, lattice, sigma, k, pbc: bool, block: int, cap: int
):
    """O(N * n_charged) variant: compact the charged sites into a fixed-size
    buffer first.  Exact when the charged-site count fits in ``cap``
    (checked by the caller via the returned count)."""
    from ..ops.compact import nonzero_fixed

    N = coords.shape[0]
    charged_idx, n_charged = nonzero_fixed(charge != 0, cap, fill_value=0)
    slot_valid = jnp.arange(cap, dtype=jnp.int32) < n_charged
    c_coords = coords[charged_idx]                       # [cap, 3]
    c_charge = jnp.where(slot_valid, charge[charged_idx], 0).astype(coords.dtype)

    n_pad = (-N) % block
    coords_p = jnp.pad(coords, ((0, n_pad), (0, 0)))
    row_ids = jnp.arange(N + n_pad, dtype=jnp.int32)
    inv_s = 1.0 / (sigma * jnp.sqrt(2.0))

    def one_block(args):
        rows_c, rows_i = args
        dist = _pairwise_dist(rows_c, c_coords, lattice, pbc) * 1e-10
        dead = (rows_i[:, None] == charged_idx[None, :]) | (dist <= 0.0)
        dist = jnp.where(dead, 1.0, dist)
        contrib = c_charge[None, :] * erfc(dist * inv_s) * k * C.Q_C / dist
        contrib = jnp.where(dead, 0.0, contrib)
        return jnp.sum(contrib, axis=1)

    out = jax.lax.map(
        one_block,
        (coords_p.reshape(-1, block, 3), row_ids.reshape(-1, block)),
    )
    return out.reshape(-1)[:N], n_charged


def poisson_gridless_compact(
    geom: Geometry,
    params: PhysParams,
    state: SimState,
    cap: int,
    block: int = 512,
):
    """Charged-site-compacted Poisson.  Returns (state, n_charged); the
    driver verifies n_charged <= cap (exactness condition) and redoes the
    step with a grown cap on overflow.

    In mixed mode the pair sweep runs in f32 (validated ~1e-7 relative
    against f64, tools/precision_study.py).  ``params.poisson_kernel ==
    "pallas"`` routes the sweep through the VMEM-resident Pallas kernel
    (ops/pairwise_pallas.py); the driver test-compiles it at startup and
    falls back to "jnp" if the TPU Mosaic compiler rejects it."""
    if getattr(params, "poisson_kernel", "jnp") == "pallas":
        from ..ops.compact import nonzero_fixed
        from ..ops.pairwise_pallas import (
            on_tpu_default_device, poisson_pairwise_pallas,
        )

        cap = -(-cap // 8) * 8          # kernel sublane-axis requirement
        charged_idx, n_charged = nonzero_fixed(
            state.charge != 0, cap, fill_value=0
        )
        slot_valid = jnp.arange(cap, dtype=jnp.int32) < n_charged
        cq = jnp.where(slot_valid, state.charge[charged_idx], 0)
        v = poisson_pairwise_pallas(
            geom.coords, charged_idx, cq, params.sigma, params.k,
            geom.lattice, geom.pbc,
            interpret=not on_tpu_default_device(),
        )
        return state.replace(potential_charge=v.astype(params.dtype)), n_charged
    cdtype = jnp.float32 if params.mixed else params.dtype
    v, n_charged = _poisson_rows_compact(
        geom.coords.astype(cdtype), state.charge, geom.lattice.astype(cdtype),
        params.sigma.astype(cdtype), params.k.astype(cdtype),
        geom.pbc, block, cap,
    )
    return state.replace(potential_charge=v.astype(params.dtype)), n_charged
