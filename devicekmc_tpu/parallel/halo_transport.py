"""Distributed blocked transport + power + heat for the halo superstep.

The single-device blocked transport operator (physics/current.py:
assemble_X_blocks / update_power_blocked, mirroring the reference's
update_power_gpu_sparse, src/current_solver_gpu.cu:854-1136) splits X into
an ELL neighbour part, three dense tunnel blocks over {vacancy,
interior-metal} atoms, two virtual-node rows and an exact diagonal.  This
module shards every O(big) piece of that operator over the ``"sites"`` mesh
axis while keeping the CG *vectors* replicated:

  * **atom rows** (ELL neighbour values, the per-row dissipation sweep) are
    split into ``ndev`` even chunks of the padded atom axis — atoms inherit
    the x-sorted site order, so these are x-slabs of atoms;
  * **T_cc (metal_p x metal_p)** — the 2.45 GB object that forces sharding
    at crossbar scale — is split by metal_p-list row chunks (static: events
    never touch metal sites);
  * **T_vv / T_vm (vacancy blocks)** are split by vacancy-bucket *slot*
    chunks (the slot space is static even when its contents are dynamic);
  * the CG vectors ([N_atom+2] ~ 8 MB at 1M atoms) stay replicated: each
    matvec does the local row work, then one all_gather per row family and
    one psum for the transposed T_vm product — the 1-D row-sharded matmul
    recipe, with dots computed redundantly on replicated vectors (so the CG
    trajectory needs no psum reassociation at all).

Memory per device: O(N_atom * max_nn / ndev) ELL + O((n_mp^2 + vcap * n_mp)
/ ndev) tunnel rows + O(N_atom) replicated vectors — the blocks that cannot
replicate at 1M+ sites are the ones that shard.

Arithmetic parity: every row is assembled with the exact same helpers as the
single-device path (current.wkb_env / tunnel_block / _pdisp_rows_cols), and
replicated reductions append only exact zeros, so a halo run matches the
single-device blocked run to CG round-off (equivalence-tested in
tests/test_halo_superstep.py).

There is no reference equivalent: the reference is single-process,
single-GPU (SURVEY.md §2.12).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cg import cg_solve, cg_solve_mixed, invert_coarse
from ..ops.compact import nonzero_fixed
from ..physics.current import (
    DEFLATION_GATE_REL,
    G0,
    _dist_blocks,
    _pdisp_rows_cols,
    tunnel_block,
    wkb_env,
    wkb_single_T,
    wkb_window_T,
)
from ..state import Geometry, PhysParams
from ..structure import Element


def build_transport_static(
    geom: Geometry, params: PhysParams, elements: np.ndarray, mesh: Mesh,
    axis: str = "sites",
):
    """Host-side static tables for the distributed transport phase.

    Returns ``(tstat, tspec, sizes)``: a pytree of device_put arrays, its
    PartitionSpec tree (atom-row tables sharded, small index tables
    replicated) and the static size dict the shard body needs at trace
    time.  ``elements`` fixes the static metal flags (events never convert
    to/from metal species — the atom-set invariance, structure.py)."""
    ndev = int(np.prod(mesh.devices.shape))
    Na = int(geom.N_atom)
    ai = np.asarray(geom.atom_ind)
    Sa = -(-Na // ndev)
    Sa = -(-Sa // 8) * 8                    # clean sublane alignment
    Na_pad = ndev * Sa

    anb = np.full((Na_pad, geom.max_nn), -1, np.int32)
    anb[:Na] = np.asarray(geom.atom_neigh_idx)

    atom_ind_g = np.zeros(Na_pad, np.int32)
    atom_ind_g[:Na] = ai
    arow_ok = np.zeros(Na_pad, bool)
    arow_ok[:Na] = True
    apos = np.zeros((Na_pad, 3), dtype=np.float64)
    apos[:Na] = np.asarray(geom.coords)[ai]
    metal_a = np.zeros(Na_pad, bool)
    metal_a[:Na] = np.asarray(geom.metal_mask_table)[np.asarray(elements)[ai]]

    mp_g = np.asarray(geom.atom_metalp_idx)
    n_mp = int(mp_g.shape[0])
    Smp = max(-(-n_mp // ndev), 1)
    Smp = -(-Smp // 8) * 8
    n_mp_pad = ndev * Smp
    mp_list = np.zeros(n_mp_pad, np.int32)
    mp_list[:n_mp] = mp_g
    mp_ok = np.zeros(n_mp_pad, bool)
    mp_ok[:n_mp] = True
    mp_inv = np.full(Na_pad, -1, np.int32)
    mp_inv[mp_g] = np.arange(n_mp, dtype=np.int32)

    site_atom = np.full(geom.N, -1, np.int32)
    site_atom[ai] = np.arange(Na, dtype=np.int32)

    dt = params.dtype
    tstat = dict(
        anb=jnp.asarray(anb),
        site_atom=jnp.asarray(site_atom),
        atom_ind_g=jnp.asarray(atom_ind_g),
        arow_ok=jnp.asarray(arow_ok),
        apos=jnp.asarray(apos, dtype=dt),
        metal_a=jnp.asarray(metal_a),
        mp_list=jnp.asarray(mp_list),
        mp_ok=jnp.asarray(mp_ok),
        mp_inv=jnp.asarray(mp_inv),
    )
    tspec = {k: P() for k in tstat}
    tspec["anb"] = P(axis)
    tspec["site_atom"] = P(axis)
    tstat = {
        k: jax.device_put(v, NamedSharding(mesh, tspec[k]))
        for k, v in tstat.items()
    }
    sizes = dict(Na=Na, Sa=Sa, Na_pad=Na_pad, n_mp=n_mp, Smp=Smp,
                 n_mp_pad=n_mp_pad)
    return tstat, tspec, sizes


def _gather_atom_inputs(axis, params, ts, element, charge, CB_edge):
    """all_gather the per-site state the atom rows need and pull it onto
    the padded atom axis (replicated).  [N]-sized gathers are O(MB) even at
    1M sites — the big objects stay sharded."""
    cdtype = jnp.float32 if params.mixed else params.dtype
    elem_g = jax.lax.all_gather(element, axis, tiled=True)
    chg_g = jax.lax.all_gather(charge, axis, tiled=True)
    cb_g = jax.lax.all_gather(CB_edge, axis, tiled=True)
    ai, ok = ts["atom_ind_g"], ts["arow_ok"]
    aelem = jnp.where(ok, elem_g[ai], jnp.int32(int(Element.DEFECT)))
    acharge = jnp.where(ok, chg_g[ai], 0)
    acb = jnp.where(ok, cb_g[ai], 0.0).astype(cdtype)
    return aelem, acharge, acb


def _row_slice(v, start, size):
    idx = (jnp.asarray(start, jnp.int32),) + (jnp.int32(0),) * (v.ndim - 1)
    return jax.lax.dynamic_slice(v, idx, (size,) + v.shape[1:])


def halo_cc_rows(geom, params, ts, sizes, element, charge, CB_edge,
                 axis: str = "sites"):
    """Per-shard metal_p x metal_p tunnel-block rows (the per-bias-point
    cache; current.assemble_cc_block distributed).  Returns the local
    [Smp, n_mp_pad] row chunk."""
    d = jax.lax.axis_index(axis)
    Smp = sizes["Smp"]
    _, _, acb = _gather_atom_inputs(axis, params, ts, element, charge, CB_edge)
    apos = ts["apos"].astype(acb.dtype)
    mp_list, mp_ok = ts["mp_list"], ts["mp_ok"]
    mpos, mcb = apos[mp_list], acb[mp_list]
    env = wkb_env(geom, params)
    r0 = d * Smp
    return tunnel_block(
        env, _row_slice(mpos, r0, Smp), _row_slice(mcb, r0, Smp),
        _row_slice(mp_ok, r0, Smp), mpos, mcb, mp_ok, wkb_single_T,
    )


def assemble_halo_operator(
    sh, geom: Geometry, params: PhysParams, ts, sizes,
    element, charge, CB_edge, T_cc_loc=None,
) -> Dict:
    """Assemble the row-sharded blocked operator (the distributed twin of
    current.assemble_X_blocks).  Returns a dict with the local row chunks,
    the replicated diagonal/masks and the ``apply(x, wd)`` closure."""
    axis = sh.axis
    dtype = params.dtype
    cdtype = jnp.float32 if params.mixed else dtype
    Na, Sa = sizes["Na"], sizes["Sa"]
    Na_pad, Smp, n_mp_pad = sizes["Na_pad"], sizes["Smp"], sizes["n_mp_pad"]
    d = sh.idx
    ndev = jax.lax.psum(1, axis)

    high_G = params.high_G * 1e5
    low_G = params.low_G
    loop_G = params.high_G * 1e7

    aelem, acharge, acb = _gather_atom_inputs(
        axis, params, ts, element, charge, CB_edge
    )
    apos = ts["apos"].astype(cdtype)
    metal = ts["metal_a"]
    ok = ts["arow_ok"]
    anyvac = ok & (aelem == int(Element.VACANCY))
    cvac = anyvac & (acharge == 0)

    # --- ELL neighbour values for my atom rows (exact dtype: they set the
    # --- diagonal, same as the single-device path) ---
    anb_l = ts["anb"]                      # local [Sa, max_nn]
    valid = anb_l >= 0
    safe = jnp.where(valid, anb_l, 0)
    r0a = d * Sa
    metal_my = _row_slice(metal, r0a, Sa)
    cvac_my = _row_slice(cvac, r0a, Sa)
    hi = (metal_my[:, None] & metal[safe]) | (cvac_my[:, None] & cvac[safe])
    nb_vals = jnp.where(
        valid, jnp.where(hi, -high_G, -low_G).astype(dtype), 0.0
    )

    # --- tunnel blocks (row chunks; same assembly helpers as single-dev) ---
    env = wkb_env(geom, params)
    vcap = params.tunnel_vac_cap
    if vcap <= 0:
        raise ValueError("halo transport requires tunnel_vac_cap > 0")
    Svc = -(-vcap // ndev)
    vcap_pad = ndev * Svc
    vidx, n_vac = nonzero_fixed(anyvac, vcap, fill_value=0)
    v_ok = jnp.arange(vcap, dtype=jnp.int32) < jnp.minimum(n_vac, vcap)
    vidx_p = jnp.pad(vidx, (0, vcap_pad - vcap))
    vok_p = jnp.pad(v_ok, (0, vcap_pad - vcap))

    mp_list, mp_ok, mp_inv = ts["mp_list"], ts["mp_ok"], ts["mp_inv"]
    mpos, mcb = apos[mp_list], acb[mp_list]
    vpos, vcb = apos[vidx_p], acb[vidx_p]

    r0m, r0v = d * Smp, d * Svc
    mpos_my = _row_slice(mpos, r0m, Smp)
    mcb_my = _row_slice(mcb, r0m, Smp)
    mok_my = _row_slice(mp_ok, r0m, Smp)
    vpos_my = _row_slice(vpos, r0v, Svc)
    vcb_my = _row_slice(vcb, r0v, Svc)
    vok_my = _row_slice(vok_p, r0v, Svc)

    if T_cc_loc is None:
        T_cc_loc = tunnel_block(
            env, mpos_my, mcb_my, mok_my, mpos, mcb, mp_ok, wkb_single_T
        )
    else:
        T_cc_loc = T_cc_loc.astype(cdtype)
    T_vv_loc = tunnel_block(
        env, vpos_my, vcb_my, vok_my, vpos, vcb, vok_p, wkb_single_T
    )
    T_vm_loc = tunnel_block(
        env, vpos_my, vcb_my, vok_my, mpos, mcb, mp_ok, wkb_window_T
    )

    # static-trip-count exactness check (my slot rows, pmax over shards)
    dist_vm = _dist_blocks(vpos_my, mpos, env["lattice"], env["pbc"])
    abs_vm = jnp.abs(vcb_my[:, None] - mcb[None, :])
    elig_vm = (
        vok_my[:, None] & mp_ok[None, :]
        & (abs_vm > env["ctol"]) & ~(dist_vm < env["nn"])
    )
    int_needed = jnp.ceil(
        jnp.max(jnp.where(elig_vm, abs_vm, 0.0)) / env["dE_step"]
    ).astype(jnp.int32)
    int_needed = jax.lax.pmax(int_needed, axis)

    # --- virtual-node rows + exact diagonal (replicated) ---
    nsi, nge = params.num_source_inj, params.num_ground_ext
    aidx = jnp.arange(Na_pad, dtype=jnp.int32)
    src_vals = jnp.where(aidx < nsi, -high_G, 0.0).astype(dtype)
    # strict ">" keeps the reference's off-by-one (src/current_solver.cpp:187)
    gnd_vals = jnp.where(
        (aidx > (Na - nge)) & (aidx < Na), -high_G, 0.0
    ).astype(dtype)

    nb_row = jax.lax.all_gather(
        jnp.sum(nb_vals, axis=1), axis, tiled=True
    )                                                    # [Na_pad]
    row_atoms = nb_row + gnd_vals + src_vals
    cc_row = jax.lax.all_gather(
        jnp.sum(T_cc_loc, axis=1).astype(dtype), axis, tiled=True
    )                                                    # [n_mp_pad]
    mv_row = jax.lax.psum(jnp.sum(T_vm_loc, axis=0), axis).astype(dtype)
    vv_row = jax.lax.all_gather(
        jnp.sum(T_vv_loc, axis=1).astype(dtype), axis, tiled=True
    )
    vm_row = jax.lax.all_gather(
        jnp.sum(T_vm_loc, axis=1).astype(dtype), axis, tiled=True
    )
    row_atoms = row_atoms.at[mp_list].add(
        jnp.where(mp_ok, cc_row + mv_row, 0.0)
    )
    row_atoms = row_atoms.at[vidx_p].add(
        jnp.where(vok_p, vv_row + vm_row, 0.0)
    )
    row0 = jnp.sum(gnd_vals) - loop_G
    row1 = jnp.sum(src_vals) - loop_G
    diag = -jnp.concatenate([jnp.stack([row0, row1]), row_atoms])

    # solve over the [Nf_pad] replicated vector with the grounded atom +
    # pads masked to zero (extra exact-zero entries leave every dot product
    # bit-identical to the single-device [Nsub] formulation)
    mask = jnp.concatenate([
        jnp.ones(Na + 1, bool), jnp.zeros(Na_pad - Na + 1, bool)
    ])

    def apply_full(x, wd):
        x = jnp.where(mask, x, 0.0).astype(wd)
        x0, x1, xa = x[0], x[1], x[2:]
        ya_loc = jnp.sum(nb_vals.astype(wd) * xa[safe], axis=1)
        ya = jax.lax.all_gather(ya_loc, axis, tiled=True)

        xm = xa[mp_list].astype(cdtype)          # pad cols are exact zeros
        xv = jnp.where(vok_p, xa[vidx_p], 0.0).astype(cdtype)
        xv_my = _row_slice(xv, r0v, Svc)
        y_cc = jax.lax.all_gather(T_cc_loc @ xm, axis, tiled=True)
        y_mv = jax.lax.psum(xv_my @ T_vm_loc, axis)
        y_v = jax.lax.all_gather(
            T_vv_loc @ xv + T_vm_loc @ xm, axis, tiled=True
        )

        y_mp_pad = jnp.concatenate(
            [(y_cc + y_mv).astype(wd), jnp.zeros(1, dtype=wd)]
        )
        ya = ya + y_mp_pad[jnp.where(mp_inv >= 0, mp_inv, n_mp_pad)]
        ya = ya.at[vidx_p].add(jnp.where(vok_p, y_v.astype(wd), 0.0))

        src = src_vals.astype(wd)
        gnd = gnd_vals.astype(wd)
        lg = loop_G.astype(wd)
        ya = ya + gnd * x0 + src * x1
        y0 = jnp.dot(gnd, xa) - lg * x1
        y1 = jnp.dot(src, xa) - lg * x0
        y = (
            jnp.concatenate([jnp.stack([y0, y1]), ya])
            + diag.astype(wd) * x
        )
        return jnp.where(mask, y, 0.0)

    def apply_full_mat(X, wd):
        """Y = A @ X for K replicated columns (the deflation-basis build;
        the distributed twin of current._apply_X_blocks_mat).  Tunnel
        blocks are read once for all columns; the ELL part runs as max_nn
        row-gathers of [Sa, K] panels."""
        K = X.shape[1]
        X = jnp.where(mask[:, None], X, 0.0).astype(wd)
        x0, x1, Xa = X[0], X[1], X[2:]

        # scan (not a Python loop) over the max_nn slots: bounds live
        # memory to one [Sa, K] gather at a time — the unrolled form keeps
        # all ~52 gathered panels live per virtual device on the CPU mesh
        def slot_acc(acc, sc):
            nb_s, safe_s = sc
            return acc + nb_s[:, None].astype(wd) * Xa[safe_s], None

        Ya_loc, _ = jax.lax.scan(
            slot_acc, jnp.zeros((Sa, K), dtype=wd),
            (nb_vals.T, safe.T),
        )
        Ya = jax.lax.all_gather(Ya_loc, axis, tiled=True)

        Xm = Xa[mp_list].astype(cdtype)
        Xv = jnp.where(vok_p[:, None], Xa[vidx_p], 0.0).astype(cdtype)
        Xv_my = _row_slice(Xv, r0v, Svc)
        Y_cc = jax.lax.all_gather(T_cc_loc @ Xm, axis, tiled=True)
        Y_mv = jax.lax.psum((Xv_my.T @ T_vm_loc).T, axis)
        Y_v = jax.lax.all_gather(
            T_vv_loc @ Xv + T_vm_loc @ Xm, axis, tiled=True
        )
        Y_mp_pad = jnp.concatenate(
            [(Y_cc + Y_mv).astype(wd), jnp.zeros((1, K), dtype=wd)]
        )
        Ya = Ya + Y_mp_pad[jnp.where(mp_inv >= 0, mp_inv, n_mp_pad)]
        Ya = Ya.at[vidx_p].add(
            jnp.where(vok_p[:, None], Y_v.astype(wd), 0.0)
        )
        src = src_vals.astype(wd)
        gnd = gnd_vals.astype(wd)
        lg = loop_G.astype(wd)
        Ya = Ya + gnd[:, None] * x0[None, :] + src[:, None] * x1[None, :]
        y0 = gnd @ Xa - lg * x1
        y1 = src @ Xa - lg * x0
        Y = (
            jnp.concatenate([jnp.stack([y0, y1]), Ya])
            + diag.astype(wd)[:, None] * X
        )
        return jnp.where(mask[:, None], Y, 0.0)

    return dict(
        apply=apply_full, apply_mat=apply_full_mat, diag=diag, mask=mask,
        nb_vals=nb_vals, safe=safe,
        T_cc_loc=T_cc_loc, T_vv_loc=T_vv_loc, T_vm_loc=T_vm_loc,
        mp_list=mp_list, mp_ok=mp_ok, mp_inv=mp_inv,
        vidx_p=vidx_p, vok_p=vok_p,
        src_vals=src_vals, gnd_vals=gnd_vals, loop_G=loop_G,
        int_needed=int_needed, anyvac=anyvac, metal=metal, aidx=aidx,
        r0a=r0a, r0m=r0m, r0v=r0v, Svc=Svc,
    )


def _halo_deflation_ops(geom: Geometry, params: PhysParams, ts, sizes,
                        op, d_diag):
    """Distributed A-DEF2 deflation operators in the Jacobi-scaled metric
    (the sharded twin of current._deflation_ops — see its docstring for
    the metric/accuracy reasoning).  All products are over replicated
    [Nf_pad(,K)] objects: every shard computes the identical coarse
    quantities redundantly, so no psum reassociation enters the CG
    trajectory."""
    dtype = params.dtype
    K = params.coarse_slabs
    Na, Na_pad = sizes["Na"], sizes["Na_pad"]
    ax = ts["apos"][:, 0].astype(dtype)               # [Na_pad] replicated
    # x-slab aggregation over the atoms of the grounded subsystem; the
    # grounded atom, pads and the two virtual nodes get NO aggregate
    # (zero one-hot rows) — current._coarse_restriction semantics
    sel = ts["arow_ok"] & (
        jnp.arange(Na_pad, dtype=jnp.int32) < jnp.int32(Na - 1)
    )
    xmin = jnp.min(jnp.where(sel, ax, jnp.inf))
    xmax = jnp.max(jnp.where(sel, ax, -jnp.inf))
    slab = jnp.clip(
        ((ax - xmin) / jnp.maximum(xmax - xmin, 1e-30) * K).astype(jnp.int32),
        0, K - 1,
    )
    agg = jnp.where(sel, slab, K)
    Z_atoms = jax.nn.one_hot(agg, K, dtype=dtype)     # [Na_pad, K]
    Zm = jnp.concatenate([jnp.zeros((2, K), dtype=dtype), Z_atoms], axis=0)

    AZ = op["apply_mat"](Zm, dtype)                   # f64 (E accuracy)
    E = Zm.T @ AZ
    E_inv = invert_coarse(E, dtype)

    def esolve(a):
        # one refinement round on the K x K solve (kappa(E) ~ 1e10)
        c = E_inv @ a
        return c + E_inv @ (a - E @ c)

    ds = jnp.sqrt(jnp.where(d_diag > 0, d_diag, 1.0))
    Zhat = ds[:, None] * Zm
    W = AZ / ds[:, None]
    return Zhat, W, esolve


def halo_transport_power(
    sh, geom: Geometry, params: PhysParams, ts, sizes,
    element, charge, CB_edge, vp_prev, Vd, T_cc_loc=None,
    cg_maxiter: int = 20000,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
    """Distributed update_power (physics/current.update_power_blocked).

    Runs inside the shard_map superstep body.  Returns
    ``(vp_new [Na+2], I_macro, atom_power [Na_pad] replicated, P_tot,
    metrics)`` — the caller scatters atom_power onto its local site slab.
    ``T_cc_loc``: optional per-bias-point local metal-block row chunk
    (halo_cc_rows)."""
    axis = sh.axis
    dtype = params.dtype
    Na, Sa = sizes["Na"], sizes["Sa"]
    Na_pad, Smp, n_mp_pad = sizes["Na_pad"], sizes["Smp"], sizes["n_mp_pad"]
    nsi = params.num_source_inj

    op = assemble_halo_operator(
        sh, geom, params, ts, sizes, element, charge, CB_edge,
        T_cc_loc=T_cc_loc,
    )
    apply_full, diag, mask = op["apply"], op["diag"], op["mask"]
    nb_vals, safe = op["nb_vals"], op["safe"]
    T_cc_loc, T_vv_loc, T_vm_loc = (
        op["T_cc_loc"], op["T_vv_loc"], op["T_vm_loc"]
    )
    mp_list, mp_inv = op["mp_list"], op["mp_inv"]
    vidx_p, vok_p = op["vidx_p"], op["vok_p"]
    src_vals, gnd_vals, loop_G = (
        op["src_vals"], op["gnd_vals"], op["loop_G"]
    )
    int_needed, anyvac, metal, aidx = (
        op["int_needed"], op["anyvac"], op["metal"], op["aidx"]
    )
    r0a, r0m, r0v, Svc = op["r0a"], op["r0m"], op["r0v"], op["Svc"]

    rhs = jnp.zeros(Na_pad + 2, dtype=dtype)
    rhs = rhs.at[0].set(-loop_G * Vd)
    rhs = rhs.at[1].set(loop_G * Vd)
    d_diag = jnp.where(mask, diag, 1.0)
    x_init = jnp.where(
        mask, jnp.pad(vp_prev, (0, Na_pad - Na)), 0.0
    )
    cg_tol = params.transport_tol

    deflate = params.transport_precond == "deflated"
    if deflate:
        Zhat, W, esolve = _halo_deflation_ops(
            geom, params, ts, sizes, op, d_diag
        )
    if params.mixed:
        dsi = 1.0 / jnp.sqrt(jnp.where(d_diag > 0, d_diag, 1.0))
        dsi32 = dsi.astype(jnp.float32)
        inner_precond = inner_start = None
        if deflate:
            Zh32 = Zhat.astype(jnp.float32)
            W32 = W.astype(jnp.float32)

            def _coarse_f32(coeff):
                # coarse solve stays f64 (kappa(E) ~ 1e10); cast at the
                # boundary only — current.update_power_blocked semantics
                return esolve(coeff.astype(dtype)).astype(jnp.float32)

            def inner_precond(r, gate):
                g = jnp.where(gate, 1.0, 0.0).astype(jnp.float32)
                return r + g * (Zh32 @ _coarse_f32(Zh32.T @ r - W32.T @ r))

            def inner_start(b, gate):
                g = jnp.where(gate, 1.0, 0.0).astype(jnp.float32)
                return g * (Zh32 @ _coarse_f32(Zh32.T @ b))

        res = cg_solve_mixed(
            lambda y: dsi * apply_full(dsi * y, dtype),
            lambda y: (dsi32 * apply_full(dsi32 * y, jnp.float32)).astype(
                jnp.float32
            ),
            rhs * dsi, x0=x_init / dsi,
            tol=cg_tol, inner_tol=1e-5, inner_maxiter=400,
            maxiter=cg_maxiter,
            inner_precond=inner_precond, inner_start=inner_start,
            inner_gate_rel=DEFLATION_GATE_REL if deflate else None,
        )
        v = res.x * dsi
    elif deflate:
        # f64 deflated solve on the scaled system (criterion="r" there IS
        # the Jacobi-preconditioned criterion on the unscaled one)
        ds = jnp.sqrt(jnp.where(d_diag > 0, d_diag, 1.0))
        dsi = 1.0 / ds
        b_s = rhs * dsi
        y0 = x_init * ds
        y0 = (
            y0
            - Zhat @ esolve(W.T @ y0)
            + Zhat @ esolve(Zhat.T @ b_s)
        )
        res = cg_solve(
            lambda y: dsi * apply_full(dsi * y, dtype), b_s,
            x0=y0,
            precond=lambda r: r + Zhat @ esolve(Zhat.T @ r - W.T @ r),
            tol=cg_tol, maxiter=cg_maxiter, criterion="r",
        )
        v = res.x * dsi
    else:
        res = cg_solve(
            lambda x: apply_full(x, dtype), rhs, x0=x_init,
            diag=d_diag, tol=cg_tol, maxiter=cg_maxiter, criterion="pre",
        )
        v = res.x

    contact_drop = jnp.abs(v[nsi] - Vd)
    M = jnp.where(mask, v * G0, 0.0)
    Matoms = M[2:]
    I_macro = jnp.sum(gnd_vals * (M[0] - Matoms))

    solve_heat = params.solve_heating_global or params.solve_heating_local
    if solve_heat:
        min_V = jnp.min(jnp.where(aidx < Na, Matoms, jnp.inf))
        Ms = Matoms + jnp.abs(min_V)

        Ms_my = _row_slice(Ms, r0a, Sa)
        dM_nb = Ms_my[:, None] - Ms[safe]
        I_cal = nb_vals * dM_nb
        fwd = ((I_cal < 0) & (Vd > 0)) | ((I_cal > 0) & (Vd < 0))
        P_nb_loc = jnp.sum(jnp.where(fwd, -I_cal, 0.0) * (-dM_nb), axis=1)
        P_disp = jax.lax.all_gather(P_nb_loc, axis, tiled=True)

        ms_m = Ms[mp_list]
        ms_v = jnp.where(vok_p, Ms[vidx_p], 0.0)
        cc_r, _ = _pdisp_rows_cols(T_cc_loc, _row_slice(ms_m, r0m, Smp),
                                   ms_m, Vd)
        vv_r, _ = _pdisp_rows_cols(T_vv_loc, _row_slice(ms_v, r0v, Svc),
                                   ms_v, Vd)
        vm_r, vm_c_part = _pdisp_rows_cols(
            T_vm_loc, _row_slice(ms_v, r0v, Svc), ms_m, Vd
        )
        cc_r = jax.lax.all_gather(cc_r, axis, tiled=True)
        vv_r = jax.lax.all_gather(vv_r, axis, tiled=True)
        vm_r = jax.lax.all_gather(vm_r, axis, tiled=True)
        vm_c = jax.lax.psum(vm_c_part, axis)
        pm_pad = jnp.concatenate(
            [cc_r + vm_c, jnp.zeros(1, dtype=P_disp.dtype)]
        )
        P_disp = P_disp + pm_pad[jnp.where(mp_inv >= 0, mp_inv, n_mp_pad)]
        P_disp = P_disp.at[vidx_p].add(jnp.where(vok_p, vv_r + vm_r, 0.0))

        in_range = (aidx >= nsi) & (aidx < Na - nsi)
        alpha = jnp.where(metal, 0.0, 1.0)
        atom_power = jnp.where(in_range, -alpha * P_disp, 0.0).astype(dtype)
        P_tot = jnp.sum(atom_power)
    else:
        atom_power = jnp.zeros(Na_pad, dtype=dtype)
        P_tot = jnp.zeros((), dtype=dtype)

    vp_new = jnp.where(mask, v, 0.0)[: Na + 2]
    n_vac_atoms = jnp.sum(anyvac, dtype=jnp.int32)
    metrics = {
        "n_vac_atoms": n_vac_atoms,
        "Current [uA]": I_macro * 1e6,
        "Conductance [uS]": jnp.abs(
            I_macro / jnp.where(Vd != 0, Vd, 1.0)
        ) * 1e6,
        "cg_iters_power": res.iters,
        "transport_converged": res.converged,
        "contact_potential_drop": contact_drop,
        "tunnel_int_steps_needed": int_needed,
    }
    if solve_heat:
        metrics["Total dissipated power [mW]"] = P_tot * 1e3
    return vp_new, I_macro.astype(dtype), atom_power, P_tot, metrics


# ----------------------------------------------------------------------------
# distributed heat
# ----------------------------------------------------------------------------

def _dist_cg_plain(sh, matvec, b, x0, tol, maxiter):
    """Distributed plain-residual CG (M = I), matching ops.cg.cg_solve's
    defaults — used by the local-heat substep solves."""
    ref = jnp.sqrt(sh.pdot(b, b))
    thresh2 = (tol * jnp.where(ref > 0, ref, 1.0)) ** 2
    r0 = b - matvec(x0)
    rz0 = sh.pdot(r0, r0)

    def cond(c):
        _, r, _, rz, it = c
        return (rz > thresh2) & (it < maxiter)

    def body(c):
        x, r, p, rz, it = c
        ap = matvec(p)
        denom = sh.pdot(p, ap)
        alpha = jnp.where(denom != 0, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rz_new = sh.pdot(r, r)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        p = r + beta * p
        return (x, r, p, rz_new, it + 1)

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rz0, jnp.asarray(0, jnp.int32))
    )
    return x


def halo_heat_local_cg(
    sh, geom: Geometry, params: PhysParams, heat,
    element, power, temperature, step_time,
    tol: float = 1e-10, maxiter: int = 1000,
):
    """Distributed matrix-free local temperature
    (physics/heat.update_temperature_local_cg with halo neighbour reads and
    psum dots; the reference instead precomputes a dense N_interface^2
    inverse, src/heat_solver.cpp:151-191, which cannot shard)."""
    from .. import constants as C
    from ..physics.heat import _p_transfer

    axis = sh.axis
    dtype = params.dtype
    T0 = params.background_temp
    scale = C.T_1 - T0
    mask = heat.interface_mask                       # local [S]
    p_t = jnp.where(mask, _p_transfer(params, element), 0.0).astype(dtype)
    P_full = jnp.where(mask, power, 0.0)
    s = heat.step_scale

    nb_int = (sh.gather(mask.astype(dtype)) > 0.5) & sh.valid
    n_int_nb = jnp.sum(nb_int, axis=1).astype(dtype)
    lap_diag = heat.diag_base - n_int_nb

    def lap(x):
        xm = jnp.where(mask, x, 0.0)
        off = jnp.sum(jnp.where(nb_int, sh.gather(xm), 0.0), axis=1)
        return jnp.where(mask, lap_diag * x + off, 0.0)

    def transient(temp):
        n_sub = jnp.floor(step_time / params.delta_t).astype(jnp.int32) + 1

        def matvec(x):
            return jnp.where(mask, x - s * lap(x), 0.0)

        def body(carry):
            temp, k = carry
            t_vec = jnp.where(mask, (temp - T0) / scale, 0.0)
            rhs = jnp.where(mask, t_vec + P_full * p_t * s, 0.0)
            x = _dist_cg_plain(sh, matvec, rhs, t_vec, tol, maxiter)
            temp = jnp.where(mask, x * scale + T0, temp)
            return temp, k + 1

        temp, _ = jax.lax.while_loop(
            lambda c: c[1] < n_sub, body, (temp, jnp.asarray(0, jnp.int32))
        )
        return temp

    def steady(temp):
        def matvec(x):
            return jnp.where(mask, -lap(x), 0.0)

        rhs = jnp.where(mask, -P_full * p_t, 0.0)
        x = _dist_cg_plain(sh, matvec, rhs, jnp.zeros_like(rhs), tol, maxiter)
        return jnp.where(mask, -x * scale + T0, temp)

    temp = jax.lax.cond(
        step_time > 1e3 * params.delta_t, steady, transient, temperature
    )
    inner = geom.inner_mask
    T_bg = (
        jax.lax.psum(jnp.sum(jnp.where(inner, temp, 0.0)), axis)
        / jax.lax.psum(jnp.sum(inner), axis)
    )
    return temp.astype(dtype), T_bg.astype(dtype), {
        "Global temperature [K]": T_bg
    }
