"""Heat solvers: lumped global temperature and site-resolved local heat.

Global model (reference: Device::updateTemperatureGlobal,
src/heat_solver.cpp:316-350): analytic solution of the capacitative heat ODE
over the event time.  NOTE the reference evaluates the source coefficient
with the *current* background temperature rather than the ambient one
(heat_solver.cpp:332) — reproduced faithfully; pass ``ambient_coupling=True``
for the physically-cooling variant.

Local model (reference: Device::updateLocalTemperature{,SteadyState},
src/heat_solver.cpp:354-513): dense mat-vec with a precomputed inverse of
the interface graph Laplacian.  The transient propagator (I - dt*tau*L)^-1
and the steady-state L^-1 are computed once at init on the host in f64
(reference: constructLaplacian, src/heat_solver.cpp:40-246) and applied as
MXU matmuls per sub-step on TPU.

Quirk reproduced: the reference's ``p_transfer_vacancies`` is built from
``k_th_interface`` and ``p_transfer_non_vacancies`` from ``k_th_vacancies``
(names swapped w.r.t. constants, heat_solver.cpp:371-372).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from .. import constants as C
from ..state import Geometry, PhysParams, SimState
from ..structure import Element


@struct.dataclass
class HeatModel:
    """Precomputed local-heat operators (empty if local heating is off).

    Two application methods:
      * ``dense``  — the reference's approach: dense inverses, MXU matvec
        per substep (O(Ni^2) memory — fine to ~10k interface sites);
      * ``cg``     — matrix-free: the Laplacian is applied on the ELL graph
        and each substep solves (I - dt*tau*L) T' = rhs with CG (the
        operator is a small perturbation of the identity, so a handful of
        iterations) — scales to arbitrary N.
    """

    L_inv: Any           # [Ni, Ni] transient propagator (I - dt*tau*L)^-1 (dense)
    L_ss_inv: Any        # [Ni, Ni] steady-state L^-1 (dense)
    interface_idx: Any   # [Ni] site indices of interface sites
    interface_mask: Any  # [N] bool (cg)
    diag_base: Any       # [N] float: -gamma where metal-adjacent, 0 else (cg)
    step_scale: Any      # scalar: dt * tau (cg)
    n_interface: int = struct.field(pytree_node=False, default=0)
    n_left: int = struct.field(pytree_node=False, default=0)
    n_right: int = struct.field(pytree_node=False, default=0)
    method: str = struct.field(pytree_node=False, default="dense")


def _num_in_contact_left(elements: np.ndarray, m: int) -> int:
    """Span from the start containing m non-DEFECT sites
    (src/heat_solver.cpp:5-20)."""
    count = seen = 0
    while seen < m:
        if elements[count] != int(Element.DEFECT):
            seen += 1
        count += 1
    return count


def _num_in_contact_right(elements: np.ndarray, m: int) -> int:
    """Span from the end containing m non-DEFECT sites
    (src/heat_solver.cpp:21-34)."""
    n = len(elements)
    count = n
    seen = 0
    while seen < m:
        count -= 1
        if elements[count] != int(Element.DEFECT):
            seen += 1
    return n - count


def build_heat_model(
    geom: Geometry,
    params: PhysParams,
    cfg,
    elements: np.ndarray,
    neigh_idx: np.ndarray,
    method: str = "dense",
    contact_spans=None,
) -> HeatModel:
    """Host-side precompute of the interface Laplacian inverses
    (reference: constructLaplacian, src/heat_solver.cpp:40-246); with
    ``method="cg"`` only the graph metadata is prepared (no dense work).

    ``contact_spans``: optional (n_left, n_right) site-span override.  The
    reference's span rule counts ``n_metals - num_atoms_contact`` metals
    from the right (src/heat_solver.cpp:21-34) — correct for its single
    devices, where every metal belongs to a contact, but wrong for
    crossbars with interior metal (word/bit lines), where it swallows the
    whole device into the "right contact".  Crossbar-scale callers pass
    symmetric spans instead."""
    n = len(elements)
    if contact_spans is not None:
        n_left, n_right = contact_spans
    else:
        n_metals = int(
            np.asarray(geom.metal_mask_table)[elements].sum()
        )
        n_left = _num_in_contact_left(elements, cfg.num_atoms_contact)
        n_right = _num_in_contact_right(
            elements, n_metals - cfg.num_atoms_contact
        )
    ni = n - n_left - n_right

    index_map = np.full(n, -1, dtype=np.int64)
    interface_idx = np.arange(n_left, n - n_right)
    index_map[interface_idx] = np.arange(ni)

    gamma = 1.0 / (cfg.delta * ((cfg.k_th_interface / cfg.k_th_metal) + 1.0))
    step_time = cfg.delta_t * cfg.tau
    metal_table = np.asarray(geom.metal_mask_table)
    dtype = params.dtype

    if method == "cg":
        interface_mask = np.zeros(n, dtype=bool)
        interface_mask[interface_idx] = True
        # vectorised metal-adjacency (a Python neighbour loop takes minutes
        # at crossbar scale): site i is bath-coupled iff any neighbour is
        # a metal element
        nb_ok = neigh_idx >= 0
        metal_nb = (
            metal_table[elements[np.where(nb_ok, neigh_idx, 0)]] & nb_ok
        ).any(axis=1)
        metal_adj = metal_nb & interface_mask
        diag_base = np.where(metal_adj, -gamma, 0.0)
        z = jnp.zeros((0, 0), dtype=dtype)
        return HeatModel(
            L_inv=z, L_ss_inv=z,
            interface_idx=jnp.asarray(interface_idx, dtype=jnp.int32),
            interface_mask=jnp.asarray(interface_mask),
            diag_base=jnp.asarray(diag_base, dtype=dtype),
            step_scale=jnp.asarray(step_time, dtype=dtype),
            n_interface=int(ni), n_left=int(n_left), n_right=int(n_right),
            method="cg",
        )

    L = np.zeros((ni, ni), dtype=np.float64)
    for i in interface_idx:
        ii = index_map[i]
        for j in neigh_idx[i]:
            if j < 0:
                continue
            jj = index_map[j]
            if jj >= 0 and j != i:
                L[ii, jj] = 1.0
            if metal_table[elements[j]]:
                # boundary site: coupled to the metal bath
                L[ii, ii] = -gamma
    # diagonal: L_ii += -sum_{j != i} L_ij  (on top of any -gamma)
    off_sums = L.sum(axis=1) - np.diagonal(L)
    L[np.arange(ni), np.arange(ni)] += -off_sums

    L_inv = np.linalg.inv(np.eye(ni) - step_time * L)
    L_ss_inv = np.linalg.inv(L)

    nz = len(elements)
    return HeatModel(
        L_inv=jnp.asarray(L_inv, dtype=dtype),
        L_ss_inv=jnp.asarray(L_ss_inv, dtype=dtype),
        interface_idx=jnp.asarray(interface_idx, dtype=jnp.int32),
        interface_mask=jnp.zeros(nz, dtype=bool),
        diag_base=jnp.zeros(nz, dtype=dtype),
        step_scale=jnp.asarray(step_time, dtype=dtype),
        n_interface=int(ni),
        n_left=int(n_left),
        n_right=int(n_right),
        method="dense",
    )


def empty_heat_model(params: PhysParams) -> HeatModel:
    z = jnp.zeros((0, 0), dtype=params.dtype)
    z1 = jnp.zeros((0,), dtype=params.dtype)
    return HeatModel(
        L_inv=z, L_ss_inv=z,
        interface_idx=jnp.zeros((0,), dtype=jnp.int32),
        interface_mask=jnp.zeros((0,), dtype=bool),
        diag_base=z1,
        step_scale=jnp.asarray(0.0, dtype=params.dtype),
        n_interface=0, n_left=0, n_right=0,
    )


# ----------------------------------------------------------------------------
# global (lumped) model
# ----------------------------------------------------------------------------

def global_ode(
    params: PhysParams, T_bg, P_tot, step_time, ambient_coupling: bool = False
):
    """Analytic solution of the capacitative heat ODE over the event time
    (src/heat_solver.cpp:316-350) — shared by the single-device and
    halo-distributed heat phases."""
    C_th = params.A * params.t_ox * params.c_p * 1e6          # [J/K]
    a = params.dissipation_constant / C_th
    T_couple = params.background_temp if ambient_coupling else T_bg
    c = a * T_couple + P_tot / C_th
    return c / a + (T_bg - c / a) * jnp.exp(-a * step_time)


def update_temperature_global(
    params: PhysParams, state: SimState, step_time, ambient_coupling: bool = False
) -> Tuple[SimState, Dict]:
    """Global (lumped) temperature update (src/heat_solver.cpp:316-350)."""
    P_tot = jnp.sum(state.power)
    T_new = global_ode(params, state.T_bg, P_tot, step_time, ambient_coupling)
    new_state = state.replace(T_bg=T_new.astype(params.dtype), P_tot=P_tot)
    return new_state, {
        "Global temperature [K]": T_new,
        "Total dissipated power [mW]": P_tot * 1e3,
    }


# ----------------------------------------------------------------------------
# local (site-resolved) model
# ----------------------------------------------------------------------------

def _p_transfer(params: PhysParams, elem_interface):
    """Per-interface-site power-transfer coefficient (names follow the
    reference's swapped convention, src/heat_solver.cpp:371-372)."""
    denom_scale = (params.nn_dist * 1e-10) * (C.T_1 - params.background_temp)
    p_vac = 1.0 / (params.k_th_interface * denom_scale)
    p_non = 1.0 / (params.k_th_vacancies * denom_scale)
    return jnp.where(elem_interface == int(Element.VACANCY), p_vac, p_non)


def update_temperature_local(
    geom: Geometry,
    params: PhysParams,
    heat: HeatModel,
    state: SimState,
    step_time,
) -> Tuple[SimState, Dict]:
    """Transient or steady-state local temperature update
    (src/heat_solver.cpp:286-307 dispatch)."""
    dtype = params.dtype
    T0 = params.background_temp
    scale = C.T_1 - T0
    iidx = heat.interface_idx

    elem_i = state.element[iidx]
    P_i = state.power[iidx]
    p_t = _p_transfer(params, elem_i)

    def transient(temp):
        sub_dt = params.delta_t * params.tau
        n_sub = jnp.floor(step_time / params.delta_t).astype(jnp.int32) + 1

        def body(carry):
            temp, k = carry
            t_vec = (temp[iidx] - T0) / scale
            rhs = t_vec + P_i * p_t * sub_dt
            t_new = heat.L_inv @ rhs
            temp = temp.at[iidx].set(t_new * scale + T0)
            return temp, k + 1

        temp, _ = jax.lax.while_loop(
            lambda c: c[1] < n_sub, body, (temp, jnp.asarray(0, jnp.int32))
        )
        return temp

    def steady(temp):
        t_tr = heat.L_ss_inv @ (P_i * p_t)
        return temp.at[iidx].set(-t_tr * scale + T0)

    temp = jax.lax.cond(
        step_time > 1e3 * params.delta_t, steady, transient, state.temperature
    )

    inner = geom.inner_mask
    T_bg = jnp.sum(jnp.where(inner, temp, 0.0)) / jnp.sum(inner)
    new_state = state.replace(
        temperature=temp.astype(dtype), T_bg=T_bg.astype(dtype)
    )
    return new_state, {"Global temperature [K]": T_bg}


def _laplacian_apply(geom: Geometry, heat: HeatModel, x):
    """Matrix-free L @ x on interface sites (adjacency 1 + gamma boundary +
    negative-degree diagonal), full-length vectors."""
    mask = heat.interface_mask
    safe = jnp.maximum(geom.neigh_idx, 0)
    nb_int = mask[safe] & geom.neigh_valid
    xm = jnp.where(mask, x, 0.0)
    off = jnp.sum(jnp.where(nb_int, xm[safe], 0.0), axis=1)
    n_int_nb = jnp.sum(nb_int, axis=1).astype(x.dtype)
    diag = heat.diag_base - n_int_nb
    return jnp.where(mask, diag * x + off, 0.0)


def _local_cg_setup(geom, params, heat, state, tol, maxiter):
    """Shared pieces of the matrix-free local model."""
    T0 = params.background_temp
    scale = C.T_1 - T0
    mask = heat.interface_mask
    p_t_full = jnp.where(
        mask, _p_transfer(params, state.element), 0.0
    ).astype(params.dtype)
    P_full = jnp.where(mask, state.power, 0.0)
    return T0, scale, mask, p_t_full, P_full


def local_cg_transient_window(
    geom: Geometry,
    params: PhysParams,
    heat: HeatModel,
    state: SimState,
    temp,
    n_sub,
    tol: float = 1e-10,
    maxiter: int = 1000,
):
    """Run ``n_sub`` (traced int) transient substeps of the matrix-free
    local model on the temperature field ``temp`` and return it.  Used by
    phase-per-dispatch drivers to bound a single dispatch's substep count
    (the in-superstep transient can need ~1000 substeps when the KMC step
    time approaches 1e3*delta_t — unbounded, that single dispatch exceeds
    the relay watchdog at crossbar scale)."""
    from ..ops.cg import cg_solve

    T0, scale, mask, p_t_full, P_full = _local_cg_setup(
        geom, params, heat, state, tol, maxiter
    )
    s = heat.step_scale

    def matvec(x):
        return jnp.where(mask, x - s * _laplacian_apply(geom, heat, x), 0.0)

    def body(carry):
        temp, k = carry
        t_vec = jnp.where(mask, (temp - T0) / scale, 0.0)
        rhs = jnp.where(mask, t_vec + P_full * p_t_full * s, 0.0)
        res = cg_solve(matvec, rhs, x0=t_vec, tol=tol, maxiter=maxiter)
        temp = jnp.where(mask, res.x * scale + T0, temp)
        return temp, k + 1

    temp, _ = jax.lax.while_loop(
        lambda c: c[1] < n_sub, body, (temp, jnp.asarray(0, jnp.int32))
    )
    return temp


def local_cg_steady(
    geom: Geometry,
    params: PhysParams,
    heat: HeatModel,
    state: SimState,
    temp,
    tol: float = 1e-10,
    maxiter: int = 1000,
):
    """The steady-state branch of the matrix-free local model
    (L T_tr = P*p_t solved as SPD (-L) T_tr = -P*p_t)."""
    from ..ops.cg import cg_solve

    T0, scale, mask, p_t_full, P_full = _local_cg_setup(
        geom, params, heat, state, tol, maxiter
    )

    def matvec(x):
        return jnp.where(mask, -_laplacian_apply(geom, heat, x), 0.0)

    rhs = jnp.where(mask, -P_full * p_t_full, 0.0)
    res = cg_solve(matvec, rhs, tol=tol, maxiter=maxiter)
    return jnp.where(mask, -res.x * scale + T0, temp)


def finish_local_temperature(geom: Geometry, params: PhysParams, state, temp):
    """Common tail of the local model: inner-region average -> T_bg."""
    inner = geom.inner_mask
    T_bg = jnp.sum(jnp.where(inner, temp, 0.0)) / jnp.sum(inner)
    new_state = state.replace(
        temperature=temp.astype(params.dtype), T_bg=T_bg.astype(params.dtype)
    )
    return new_state, {"Global temperature [K]": T_bg}


def update_temperature_local_cg(
    geom: Geometry,
    params: PhysParams,
    heat: HeatModel,
    state: SimState,
    step_time,
    tol: float = 1e-10,
    maxiter: int = 1000,
) -> Tuple[SimState, Dict]:
    """Matrix-free variant of :func:`update_temperature_local`: each
    transient substep solves (I - dt*tau*L) T' = rhs with CG (the reference
    instead precomputes the dense inverse, src/heat_solver.cpp:151-191);
    the steady-state branch solves L T = -P*p_t."""

    def transient(temp):
        n_sub = jnp.floor(step_time / params.delta_t).astype(jnp.int32) + 1
        return local_cg_transient_window(
            geom, params, heat, state, temp, n_sub, tol, maxiter
        )

    def steady(temp):
        return local_cg_steady(geom, params, heat, state, temp, tol, maxiter)

    temp = jax.lax.cond(
        step_time > 1e3 * params.delta_t, steady, transient, state.temperature
    )
    return finish_local_temperature(geom, params, state, temp)


def update_temperature(
    geom: Geometry,
    params: PhysParams,
    heat: Optional[HeatModel],
    state: SimState,
    step_time,
) -> Tuple[SimState, Dict]:
    """Dispatch matching Device::updateTemperature
    (src/heat_solver.cpp:250-312): global model takes precedence."""
    if params.solve_heating_global:
        return update_temperature_global(params, state, step_time)
    if params.solve_heating_local and heat is not None and heat.n_interface:
        if heat.method == "cg":
            return update_temperature_local_cg(
                geom, params, heat, state, step_time
            )
        return update_temperature_local(geom, params, heat, state, step_time)
    return state, {}
