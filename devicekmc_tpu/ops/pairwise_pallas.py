"""Pallas TPU kernel for the gridless-Poisson pairwise sweep.

Computes, for every site i, the screened-Coulomb superposition from a
compacted set of charged sites:

    V_i = sum_c  q_c * erfc(r_ic / (sigma*sqrt(2))) * k * e / r_ic

The jnp implementation (physics/potential.py) runs the same math as a
lax.map over row blocks; this kernel tiles rows onto the grid and keeps the
charged set resident in VMEM, so each (charged x row_tile) interaction block
is one fully-regular VPU pass — distance, erfc, mask, accumulate — with no
HBM round-trips between stages.

Layout (see the pallas guide's tiling constraints): sites ride the LANE axis
(row tiles of 512, multiple of 128) and the charged set rides the SUBLANE
axis, so every block is (cap, ROW_TILE) — natively tileable.  Scalars ride
in SMEM as a (1, 8) row.  erfc is not lowered by Mosaic, so the kernel uses
the Abramowitz-Stegun 7.1.26 rational approximation (|err| <= 1.5e-7,
f32-exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 512


def on_tpu_default_device() -> bool:
    """True when computations target a real TPU.  ``jax.default_backend()``
    alone is wrong here: the axon TPU plugin registers regardless of
    JAX_PLATFORMS, so a CPU-pinned session still reports backend "tpu" —
    check the pinned default device first."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform == "tpu"
    return jax.default_backend() == "tpu"


def _erfc_pos(x):
    """erfc for x >= 0 via Abramowitz & Stegun 7.1.26."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * jnp.exp(-x * x)


def _kernel(scal_ref, xr, yr, zr, ir, cx, cy, cz, cq, ci, out):
    """One row-tile against the full charged set.

    scal_ref (SMEM, (1,8)): inv_s, kq, lat_y, lat_z, pbc_flag, ...
    xr/yr/zr/ir: (1, T) row coordinates / int32 site ids (lane axis)
    cx/cy/cz/cq/ci: (C, 1) charged data (sublane axis)
    out: (1, T)
    """
    inv_s = scal_ref[0, 0]
    kq = scal_ref[0, 1]
    lat_y = scal_ref[0, 2]
    lat_z = scal_ref[0, 3]
    pbc = scal_ref[0, 4]

    dx = cx[:] - xr[:]                       # (C, T)
    dy = cy[:] - yr[:]
    dz = cz[:] - zr[:]

    wrap_y = dy - jnp.round(dy / lat_y) * lat_y
    wrap_z = dz - jnp.round(dz / lat_z) * lat_z
    dy = jnp.where(pbc > 0, wrap_y, dy)
    dz = jnp.where(pbc > 0, wrap_z, dz)

    r = jnp.sqrt(dx * dx + dy * dy + dz * dz) * 1e-10   # [m]
    dead = (ci[:] == ir[:]) | (r <= 0.0)
    r = jnp.where(dead, 1.0, r)
    contrib = cq[:] * _erfc_pos(r * inv_s) * kq / r
    contrib = jnp.where(dead, 0.0, contrib)
    out[:] = jnp.sum(contrib, axis=0, keepdims=True)    # (1, T)


@functools.partial(jax.jit, static_argnames=("pbc", "interpret"))
def poisson_pairwise_pallas(
    coords,            # [N,3]
    charged_idx,       # [C] int32 (fill slots allowed; their charge must be 0)
    charged_q,         # [C] float (0 on fill slots)
    sigma,             # scalar [m]
    k,                 # scalar
    lattice,           # [3]
    pbc: bool,
    interpret: bool = False,
):
    """Returns V [N] f32.  C must be a multiple of 8."""
    from .. import constants as C_

    n = coords.shape[0]
    cap = charged_idx.shape[0]
    assert cap % 8 == 0, "charged capacity must be a multiple of 8"
    n_pad = (-n) % ROW_TILE
    np_tot = n + n_pad

    f32 = jnp.float32
    xr = jnp.pad(coords[:, 0].astype(f32), (0, n_pad)).reshape(1, np_tot)
    yr = jnp.pad(coords[:, 1].astype(f32), (0, n_pad)).reshape(1, np_tot)
    zr = jnp.pad(coords[:, 2].astype(f32), (0, n_pad)).reshape(1, np_tot)
    ir = jnp.pad(
        jnp.arange(n, dtype=jnp.int32), (0, n_pad), constant_values=-2
    ).reshape(1, np_tot)

    ccoords = coords[charged_idx]
    cx = ccoords[:, 0].astype(f32).reshape(cap, 1)
    cy = ccoords[:, 1].astype(f32).reshape(cap, 1)
    cz = ccoords[:, 2].astype(f32).reshape(cap, 1)
    cq = charged_q.astype(f32).reshape(cap, 1)
    ci = charged_idx.astype(jnp.int32).reshape(cap, 1)

    scal = jnp.zeros((1, 8), dtype=f32)
    scal = scal.at[0, 0].set(1.0 / (sigma * jnp.sqrt(jnp.float32(2.0))))
    scal = scal.at[0, 1].set(k * C_.Q_C)
    scal = scal.at[0, 2].set(lattice[1].astype(f32))
    scal = scal.at[0, 3].set(lattice[2].astype(f32))
    scal = scal.at[0, 4].set(1.0 if pbc else 0.0)

    grid = (np_tot // ROW_TILE,)

    def row_spec():
        return pl.BlockSpec(
            (1, ROW_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    def col_spec():
        return pl.BlockSpec(
            (cap, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    # trace the pallas_call with x64 OFF: under jax_enable_x64 the grid
    # machinery emits i64 index scalars that Mosaic cannot legalize
    # ("failed to legalize operation 'func.return' (i64, i64)"); every
    # operand here is already f32/i32 so the narrowed trace is exact
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                row_spec(), row_spec(), row_spec(), row_spec(),
                col_spec(), col_spec(), col_spec(), col_spec(), col_spec(),
            ],
            out_specs=pl.BlockSpec(
                (1, ROW_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((1, np_tot), f32),
            interpret=interpret,
        )(scal, xr, yr, zr, ir, cx, cy, cz, cq, ci)

    return out.reshape(-1)[:n]
