"""Pallas TPU kernel for the static banded transport matvec.

The blocked transport operator's neighbour part is stored banded-dense over
x-sorted atoms (current.build_banded_nb): ``C4[r, k, b, j]`` couples permuted
atom ``r*B + b`` to permuted atom ``(r - p + k)*B + j``.  The jnp matvec
materialises an [R, m_pad, B] stack of shifted window copies in HBM every CG
iteration and runs the contraction as an einsum; at crossbar scale the
operator itself is ~2 GB, so the iteration cost is pure HBM streaming and
every extra pass over window copies is measurable (~8 ms/iter,
PERFORMANCE.md).

This kernel streams C4 through VMEM exactly once per iteration (double-
buffered automatically by the pallas grid pipeline), keeps the whole padded
window vector resident in VMEM (~0.5 MB), and accumulates the per-block
matvec on the MXU — no window copies, no gathers, HBM traffic = |C4| + |x| +
|y|, the speed-of-light for this operator.

Reference analog: the hand-tiled pairwise kernel of
/root/reference/src/potential_solver_gpu.cu:907-978 (the reference's answer
to the same "stream a static operator at memory bandwidth" problem).

Grid: ``(R, nk)`` — row blocks x k-tiles of ``KC`` diagonal-block columns.
The out block index map is constant in ``nk`` so the accumulator stays in
VMEM across the k-tiles (reduction pattern).  Traced under
``jax.enable_x64(False)``: x64 grid scalars are i64, which Mosaic cannot
legalize (see ops/pairwise_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_k(m_pad: int, bytes_per_block_row: int) -> int:
    """k-tile size: the whole k extent when the C block fits comfortably
    in VMEM double-buffered (~4 MB/block), else 8-tiles (build_banded_nb
    pads m to a multiple of 8 unless m < 8).  Bigger tiles amortise the
    per-grid-step pipeline overhead — measured 4.9 -> 2.8 ms/iter at
    crossbar scale going from 0.5 MB to 3.5 MB blocks."""
    if m_pad * bytes_per_block_row <= (4 << 20) or m_pad % 8 != 0:
        return m_pad
    return 8


def _kernel(C_ref, xp_ref, o_ref, *, KC: int):
    r = pl.program_id(0)
    kt = pl.program_id(1)
    # window rows for k-tile kt of row block r: x2[r + kt*KC : ... + KC]
    xwin = xp_ref[pl.ds(r + kt * KC, KC), :]                  # [KC, B]
    # rhs as [batch, 1, K]: the only batched-matvec shape Mosaic lowers for
    # both f32 and bf16 ("rhs must be vector-like [B, K] or [B, 1, K]")
    part = jax.lax.dot_general(
        C_ref[0], xwin[:, None, :],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                         # [KC, B, 1]
    y = jnp.sum(part[..., 0], axis=0)                         # [B]

    @pl.when(kt == 0)
    def _():
        o_ref[0, 0, :] = y

    @pl.when(kt > 0)
    def _():
        o_ref[0, 0, :] = o_ref[0, 0, :] + y


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_matvec_pallas(C4, xp2, interpret: bool = False):
    """y[r*B + b] = sum_{k,j} C4[r, k, b, j] * xp2[r + k, j].

    C4:  [R, m_pad, B, B] f32 or bf16 (zero-padded band blocks)
    xp2: [R + m_pad - 1, B] same dtype as C4
    Returns [R, B] f32.
    """
    R, m_pad, B, _ = C4.shape
    KC = _tile_k(m_pad, B * B * C4.dtype.itemsize)
    nk = m_pad // KC
    bytes_c = C4.size * C4.dtype.itemsize
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, KC=KC),
            grid=(R, nk),
            in_specs=[
                pl.BlockSpec(
                    (1, KC, B, B), lambda r, kt: (r, kt, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            # out rides as (R, 1, B): Mosaic requires the last two block
            # dims be (8, 128)-divisible OR equal to the array dims — a
            # (1, B) block of an (R, B) array is neither, a (1, 1, B)
            # block of an (R, 1, B) array is
            out_specs=pl.BlockSpec(
                (1, 1, B), lambda r, kt: (r, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((R, 1, B), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * R * m_pad * B * B,
                bytes_accessed=bytes_c + xp2.size * xp2.dtype.itemsize
                + R * B * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(C4, xp2)
    return out.reshape(R, B)
