"""Pallas TPU kernel for the ELL neighbour gather (the profiled hot spot).

Every field stage gathers per-site values at the static neighbour indices
``geom.neigh_idx`` ([N, max_nn], x-sorted site order): the rate table reads
(phi, packed site code) per pair, the charge rule reads a flag word per
pair.  XLA lowers these to row gathers with 1-2-lane rows, which run ~50x
below HBM bandwidth on TPU (measured 14.7 ms for the packed rate gather and
40.3 ms for the charge-flag gather at 110k sites — together most of the
warm superstep).

Mosaic exposes exactly one dynamic-gather primitive on this toolchain: a
same-shape ``take_along_axis(t, idx, axis=1)`` whose table rows are 128
lanes wide (a lane shuffle).  The kernel therefore decomposes the window
gather into a static sweep over 128-lane *pages*:

  * sites are x-sorted, so every neighbour of the 128-site block ``r``
    lives within ``bw`` sites of it — a window of ``Wp`` pages of the
    zero-padded value array, starting at page ``r``;
  * the (site, slot) pairs of block ``r`` flatten to ``TBr`` rows of 128
    lanes, with STATIC page/lane split of each pair's neighbour index
    (``plan`` arrays, built once per geometry);
  * per page p: broadcast the page row, lane-shuffle it with
    ``take_along_axis``, select where ``page == p``.  ~4 VPU ops per
    (pair, page): N*mp2*Wp elements total, ~1.6 ms/channel at crossbar
    scale vs 15-40 ms for the XLA gathers.

The value arrays live fully VMEM-resident (N+2*BWpad f32 <= ~3 MB at 750k
sites); the static index arrays stream per block.  All channels share one
page sweep (the mask is computed once).

Reference analog: the hand-tiled window kernels of
/root/reference/src/potential_solver_gpu.cu:907-978 — same "stage the
window in fast memory, sweep it regularly" answer to irregular access.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128          # sites per block (must be a multiple of 128: page-aligned)
LANES = 128


def build_ell_gather_plan(neigh_idx, max_window_pages: int = 128):
    """Static page/lane decomposition of the neighbour indices.

    neigh_idx: [N, max_nn] int (numpy or jax), pad -1 (clamped to 0, same
    semantics as the XLA ``packed[max(idx, 0)]`` path — callers mask with
    neigh_valid downstream).

    Returns None when the x-bandwidth makes the page window larger than
    ``max_window_pages`` (the sweep cost scales with it; fall back to XLA),
    or a dict of static arrays + ints.
    """
    nb = np.asarray(neigh_idx)
    N, max_nn = nb.shape
    N2 = -(-N // TB) * TB                 # page-aligned site count
    site = np.arange(N, dtype=np.int64)[:, None]
    # pad slots (and index-0 clamps from the XLA path's max(idx, 0)) would
    # fall outside distant blocks' windows: point them at the source site
    # itself instead — gathered values there are masked by neigh_valid
    # downstream, exactly like the XLA path's site-0 values
    safe = np.where(nb >= 0, nb, site)
    # x-bandwidth in site-index space
    bw = int(np.abs(safe - site).max()) if N else 1
    bwpad = -(-bw // LANES) * LANES
    wp = (TB + 2 * bwpad) // LANES
    if wp > max_window_pages:
        return None
    # pad slots to a power-of-two lane packing
    mp2 = 1
    while mp2 < max_nn:
        mp2 *= 2
    mp2 = max(mp2, 2)
    safe_p = np.pad(safe, ((0, N2 - N), (0, mp2 - max_nn)))   # [N2, mp2]
    # alignment pad rows gather their own (diagonal) site
    safe_p[N:, :] = np.arange(N, N2, dtype=np.int64)[:, None]
    safe_p[:N, max_nn:] = site
    # flatten (site, slot) site-major into rows of 128 lanes
    flat = safe_p.reshape(-1)                                 # [N2 * mp2]
    n_rows = flat.size // LANES
    rows_per_block = TB * mp2 // LANES
    blk = np.repeat(
        np.arange(N2 // TB, dtype=np.int64),
        rows_per_block * LANES,
    )
    base = blk * TB                       # window base site (pre-pad index)
    rel = flat - base + bwpad             # index into the padded window
    assert (rel >= 0).all() and (rel < wp * LANES).all()
    page = (rel // LANES).astype(np.int32).reshape(n_rows, LANES)
    lane = (rel % LANES).astype(np.int32).reshape(n_rows, LANES)
    return dict(
        page=jnp.asarray(page), lane=jnp.asarray(lane),
        N=N, N2=N2, max_nn=max_nn, mp2=mp2, bwpad=bwpad, wp=wp,
        rows_per_block=rows_per_block,
    )


def _kernel(page_ref, lane_ref, *refs, wp: int, nch: int, tbr: int):
    r = pl.program_id(0)
    v_refs = refs[:nch]
    o_refs = refs[nch:]
    lane = lane_ref[:]
    page = page_ref[:]
    accs = [jnp.zeros((tbr, LANES), jnp.float32) for _ in range(nch)]
    for p in range(wp):
        mask = page == p
        for c in range(nch):
            prow = v_refs[c][pl.ds(r + p, 1), :]              # [1, 128]
            t = jnp.broadcast_to(prow, (tbr, LANES))
            g = jnp.take_along_axis(t, lane, axis=1)
            accs[c] = jnp.where(mask, g, accs[c])
    for c in range(nch):
        o_refs[c][:] = accs[c]


@functools.partial(
    jax.jit, static_argnames=("mp2", "bwpad", "wp", "rows_per_block",
                              "interpret"),
)
def _gather_call(page, lane, values, mp2, bwpad, wp, rows_per_block,
                 interpret=False):
    N = values[0].shape[0]
    N2 = -(-N // TB) * TB
    nch = len(values)
    n_rows = page.shape[0]
    n_blocks = n_rows // rows_per_block
    padded = []
    for v in values:
        vp = jnp.concatenate([
            jnp.zeros(bwpad, jnp.float32), v.astype(jnp.float32),
            jnp.zeros(bwpad + (N2 - N), jnp.float32),
        ]).reshape(-1, LANES)
        padded.append(vp)

    idx_spec = pl.BlockSpec(
        (rows_per_block, LANES), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    val_spec = pl.BlockSpec(memory_space=pltpu.VMEM)   # full, VMEM-resident
    out_spec = pl.BlockSpec(
        (rows_per_block, LANES), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(
                _kernel, wp=wp, nch=nch, tbr=rows_per_block
            ),
            grid=(n_blocks,),
            in_specs=[idx_spec, idx_spec] + [val_spec] * nch,
            out_specs=[out_spec] * nch,
            out_shape=[
                jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)
            ] * nch,
            cost_estimate=pl.CostEstimate(
                flops=4 * n_rows * LANES * wp,
                bytes_accessed=(2 * n_rows * LANES * 4
                                + nch * (N * 4 + n_rows * LANES * 4)),
                transcendentals=0,
            ),
            interpret=interpret,
        )(page, lane, *padded)
    return outs


def plan_from_geom(geom):
    """Reassemble the plan dict from the fields the engine attached to the
    Geometry (state.Geometry.gather_*); None when no plan is attached."""
    if getattr(geom, "gather_page", None) is None:
        return None
    return dict(
        page=geom.gather_page, lane=geom.gather_lane,
        N=geom.N, N2=-(-geom.N // TB) * TB, max_nn=geom.max_nn,
        mp2=geom.gather_mp2, bwpad=geom.gather_bwpad, wp=geom.gather_wp,
        rows_per_block=geom.gather_rpb,
    )


def ell_gather_pallas(plan, values, interpret: bool = False):
    """Gather each [N] f32 array in ``values`` at the plan's neighbour
    indices.  Returns a list of [N, max_nn] f32 arrays (pad slots dropped).
    Non-f32 inputs must be bitcast to f32 by the caller (the kernel moves
    bits, it never does arithmetic on the values)."""
    outs = _gather_call(
        plan["page"], plan["lane"], tuple(values),
        mp2=plan["mp2"], bwpad=plan["bwpad"], wp=plan["wp"],
        rows_per_block=plan["rows_per_block"], interpret=interpret,
    )
    N, N2, max_nn, mp2 = plan["N"], plan["N2"], plan["max_nn"], plan["mp2"]
    return [o.reshape(N2, mp2)[:N, :max_nn] for o in outs]
