"""Pallas TPU kernels that compute the metal_p x metal_p WKB tunnel block
ON THE FLY inside the transport matvec — the block never exists in memory.

Why: the c2c tunnel block is dense in the f32-exact sense (measured on the
110,813-site crossbar at Vd = 1 V: 59% of entries are nonzero, with nonzero
transmissions out to 172 A — the WKB decay is too slow at these barrier
parameters for any exact distance cut), so storing it costs O(n_mp^2) HBM:
2.45 GB at the reference crossbar and ~50 GB at 500k sites, which is the
object that caps single-chip scaling.  But each entry is only ~30 VPU flops
(distance + one exp), while streaming it from HBM costs 4 bytes: on TPU the
compute path is faster than the memory path, so the TPU-native answer is to
re-derive the physics inside the kernel.  Per matvec the HBM traffic is
O(n_mp) vectors; the [BR, BC] pair tiles live entirely in VMEM.

The entry formula matches physics/current.tunnel_block + wkb_single_T
(reference: src/current_solver.cpp:135-154 — trapezoidal/triangular WKB
barrier between interior-metal contacts) with the same eligibility rule
(|dE_CB| > ctol and not neighbours).  Padded slots are handled by
displacement: pad positions sit 1e6 A away, so their transmissions underflow
to exactly 0.0 — no mask input needed.  WKB scalars (prefac, qV0, ctol,
nn_dist, lattice) ride in a small VMEM scalar vector — they derive from
traced PhysParams leaves, so they cannot be trace-time constants.

Grid: (n_r,) row blocks; the column loop is an in-kernel fori over BC-tiles
with the accumulator held in VMEM.  All input vectors are VMEM-resident
([1, n_pad] each, ~0.5 MB at crossbar scale, ~2 MB at 500k sites).  Traced
under ``jax.enable_x64(False)``: x64 grid scalars are i64, which Mosaic
cannot legalize (see ops/pairwise_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: pad displacement [A] for unused slots: far enough that every WKB
#: exponent underflows exp() to exactly 0.0 in f32
PAD_DISPLACE = 1.0e6

#: scalar-vector layout: indices into the [1, 128] sc input
_PREFAC, _QV0, _CTOL, _NN, _LY, _LZ, _VSGN, _DESTEP = range(8)


def _pair_vals(sc, px_r, py_r, pz_r, cb_r, px_c, py_c, pz_c, cb_c, *, pbc):
    """Negated-transmission tile [BR, BC] for row chunk x col chunk.

    Same operation sequence as current.tunnel_block(..., wkb_single_T):
    y/z minimum image, eligibility, shared exponent scale, trapezoidal /
    triangular barrier."""
    dx = px_r[:, None] - px_c[None, :]
    dy = py_r[:, None] - py_c[None, :]
    dz = pz_r[:, None] - pz_c[None, :]
    if pbc:
        dy = dy - jnp.round(dy / sc[_LY]) * sc[_LY]
        dz = dz - jnp.round(dz / sc[_LZ]) * sc[_LZ]
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    abs_dE = jnp.abs(cb_r[:, None] - cb_c[None, :])
    elig = (abs_dE > sc[_CTOL]) & ~(dist < sc[_NN])
    safe = jnp.where(elig, abs_dE, 1.0)
    s = sc[_PREFAC] * (dist * 1e-10) / safe
    qV0 = sc[_QV0]
    E2 = qV0 - safe
    # x**1.5 spelled x*sqrt(x): Mosaic cannot legalize math.powf.  Differs
    # from XLA's powf by <=1 ulp — below the f32 assembly-noise contract.
    e15 = qV0 * jnp.sqrt(qV0)
    E2p = jnp.where(E2 > 0, E2, 0.0)
    T = jnp.where(
        E2 > 0,
        jnp.exp(s * (e15 - E2p * jnp.sqrt(E2p))),
        jnp.where(E2 < 0, jnp.exp(s * e15), 0.0),
    )
    return jnp.where(elig, -T, 0.0)


def _mv_kernel(sc_ref, px_ref, py_ref, pz_ref, cb_ref, x_ref, o_ref,
               *, BR, BC, n_c, pbc):
    r = pl.program_id(0)
    r0 = r * BR
    sc = sc_ref[0, :]
    px_r = px_ref[0, pl.ds(r0, BR)]
    py_r = py_ref[0, pl.ds(r0, BR)]
    pz_r = pz_ref[0, pl.ds(r0, BR)]
    cb_r = cb_ref[0, pl.ds(r0, BR)]

    def body(c, acc):
        c0 = c * BC
        vals = _pair_vals(
            sc, px_r, py_r, pz_r, cb_r,
            px_ref[0, pl.ds(c0, BC)], py_ref[0, pl.ds(c0, BC)],
            pz_ref[0, pl.ds(c0, BC)], cb_ref[0, pl.ds(c0, BC)], pbc=pbc,
        )
        return acc + jnp.sum(vals * x_ref[0, pl.ds(c0, BC)][None, :], axis=1)

    acc = jax.lax.fori_loop(0, n_c, body, jnp.zeros(BR, jnp.float32))
    o_ref[0, 0, :] = acc


def _mv_sym_kernel(sc_ref, px_ref, py_ref, pz_ref, cb_ref, x_ref, o_ref,
                   y_acc, *, B, n_b, pbc):
    """Symmetric matvec: the cc block is symmetric (distance and |dE| are),
    so each strict upper-triangle [B, B] tile is computed ONCE and
    contributes to both its row block (vals @ x_c) and its column block
    (vals^T @ x_r) — halving the transcendental work.  ``y_acc`` is a
    VMEM scratch accumulator that persists across the sequential TPU grid;
    the (constant-index) output block is written on the last grid step.
    Lower-triangle grid steps skip all compute."""
    r = pl.program_id(0)
    c = pl.program_id(1)
    sc = sc_ref[0, :]

    @pl.when(jnp.logical_and(r == 0, c == 0))
    def _():
        y_acc[0, :] = jnp.zeros_like(y_acc[0, :])

    @pl.when(c >= r)
    def _():
        r0, c0 = r * B, c * B
        vals = _pair_vals(
            sc,
            px_ref[0, pl.ds(r0, B)], py_ref[0, pl.ds(r0, B)],
            pz_ref[0, pl.ds(r0, B)], cb_ref[0, pl.ds(r0, B)],
            px_ref[0, pl.ds(c0, B)], py_ref[0, pl.ds(c0, B)],
            pz_ref[0, pl.ds(c0, B)], cb_ref[0, pl.ds(c0, B)], pbc=pbc,
        )
        row_part = jnp.sum(vals * x_ref[0, pl.ds(c0, B)][None, :], axis=1)
        y_acc[0, pl.ds(r0, B)] = y_acc[0, pl.ds(r0, B)] + row_part

        @pl.when(c > r)
        def _():
            col_part = jnp.sum(
                vals * x_ref[0, pl.ds(r0, B)][:, None], axis=0
            )
            y_acc[0, pl.ds(c0, B)] = y_acc[0, pl.ds(c0, B)] + col_part

    @pl.when(jnp.logical_and(r == n_b - 1, c == n_b - 1))
    def _():
        o_ref[0, :] = y_acc[0, :]


def _mm_kernel(sc_ref, px_ref, py_ref, pz_ref, cb_ref, x_ref, o_ref,
               *, BR, BC, n_c, K, pbc):
    """Multi-RHS variant: x_ref [K, n_pad] -> o_ref [1, K, BR]."""
    r = pl.program_id(0)
    r0 = r * BR
    sc = sc_ref[0, :]
    px_r = px_ref[0, pl.ds(r0, BR)]
    py_r = py_ref[0, pl.ds(r0, BR)]
    pz_r = pz_ref[0, pl.ds(r0, BR)]
    cb_r = cb_ref[0, pl.ds(r0, BR)]

    def body(c, acc):
        c0 = c * BC
        vals = _pair_vals(
            sc, px_r, py_r, pz_r, cb_r,
            px_ref[0, pl.ds(c0, BC)], py_ref[0, pl.ds(c0, BC)],
            pz_ref[0, pl.ds(c0, BC)], cb_ref[0, pl.ds(c0, BC)], pbc=pbc,
        )
        xt = x_ref[:, pl.ds(c0, BC)]                     # [K, BC]
        # [K, BR] <- [K, BC] x [BR, BC]^T contraction on the MXU.
        # precision=HIGHEST: the MXU's DEFAULT f32 contraction is a single
        # bf16 pass (~2e-3 relative — measured by bench.py --selftest on
        # real Mosaic, round 5); the entries cost ~30 VPU flops + 1 exp
        # each, so the extra MXU passes are noise while restoring the
        # ~1e-6 f32 accuracy contract of the fly kernels
        return acc + jax.lax.dot_general(
            xt, vals, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    acc = jax.lax.fori_loop(0, n_c, body, jnp.zeros((K, BR), jnp.float32))
    o_ref[0, :, :] = acc


def _pdisp_kernel(sc_ref, px_ref, py_ref, pz_ref, cb_ref, ms_ref, o_ref,
                  *, BR, BC, n_c, pbc):
    """Forward-current dissipation row sums over the on-the-fly block:
    row_c[i] = sum_j [fwd] (-vals*dM) * (-dM), dM = ms_i - ms_j
    (the cc orientation of current._pdisp_rows_cols; the block is
    symmetric so only row sums are needed).  sign(Vd) rides in the scalar
    vector — Vd is a traced value inside the superstep jit."""
    r = pl.program_id(0)
    r0 = r * BR
    sc = sc_ref[0, :]
    vs = sc[_VSGN]
    px_r = px_ref[0, pl.ds(r0, BR)]
    py_r = py_ref[0, pl.ds(r0, BR)]
    pz_r = pz_ref[0, pl.ds(r0, BR)]
    cb_r = cb_ref[0, pl.ds(r0, BR)]
    ms_r = ms_ref[0, pl.ds(r0, BR)]

    def body(c, acc):
        c0 = c * BC
        vals = _pair_vals(
            sc, px_r, py_r, pz_r, cb_r,
            px_ref[0, pl.ds(c0, BC)], py_ref[0, pl.ds(c0, BC)],
            pz_ref[0, pl.ds(c0, BC)], cb_ref[0, pl.ds(c0, BC)], pbc=pbc,
        )
        dM = ms_r[:, None] - ms_ref[0, pl.ds(c0, BC)][None, :]
        I_cal = vals * dM
        fwd = ((I_cal < 0) & (vs > 0)) | ((I_cal > 0) & (vs < 0))
        return acc + jnp.sum(jnp.where(fwd, -I_cal, 0.0) * (-dM), axis=1)

    acc = jax.lax.fori_loop(0, n_c, body, jnp.zeros(BR, jnp.float32))
    o_ref[0, 0, :] = acc


def _prep(pos, cb, BC):
    """Pad the metal_p vectors to a BC multiple with displaced slots and
    reshape to the [1, n_pad] layout the kernels read."""
    n = pos.shape[0]
    n_pad = -(-n // BC) * BC
    pad = n_pad - n
    px = jnp.pad(pos[:, 0].astype(jnp.float32), (0, pad),
                 constant_values=PAD_DISPLACE)
    py = jnp.pad(pos[:, 1].astype(jnp.float32), (0, pad))
    pz = jnp.pad(pos[:, 2].astype(jnp.float32), (0, pad))
    cbp = jnp.pad(cb.astype(jnp.float32), (0, pad))
    return px[None, :], py[None, :], pz[None, :], cbp[None, :], n_pad


def _sc_vector(env, vd=None):
    """[1, 128] f32 scalar vector from the (possibly traced) wkb_env dict."""
    vals = [
        env["prefac"], env["qV0"], env["ctol"], env["nn"],
        env["lattice"][1], env["lattice"][2],
        jnp.sign(vd) if vd is not None else 0.0,
        env.get("dE_step", 0.0),
    ]
    sc = jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])
    return jnp.pad(sc, (0, 128 - sc.shape[0]))[None, :]


@functools.partial(jax.jit, static_argnames=("pbc", "BR", "BC", "interpret"))
def _fly_mv_call(pos, cb, x, sc, pbc, BR, BC, interpret):
    px, py, pz, cbp, n_pad = _prep(pos, cb, BC)
    xp = jnp.pad(x.astype(jnp.float32), (0, n_pad - x.shape[0]))[None, :]
    n_r, n_c = n_pad // BR, n_pad // BC
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_mv_kernel, BR=BR, BC=BC, n_c=n_c, pbc=pbc),
            grid=(n_r,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            # out rides as (n_r, 1, BR): Mosaic requires the last two
            # block dims be (8, 128)-divisible OR equal to the array dims
            # (see ops/banded_pallas.py)
            out_specs=pl.BlockSpec(
                (1, 1, BR), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_r, 1, BR), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=30 * n_pad * n_pad,
                bytes_accessed=6 * n_pad * 4,
                transcendentals=n_pad * n_pad,
            ),
            interpret=interpret,
        )(sc, px, py, pz, cbp, xp)
    return out.reshape(-1)[: pos.shape[0]]


@functools.partial(jax.jit, static_argnames=("pbc", "B", "interpret"))
def _fly_mv_sym_call(pos, cb, x, sc, pbc, B, interpret):
    px, py, pz, cbp, n_pad = _prep(pos, cb, B)
    xp = jnp.pad(x.astype(jnp.float32), (0, n_pad - x.shape[0]))[None, :]
    n_b = n_pad // B
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_mv_sym_kernel, B=B, n_b=n_b, pbc=pbc),
            grid=(n_b, n_b),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=15 * n_pad * n_pad,
                bytes_accessed=6 * n_pad * 4,
                transcendentals=n_pad * n_pad // 2,
            ),
            interpret=interpret,
        )(sc, px, py, pz, cbp, xp)
    return out.reshape(-1)[: pos.shape[0]]


def wkb_fly_matvec(pos, cb, x, env, BR: int = 256, BC: int = 512,
                   interpret: bool = False, symmetric: bool = True):
    """y = T_cc @ x without materialising T_cc (entries re-derived in-kernel).

    pos: [n_mp, 3] metal_p coordinates; cb: [n_mp] CB edges [J];
    x: [n_mp]; env: current.wkb_env(...) dict.  Returns [n_mp] f32.
    ``symmetric=True`` (default): upper-triangle tiling with a VMEM
    column accumulator — the block is symmetric, so this halves the
    per-pair transcendental work.
    """
    if symmetric:
        return _fly_mv_sym_call(
            pos, cb, x, _sc_vector(env), bool(env["pbc"]), BC, interpret
        )
    return _fly_mv_call(
        pos, cb, x, _sc_vector(env), bool(env["pbc"]), BR, BC, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("pbc", "BR", "BC", "KB", "interpret")
)
def _fly_mm_call(pos, cb, X, sc, pbc, BR, BC, KB, interpret):
    px, py, pz, cbp, n_pad = _prep(pos, cb, BC)
    K = X.shape[1]
    K_pad = -(-K // KB) * KB
    Xp = jnp.pad(
        X.astype(jnp.float32), ((0, n_pad - X.shape[0]), (0, K_pad - K))
    ).T                                                   # [K_pad, n_pad]
    n_r, n_c = n_pad // BR, n_pad // BC
    outs = []
    with jax.enable_x64(False):
        for k0 in range(0, K_pad, KB):
            out = pl.pallas_call(
                functools.partial(
                    _mm_kernel, BR=BR, BC=BC, n_c=n_c, K=KB, pbc=pbc
                ),
                grid=(n_r,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
                out_specs=pl.BlockSpec(
                    (1, KB, BR), lambda r: (r, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((n_r, KB, BR), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=(30 + 2 * KB) * n_pad * n_pad,
                    bytes_accessed=(6 + KB) * n_pad * 4,
                    transcendentals=n_pad * n_pad,
                ),
                interpret=interpret,
            )(sc, px, py, pz, cbp, Xp[k0:k0 + KB])
            outs.append(out)
    Y = jnp.concatenate(outs, axis=1)                     # [n_r, K_pad, BR]
    Y = jnp.moveaxis(Y, 1, 0).reshape(K_pad, -1)
    return Y[:K, : pos.shape[0]].T                        # [n_mp, K]


def wkb_fly_matmat(pos, cb, X, env, BR: int = 256, BC: int = 512,
                   KB: int = 8, interpret: bool = False):
    """Y = T_cc @ X for X [n_mp, K] (deflation-basis build); the pair tile
    is computed once per KB-column group and contracted on the MXU."""
    return _fly_mm_call(
        pos, cb, X, _sc_vector(env), bool(env["pbc"]), BR, BC, KB, interpret
    )


@functools.partial(jax.jit, static_argnames=("pbc", "BR", "BC", "interpret"))
def _fly_pdisp_call(pos, cb, ms, sc, pbc, BR, BC, interpret):
    px, py, pz, cbp, n_pad = _prep(pos, cb, BC)
    msp = jnp.pad(ms.astype(jnp.float32), (0, n_pad - ms.shape[0]))[None, :]
    n_r, n_c = n_pad // BR, n_pad // BC
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(
                _pdisp_kernel, BR=BR, BC=BC, n_c=n_c, pbc=pbc
            ),
            grid=(n_r,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            # out rides as (n_r, 1, BR): Mosaic requires the last two
            # block dims be (8, 128)-divisible OR equal to the array dims
            # (see ops/banded_pallas.py)
            out_specs=pl.BlockSpec(
                (1, 1, BR), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_r, 1, BR), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=35 * n_pad * n_pad,
                bytes_accessed=6 * n_pad * 4,
                transcendentals=n_pad * n_pad,
            ),
            interpret=interpret,
        )(sc, px, py, pz, cbp, msp)
    return out.reshape(-1)[: pos.shape[0]]


def wkb_fly_pdisp(pos, cb, ms, Vd, env, BR: int = 256,
                  BC: int = 512, interpret: bool = False):
    """cc rows of the forward-current dissipation sweep
    (current._pdisp_rows_cols on the on-the-fly block).  ``Vd`` may be a
    traced scalar; only its sign enters (via the scalar vector)."""
    return _fly_pdisp_call(
        pos, cb, ms, _sc_vector(env, vd=Vd), bool(env["pbc"]),
        BR, BC, interpret,
    )


# ---------------------------------------------------------------------------
# contact->trap window-integral ASSEMBLY kernel (the stored T_vm block)
# ---------------------------------------------------------------------------
#
# The vacancy x metal_p block uses the occupied-energy-window integration
# (current.wkb_window_T; src/current_solver.cpp:99-134): n_int_steps
# single-shot evaluations summed per pair.  It must stay STORED (it is
# read ~10-200x per solve and its rows change with the vacancy bucket every
# superstep), but its per-superstep ASSEMBLY is the cost: the jnp fori
# materialises the [vcap, n_mp] elementwise intermediates in HBM on every
# one of the n_int_steps passes.  This kernel runs the step loop entirely
# in VMEM per [BR, BC] tile — HBM traffic is the output block, once.

def _window_kernel(sc_ref, vx_ref, vy_ref, vz_ref, vcb_ref,
                   px_ref, py_ref, pz_ref, cb_ref, o_ref,
                   *, BR, BC, n_steps, pbc):
    r = pl.program_id(0)
    c = pl.program_id(1)
    sc = sc_ref[0, :]
    r0, c0 = r * BR, c * BC
    vx = vx_ref[0, pl.ds(r0, BR)]
    vy = vy_ref[0, pl.ds(r0, BR)]
    vz = vz_ref[0, pl.ds(r0, BR)]
    vcb = vcb_ref[0, pl.ds(r0, BR)]
    px = px_ref[0, pl.ds(c0, BC)]
    py = py_ref[0, pl.ds(c0, BC)]
    pz = pz_ref[0, pl.ds(c0, BC)]
    pcb = cb_ref[0, pl.ds(c0, BC)]

    dx = vx[:, None] - px[None, :]
    dy = vy[:, None] - py[None, :]
    dz = vz[:, None] - pz[None, :]
    if pbc:
        dy = dy - jnp.round(dy / sc[_LY]) * sc[_LY]
        dz = dz - jnp.round(dz / sc[_LZ]) * sc[_LZ]
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    abs_dE = jnp.abs(vcb[:, None] - pcb[None, :])
    elig = (abs_dE > sc[_CTOL]) & ~(dist < sc[_NN])
    safe = jnp.where(elig, abs_dE, 1.0)
    s = sc[_PREFAC] * (dist * 1e-10) / safe
    qV0 = sc[_QV0]
    dE_step = sc[_DESTEP]

    def step(k, acc):
        iv = k.astype(jnp.float32) * dE_step
        e1 = qV0 + iv
        e2 = e1 - safe
        e15 = e1 * jnp.sqrt(e1)
        e2p = jnp.where(e2 > 0, e2, 0.0)
        term = jnp.where(
            e2 > 0,
            jnp.exp(s * (e15 - e2p * jnp.sqrt(e2p))),
            jnp.where(e2 < 0, jnp.exp(s * e15), 0.0),
        )
        return acc + jnp.where(iv < safe, term, 0.0)

    T = jax.lax.fori_loop(0, n_steps, step, jnp.zeros((BR, BC), jnp.float32))
    o_ref[:, :] = jnp.where(elig, -T, 0.0)


@functools.partial(
    jax.jit, static_argnames=("pbc", "n_steps", "BR", "BC", "interpret")
)
def _window_call(vpos, vcb, pos, cb, sc, pbc, n_steps, BR, BC, interpret):
    vx, vy, vz, vcbp, nv_pad = _prep(vpos, vcb, BR)
    px, py, pz, cbp, n_pad = _prep(pos, cb, BC)
    n_r, n_c = nv_pad // BR, n_pad // BC
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(
                _window_kernel, BR=BR, BC=BC, n_steps=n_steps, pbc=pbc
            ),
            grid=(n_r, n_c),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=pl.BlockSpec(
                (BR, BC), lambda r, c: (r, c), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nv_pad, n_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=15 * nv_pad * n_pad * n_steps,
                bytes_accessed=nv_pad * n_pad * 4,
                transcendentals=nv_pad * n_pad * n_steps,
            ),
            interpret=interpret,
        )(sc, vx, vy, vz, vcbp, px, py, pz, cbp)
    return out[: vpos.shape[0], : pos.shape[0]]


def wkb_window_block(vpos, vcb, v_ok, pos, cb, env, BR: int = 128,
                     BC: int = 512, interpret: bool = False):
    """Assemble the [n_vac, n_mp] contact->trap window-integral block
    (current.tunnel_block(..., wkb_window_T)) with the energy-step loop in
    VMEM.  ``v_ok`` masks inactive vacancy slots (handled by displacing
    their positions, like the pad slots)."""
    vpos_m = jnp.where(
        v_ok[:, None], vpos.astype(jnp.float32),
        jnp.asarray([PAD_DISPLACE, 0.0, 0.0], jnp.float32),
    )
    sc = _sc_vector(env)
    return _window_call(
        vpos_m, vcb, pos, cb, sc, bool(env["pbc"]),
        int(env["n_int_steps"]), BR, BC, interpret,
    )
