"""Microbenchmark the boundary-solve branch pieces on the TPU.

The deep-trajectory profile shows supersteps whose neutral-vacancy set
changed cost ~4-4.5 relay ticks even when the warm-started CG converges in
0 iterations.  This probe times each piece K times inside ONE jit (a
lax.fori_loop with data dependence) so sub-tick costs are resolvable
through the ~91 ms relay quantization.

Usage:  python tools/probe_solve_branch.py [--structure PATH] [--reps K]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_crossbar_sim  # the headline structure loader

    geom, params, _heat, state = build_crossbar_sim("mixed")
    N, m = geom.N, geom.max_nn
    print(f"# N={N}, max_nn={m}")

    from devicekmc_tpu.physics.potential import (
        _edge_conductance_boundary,
    )
    from devicekmc_tpu.ops.ell import ell_matvec

    reps = args.reps

    def timed(label, fn, *xs):
        f = jax.jit(fn)
        r = f(*xs)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = f(*xs)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        print(f"{label:42s} {dt/reps*1e3:9.3f} ms/rep   ({dt:.3f}s / {reps})")

    # 1) edge-conductance assembly (f64), K times
    def assemble_loop(elem, charge):
        st = state.replace(element=elem, charge=charge)
        def body(_, acc):
            g = _edge_conductance_boundary(geom, st, params)
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, params.dtype))

    timed("edge assembly f64", assemble_loop, state.element, state.charge)

    # 2) one f64 ELL matvec, K times
    edge_g = jax.jit(
        lambda: _edge_conductance_boundary(geom, state, params)
    )()
    diag = jnp.sum(edge_g, axis=1)
    neg_vals = -edge_g
    x = jnp.linspace(0.0, 1.0, N).astype(params.dtype)

    def matvec_loop(x):
        def body(_, v):
            return ell_matvec(diag, neg_vals, geom.neigh_idx, v) * 1e-9
        return jax.lax.fori_loop(0, reps, body, x)

    timed("ELL matvec f64", matvec_loop, x)

    # 3) same in f32
    diag32, vals32 = diag.astype(jnp.float32), neg_vals.astype(jnp.float32)

    def matvec_loop32(x):
        def body(_, v):
            return ell_matvec(diag32, vals32, geom.neigh_idx, v) * 1e-9
        return jax.lax.fori_loop(0, reps, body, x)

    timed("ELL matvec f32", matvec_loop32, x.astype(jnp.float32))

    # 4) f32 assembly
    p32 = params.replace(dtype=jnp.float32) if hasattr(params, "replace") else params
    def assemble_loop32(elem, charge):
        st = state.replace(element=elem, charge=charge)
        def body(_, acc):
            g = _edge_conductance_boundary(geom, st, p32)
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, jnp.float32))

    try:
        timed("edge assembly f32", assemble_loop32, state.element, state.charge)
    except Exception as e:
        print("f32 assembly probe skipped:", type(e).__name__)

    # 5) full solve branch (warm start == solution, 0 iterations)
    from devicekmc_tpu.physics.potential import solve_boundary_potential

    Vd = jnp.asarray(5.0, params.dtype)
    st1, _ = jax.jit(
        lambda s: solve_boundary_potential(geom, params, s, 5.0)
    )(state)
    jax.block_until_ready(st1.potential_boundary)
    # flip cvac_prev so the exact-skip path is NOT taken, warm start exact
    st_warm = st1.replace(Vd_prev=jnp.asarray(-1.0, params.dtype))

    f = jax.jit(lambda s: solve_boundary_potential(geom, params, s, 5.0))
    r = f(st_warm)
    jax.block_until_ready(r[0].potential_boundary)
    t0 = time.perf_counter()
    r = f(st_warm)
    jax.block_until_ready(r[0].potential_boundary)
    dt = time.perf_counter() - t0
    print(f"{'solve branch, warm(0-iter), 1 dispatch':42s} {dt*1e3:9.3f} ms")
    print("cg iters:", int(r[1]["cg_iters_boundary"]))


if __name__ == "__main__":
    main()
