#!/usr/bin/env python
"""Warm-transport cost breakdown on the full 75,360-atom crossbar.

Times the components of one warm `update_power_blocked` call separately
(50-deep dependent chains per the relay measurement caveat in
PERFORMANCE.md, except the full solves which are chained 5-deep):

  assemble   assemble_X_blocks (per-superstep vm/vv tunnel + ELL scatter)
  deflate    _deflation_ops (K-column matmat A@Z + coarse factorisation)
  solve      full update_power_blocked (converged warm solve)

Usage: python tools/profile_transport_warm.py [--precond deflated]
       [--cc-kernel auto] [--chain 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precond", default="deflated")
    ap.add_argument("--cc-kernel", default="auto")
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--precision", default="mixed")
    ap.add_argument("--incremental", default="off", choices=["on", "off"])
    ap.add_argument("--coarse-yz", type=int, default=1)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    import bench
    from devicekmc_tpu.physics import current as cur

    geom, params, heat, state, cfg = bench.build_full_crossbar_sim(
        args.precision, 1.0, precond=args.precond
    )
    mode = cur.resolve_transport_cc(
        args.cc_kernel, int(jnp.sum(
            geom.metal_mask_table[state.element[geom.atom_ind]]
            & (jnp.arange(geom.N_atom) >= params.num_source_inj)
            & (jnp.arange(geom.N_atom) < geom.N_atom - params.num_source_inj)
        )), params.dtype == jnp.float32 or args.precision == "mixed",
    ) if args.cc_kernel == "auto" else args.cc_kernel
    params = params.replace(transport_cc=mode)
    if args.coarse_yz > 1:
        params = params.replace(coarse_yz=args.coarse_yz)
    if args.incremental == "on":
        from devicekmc_tpu.state import attach_tunnel_state

        params = params.replace(transport_incremental=True)
        state = attach_tunnel_state(state, geom, params)
    print(f"# transport_cc={mode} precond={args.precond} "
          f"incremental={args.incremental} coarse_yz={args.coarse_yz}",
          file=sys.stderr)

    Vd = 1.0
    from devicekmc_tpu.physics.potential import solve_cb_edge
    state, _ = jax.jit(solve_cb_edge)(geom, params, state, Vd)
    cc = dict(jax.jit(cur.assemble_transport_cache)(geom, params, state))
    band = cur.build_banded_nb(geom, params, state)
    if band is not None:
        cc["band"] = band

    # cold solve to get the warm start committed
    fpow = jax.jit(lambda g, p, s, v, c: cur.update_power_blocked(g, p, s, v, cc=c))
    t0 = time.time()
    st, m = fpow(geom, params, state, Vd, cc)
    jax.block_until_ready(st.I_macro)
    print(f"# cold solve: {int(m['cg_iters_power'])} iters "
          f"{time.time()-t0:.1f}s (incl compile)", file=sys.stderr)
    state = st

    # --- component probes (dependent chains); cc passed as jit ARGS so
    # the 2.45 GB metal block is a device buffer, not a captured constant
    def probe(label, fn, *a):
        f = jax.jit(fn)
        out = f(*a)          # compile
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.chain):
            out = f(*a)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.chain
        print(f"{label:28s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    ccv = cc.get("cc")
    bandv = cc.get("band")

    def do_assemble(s, ccv, bandv):
        blk = cur.assemble_X_blocks(geom, params, s, cc=ccv, band=bandv)
        return blk["diag"]

    probe("assemble_X_blocks", do_assemble, state, ccv, bandv)

    def do_deflate(s, ccv, bandv):
        blk = cur.assemble_X_blocks(geom, params, s, cc=ccv, band=bandv)
        d = blk["diag"][: geom.N_atom + 1]
        Zhat, W, _ = cur._deflation_ops(geom, params, blk, d)
        return W

    if args.precond == "deflated":
        probe("assemble + deflation_ops", do_deflate, state, ccv, bandv)

    def do_matvec(s, ccv, bandv):
        blk = cur.assemble_X_blocks(geom, params, s, cc=ccv, band=bandv)
        x = s.virtual_potentials
        kern = getattr(params, "transport_band_kernel", "jnp")
        return cur._apply_X_blocks(blk, x, params.dtype, kern)

    probe("assemble + 1 f64 matvec", do_matvec, state, ccv, bandv)

    def do_solve(s, cc):
        st2, m2 = cur.update_power_blocked(geom, params, s, Vd, cc=cc)
        return st2.I_macro, st2.virtual_potentials, m2["cg_iters_power"]

    f = jax.jit(do_solve)
    out = f(state, cc)
    jax.block_until_ready(out[0])
    iters = int(out[2])
    t0 = time.time()
    n = max(3, args.chain // 2)
    for _ in range(n):
        out = f(state, cc)
    jax.block_until_ready(out[0])
    dt = (time.time() - t0) / n
    print(f"{'full warm solve':28s} {dt*1e3:9.2f} ms   ({iters} cg iters)",
          flush=True)


if __name__ == "__main__":
    main()
