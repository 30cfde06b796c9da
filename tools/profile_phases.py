#!/usr/bin/env python
"""Per-phase wall-clock profile of the superstep on the bench structure.

Usage: python tools/profile_phases.py [--precision f64] [--steps 3]
       [--cap 16384] [--synthetic N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="f64")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--cap", type=int, default=16384)
    ap.add_argument("--synthetic", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import bench
    from devicekmc_tpu.physics import charge as charge_mod
    from devicekmc_tpu.physics import events as events_mod
    from devicekmc_tpu.physics import potential as potential_mod

    if args.synthetic:
        geom, params, _, heat, state = bench.build_synthetic_sim(
            args.synthetic, args.precision
        )
    else:
        geom, params, heat, state = bench.build_crossbar_sim(args.precision)
    params = params.replace(poisson_compact_cap=args.cap)
    print(f"# N={geom.N}, max_nn={geom.max_nn}, precision={args.precision}, "
          f"cap={args.cap}", file=sys.stderr)

    Vd = 1.0
    f_charge = jax.jit(charge_mod.update_charge)
    f_bound = jax.jit(potential_mod.solve_boundary_potential)
    f_poisson = jax.jit(
        lambda g, p, s: potential_mod.poisson_gridless_compact(
            g, p, s, cap=args.cap
        )
    )
    f_rates = jax.jit(events_mod.build_rate_table)
    f_events = jax.jit(events_mod.execute_superstep)

    def tick(label, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"  {label:<28s} {dt*1e3:10.2f} ms", flush=True)
        return out

    for it in range(args.steps):
        print(f"step {it}:")
        (state, m1) = tick("charge", f_charge, geom, state)
        (state, m2) = tick("boundary CG", f_bound, geom, params, state, Vd)
        print(f"    (cg iters: {int(m2['cg_iters_boundary'])})")
        (state, nch) = tick("poisson compact", f_poisson, geom, params, state)
        print(f"    (charged sites: {int(nch)})")
        prob = tick("rate table", f_rates, geom, params, state)
        res = tick("event loop (full superstep)", f_events, geom, params, state)
        print(f"    (events: {int(res.n_events)})")
        state = res.state


if __name__ == "__main__":
    main()
