#!/usr/bin/env python
"""Produce a reference-style per-module timing log for the crossbar bench
config (modular superstep on TPU), for line-by-line comparison with the
reference's committed structures/crossbars/timing_10nm_5pitch/output_initial.txt."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax

    import bench
    from devicekmc_tpu.engine import make_modular_superstep

    geom, params, heat, state = bench.build_crossbar_sim("mixed")
    step = make_modular_superstep(geom, params, heat)
    Vd = 1.0
    keys = [
        "Z - calculation time - charge [s]",
        "Z - calculation time - potential from boundaries [s]",
        "Z - calculation time - potential from charges [s]",
        "Z - calculation time - kmc events [s]",
    ]
    rows = []
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    for k in range(n_steps + 2):
        state, dt, metrics = step(state, Vd)
        if k >= 2:  # skip compile steps
            rows.append([metrics[kk] for kk in keys])
            print(f"step {k-2}: " + "  ".join(
                f"{kk.split(' - ')[-1]}={metrics[kk]*1e3:8.2f}ms"
                for kk in keys))
    rows = np.asarray(rows)
    print("\nmedians [s]:")
    for i, kk in enumerate(keys):
        print(f"  {kk}: {np.median(rows[:, i]):.6g}")
    print(f"  total: {np.median(rows.sum(axis=1)):.6g}")


if __name__ == "__main__":
    main()
