#!/usr/bin/env python
"""Device-ensemble statistics: B independent device instances batched through
one vmapped superstep (devicekmc_tpu.parallel.batched), optionally sharded
over a mesh — the TPU-native way to run crossbar-style arrays of
nominally-identical cells or device-to-device variability studies.

Usage: python examples/ensemble.py [--batch 8] [--steps 10] [--cpu] [--mesh N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--vd", type=float, default=3.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the batch over this many devices")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np

    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.parallel import make_mesh
    from devicekmc_tpu.parallel.batched import (
        batch_states, make_batched_superstep, shard_batch,
    )
    from devicekmc_tpu.physics import heat as heat_mod
    from devicekmc_tpu.physics.potential import solve_cb_edge
    from devicekmc_tpu.state import (
        build_geometry, build_params, init_state, make_substoichiometric,
    )
    from devicekmc_tpu.structure import make_test_structure

    s = make_test_structure(nx_contact=2, nx_oxide=8, ny=4, nz=4, seed=5)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, A=1e-18,
    )
    elems = make_substoichiometric(s.elements, 0.05, seed=1)
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    heat = heat_mod.empty_heat_model(params)
    state, _ = jax.jit(solve_cb_edge)(geom, params, state, args.vd)

    states = batch_states(state, args.batch, base_seed=42)
    mesh = None
    if args.mesh:
        devs = jax.devices("cpu") if args.cpu else jax.devices()
        mesh = make_mesh(args.mesh, axis_names=("batch",), devices=devs)
        states = shard_batch(states, mesh)

    step = make_batched_superstep(geom, params, heat, mesh=mesh)
    for k in range(args.steps):
        states, dts, metrics = step(states, args.vd)

    I = np.asarray(states.I_macro) * 1e6
    T = np.asarray(states.T_bg)
    n_ev = np.asarray(metrics["n_events"])
    print(f"ensemble of {args.batch} devices after {args.steps} supersteps "
          f"at Vd={args.vd} V:")
    print(f"  I [uA]: mean {I.mean():.4g}  std {I.std():.3g}  "
          f"range [{I.min():.4g}, {I.max():.4g}]")
    print(f"  T_bg [K]: mean {T.mean():.6g}  std {T.std():.3g}")
    print(f"  events/superstep (last): {n_ev.tolist()}")


if __name__ == "__main__":
    main()
