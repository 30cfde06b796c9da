#!/usr/bin/env python
"""f32 vs f64 accuracy study for the full coupled superstep.

Runs the same trajectory (same RNG keys) on a mid-size synthetic device in
both precisions on the CPU backend and reports field/current/temperature
errors, plus the divergence step of the discrete event sequence (discrete
selections eventually diverge under any perturbation — what matters is that
the *statistics* match; this prints the first divergence and the field-level
errors before it).

Usage: python tools/precision_study.py [--steps 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

# the axon TPU plugin registers regardless of JAX_PLATFORMS — pin CPU hard
import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass


def build(precision):
    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.physics import heat as heat_mod
    from devicekmc_tpu.state import (
        build_geometry, build_params, init_state, make_substoichiometric,
    )
    from devicekmc_tpu.structure import make_test_structure

    s = make_test_structure(nx_contact=3, nx_oxide=14, ny=6, nz=6, seed=1)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, precision=precision,
        A=6.25e-19,
        solver_tol=1e-12 if precision == "f64" else 1e-6,
    )
    elems = make_substoichiometric(s.elements, 0.07, seed=5)
    geom = build_geometry(elems, s.coords, cfg)
    params = build_params(cfg)
    state = init_state(geom, cfg, elems)
    heat = heat_mod.empty_heat_model(params)
    return geom, params, heat, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax

    from devicekmc_tpu.physics.potential import solve_cb_edge
    from devicekmc_tpu.superstep import superstep_impl

    runs = {}
    for prec in ("f64", "f32", "mixed"):
        geom, params, heat, state = build(prec)
        cb = jax.jit(solve_cb_edge)
        step = jax.jit(superstep_impl)
        state, _ = cb(geom, params, state, 2.0)
        traj = []
        for _ in range(args.steps):
            state, dt, metrics = step(geom, params, heat, state, 2.0)
            traj.append({
                "elements": np.asarray(state.element).copy(),
                "phi_b": np.asarray(state.potential_boundary).copy(),
                "phi_c": np.asarray(state.potential_charge).copy(),
                "I": float(state.I_macro),
                "T": float(state.T_bg),
                "dt": float(dt),
                "events": int(metrics["n_events"]),
            })
        runs[prec] = traj

    for other in ("f32", "mixed"):
      print(f"=== {other} vs f64 ===")
      div_step = args.steps
      for k in range(args.steps):
        if not np.array_equal(runs["f64"][k]["elements"], runs[other][k]["elements"]):
            div_step = k
            break
      print(f"event sequences identical through step {div_step}/{args.steps}")

      for k in range(min(div_step + 1, args.steps)):
        a, b = runs["f64"][k], runs[other][k]
        scale_b = max(np.abs(a["phi_b"]).max(), 1e-30)
        scale_c = max(np.abs(a["phi_c"]).max(), 1e-30)
        err_b = np.abs(a["phi_b"] - b["phi_b"]).max() / scale_b
        err_c = np.abs(a["phi_c"] - b["phi_c"]).max() / scale_c
        err_i = abs(a["I"] - b["I"]) / max(abs(a["I"]), 1e-30)
        err_t = abs(a["T"] - b["T"])
        same = np.array_equal(a["elements"], b["elements"])
        print(
            f"step {k}: phi_boundary rel {err_b:.2e}, phi_charge rel {err_c:.2e}, "
            f"I rel {err_i:.2e}, dT {err_t:.2e} K, events {a['events']}/{b['events']}, "
            f"traj_same={same}"
        )


if __name__ == "__main__":
    main()
