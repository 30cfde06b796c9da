"""Command-line driver: the equivalent of the reference's
``./bin/runKMC parameters.txt`` (src/kmc_main.cpp:26).

    python -m devicekmc_tpu parameters.txt [--max-steps N] [--cpu] [--modular]
"""

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="devicekmc_tpu",
        description="TPU-native kinetic Monte Carlo for VCM RRAM devices",
    )
    ap.add_argument("parameters", help="parameters.txt (reference-compatible)")
    ap.add_argument("--max-steps", type=int, default=None,
                    help="cap KMC supersteps per bias point")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--modular", action="store_true",
                    help="per-phase timing (reference-style module timers)")
    ap.add_argument("--checkpoint", default="",
                    help="write a full-state checkpoint here at the end")
    ap.add_argument("--checkpoint-backend", default=None,
                    choices=["npz", "orbax", "orbax_async"],
                    help="checkpoint format (default: npz for *.npz paths,"
                         " else orbax)")
    ap.add_argument("--resume", default="",
                    help="load a full-state checkpoint before running")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.cpu:
        # the axon register forces jax_platforms="axon,cpu"; force it back
        # so --cpu never touches (or blocks on) the remote TPU backend
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        except RuntimeError:
            pass

    from .config import parse_parameters
    from .engine import Simulation

    cfg = parse_parameters(args.parameters)
    print(f"Backend: {jax.default_backend()} ({jax.devices()[0]})")
    print("Constructing device...")
    try:
        sim = Simulation(cfg, fused=not args.modular)
    except FileNotFoundError as e:
        print(e)
        return 1
    print(
        f"Loaded {sim.geom.N_real} sites into device : "
        f"{sim.geom.N_atom} atoms and "
        f"{sim.geom.N_real - sim.geom.N_atom} interstitials"
    )
    if args.resume:
        sim.load_checkpoint(args.resume)
    sim.run(max_steps_per_bias=args.max_steps)
    if args.checkpoint:
        sim.save_checkpoint(args.checkpoint, backend=args.checkpoint_backend)
        sim.wait_for_checkpoint()
    print(f"Done. Output in {sim.output_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
