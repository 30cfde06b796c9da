"""devicekmc_tpu — a TPU-native kinetic Monte Carlo framework for
atomistically-resolved VCM RRAM (filament formation/dissolution in
TiN-HfO2/Ti-TiN stacks), with the capabilities of the reference DeviceKMC
C++/CUDA code re-designed for JAX/XLA/Pallas on TPU device meshes.

Quick start::

    from devicekmc_tpu import parse_parameters, Simulation
    cfg = parse_parameters("parameters.txt")
    sim = Simulation(cfg)
    sim.run()

Precision: the physics defaults to float64 (the reference is f64 throughout),
so importing this package enables JAX x64 mode unless the environment variable
``DEVICEKMC_TPU_NO_X64`` is set.  Set ``precision = f32`` in the parameter
file to run the compute path in float32 on TPU.
"""

import os as _os

if not _os.environ.get("DEVICEKMC_TPU_NO_X64"):
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

from .config import KMCConfig, Layer, parse_parameters  # noqa: E402
from .structure import Element, read_xyz, write_xyz, make_test_structure  # noqa: E402
from .state import (  # noqa: E402
    Geometry,
    PhysParams,
    SimState,
    build_simulation,
    build_geometry,
    build_params,
    init_state,
)

__version__ = "0.1.0"

__all__ = [
    "KMCConfig",
    "Layer",
    "parse_parameters",
    "Element",
    "read_xyz",
    "write_xyz",
    "make_test_structure",
    "Geometry",
    "PhysParams",
    "SimState",
    "build_simulation",
    "build_geometry",
    "build_params",
    "init_state",
    "Simulation",
]


def __getattr__(name):
    # lazy import to keep base import light
    if name == "Simulation":
        from .engine import Simulation

        return Simulation
    raise AttributeError(name)
