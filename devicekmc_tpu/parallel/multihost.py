"""Multi-host orchestration helpers.

On a multi-host TPU slice, call :func:`initialize` once per process before
building the simulation; every host then sees the full global device list
and the same code path as single-host — `make_mesh()` spans all chips, data
is sharded by `shard_simulation`, and XLA routes collectives over ICI within
a host-block and DCN across hosts.

The reference has no distributed capability (its MPI build is commented
out, Makefile:31-43); this module is the new multi-host entry point.

Typical SPMD driver::

    from devicekmc_tpu.parallel import multihost, make_mesh
    multihost.initialize()                  # no-op on single host
    mesh = make_mesh()                      # all global devices
    sim = Simulation(cfg, mesh=mesh)
    sim.run()                               # every host runs the same program

Only process 0 should write output files; use :func:`is_coordinator`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise jax.distributed if running under a multi-process launcher.

    With no arguments, relies on the TPU environment's auto-detection (GKE /
    Cloud TPU metadata); explicit arguments support manual launches.  Safe
    to call on a single host (no-op when no cluster env is present).
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return
    env_hint = (
        coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")
    )
    if env_hint is None and num_processes is None:
        return  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:  # pragma: no cover - environment dependent
        import warnings

        warnings.warn(f"jax.distributed.initialize failed: {e}")


def is_coordinator() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()
