"""Device mesh helpers.

The canonical mesh is 1-D over the transport (x) axis of the site graph:
``("sites",)``.  Crossbar batches add a leading data-parallel axis
``("batch", "sites")``.  On multi-host slices use ``jax.distributed`` +
``jax.devices()`` as usual; the shardings below are host-count agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("sites",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh, preferring explicit devices, then CPU devices when the
    requested count exceeds the accelerator count (virtual-device testing),
    then the default device list."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                cpus = jax.devices("cpu")
                if len(cpus) >= n_devices:
                    devices = cpus
            except RuntimeError:
                pass
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)
