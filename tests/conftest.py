"""Test configuration: run everything on the CPU backend (8 virtual devices
for sharding tests), f64 enabled.  The axon TPU plugin registers itself
regardless of JAX_PLATFORMS, so we additionally pin the default device to
CPU after import."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# the axon register (sitecustomize) FORCES jax_platforms="axon,cpu",
# overriding the env var — force it back so tests never initialize the
# remote TPU backend (whose PJRT client blocks indefinitely when the
# relay session is wedged)
jax.config.update("jax_platforms", "cpu")
try:
    _cpu = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", _cpu)
except RuntimeError:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
