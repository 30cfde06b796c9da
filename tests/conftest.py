"""Test configuration: run everything on the CPU backend (8 virtual devices
for sharding tests), f64 enabled.  The axon TPU plugin registers itself
regardless of JAX_PLATFORMS, so we additionally pin the default device to
CPU after import."""

import os
import sys
import tempfile

# Pre-claim the compilation-cache env var with a fresh per-session dir so
# importing bench.py (test_bench) cannot point the in-process cache at the
# repo's TPU-session cache; the cache is additionally DISABLED outright
# below — with it enabled, XLA's _compile_and_write_cache segfaults
# reproducibly late in the suite (jaxlib CPU serialization bug; the
# pre-round-5 suite never enabled the cache in-process).
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="dkmc_test_xla_cache_"
)

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
jax.config.update("jax_compilation_cache_dir", None)   # see note above
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


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_accumulation():
    """Free compiled executables between test modules.

    The round-5 suite (~155 tests) crossed a per-process accumulation
    threshold in XLA:CPU: with every module's programs kept live, late
    compilations first start mis-executing (order-dependent failures of
    tests that pass standalone) and then segfault inside
    backend_compile_and_load — reproducibly around the ~125th test
    regardless of which test sits there.  Clearing jax's executable and
    tracing caches per module keeps the process under the threshold; the
    cost is re-tracing shared fixtures, ~10% suite time."""
    yield
    jax.clear_caches()
