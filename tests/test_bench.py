"""bench.py builders must work end-to-end (CPU, tiny synthetic)."""

import subprocess
import sys
import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("DEVICEKMC_SLOW_TESTS"),
    reason="slow (~8 min CPU compile); set DEVICEKMC_SLOW_TESTS=1",
)
def test_bench_synthetic_cpu(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=str(tmp_path))
    r = subprocess.run(
        [sys.executable, "bench.py", "--synthetic", "3000", "--steps", "2",
         "--warmup", "1", "--precision", "f64"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "kmc_supersteps_per_s"
    assert out["value"] > 0
