"""Integration runs on the reference's own test structures (depreciated/tests)."""

import os

import numpy as np
import pytest

from devicekmc_tpu.config import parse_parameters
from devicekmc_tpu.engine import Simulation

REF_TEST1 = "/root/reference/depreciated/tests/1-potential"


@pytest.mark.skipif(not os.path.exists(REF_TEST1), reason="no reference")
def test_reference_test1_potential(tmp_path):
    """Reference regression scenario 1: 9030-site device, charge+potential
    only, Vd=20V (depreciated/tests/README.md).  Runs our framework on the
    same parameters.txt + restart snapshot and sanity-checks the physics."""
    cfg = parse_parameters(os.path.join(REF_TEST1, "parameters.txt"))
    cfg.restart_xyz_file = os.path.join(REF_TEST1, "snapshot_init.xyz")
    cfg.perturb_structure = True  # implied by the scenario (snapshots evolve)
    cfg.output_dir = str(tmp_path)
    cfg.solver_tol = 1e-10

    sim = Simulation(cfg)
    assert sim.geom.N == 9030
    summary = sim.run_bias_point(20.0, 1.5e-13, max_steps=3)
    assert summary["steps"] >= 1

    phi_b = np.asarray(sim.state.potential_boundary)
    # Dirichlet contacts at -+Vd/2
    np.testing.assert_allclose(phi_b[: cfg.num_atoms_first_layer], -10.0)
    np.testing.assert_allclose(phi_b[-cfg.num_atoms_first_layer:], 10.0)
    # interior potential bounded by the contacts (discrete maximum principle)
    assert phi_b.min() >= -10.0 - 1e-6 and phi_b.max() <= 10.0 + 1e-6
    # charge update found the vacancies present in the restart snapshot
    elems = np.asarray(sim.state.element)
    assert (elems == 2).sum() > 0  # VACANCY
    # events happened and the clock advanced
    assert summary["kmc_time"] > 0


@pytest.mark.skipif(not os.path.exists(REF_TEST1), reason="no reference")
def test_cli_driver(tmp_path):
    """python -m devicekmc_tpu parameters.txt — the runKMC equivalent."""
    import subprocess
    import sys

    # write a params file pointing at the reference snapshot, with output here
    params = open(os.path.join(REF_TEST1, "parameters.txt")).read()
    params += (
        f"\nrestart_xyz_file = {os.path.join(REF_TEST1, 'snapshot_init.xyz')}\n"
        f"output_dir = {tmp_path}\n"
        "perturb_structure = 1\n"
        "solver_tol = 1e-8\n"
    )
    pfile = tmp_path / "parameters.txt"
    pfile.write_text(params)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "devicekmc_tpu", str(pfile),
         "--max-steps", "2", "--cpu",
         "--checkpoint", str(tmp_path / "end.npz")],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Loaded 9030 sites" in r.stdout
    assert os.path.exists(tmp_path / "output.txt")
    assert os.path.exists(tmp_path / "end.npz")
