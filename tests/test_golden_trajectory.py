"""Fixed-seed golden-trajectory regression tests.

The reference's regression strategy is fixed-seed exact reproducibility of
snapshot files (depreciated/tests/README.md).  Here the committed golden
records capture a short full-physics trajectory on the deterministic
synthetic device: element-state fingerprints and key scalar observables per
superstep.  Any change to rate physics, selection, field solves or RNG
threading shows up as a diff.

Regenerate (after an INTENTIONAL semantics change) with:
    python tests/test_golden_trajectory.py --regen
"""

import hashlib
import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_trajectory.json")


def _run_trajectory(steps=6):
    import jax.numpy as jnp

    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.engine import Simulation
    from devicekmc_tpu.structure import make_test_structure

    s = make_test_structure(nx_contact=2, nx_oxide=8, ny=4, nz=4, seed=11)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, pristine=True,
        initial_vacancy_concentration=0.08,
        A=1e-18, rnd_seed=3, rnd_seed_kmc=7,
        V_switch=[2.5], t_switch=[1.0],
        output_dir="/tmp",
    )
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    Vd = 2.5
    from devicekmc_tpu.engine import _phase_cb_edge

    sim.state, _ = _phase_cb_edge(sim.geom, sim.params, sim.state, Vd)

    records = []
    for _ in range(steps):
        sim.state, dt, metrics = sim._superstep(sim.state, Vd)
        elem_hash = hashlib.sha256(
            np.asarray(sim.state.element).tobytes()
        ).hexdigest()[:16]
        records.append({
            "elem_hash": elem_hash,
            "n_events": int(metrics["n_events"]),
            "step_time": float(dt),
            "I_uA": float(metrics["Current [uA]"]),
            "T_bg": float(sim.state.T_bg),
            "charged_V": int(metrics["Charged vacancies"]),
        })
    return records


def test_golden_trajectory():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden record not generated yet")
    golden = json.load(open(GOLDEN_PATH))
    got = _run_trajectory(steps=len(golden))
    for k, (g, o) in enumerate(zip(golden, got)):
        assert o["elem_hash"] == g["elem_hash"], (
            f"step {k}: element state diverged from golden record\n"
            f"golden: {g}\n     got: {o}"
        )
        assert o["n_events"] == g["n_events"], f"step {k} events"
        assert o["step_time"] == pytest.approx(g["step_time"], rel=1e-9), k
        assert o["I_uA"] == pytest.approx(g["I_uA"], rel=1e-6, abs=1e-12), k
        assert o["T_bg"] == pytest.approx(g["T_bg"], rel=1e-9), k
        assert o["charged_V"] == g["charged_V"], f"step {k} charged vacancies"


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # regen must run under the SAME backend as the tests (conftest pins
    # CPU; the axon TPU differs in f64 round-off at the last few ulps,
    # enough to flip downstream event picks)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")   # axon register overrides env
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass
    if "--regen" in sys.argv:
        records = _run_trajectory()
        json.dump(records, open(GOLDEN_PATH, "w"), indent=1)
        print(f"wrote {GOLDEN_PATH}:")
        for r in records:
            print(" ", r)
