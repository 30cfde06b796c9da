import os

import numpy as np

from devicekmc_tpu.postprocessing import parse_output, parse_snapshot


SAMPLE = """\
--------------------------------
Applied Voltage = 1 V
--------------------------------
Created folder: Results_1.000000
--------------
KMC step count: 0
V_vcm: 1
KMC time is: 3.4e-14
Current [uA]: 12.5
Conductance [uS]: 12.5
Global temperature [K]: 301.5
Z - calculation time - KMC superstep [s]: 0.5
--------------
KMC step count: 1
V_vcm: 1
KMC time is: 7.0e-14
Current [uA]: 14.0
Z - calculation time - KMC superstep [s]: 0.4
--------------------------------
Applied Voltage = 2 V
--------------------------------
--------------
KMC step count: 0
KMC time is: 1.0e-14
Current [uA]: 30.0
"""


def test_parse_output(tmp_path):
    p = tmp_path / "output.txt"
    p.write_text(SAMPLE)
    tr = parse_output(str(p))
    np.testing.assert_array_equal(tr.voltages, [1.0, 2.0])
    np.testing.assert_allclose(
        tr.final_per_bias("Current [uA]"), [14.0, 30.0]
    )
    np.testing.assert_allclose(tr.bias_points[0].kmc_time, [3.4e-14, 7.0e-14])
    # concat clock accumulates across bias points
    t = tr.concat_time()
    np.testing.assert_allclose(t, [3.4e-14, 7.0e-14, 8.0e-14])
    np.testing.assert_allclose(
        tr.concat("Z - calculation time - KMC superstep [s]"), [0.5, 0.4]
    )


def test_parse_our_driver_output(tmp_path):
    """The parser must work on output.txt written by our Simulation."""
    from devicekmc_tpu.config import KMCConfig
    from devicekmc_tpu.engine import Simulation
    from devicekmc_tpu.structure import make_test_structure

    s = make_test_structure(nx_contact=2, nx_oxide=6, ny=3, nz=3, seed=3)
    cfg = KMCConfig(
        lattice=list(s.lattice), nn_dist=3.0,
        num_atoms_first_layer=s.num_atoms_first_layer,
        num_layers_contact=s.num_layers_contact,
        num_atoms_contact=s.num_atoms_contact,
        layers=s.layers,
        solve_potential=True, solve_current=True, solve_heating_global=True,
        perturb_structure=True, pristine=True,
        initial_vacancy_concentration=0.1, A=6.25e-19,
        V_switch=[1.5], t_switch=[1e-13], output_dir=str(tmp_path),
    )
    sim = Simulation(cfg, elements=s.elements, coords=s.coords)
    sim.run(max_steps_per_bias=3)

    tr = parse_output(os.path.join(tmp_path, "output.txt"))
    assert tr.voltages.tolist() == [1.5]
    assert len(tr.bias_points[0].kmc_time) >= 1
    assert len(tr.bias_points[0].get("Current [uA]")) >= 1
    assert len(tr.bias_points[0].get("Global temperature [K]")) >= 1

    snap = parse_snapshot(
        os.path.join(tmp_path, "Results_1.500000", "snapshot_0.xyz")
    )
    assert len(snap["elements"]) == len(s.elements)
    assert np.isfinite(snap["potential"]).all()


def test_plots_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from devicekmc_tpu.postprocessing import plots

    p = tmp_path / "output.txt"
    p.write_text(SAMPLE)
    out = str(tmp_path / "iv.png")
    plots.plot_iv(str(p), out)
    assert os.path.exists(out)
    plots.plot_current(str(p), str(tmp_path / "i.png"))
    plots.plot_timing(str(p), str(tmp_path / "t.png"))
    arrays = plots.extract_data(str(p), str(tmp_path / "d.npz"))
    assert "kmc_time" in arrays


def test_extract_mat(tmp_path):
    from devicekmc_tpu.postprocessing import plots

    p = tmp_path / "output.txt"
    p.write_text(SAMPLE)
    out = str(tmp_path / "d.mat")
    plots.extract_data(str(p), out)
    from scipy.io import loadmat

    m = loadmat(out)
    assert "kmc_time" in m
