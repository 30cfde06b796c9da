import math
import os

import pytest

from devicekmc_tpu.config import KMCConfig, Layer, default_layers, parse_parameters

REF_PARAMS = "/root/reference/parameters.txt"


def test_defaults_derived():
    cfg = KMCConfig()
    assert cfg.high_G == 1.0
    assert cfg.low_G == 1e-8
    assert math.isclose(cfg.k, 8.987552e9 / 23.0)
    assert math.isclose(cfg.m_e, 0.85 * 9.11e-31)


@pytest.mark.skipif(not os.path.exists(REF_PARAMS), reason="no reference")
def test_parse_reference_parameters():
    cfg = parse_parameters(REF_PARAMS)
    assert cfg.rnd_seed == 5
    assert cfg.restart is False
    assert cfg.lattice == [93.72586, 26.914773122, 26.6371955996]
    assert cfg.pristine is True
    assert math.isclose(cfg.initial_vacancy_concentration, 0.05)
    assert math.isclose(cfg.freq, 10e13)
    assert math.isclose(cfg.nn_dist, 3.5)
    assert cfg.perturb_structure is True
    assert cfg.solve_potential and cfg.solve_current
    assert cfg.solve_heating_global and not cfg.solve_heating_local
    assert math.isclose(cfg.sigma, 3.5e-10)
    assert math.isclose(cfg.epsilon, 23.0)
    assert math.isclose(cfg.m_r, 0.85)
    assert math.isclose(cfg.V0, 1.6)
    assert cfg.pbc is True
    # the trailing "//0 0.04..." comment leaves a single bias point
    assert cfg.V_switch == [5.0]
    assert len(cfg.t_switch) > 100
    assert math.isclose(cfg.t_switch[0], 1e-6)
    assert math.isclose(cfg.Icc, 500)
    assert math.isclose(cfg.Rs, 1e-16)
    assert cfg.log_freq == 10
    assert cfg.num_atoms_first_layer == 144
    assert cfg.num_layers_contact == 6
    assert cfg.num_atoms_contact == 864
    assert cfg.metals == ["Ti", "N"]
    assert math.isclose(cfg.t_ox, 52.6838e-10)
    assert math.isclose(cfg.A, 26.914773122e-10 * 26.6371955996e-10)
    assert math.isclose(cfg.c_p, 1.92)
    assert math.isclose(cfg.k_th_metal, 29)
    assert math.isclose(cfg.dissipation_constant, 1e-13)
    assert math.isclose(cfg.delta_t, 1e-13)
    assert math.isclose(cfg.L_char, 3.5e-10)
    # derived
    assert math.isclose(
        cfg.k_th_interface, 0.5 + (5 - 0.5) * 0.05
    )
    assert math.isclose(
        cfg.tau, cfg.k_th_interface / (3.5e-10) ** 2 / 1.92 / 1e6
    )


def test_layer_table_defaults():
    layers = default_layers()
    assert len(layers) == 5
    assert layers[0].type == "contact"
    assert layers[1].E_gen_0 == 3.93
    assert layers[3].E_gen_0 == 1.66
    assert layers[4].E_diff_3 == 2.8


def test_layer_override(tmp_path):
    p = tmp_path / "params.txt"
    p.write_text(
        "num_layers = 2\n"
        "layer_0_type = contact\n"
        "layer_0_start_x = -5\n"
        "layer_0_end_x = 1\n"
        "layer_1_E_gen_0 = 2.5\n"
        "nn_dist = 3.0 // comment\n"
    )
    cfg = parse_parameters(str(p))
    assert len(cfg.layers) == 2
    assert cfg.layers[0].start_x == -5
    assert cfg.layers[1].E_gen_0 == 2.5
    assert cfg.nn_dist == 3.0


def test_accepts_zero_values(tmp_path):
    # the reference parser rejects explicit 0.0 (input_parser.cpp:330-334);
    # we accept it
    p = tmp_path / "params.txt"
    p.write_text("Rs = 0.0\nsigma = 1e-10\n")
    cfg = parse_parameters(str(p))
    assert cfg.Rs == 0.0
    assert cfg.sigma == 1e-10
