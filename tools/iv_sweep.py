#!/usr/bin/env python
"""Cross-code I-V forming-sweep comparison against the reference binary.

Extends the single-bias statistical cross-validation (tools/cross_stats.py,
docs/cross_validation_stats.md) to BASELINE.md's north star: a multi-bias
forming sweep on the 9,030-site scenario-2 device with the full field stack
(potential + transport + global heating), comparing the two codes' I-V
curves and temperature/current timelines at matched KMC times across
fixed-seed ensembles.

The two codes' RNG streams differ by construction (reference:
compile-time-seeded std::mt19937, src/structure_input.h:8 + random_num.h;
ours: jax.random threefry), so individual trajectories cannot match
bitwise and the comparison is distributional: per-bias-point end-of-window
current/temperature/species statistics and within-window timelines sampled
at fixed fractions of each bias window.

Usage:
  python tools/iv_sweep.py ref  SEED OUTDIR   # one reference sweep run
        # SEED=1 uses the stock refbuild/bin/runKMC; SEED=N uses the
        # patched-seed binary /tmp/refsrc_seedN/bin_runKMC (built by
        # rebuilding the reference out-of-tree with structure_input.h's
        # compile-time rnd_seed_kmc set to N — the parameters.txt rnd_seed
        # is ignored by the reference KMC stream, verified in round 2).
  python tools/iv_sweep.py mine SEED OUTDIR [cpu|tpu]
  python tools/iv_sweep.py report RUNS_DIR [--plot OUT.png]
        # aggregates ref*/ and mine*/ subdirectories of RUNS_DIR

Reference driver semantics being exercised: the V_switch/t_switch bias-point
loop of /root/reference/src/kmc_main.cpp:150-280 with solve_current
(current_solver.cpp) and solve_heating_global (heat_solver.cpp) enabled.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = "/root/reference/depreciated/tests/2-globaltemp"
STOCK_BIN = os.path.join(REPO, "refbuild", "bin", "runKMC")

# The sweep: five forming bias points with per-bias windows sized to ~3
# supersteps each (probe: the KMC clock advances ~2.5-3.4e-14 s/superstep
# across this bias range on the scenario-2 device).
V_SWITCH = "8, 10, 12, 14, 16"
T_SWITCH = "6e-14, 6e-14, 6e-14, 6e-14, 6e-14"
T_PER_BIAS = 6e-14

SPECIES_KEYS = [
    "Charged vacancies", "Uncharged vacancies",
    "Charged oxygen ions", "Uncharged oxygen ions",
]
FRACS = (0.5, 1.0)   # within-window timeline sample points (t / t_switch)


def _write_params(outdir: str, seed: int):
    src = open(os.path.join(REF_DIR, "parameters.txt")).read()
    src = src.replace("V_switch = 14", f"V_switch = {V_SWITCH}")
    src = src.replace("t_switch = 2.5e-13", f"t_switch = {T_SWITCH}")
    # Icc=3e-3 trips the reference's compliance break (kmc_main.cpp:260,
    # I_macro[uA] > Icc*1e-6) on the first transport solve; lift it so every
    # bias window runs to t_switch and the I-V curve is sampled at all biases.
    src = src.replace("Icc = 3e-3", "Icc = 1e12")
    src = src.replace("solve_heating_global = 0", "solve_heating_global = 1")
    src = src.replace("rnd_seed = 2", f"rnd_seed = {seed}")
    src += "\nperturb_structure = 1\n"
    # ours threads the KMC stream from rnd_seed_kmc; the reference parser
    # ignores the unknown key (its stream seed is compile-time)
    src += f"rnd_seed_kmc = {seed}\n"
    with open(os.path.join(outdir, "parameters.txt"), "w") as f:
        f.write(src)
    shutil.copy(os.path.join(REF_DIR, "snapshot_init.xyz"),
                os.path.join(outdir, "snapshot_init.xyz"))


def run_ref(seed: int, outdir: str):
    binpath = STOCK_BIN if seed == 1 else f"/tmp/refsrc_seed{seed}/bin_runKMC"
    if not os.path.exists(binpath):
        sys.exit(f"missing reference binary {binpath} (build_ref_seeds)")
    os.makedirs(outdir, exist_ok=True)
    _write_params(outdir, seed)
    with open(os.path.join(outdir, "run.log"), "w") as log:
        subprocess.run([os.path.abspath(binpath), "parameters.txt"],
                       cwd=outdir, stdout=log, stderr=subprocess.STDOUT,
                       check=True)


def run_mine(seed: int, outdir: str, platform: str = "cpu"):
    os.makedirs(outdir, exist_ok=True)
    outdir = os.path.abspath(outdir)
    _write_params(outdir, seed)
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from devicekmc_tpu.config import parse_parameters
    from devicekmc_tpu.engine import Simulation

    cfg = parse_parameters(os.path.join(outdir, "parameters.txt"))
    cfg.output_dir = outdir
    cfg.bc_pinned_width = "full_contact"   # match the reference CPU pinning
    here = os.getcwd()
    os.chdir(outdir)
    try:
        sim = Simulation(cfg)
        sim.run()
    finally:
        os.chdir(here)


# ---------------------------------------------------------------- report

def _collect(runs_dir):
    sys.path.insert(0, REPO)
    from devicekmc_tpu.postprocessing.parse import parse_output

    out = {"ref": [], "mine": []}
    for d in sorted(os.listdir(runs_dir)):
        full = os.path.join(runs_dir, d)
        p = os.path.join(full, "output.txt")
        kind = "ref" if d.startswith("ref") else (
            "mine" if d.startswith("mine") else None)
        if kind is None or not os.path.exists(p):
            continue
        tr = parse_output(p)
        if not tr.bias_points:
            print(f"  (skipping {d}: empty output)")
            continue
        out[kind].append((d, tr))
    return out


def _sample_at(bp, key, frac):
    """Series value at the first superstep whose clock >= frac * window."""
    t = np.asarray(bp.kmc_time, dtype=float)
    v = bp.get(key)
    if len(v) == 0:
        return np.nan
    idx = np.searchsorted(t, frac * T_PER_BIAS - 1e-30)
    idx = min(idx, len(v) - 1)
    return float(v[idx])


def _quant6(x):
    """Quantize to 6 significant digits — the reference binary's cout
    precision.  Differences below its print quantum (e.g. any T in
    [300, 300.0005) prints as "300") are unobservable in its output and
    must not feed the z-test."""
    x = np.asarray(x, float)
    with np.errstate(divide="ignore"):
        q = np.where(x == 0, 1.0,
                     10.0 ** (np.floor(np.log10(np.abs(x))) - 5))
    return np.round(x / q) * q


def _z(a, b, int_tol=0.0):
    a = _quant6(np.asarray(a, float))
    b = _quant6(np.asarray(b, float))
    se = np.sqrt(np.var(a, ddof=1) / len(a) + np.var(b, ddof=1) / len(b))
    dm = abs(a.mean() - b.mean())
    if se == 0:
        return 0.0 if dm <= int_tol else np.inf
    return dm / se


def report(runs_dir, plot=None):
    groups = _collect(runs_dir)
    n_ref, n_mine = len(groups["ref"]), len(groups["mine"])
    print(f"ensembles: ref n={n_ref}, mine n={n_mine}")
    if not n_ref or not n_mine:
        sys.exit("need both ref* and mine* runs")

    voltages = [float(v) for v in V_SWITCH.split(",")]
    keys = (["Current [uA]", "Global temperature [K]"] + SPECIES_KEYS)
    worst = 0.0
    rows_for_plot = {}
    for key in keys:
        print(f"\n## {key} (sampled at fixed kmc_time within each bias window)")
        print("   Vd | t/t_sw |    ref mean+-sd     |   mine mean+-sd     | z")
        for bi, vd in enumerate(voltages):
            for frac in FRACS:
                cols = {}
                for kind in ("ref", "mine"):
                    vals = []
                    for _, tr in groups[kind]:
                        if bi < len(tr.bias_points):
                            vals.append(_sample_at(tr.bias_points[bi], key, frac))
                    cols[kind] = np.asarray(
                        [v for v in vals if np.isfinite(v)])
                if min(len(cols["ref"]), len(cols["mine"])) < 2:
                    continue
                int_tol = 2.0 if key in SPECIES_KEYS else 0.0
                z = _z(cols["ref"], cols["mine"], int_tol)
                worst = max(worst, 0.0 if np.isinf(z) else z)
                print(f"  {vd:4.0f} | {frac:5.2f}  | "
                      f"{cols['ref'].mean():9.2f} +- {cols['ref'].std(ddof=1):7.2f} | "
                      f"{cols['mine'].mean():9.2f} +- {cols['mine'].std(ddof=1):7.2f} | "
                      f"{z:5.2f}")
                if key == "Current [uA]" and frac == 1.0:
                    rows_for_plot[vd] = (cols["ref"], cols["mine"])
    print(f"\nworst z across all cells: {worst:.2f}  "
          f"({'OVERLAP' if worst < 4 else 'DIVERGENT'} at |z|<4)")

    if plot:
        _plot_iv(rows_for_plot, plot, n_ref, n_mine)
    return worst


def _plot_iv(rows, path, n_ref, n_mine):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vds = sorted(rows)
    fig, ax = plt.subplots(figsize=(6.4, 4.4))
    for kind, color, label, off in (
            ("ref", "#555555", f"reference CPU binary (n={n_ref})", -0.07),
            ("mine", "#C3503F", f"devicekmc_tpu (n={n_mine})", 0.07)):
        idx = 0 if kind == "ref" else 1
        means = [rows[v][idx].mean() for v in vds]
        sds = [rows[v][idx].std(ddof=1) for v in vds]
        ax.errorbar([v + off for v in vds], means, yerr=sds, color=color,
                    marker="o", ms=4, capsize=3, lw=1.4, label=label)
        for v in vds:
            ax.plot([v + off] * len(rows[v][idx]), rows[v][idx], ".",
                    color=color, alpha=0.35, ms=3)
    ax.set_xlabel("applied bias $V_d$ [V]")
    ax.set_ylabel("end-of-window current [$\\mu$A]")
    ax.set_title("Forming-sweep I-V, 9030-site device (ensemble mean $\\pm$ sd)")
    ax.legend(frameon=False, fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"wrote {path}")


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "ref":
        run_ref(int(sys.argv[2]), sys.argv[3])
    elif mode == "mine":
        run_mine(int(sys.argv[2]), sys.argv[3],
                 sys.argv[4] if len(sys.argv) > 4 else "cpu")
    elif mode == "report":
        plot = None
        args = sys.argv[2:]
        if "--plot" in args:
            i = args.index("--plot")
            plot = args[i + 1]
            args = args[:i] + args[i + 2:]
        report(args[0], plot)
    else:
        sys.exit(f"unknown mode {mode}")
