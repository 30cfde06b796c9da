#!/usr/bin/env python
"""Statistical KMC-trajectory cross-validation against the reference binary.

The deterministic field-level cross-validation (tests/test_cross_validation.py)
compares solver outputs on identical states.  This tool compares the
*stochastic* side: fixed-seed ensembles of full KMC runs of both codes on the
reference's scenario-1 device (perturb_structure = 1, Vd = 20 V), whose RNG
streams are different by construction (std::mt19937 vs threefry), so the
comparison is statistical — per-superstep species-count distributions and
KMC-clock advance across seeds.

Usage:
  python tools/cross_stats.py ref   SEED OUTDIR   # one reference run (slow,
                                                  # ~100 s/superstep on CPU)
  python tools/cross_stats.py mine  SEED OUTDIR   # one devicekmc_tpu run
  python tools/cross_stats.py report DIR_A DIR_B [...]
        # aggregate output.txt files found under the listed run dirs, split
        # by code (ref*/mine* prefix of the directory name), print the
        # per-step comparison table and overlap verdicts

The recorded report for the committed ensemble lives in
docs/cross_validation_stats.md.

Reference inputs: /root/reference/depreciated/tests/1-potential
(9030 sites; src driver semantics in kmc_main.cpp).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = "/root/reference/depreciated/tests/1-potential"
REF_BIN = os.path.join(REPO, "refbuild", "bin", "runKMC")
T_SWITCH = "1.5e-13"   # the scenario's own window: ~5-10 supersteps at Vd=20

SPECIES_KEYS = [
    "Charged vacancies", "Uncharged vacancies",
    "Charged oxygen ions", "Uncharged oxygen ions",
]


def _write_params(outdir: str, seed: int):
    src = open(os.path.join(REF_DIR, "parameters.txt")).read()
    src = src.replace("rnd_seed = 1", f"rnd_seed = {seed}")
    src = src.replace("t_switch = 1.5e-13", f"t_switch = {T_SWITCH}")
    src += "\nperturb_structure = 1\n"
    # devicekmc_tpu threads the KMC event stream from rnd_seed_kmc; the
    # reference parser ignores the unknown key
    src += f"rnd_seed_kmc = {seed}\n"
    with open(os.path.join(outdir, "parameters.txt"), "w") as f:
        f.write(src)
    shutil.copy(
        os.path.join(REF_DIR, "snapshot_init.xyz"),
        os.path.join(outdir, "snapshot_init.xyz"),
    )


def run_ref(seed: int, outdir: str):
    os.makedirs(outdir, exist_ok=True)
    _write_params(outdir, seed)
    with open(os.path.join(outdir, "run.log"), "w") as log:
        subprocess.run(
            [REF_BIN, "parameters.txt"], cwd=outdir, stdout=log,
            stderr=subprocess.STDOUT, check=True,
        )


def run_mine(seed: int, outdir: str):
    os.makedirs(outdir, exist_ok=True)
    _write_params(outdir, seed)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    sys.path.insert(0, REPO)
    from devicekmc_tpu.config import parse_parameters
    from devicekmc_tpu.engine import Simulation

    cfg = parse_parameters(os.path.join(outdir, "parameters.txt"))
    cfg.output_dir = outdir
    # the reference CPU path pins num_atoms_contact per side
    cfg.bc_pinned_width = "full_contact"
    here = os.getcwd()
    os.chdir(outdir)
    try:
        sim = Simulation(cfg)
        sim.run()
    finally:
        os.chdir(here)


def _collect(dirs):
    sys.path.insert(0, REPO)
    from devicekmc_tpu.postprocessing.parse import parse_output

    runs = []
    for d in dirs:
        p = os.path.join(d, "output.txt")
        if not os.path.exists(p):
            print(f"  (skipping {d}: no output.txt)")
            continue
        tr = parse_output(p)
        bp = tr.bias_points[0]
        rec = {k: bp.get(k) for k in SPECIES_KEYS}
        rec["kmc_time"] = np.asarray(bp.kmc_time)
        rec["dir"] = d
        runs.append(rec)
    return runs


def _zcmp(a, b):
    """(z, divergent?) for two 1-D samples; integer counts tolerate |Δmean|<=2."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    z = abs(a.mean() - b.mean()) / max(se, 1e-12)
    return a, b, z


def report(dirs):
    ref_runs = _collect([d for d in dirs if "ref" in os.path.basename(d)])
    my_runs = _collect([d for d in dirs if "mine" in os.path.basename(d)])
    if not ref_runs or not my_runs:
        print("need both ref* and mine* run dirs")
        return 1
    # Supersteps are stochastic in count (every run integrates the same
    # KMC-time window t_switch, crossing it in a seed-dependent number of
    # steps).  Per-step stats use every run that reached that step, down to a
    # floor of 3 samples per side; end-of-window stats use all runs.
    MIN_SAMPLES = 3

    def _have(runs, s):
        return [r for r in runs if len(r["kmc_time"]) > s]

    n_steps = 0
    while (len(_have(ref_runs, n_steps)) >= MIN_SAMPLES
           and len(_have(my_runs, n_steps)) >= MIN_SAMPLES):
        n_steps += 1
    print(f"# {len(ref_runs)} reference runs x {len(my_runs)} devicekmc_tpu "
          f"runs; per-step stats over runs reaching each step "
          f"(>= {MIN_SAMPLES}/side, {n_steps} steps)\n")
    ok = True
    # Informational per-step-index table.  Step index is NOT equal physical
    # time (each code advances the KMC clock by a seed- and stream-dependent
    # amount per superstep), so no divergence verdict is drawn here — the
    # time-aligned table below is the apples-to-apples one.
    for key in SPECIES_KEYS:
        print(f"## {key} (by step index, informational)")
        print("step |  n_r |  n_m |   ref mean+-sd    |  mine mean+-sd    | z")
        for s in range(n_steps):
            ra = _have(ref_runs, s)
            rb = _have(my_runs, s)
            a, b, z = _zcmp([r[key][s] for r in ra], [r[key][s] for r in rb])
            print(f"{s:4d} | {len(ra):4d} | {len(rb):4d} | "
                  f"{a.mean():8.2f} +- {a.std(ddof=1):5.2f} | "
                  f"{b.mean():8.2f} +- {b.std(ddof=1):5.2f} | {z:5.2f}")
        print()

    # Time-aligned comparison: sample each trajectory (a step function of
    # kmc_time) at fixed fractions of the integration window.  This is the
    # statistically meaningful comparison — same elapsed physical time on
    # both sides, every run contributes at every checkpoint.
    t_switch = float(T_SWITCH)

    def _at_time(run, key, t):
        kt = np.asarray(run["kmc_time"], dtype=float)
        idx = np.searchsorted(kt, t, side="left")
        vals = np.asarray(run[key], dtype=float)
        if idx >= len(vals):
            idx = len(vals) - 1
        return vals[idx]

    fracs = [0.25, 0.5, 0.75, 1.0]
    for key in SPECIES_KEYS:
        print(f"## {key} (at fixed kmc_time)")
        print("t/t_sw |   ref mean+-sd    |  mine mean+-sd    | z")
        for fr in fracs:
            t = fr * t_switch
            a, b, z = _zcmp([_at_time(r, key, t) for r in ref_runs],
                            [_at_time(r, key, t) for r in my_runs])
            flag = "" if (z < 4 or abs(a.mean() - b.mean()) <= 2) else "  <-- DIVERGENT"
            if flag:
                ok = False
            print(f"{fr:6.2f} | {a.mean():8.2f} +- {a.std(ddof=1):5.2f} | "
                  f"{b.mean():8.2f} +- {b.std(ddof=1):5.2f} | {z:5.2f}{flag}")
        print()
    # End-of-window ensemble statistics: every run stops at kmc_time >=
    # t_switch, so the final state and the number of supersteps needed to get
    # there are directly comparable across all runs of both codes.
    print("## end of window (kmc_time >= t_switch), all runs")
    print("quantity              |   ref mean+-sd    |  mine mean+-sd    | z")
    for key in SPECIES_KEYS:
        a, b, z = _zcmp([r[key][-1] for r in ref_runs],
                        [r[key][-1] for r in my_runs])
        flag = "" if (z < 4 or abs(a.mean() - b.mean()) <= 2) else "  <-- DIVERGENT"
        if flag:
            ok = False
        print(f"{key:21s} | {a.mean():8.2f} +- {a.std(ddof=1):5.2f} | "
              f"{b.mean():8.2f} +- {b.std(ddof=1):5.2f} | {z:5.2f}{flag}")
    a, b, z = _zcmp([len(r["kmc_time"]) for r in ref_runs],
                    [len(r["kmc_time"]) for r in my_runs])
    flag = "" if (z < 4 or abs(a.mean() - b.mean()) <= 2) else "  <-- DIVERGENT"
    if flag:
        ok = False
    print(f"{'supersteps to cross':21s} | {a.mean():8.2f} +- {a.std(ddof=1):5.2f} | "
          f"{b.mean():8.2f} +- {b.std(ddof=1):5.2f} | {z:5.2f}{flag}")
    # KMC clock advance per superstep (log-scale: spans decades)
    print("\n## log10(kmc_time) at first superstep")
    a = np.log10([max(r["kmc_time"][0], 1e-300) for r in ref_runs])
    b = np.log10([max(r["kmc_time"][0], 1e-300) for r in my_runs])
    print(f"ref  {a.mean():7.3f} +- {a.std(ddof=1):5.3f}   "
          f"mine {b.mean():7.3f} +- {b.std(ddof=1):5.3f}")
    if abs(a.mean() - b.mean()) > 3 * max(a.std(ddof=1), b.std(ddof=1), 0.3):
        ok = False
        print("  <-- DIVERGENT")
    print("\nVERDICT:", "overlapping (statistical parity)" if ok
          else "DIVERGENT — investigate")
    return 0 if ok else 2


def main():
    mode = sys.argv[1]
    if mode == "ref":
        run_ref(int(sys.argv[2]), sys.argv[3])
    elif mode == "mine":
        run_mine(int(sys.argv[2]), sys.argv[3])
    elif mode == "report":
        return report(sys.argv[2:])
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
