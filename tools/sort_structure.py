#!/usr/bin/env python
"""Reorder an xyz structure so that the Dirichlet boundary sites sit at the
beginning/end of the file (the solvers' positional convention) — the
framework equivalent of the reference's sort_crossbar.py.

Modes:
  x        sort every site by x (ties: y, z) — puts the min-x contact plane
           first and the max-x plane last
  contacts keep the relative order, but move the sites with x <= --left-cut
           to the front and x >= --right-cut to the back (crossbar
           wordline/bitline style)

Usage:
  python tools/sort_structure.py in.xyz out.xyz [--mode x|contacts]
         [--left-cut X0] [--right-cut X1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from devicekmc_tpu.structure import read_xyz, write_xyz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("outfile")
    ap.add_argument("--mode", default="x", choices=["x", "contacts"])
    ap.add_argument("--left-cut", type=float, default=None)
    ap.add_argument("--right-cut", type=float, default=None)
    args = ap.parse_args()

    elems, coords = read_xyz(args.infile)
    if args.mode == "x":
        order = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    else:
        x = coords[:, 0]
        lo = args.left_cut if args.left_cut is not None else np.quantile(x, 0.05)
        hi = args.right_cut if args.right_cut is not None else np.quantile(x, 0.95)
        left = np.nonzero(x <= lo)[0]
        right = np.nonzero(x >= hi)[0]
        mid = np.nonzero((x > lo) & (x < hi))[0]
        order = np.concatenate([left, mid, right])

    write_xyz(args.outfile, elems[order], coords[order])
    print(f"wrote {args.outfile}: {len(elems)} sites "
          f"(first x={coords[order[0],0]:.3f}, last x={coords[order[-1],0]:.3f})")


if __name__ == "__main__":
    main()
