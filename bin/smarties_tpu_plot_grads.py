#!/usr/bin/env python3
"""Gradient-moment dump viewer.

Reads grads_rank*.raw written by the Trainer (f32 rows
[grad_step, grad_norm, grad_max]; the reference analog is
bin/smarties_plot_grads.py over Utils/StatsTracker grads_*.raw dumps)
and prints a table or plots norm/max vs grad step.
"""
import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file", help="grads_rank*.raw path")
    ap.add_argument("--plot", action="store_true",
                    help="matplotlib plot instead of a table")
    args = ap.parse_args()

    data = np.fromfile(args.file, np.float32)
    if data.size % 3:
        print(f"warning: {data.size % 3} trailing floats ignored",
              file=sys.stderr)
        data = data[:data.size - data.size % 3]
    rows = data.reshape(-1, 3)
    if rows.size == 0:
        print("empty dump")
        return
    if args.plot:
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.semilogy(rows[:, 0], rows[:, 1], label="|grad|")
        ax.semilogy(rows[:, 0], rows[:, 2], label="max|g_i|")
        ax.set_xlabel("grad step")
        ax.legend()
        plt.show()
        return
    print(f"{'step':>10s} {'grad_norm':>12s} {'grad_max':>12s}")
    for r in rows:
        print(f"{int(r[0]):>10d} {r[1]:>12.5g} {r[2]:>12.5g}")


if __name__ == "__main__":
    main()
