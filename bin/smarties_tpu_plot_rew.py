#!/usr/bin/env python3
"""Learning-curve plotter for cumulative_rewards.dat files.

Reads the same per-episode row format the reference's
bin/smarties_plot_rew.py consumes — `[grad-step, env-step, agentID,
ep-length, return]` (MemoryBuffer.cpp:491-513) — and prints/plots
return-vs-env-steps with a sliding-window mean.
"""
import argparse
import glob
import os
import sys

import numpy as np


def load_runs(paths):
    rows = []
    for p in paths:
        for f in glob.glob(os.path.join(p, "agent_*_cumulative_rewards.dat")) \
                or ([p] if os.path.isfile(p) else []):
            rows.append(np.loadtxt(f, ndmin=2))
    return np.concatenate(rows) if rows else np.zeros((0, 5))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="run dirs or .dat files")
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--plot", action="store_true",
                    help="write learning_curve.png (needs matplotlib)")
    args = ap.parse_args()

    data = load_runs(args.runs)
    if data.shape[0] == 0:
        print("no data found", file=sys.stderr)
        sys.exit(1)
    data = data[np.argsort(data[:, 1])]
    env_steps, rets = data[:, 1], data[:, 4]
    w = min(args.window, len(rets))
    smooth = np.convolve(rets, np.ones(w) / w, mode="valid")
    for i in range(0, len(smooth), max(1, len(smooth) // 40)):
        print(f"{env_steps[i + w - 1]:>12.0f}  {smooth[i]:>10.2f}")
    print(f"final (window {w}): {smooth[-1]:.2f} over "
          f"{env_steps[-1]:.0f} env steps, {len(rets)} episodes")
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.plot(env_steps[w - 1:], smooth)
        plt.xlabel("env steps")
        plt.ylabel(f"return (window {w})")
        plt.savefig("learning_curve.png", dpi=120)
        print("wrote learning_curve.png")


if __name__ == "__main__":
    main()
