#!/usr/bin/env python3
"""Raw observation-log viewer.

Reads the Engine's agent_*_obs.raw binary stream (f32 rows
[lane, status, state..., reward], runtime/engine.py; the reference analog
is bin/smarties_plot_obs.py over Agent::writeData dumps) and prints
per-dimension statistics or dumps a CSV slice.
"""
import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file", help="agent_*_obs.raw path")
    ap.add_argument("--dim-state", type=int, required=True)
    ap.add_argument("--csv", type=int, default=0,
                    help="print the first N rows as CSV")
    args = ap.parse_args()

    row_len = 2 + args.dim_state + 1
    data = np.fromfile(args.file, np.float32)
    if data.size % row_len:
        print(f"warning: {data.size % row_len} trailing floats ignored",
              file=sys.stderr)
        data = data[:data.size - data.size % row_len]
    rows = data.reshape(-1, row_len)
    print(f"{rows.shape[0]} records, {args.dim_state} state dims")
    if args.csv:
        hdr = ["lane", "status"] + [f"s{i}" for i in
                                    range(args.dim_state)] + ["reward"]
        print(",".join(hdr))
        for r in rows[:args.csv]:
            print(",".join(f"{x:.6g}" for x in r))
        return
    states = rows[:, 2:-1]
    print("state dim:  mean      std       min       max")
    for i in range(args.dim_state):
        c = states[:, i]
        print(f"  s{i:<3d}  {c.mean():9.4f} {c.std():9.4f} "
              f"{c.min():9.4f} {c.max():9.4f}")
    r = rows[:, -1]
    print(f"reward  {r.mean():9.4f} {r.std():9.4f} {r.min():9.4f} "
          f"{r.max():9.4f}")
    status = rows[:, 1].astype(int)
    for s, name in ((0, "INIT"), (1, "CONT"), (2, "TERM"), (3, "LAST")):
        print(f"{name}: {(status == s).sum()}")


if __name__ == "__main__":
    main()
