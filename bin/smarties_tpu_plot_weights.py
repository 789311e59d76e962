#!/usr/bin/env python3
"""Weights / Adam-moment viewer over checkpoint.pkl files.

Analog of the reference's bin/smarties_plot_weights.py (which scatter-plots
the flat weights.raw / 1stMom.raw / 2ndMom.raw dumps): loads a
smarties_tpu checkpoint (Trainer.save / Engine snapshot), flattens the
parameter pytree(s), and prints per-leaf statistics or plots weights vs
Adam moments.
"""
import argparse
import pickle
import sys

import numpy as np


def _leaves(tree, prefix=""):
    """(name, np.ndarray) pairs of a params pytree, stable order."""
    if isinstance(tree, dict):
        for k in tree:
            yield from _leaves(tree[k], f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaves(v, f"{prefix}{i}.")
    else:
        yield prefix.rstrip("."), np.asarray(tree)


def _flat(tree):
    return np.concatenate([v.ravel() for _, v in _leaves(tree)]) \
        if tree is not None else None


def show_learner(tag, params, opt_state, do_plot):
    print(f"== learner {tag} ==")
    print(f"{'leaf':<28s} {'shape':>14s} {'|w|max':>10s} {'rms':>10s}")
    for name, v in _leaves(params):
        print(f"{name:<28s} {str(v.shape):>14s} "
              f"{np.abs(v).max():>10.4f} "
              f"{np.sqrt(np.mean(v * v)):>10.5f}")
    w = _flat(params)
    assert not np.isnan(w).any(), "NaN weights in checkpoint"
    m1 = m2 = None
    if opt_state is not None:
        os_ = opt_state if isinstance(opt_state, dict) else \
            getattr(opt_state, "_asdict", lambda: None)() or None
        if os_ and "m1" in os_:
            m1, m2 = _flat(os_["m1"]), _flat(os_["m2"])
            # flat-Adam states store moments as one vector already
            if m1.shape != w.shape:
                m1 = m1[:w.size]
                m2 = m2[:w.size]
            print(f"n={w.size}  |w|max={np.abs(w).max():.4f}  "
                  f"|m1|max={np.abs(m1).max():.3g}  "
                  f"m2max={m2.max():.3g}")
    if do_plot:
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3 if m1 is not None else 1,
                                 figsize=(12, 4))
        axes = np.atleast_1d(axes)
        axes[0].plot(w, "o", ms=1)
        axes[0].set_title(f"weights ({tag})")
        if m1 is not None:
            axes[1].plot(m1, "o", ms=1)
            axes[1].set_title("1st moment")
            axes[2].semilogy(np.maximum(m2, 1e-20), "o", ms=1)
            axes[2].set_title("2nd moment")
        plt.tight_layout()
        plt.show()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="checkpoint.pkl path")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    with open(args.checkpoint, "rb") as f:
        snap = pickle.load(f)
    if "learners" in snap:          # multi-learner Engine snapshot
        for i, s in enumerate(snap["learners"]):
            show_learner(str(i), s["params"], s.get("opt_state"),
                         args.plot)
    else:
        show_learner("0", snap["params"], snap.get("opt_state"),
                     args.plot)


if __name__ == "__main__":
    main()
