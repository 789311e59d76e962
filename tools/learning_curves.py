"""Learning-curve parity artifacts (VERDICT r1 next-step #7).

Runs recipe x env combos to convergence on one chip, one combo per
subprocess (the axon backend degrades permanently after the first
device->host transfer; isolation keeps every run's steady state clean —
see bench.py). Each run writes a reference-format
agent_00_rank00_cumulative_rewards.dat under docs/curves/runs/<name>/ and
a JSON summary; `render` turns the .dat files into docs/curves/<name>.png
(raw episode returns at low alpha + trailing-mean line, one panel per
run) plus a combined docs/curves/summary.png.

Reference analog: the learning curves of Novati & Koumoutsakos ICML'19
reproduced by the repo recipes (BASELINE.md comparison procedure); the
.dat format is MemoryBuffer.cpp:491-513.

Usage:
  python tools/learning_curves.py            # run all combos + render
  python tools/learning_curves.py run NAME   # one combo (child mode)
  python tools/learning_curves.py render     # re-render PNGs only
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "curves")

# name -> (env, recipe, overrides, grad-step budget, wall cap s, n_envs)
#
# Budgets are sized in env-steps-per-lane: at obsPerStep=1 each lane sees
# grad_steps/n_envs env steps, so a 200-step pendulum episode needs
# ~200k grad steps per episode-per-lane at 1024 lanes. Wall cost is
# almost entirely the 2-3 jit compiles (~40-60 s each through the
# remote-compile tunnel); the training itself runs at millions of
# steps/s, so 10x more grad steps costs seconds.
COMBOS = {
    "vracer_pendulum": ("pendulum", "VRACER",
                        {"gamma": 0.99, "minTotObsNum": 65536,
                         "maxTotObsNum": 131072}, 2_000_000, 400, 1024),
    "dpg_pendulum": ("pendulum", "DPG",
                     {"gamma": 0.99, "minTotObsNum": 65536,
                      "maxTotObsNum": 131072}, 2_000_000, 400, 1024),
    # PPO.json horizon (maxTotObsNum) is 2048: min must come down with it
    "ppo_pendulum": ("pendulum", "PPO",
                     {"gamma": 0.99, "minTotObsNum": 2048},
                     30_000, 300, 64),
    # glider episodes run up to 400 steps: 3M grad steps = ~2900 env
    # steps per lane = ~7 episodes per lane
    "racer_glider": ("glider", "RACER_glider",
                     {"minTotObsNum": 65536}, 3_000_000, 500, 1024),
}


def run_combo(name):
    import numpy as np
    from smarties_tpu.runtime.trainer import Trainer
    from smarties_tpu.utils import recipes
    import importlib

    env_name, rec, over, budget, wall, n_envs = COMBOS[name]
    env = importlib.import_module(f"smarties_tpu.envs.{env_name}")
    d = dict(recipes.RECIPES[rec])
    d.update(over)
    cfg = recipes.HyperParameters.from_dict(d)
    run_dir = os.path.join(OUT, "runs", name)
    os.makedirs(run_dir, exist_ok=True)
    # truncate a previous run's rewards file (Trainer appends)
    rew = os.path.join(run_dir, "agent_00_rank00_cumulative_rewards.dat")
    if os.path.exists(rew):
        os.remove(rew)
    tr = Trainer(env, env.MDP, cfg, n_envs=n_envs, max_len=env.MAX_STEPS,
                 run_dir=run_dir, algo_cls=__import__(
                     "smarties_tpu.algos.registry",
                     fromlist=["make_learner"]).make_learner)
    t0 = time.time()
    if getattr(tr.algo, "on_policy", False):
        tr.train(budget, log_every=10 ** 9, max_wall_s=wall)
    else:
        tr.log_flush_threshold = 10 ** 9       # transfer-free steady state
        tr.warmup(chunk=16,
                  blind_sweeps=max(16, cfg.minTotObsNum // n_envs))
        tr.train_fused(budget, log_every=10 ** 9, max_wall_s=wall,
                       flush=False)
    tr._flush_logs()
    tr._rew_file.flush()
    wall_s = time.time() - t0
    ev = tr.evaluate(16, max_steps=env.MAX_STEPS)
    summary = {
        "name": name, "recipe": rec, "env": env_name,
        "grad_steps": tr.n_grad_steps, "env_steps": tr.n_env_steps,
        "episodes": sum(1 for _ in open(rew)) if os.path.exists(rew)
        else 0,
        "wall_s": round(wall_s, 1),
        "eval_mean": round(float(np.mean(ev)), 2),
        "eval_std": round(float(np.std(ev)), 2),
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


def render():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    HUE = "#3056d3"      # one hue per panel: same entity, two weights
    def has_rows(n):
        p = os.path.join(OUT, "runs", n,
                         "agent_00_rank00_cumulative_rewards.dat")
        return os.path.exists(p) and os.path.getsize(p) > 0

    runs = [n for n in COMBOS if has_rows(n)]
    if not runs:
        print("no runs to render")
        return
    fig, axes = plt.subplots(1, len(runs), figsize=(4.2 * len(runs), 3.4),
                             squeeze=False)
    for ax, name in zip(axes[0], runs):
        dat = np.loadtxt(os.path.join(
            OUT, "runs", name, "agent_00_rank00_cumulative_rewards.dat"))
        x, r = dat[:, 1], dat[:, 4]
        o = np.argsort(x, kind="stable")
        x, r = x[o], r[o]
        w = max(1, len(r) // 200)
        mean = np.convolve(r, np.ones(w) / w, mode="valid")
        ax.plot(x, r, ".", ms=2, color=HUE, alpha=0.12,
                rasterized=True)
        ax.plot(x[w - 1:], mean, color=HUE, lw=2)
        s = json.load(open(os.path.join(OUT, "runs", name,
                                        "summary.json")))
        ax.set_title(f"{name}  (eval {s['eval_mean']:+.0f}"
                     f"±{s['eval_std']:.0f})", fontsize=10)
        ax.set_xlabel("env steps")
        ax.grid(alpha=0.25, lw=0.5)
        ax.spines[["top", "right"]].set_visible(False)
        fig2, ax2 = plt.subplots(figsize=(4.6, 3.4))
        ax2.plot(x, r, ".", ms=2, color=HUE, alpha=0.12, rasterized=True)
        ax2.plot(x[w - 1:], mean, color=HUE, lw=2)
        ax2.set_title(name, fontsize=11)
        ax2.set_xlabel("env steps")
        ax2.set_ylabel("episode return")
        ax2.grid(alpha=0.25, lw=0.5)
        ax2.spines[["top", "right"]].set_visible(False)
        fig2.tight_layout()
        fig2.savefig(os.path.join(OUT, f"{name}.png"), dpi=130)
        plt.close(fig2)
    axes[0][0].set_ylabel("episode return")
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "summary.png"), dpi=130)
    print("rendered", [f"{n}.png" for n in runs], "+ summary.png")


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "run":
        run_combo(sys.argv[2])
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "render":
        render()
        return
    os.makedirs(os.path.join(OUT, "runs"), exist_ok=True)
    for name in COMBOS:
        print(f"=== {name} ===", flush=True)
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "run", name],
                           timeout=COMBOS[name][4] + 600)
        if p.returncode:
            print(f"{name}: FAILED rc={p.returncode}", flush=True)
    render()


if __name__ == "__main__":
    main()
