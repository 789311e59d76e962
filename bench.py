"""Headline benchmark: V-RACER on vectorized JAX cart-pole, single chip.

Headline: the FUSED actor-learner loop at the reference's obsPerStep=1
pacing — each cycle is one XLA program doing an env sweep (1024 obs),
at-ingest Retrace, and the matching 1024 ReF-ER grad steps. Extras measure
the decoupled rollout / train throughputs (best-effort: skipped if the
wall-clock budget runs low — first compiles through the remote-compile
tunnel can take minutes).

The reference publishes no absolute throughput (BASELINE.md): vs_baseline
is reported against this framework's first recorded round (r1 == 1.0).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import time

import numpy as np

BUDGET_S = 480.0  # leave headroom under typical driver limits


def main():
    import jax
    from smarties_tpu.envs import cartpole
    from smarties_tpu.runtime.trainer import Trainer
    from smarties_tpu.utils.config import HyperParameters

    t_start = time.time()

    def left():
        return BUDGET_S - (time.time() - t_start)

    N_ENVS = 1024
    cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                          batchSize=256, obsPerStep=1.0,
                          nnLayerSizes=[128, 128])
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=N_ENVS, n_slots=4096,
                 max_len=cartpole.MAX_STEPS)

    # ---- warmup (compiles the rollout path) ----
    tr.warmup(chunk=16, adaptive=False)

    # ---- headline: fused combined loop ----
    # pre-warm the fused program + the 1000-step refresh (first call pays
    # the compiles; the timed phase below is all steady state and takes
    # only a few seconds, so it is never wall-capped)
    tr.train_fused(3 * N_ENVS, log_every=10**9)
    g0, e0 = tr.n_grad_steps, tr.n_env_steps
    t0 = time.perf_counter()
    tr.train_fused(8 * N_ENVS, log_every=10**9)
    dt = time.perf_counter() - t0
    loop_grad_s = (tr.n_grad_steps - g0) / dt
    loop_env_s = (tr.n_env_steps - e0) / dt

    extras = {
        "combined_grad_steps_per_s": round(loop_grad_s, 1),
        "n_envs": N_ENVS,
        "batch_size": cfg.batchSize,
        "device": str(jax.devices()[0]),
    }

    # ---- best-effort extras ----
    if left() > 120:
        tr._roll(16)
        jax.block_until_ready(tr.carry.replay.states)
        t0 = time.perf_counter()
        for _ in range(8):
            tr._roll(16)
        jax.block_until_ready(tr.carry.replay.states)
        extras["rollout_env_steps_per_s"] = round(
            8 * 16 * N_ENVS / (time.perf_counter() - t0), 1)
    if left() > 60:
        key = jax.random.PRNGKey(1)
        p, _, _, _ = tr._train_chunk(tr.params, tr.opt_state,
                                     tr.carry.replay, key, 100)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        p, _, _, _ = tr._train_chunk(tr.params, tr.opt_state,
                                     tr.carry.replay, key, 100)
        jax.block_until_ready(p)
        extras["train_chunk_grad_steps_per_s"] = round(
            100 / (time.perf_counter() - t0), 1)

    print(json.dumps({
        "metric": "combined_env_steps_per_s",
        "value": round(loop_env_s, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": 1.0,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
