"""Headline benchmark: V-RACER on vectorized JAX cart-pole, single chip.

Measures steady-state env-steps/s (acting + replay ingest) and grad-steps/s
(full ReF-ER train step incl. write-backs), plus the combined actor-learner
loop at obsPerStep pacing. The reference publishes no absolute throughput
(BASELINE.md): vs_baseline is reported against this framework's first
recorded round (r1 == 1.0 by definition).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import time

import numpy as np


def main():
    import jax
    from smarties_tpu.envs import cartpole
    from smarties_tpu.runtime.trainer import Trainer
    from smarties_tpu.utils.config import HyperParameters

    N_ENVS = 1024
    cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                          batchSize=256, obsPerStep=1.0,
                          nnLayerSizes=[128, 128])
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=N_ENVS, n_slots=4096,
                 max_len=cartpole.MAX_STEPS)

    # ---- warmup (also compiles the rollout path) ----
    tr.warmup(chunk=16)

    # ---- rollout throughput ----
    tr._roll(16)  # ensure compiled at this chunk size
    jax.block_until_ready(tr.carry.replay.states)
    t0 = time.perf_counter()
    n_sweeps = 8
    for _ in range(n_sweeps):
        tr._roll(16)
    jax.block_until_ready(tr.carry.replay.states)
    dt_roll = time.perf_counter() - t0
    env_steps_s = n_sweeps * 16 * N_ENVS / dt_roll

    # ---- train-step throughput ----
    key = jax.random.PRNGKey(1)
    p, o, rs, _ = tr._train_chunk(tr.params, tr.opt_state, tr.carry.replay,
                                  key, 100)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    p, o, rs, _ = tr._train_chunk(tr.params, tr.opt_state, tr.carry.replay,
                                  key, 100)
    jax.block_until_ready(p)
    dt_train = time.perf_counter() - t0
    grad_steps_s = 100 / dt_train

    # ---- combined actor-learner loop (the real training regime) ----
    # re-couple the pacing invariant: the rollout phase above ran the env
    # counter far ahead, which would let the combined phase train without
    # collecting (blockDataAcquisition would stay true)
    tr.n_env_steps = tr.n_obs_b4_start + int(
        tr.n_grad_steps * cfg.obsPerStep)
    # pre-warm every chunk shape the loop uses (train(100), roll(1),
    # refresh, fused cycle) so the timed window measures steady state
    tr.train(2200, log_every=10**9, max_wall_s=120)
    tr.n_env_steps = tr.n_obs_b4_start + int(
        tr.n_grad_steps * cfg.obsPerStep)
    tr.train_fused(2 * N_ENVS, log_every=10**9, max_wall_s=180)
    g0, e0 = tr.n_grad_steps, tr.n_env_steps
    t0 = time.perf_counter()
    tr.train_fused(8000, log_every=10**9, max_wall_s=60)
    dt = time.perf_counter() - t0
    loop_grad_s = (tr.n_grad_steps - g0) / dt
    loop_env_s = (tr.n_env_steps - e0) / dt

    result = {
        "metric": "combined_env_steps_per_s",
        "value": round(loop_env_s, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": 1.0,
        "extras": {
            "rollout_env_steps_per_s": round(env_steps_s, 1),
            "train_grad_steps_per_s": round(grad_steps_s, 1),
            "combined_grad_steps_per_s": round(loop_grad_s, 1),
            "n_envs": N_ENVS,
            "batch_size": cfg.batchSize,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
