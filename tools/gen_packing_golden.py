"""Generate golden training traces guarding the replay-packing refactor.

Run BEFORE a replay-layout change (from the pre-change revision) to
capture reference trajectories, then `tests/test_packing_parity.py`
asserts the post-change code reproduces them. Covers every write-back
flavor: fused V-RACER (scatter write_back + write_next_value + commit +
refresh), interleaved DQN (train() path), ACER (windowed write-back),
PPO (on-policy horizon + clear_all), LSTM V-RACER (BPTT window gathers),
and Gaussian-advantage RACER.

CPU-only: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gen_packing_golden.py
Writes tests/golden/packing_golden.npz
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from smarties_tpu.envs import cartpole, pendulum  # noqa: E402
from smarties_tpu.runtime.trainer import Trainer  # noqa: E402
from smarties_tpu.utils.config import HyperParameters  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "packing_golden.npz")


def leaves_vec(tree):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(tree)])


def capture(name, tr, rec):
    rs = tr.replay
    rec[f"{name}/params"] = leaves_vec(tr.params)
    rec[f"{name}/beta"] = np.asarray(rs.beta)
    rec[f"{name}/n_far"] = np.asarray(jnp.sum(rs.far_count))
    rec[f"{name}/n_stored"] = np.asarray(rs.n_stored_steps())
    mask = np.asarray(rs.valid_steps())
    rec[f"{name}/qret_sum"] = np.asarray(
        jnp.sum(jnp.where(rs.valid_steps(), rs.qret, 0.0)))
    rec[f"{name}/rho_sum"] = np.asarray(
        jnp.sum(jnp.where(rs.valid_steps(), rs.rho, 0.0)))
    rec[f"{name}/value_sum"] = np.asarray(
        jnp.sum(jnp.where(rs.valid_steps(), rs.value, 0.0)))
    del mask


def build(env, mdp, algo_cls=None, **cfg_extra):
    d = dict(minTotObsNum=256, maxTotObsNum=1024, batchSize=24,
             nnLayerSizes=[24], encoderLayerSizes=[24], explNoise=0.3,
             targetDelay=1e-3, randSeed=3)
    d.update(cfg_extra)
    cfg = HyperParameters(**d)
    return Trainer(env, mdp, cfg, n_envs=8, n_slots=64, max_len=128,
                   algo_cls=algo_cls)


def main():
    rec = {}

    # 1) fused V-RACER (the headline path): warmup + fused cycles
    tr = build(cartpole, cartpole.MDP)
    tr.warmup(chunk=16)
    tr.train_fused(96, log_every=10 ** 9)
    capture("vracer_fused", tr, rec)

    # 2) interleaved train() path, discrete DQN + retrace ReF-ER
    from smarties_tpu.algos.dqn import DQN
    tr = build(cartpole.discrete, cartpole.discrete.MDP, DQN,
               learner="DQN", clipImpWeight=4.0,
               returnsEstimator="retrace")
    tr.warmup(chunk=16)
    tr.train(80, log_every=10 ** 9)
    capture("dqn_train", tr, rec)

    # 3) ACER windowed write-back (continuous pendulum)
    from smarties_tpu.algos.acer import ACER
    tr = build(pendulum, pendulum.MDP, ACER, learner="ACER",
               clipImpWeight=5.0)
    tr.warmup(chunk=16)
    tr.train(24, log_every=10 ** 9)
    capture("acer", tr, rec)

    # 4) PPO on-policy horizon cycle + clear_all
    from smarties_tpu.algos.ppo import PPO
    tr = build(cartpole, cartpole.MDP, PPO, learner="PPO",
               clipImpWeight=0.2, maxTotObsNum=512, obsPerStep=6.4)
    tr.train(48, log_every=10 ** 9)
    capture("ppo", tr, rec)

    # 5) LSTM V-RACER (BPTT windows + recurrent acting)
    tr = build(cartpole, cartpole.MDP, nnType="LSTM", nnBPTTseq=8,
               nnLayerSizes=[16])
    tr.warmup(chunk=16)
    tr.train_fused(48, log_every=10 ** 9)
    capture("vracer_rnn", tr, rec)

    # 6) Gaussian-advantage RACER
    from smarties_tpu.algos.vracer import Racer
    tr = build(cartpole, cartpole.MDP, Racer)
    tr.warmup(chunk=16)
    tr.train_fused(48, log_every=10 ** 9)
    capture("racer_gauss", tr, rec)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **rec)
    print(f"wrote {OUT}: {len(rec)} entries")
    for k in sorted(rec):
        v = rec[k]
        print(f"  {k}: shape {v.shape} sum {float(np.sum(v)):.6g}")


if __name__ == "__main__":
    main()
