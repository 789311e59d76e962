"""Smoke matrix: every learner family trains without NaNs on cart-pole.

The per-algorithm learning-quality checks live in the slow/e2e tests and
docs/RESULTS.md; this matrix guards the train-step plumbing of all nine
families (the reference's full AlgoFactory surface).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from smarties_tpu.envs import cartpole
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters


def run_algo(algo_cls, env, mdp, cfg_extra=None, n_steps=40):
    d = dict(minTotObsNum=256, maxTotObsNum=1024, batchSize=24,
             nnLayerSizes=[24], encoderLayerSizes=[24], explNoise=0.3,
             targetDelay=1e-3)
    d.update(cfg_extra or {})
    cfg = HyperParameters(**d)
    tr = Trainer(env, mdp, cfg, n_envs=8, n_slots=64, max_len=128,
                 algo_cls=algo_cls)
    tr.warmup(chunk=16) if not getattr(tr, "on_policy", False) else None
    tr.train(n_steps, log_every=10**9)
    assert tr.n_grad_steps >= n_steps
    leaves = jnp.concatenate([jnp.ravel(x) for x in
                              __import__("jax").tree_util.tree_leaves(
                                  tr.params)])
    assert bool(jnp.isfinite(leaves).all()), "non-finite params"
    return tr


class TestAllAlgos:
    def test_vracer(self):
        from smarties_tpu.algos.vracer import VRacer
        run_algo(VRacer, cartpole, cartpole.MDP)

    def test_racer_gaussian(self):
        from smarties_tpu.algos.vracer import Racer
        run_algo(Racer, cartpole, cartpole.MDP)

    def test_racer_discrete(self):
        from smarties_tpu.algos.vracer import VRacer
        run_algo(VRacer, cartpole.discrete, cartpole.discrete.MDP)

    def test_dqn(self):
        from smarties_tpu.algos.dqn import DQN
        run_algo(DQN, cartpole.discrete, cartpole.discrete.MDP,
                 {"learner": "DQN", "clipImpWeight": 0.0})

    def test_dqn_refer_retrace(self):
        from smarties_tpu.algos.dqn import DQN
        run_algo(DQN, cartpole.discrete, cartpole.discrete.MDP,
                 {"learner": "DQN", "clipImpWeight": 4.0,
                  "returnsEstimator": "retrace"})

    def test_naf(self):
        from smarties_tpu.algos.naf import NAF
        run_algo(NAF, cartpole, cartpole.MDP,
                 {"learner": "NAF", "returnsEstimator": "retrace"})

    def test_naf_gaussian_advantage(self):
        # NAF_ADV_GAUS compile-switch analog (DEVIATIONS #21)
        from smarties_tpu.algos.naf import NAF
        run_algo(NAF, cartpole, cartpole.MDP,
                 {"learner": "NAF", "returnsEstimator": "retrace",
                  "nafAdvGaussian": True})

    def test_dpg(self):
        from smarties_tpu.algos.dpg import DPG
        run_algo(DPG, cartpole, cartpole.MDP,
                 {"learner": "DPG", "returnsEstimator": "retrace"})

    def test_ppo(self):
        from smarties_tpu.algos.ppo import PPO
        run_algo(PPO, cartpole, cartpole.MDP,
                 {"learner": "PPO", "clipImpWeight": 0.2,
                  "maxTotObsNum": 512, "obsPerStep": 6.4})

    def test_ppo_standard(self):
        # standard PPO-clip mode (DEVIATIONS #20)
        from smarties_tpu.algos.ppo import PPO
        run_algo(PPO, cartpole, cartpole.MDP,
                 {"learner": "PPO", "clipImpWeight": 0.2,
                  "maxTotObsNum": 512, "obsPerStep": 6.4,
                  "ppoStandard": True})

    def test_acer(self):
        from smarties_tpu.algos.acer import ACER
        run_algo(ACER, cartpole, cartpole.MDP,
                 {"learner": "ACER", "clipImpWeight": 5.0}, n_steps=20)

    def test_mixedpg(self):
        from smarties_tpu.algos.mixedpg import MixedPG
        run_algo(MixedPG, cartpole, cartpole.MDP, {"learner": "MixedPG"})

    def test_cma(self):
        from smarties_tpu.algos.cma import CMAES
        cfg = HyperParameters(learner="CMA", ESpopSize=4, batchSize=2,
                              explNoise=0.1, nnLayerSizes=[16],
                              learnrate=0.02)
        cma = CMAES(cartpole, cartpole.MDP, cfg, n_envs=8, max_len=64)
        cma.train(2, log_every=10)
        assert bool(jnp.isfinite(cma.state.mean).all())

    def test_lstm_vracer(self):
        from smarties_tpu.algos.vracer import VRacer
        run_algo(VRacer, cartpole, cartpole.MDP,
                 {"nnType": "LSTM", "nnBPTTseq": 8})

    def test_gru_vracer(self):
        from smarties_tpu.algos.vracer import VRacer
        run_algo(VRacer, cartpole, cartpole.MDP,
                 {"nnType": "GRU", "nnBPTTseq": 8})

    # Recurrent paths for the non-RACER families (the reference's Builder
    # gives every learner LSTM/GRU nets; here DQN/NAF carry the recurrence
    # in the single net, DPG/PPO in the shared encoder trunk).
    def test_lstm_dqn(self):
        from smarties_tpu.algos.dqn import DQN
        run_algo(DQN, cartpole.discrete, cartpole.discrete.MDP,
                 {"learner": "DQN", "clipImpWeight": 4.0,
                  "nnType": "LSTM", "nnBPTTseq": 8})

    def test_lstm_dqn_1step_target(self):
        from smarties_tpu.algos.dqn import DQN
        run_algo(DQN, cartpole.discrete, cartpole.discrete.MDP,
                 {"learner": "DQN", "clipImpWeight": 0.0,
                  "returnsEstimator": "none",
                  "nnType": "LSTM", "nnBPTTseq": 8})

    def test_gru_naf(self):
        from smarties_tpu.algos.naf import NAF
        run_algo(NAF, cartpole, cartpole.MDP,
                 {"learner": "NAF", "returnsEstimator": "retrace",
                  "nnType": "GRU", "nnBPTTseq": 8})

    def test_lstm_dpg(self):
        from smarties_tpu.algos.dpg import DPG
        run_algo(DPG, cartpole, cartpole.MDP,
                 {"learner": "DPG", "returnsEstimator": "retrace",
                  "nnType": "LSTM", "nnBPTTseq": 8})

    def test_lstm_dpg_1step_target(self):
        from smarties_tpu.algos.dpg import DPG
        run_algo(DPG, cartpole, cartpole.MDP,
                 {"learner": "DPG", "returnsEstimator": "none",
                  "nnType": "LSTM", "nnBPTTseq": 8})

    def test_lstm_ppo(self):
        from smarties_tpu.algos.ppo import PPO
        run_algo(PPO, cartpole, cartpole.MDP,
                 {"learner": "PPO", "clipImpWeight": 0.2,
                  "maxTotObsNum": 512, "obsPerStep": 6.4,
                  "nnType": "LSTM", "nnBPTTseq": 8})
