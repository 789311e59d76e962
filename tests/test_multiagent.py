"""Multi-agent env training (predator-prey, competing agents).

Reference analog: apps/predator_prey + apps/cart_pole_many
(SURVEY.md section 2.8) — multiple agent lanes per env feed the shared
learner through the same replay.
"""
import numpy as np
import pytest

from smarties_tpu.envs import predator_prey as pp
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters


class TestPredatorPrey:
    def test_lanes_and_training(self):
        cfg = HyperParameters(minTotObsNum=1024, maxTotObsNum=8192,
                              batchSize=64, nnLayerSizes=[32, 32],
                              gamma=0.99)
        tr = Trainer(pp, pp.MDP, cfg, n_envs=16, n_slots=256,
                     max_len=pp.MAX_STEPS)
        tr.warmup(chunk=32)
        tr.train(200, log_every=10**9)
        assert tr.n_grad_steps >= 200
        rs = tr.replay
        assert int(rs.n_stored_eps()) > 0
        assert np.isfinite(float(rs.beta))

    def test_env_rewards_are_zero_sum(self):
        import jax
        import jax.numpy as jnp
        st = pp.init(jax.random.PRNGKey(0), 8)
        a = jnp.ones((8, 2)) * 0.5
        _, r, _, _ = pp.step(st, a)
        r = np.asarray(r).reshape(-1, 2)
        np.testing.assert_allclose(r[:, 0] + r[:, 1], 0.0, atol=1e-6)
