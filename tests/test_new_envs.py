"""New JAX envs (r3): acrobot, continuous mountain-car, pixel Catch.

Classic-control coverage matching the reference's gym adapter surface
(reference bin/smarties.py:30-43); Catch is the conv-pipeline proof env
(stands in for apps/OpenAI_gym_atari — no ALE in this image).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smarties_tpu.envs import acrobot, catch, mountaincar
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters


def small_cfg(**kw):
    d = dict(minTotObsNum=256, maxTotObsNum=2048, batchSize=24,
             nnLayerSizes=[24], explNoise=0.4)
    d.update(kw)
    return HyperParameters(**d)


class TestAcrobot:
    def test_dynamics_match_gym_semantics(self):
        """Energy pumping with constant torque raises the tip; zero
        torque from rest stays near the stable equilibrium."""
        s = acrobot.init(jax.random.PRNGKey(0), 4)
        a_zero = jnp.full((4, 1), 1.0)       # label 1 -> torque 0
        s2 = s
        for _ in range(20):
            s2, r, d, t = acrobot.step(s2, a_zero)
        assert float(jnp.abs(s2.u[:, 0]).max()) < 0.5   # still hanging
        assert float(r.min()) == -1.0

    def test_racer_trains(self):
        tr = Trainer(acrobot, acrobot.MDP, small_cfg(), n_envs=8,
                     n_slots=64, max_len=acrobot.MAX_STEPS)
        tr.warmup(chunk=16)
        tr.train(40, log_every=10**9)
        leaves = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(tr.params)])
        assert bool(jnp.isfinite(leaves).all())


class TestMountainCar:
    def test_underpowered(self):
        """Full constant throttle alone cannot climb the hill (the env's
        defining property — requires momentum pumping)."""
        s = mountaincar.init(jax.random.PRNGKey(0), 4)
        a = jnp.ones((4, 1))
        for _ in range(300):
            s, r, d, t = mountaincar.step(s, a)
        assert float(s.u[:, 0].max()) < mountaincar.GOAL_POS

    def test_pumping_solves(self):
        """Bang-bang force in the direction of velocity escapes."""
        s = mountaincar.init(jax.random.PRNGKey(0), 4)
        solved = np.zeros(4, bool)
        for _ in range(400):
            v = np.asarray(s.u[:, 1])
            a = jnp.asarray(np.where(v >= 0, 1.0, -1.0)[:, None])
            s, r, d, t = mountaincar.step(s, a)
            solved |= np.asarray(t)
        assert solved.all()

    def test_vracer_trains(self):
        tr = Trainer(mountaincar, mountaincar.MDP, small_cfg(), n_envs=8,
                     n_slots=64, max_len=256)
        tr.warmup(chunk=16)
        tr.train(40, log_every=10**9)
        leaves = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(tr.params)])
        assert bool(jnp.isfinite(leaves).all())


class TestCatch:
    def test_optimal_policy_scores_one(self):
        s = catch.init(jax.random.PRNGKey(1), 8)
        ret = np.zeros(8)
        for _ in range(catch.MAX_STEPS + 1):
            d = np.sign((np.asarray(s.ball_col) + catch.BALL // 2)
                        - (np.asarray(s.paddle_col) + catch.PADDLE // 2))
            a = jnp.asarray((d + 1).astype("int32")).reshape(8, 1)
            s, r, done, term = catch.step(s, a)
            ret += np.asarray(r)
            if bool(done.all()):
                break
        assert (ret == 1.0).all()

    def test_racer_conv_uint8_trains(self):
        """Tiny conv recipe through the full uint8-replay pipeline
        (frame stacking + conv + ReF-ER) — the fast CPU version of the
        RACER_atari-style run recorded in docs/RESULTS.md."""
        cfg = HyperParameters(minTotObsNum=128, maxTotObsNum=1024,
                              batchSize=8, nnLayerSizes=[32],
                              gamma=0.99)
        tr = Trainer(catch, catch.MDP, cfg, n_envs=4, n_slots=32,
                     max_len=catch.MAX_STEPS, state_dtype=jnp.uint8)
        tr.warmup(chunk=8)
        assert tr.replay.states.dtype == jnp.uint8
        tr.train(10, log_every=10**9)
        leaves = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(tr.params)])
        assert bool(jnp.isfinite(leaves).all())
