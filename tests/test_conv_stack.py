"""Conv2D preprocessing + frame stacking (the Atari recipe path).

Reference: Communicator::setPreprocessingConv2d + nAppendedObs frame
stacking (apps/OpenAI_gym_atari/exec.py:93-115, Conv2D_Descriptor).
Uses a synthetic image env: the agent sees a W x W grayscale frame with a
bright column whose position encodes which discrete action yields reward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from typing import NamedTuple

from smarties_tpu.core.mdp import MDPSpec
from smarties_tpu.models.net import Conv2DDesc, NetSpec, apply_net, \
    init_params
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters

W = 12


class ImgEnvState(NamedTuple):
    col: jnp.ndarray    # [V] bright-column position in {0,1}
    step: jnp.ndarray   # [V]


class imgenv:
    MDP = MDPSpec(dim_state=W * W, dim_action=1, discrete_values=(2,),
                  n_appended_obs=1,
                  conv_layers=((W, W, 2, 4, 4, 2), (5, 5, 4, 8, 3, 2)))
    MAX_STEPS = 16

    @staticmethod
    def init(key, n):
        return ImgEnvState(col=jax.random.randint(key, (n,), 0, 2),
                           step=jnp.zeros((n,), jnp.int32))

    @staticmethod
    def observe(st):
        n = st.col.shape[0]
        img = jnp.zeros((n, W, W))
        colpos = jnp.where(st.col == 0, 2, W - 3)
        img = img.at[jnp.arange(n), :, :].set(0.1)
        onehot = (jnp.arange(W)[None, :] == colpos[:, None])
        img = jnp.where(onehot[:, None, :], 1.0, img)
        return img.reshape(n, -1)

    @staticmethod
    def step(st, env_act):
        a = env_act[..., 0].astype(jnp.int32)
        reward = (a == st.col).astype(jnp.float32)
        nstep = st.step + 1
        done = nstep >= imgenv.MAX_STEPS
        return (ImgEnvState(col=st.col, step=nstep), reward, done,
                jnp.zeros_like(done))

    @staticmethod
    def reset_where(st, mask, key):
        col = jnp.where(mask, jax.random.randint(key, mask.shape, 0, 2),
                        st.col)
        return ImgEnvState(col=col, step=jnp.where(mask, 0, st.step))


class TestConvNet:
    def test_conv_forward_shapes(self):
        spec = NetSpec(n_in=W * W * 2, hidden=(16,), n_out=3,
                       conv=(Conv2DDesc(W, W, 2, 4, 4, 2),
                             Conv2DDesc(5, 5, 4, 8, 3, 2)))
        params = init_params(jax.random.PRNGKey(0), spec)
        x = jnp.ones((7, W * W * 2))
        y, _ = apply_net(params, spec, x)
        assert y.shape == (7, 3)
        assert bool(jnp.isfinite(y).all())

    def test_conv_frames_are_channels(self):
        # two different frames must map to different channel planes
        spec = NetSpec(n_in=W * W * 2, hidden=(4,), n_out=1,
                       conv=(Conv2DDesc(W, W, 2, 2, 3, 1),))
        params = init_params(jax.random.PRNGKey(0), spec)
        f0 = jnp.ones((1, W * W))
        f1 = jnp.zeros((1, W * W))
        y01, _ = apply_net(params, spec, jnp.concatenate([f0, f1], -1))
        y10, _ = apply_net(params, spec, jnp.concatenate([f1, f0], -1))
        assert not np.allclose(np.asarray(y01), np.asarray(y10))


class TestConvTraining:
    def test_racer_discrete_with_conv_and_stack(self):
        cfg = HyperParameters(minTotObsNum=256, maxTotObsNum=1024,
                              batchSize=32, nnLayerSizes=[16],
                              learnrate=1e-3)
        tr = Trainer(imgenv, imgenv.MDP, cfg, n_envs=8, n_slots=128,
                     max_len=imgenv.MAX_STEPS)
        tr.warmup(chunk=16)
        tr.train(300, log_every=10**9)
        assert tr.n_grad_steps >= 300
        # the task is a contextual bandit: a few hundred steps should get
        # the policy picking the right action most of the time
        rets = tr.evaluate(16, max_steps=imgenv.MAX_STEPS)
        assert np.mean(rets) > 10, rets  # max 16

    def test_dqn_with_conv_and_stack(self):
        from smarties_tpu.algos.dqn import DQN
        cfg = HyperParameters(minTotObsNum=256, maxTotObsNum=1024,
                              batchSize=32, nnLayerSizes=[16],
                              learnrate=1e-3, learner="DQN",
                              clipImpWeight=4.0,
                              returnsEstimator="retrace")
        tr = Trainer(imgenv, imgenv.MDP, cfg, n_envs=8, n_slots=128,
                     max_len=imgenv.MAX_STEPS, algo_cls=DQN)
        tr.warmup(chunk=16)
        tr.train(300, log_every=10**9)
        rets = tr.evaluate(16, max_steps=imgenv.MAX_STEPS)
        assert np.mean(rets) > 10, rets  # max 16
