"""NaN guards (reference: Agent::checkNanOrInf on every message,
Agent.h:301-313; Communicator.cpp:267-270; `config=nans` FP-trap builds).
"""
import numpy as np
import pytest

import smarties_tpu
from smarties_tpu.utils.config import HyperParameters


def nan_app(comm):
    comm.setStateActionDims(1, 1)
    comm.setActionScales([1.0], [-1.0], True)
    comm.sendInitState(np.zeros(1))
    comm.recvAction()
    comm.sendState(np.array([float("nan")]), 0.5)   # poisoned state
    comm.recvAction()
    comm.sendLastState(np.zeros(1), 0.0)


class TestEngineNaNGuard:
    def test_nan_state_raises(self):
        e = smarties_tpu.Engine([])
        e.setNEnvironments(1)
        e.setSettings(HyperParameters(minTotObsNum=16, maxTotObsNum=64,
                                      batchSize=8, nnLayerSizes=[8]))
        e.setNTrainSteps(5)
        e.setMaxEpisodeLength(16)
        with pytest.raises(FloatingPointError, match="non-finite"):
            e.run(nan_app, max_wall_s=60)


class TestTrainerNaNGuard:
    def test_debug_nan_catches_divergence(self):
        """debugNaN checks metrics after every train chunk; a poisoned
        replay (non-finite rewards scaled into qret) must raise instead
        of silently training on garbage."""
        import jax.numpy as jnp
        from smarties_tpu.envs import cartpole
        from smarties_tpu.runtime.trainer import Trainer
        cfg = HyperParameters(minTotObsNum=128, maxTotObsNum=1024,
                              batchSize=16, nnLayerSizes=[8, 8],
                              debugNaN=True)
        tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=8, n_slots=32,
                     max_len=64)
        tr.warmup(chunk=16)
        # corrupt the stored return estimates
        rs = tr.carry.replay
        tr.carry = tr.carry._replace(replay=rs._replace(
            qret=jnp.full_like(rs.qret, jnp.nan)))
        with pytest.raises(FloatingPointError, match="non-finite"):
            tr.train(100, log_every=10**9)
