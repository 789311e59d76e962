"""Engine lifecycle: train -> checkpoint -> restart -> eval mode.

Reference analog: --restart / --nEvalEpisodes runs (Engine.cpp:92-95,
Worker.cpp:91-111) and the write-then-rename checkpoint atomicity
(MemoryBuffer.cpp:289-292).
"""
import os
import sys

import numpy as np
import pytest

import smarties_tpu
from smarties_tpu.utils.config import HyperParameters

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "apps", "cart_pole_py"))


def cfg(**kw):
    d = dict(minTotObsNum=256, maxTotObsNum=2048, batchSize=32,
             nnLayerSizes=[32, 32])
    d.update(kw)
    return HyperParameters(**d)


class TestEngineLifecycle:
    def test_train_restart_eval(self, tmp_path):
        from exec import app_main
        d = str(tmp_path)
        e = smarties_tpu.Engine([])
        e.setNEnvironments(2)
        e.setSettings(cfg())
        e.setNTrainSteps(60)
        e.setMaxEpisodeLength(256)
        e.run_dir = d
        e.run(app_main, max_wall_s=90)
        ckpt = os.path.join(d, "checkpoint.pkl")
        assert os.path.exists(ckpt)
        assert e.n_grad_steps >= 60

        # restart continues counters and trains further
        e2 = smarties_tpu.Engine([])
        e2.setNEnvironments(2)
        e2.setSettings(cfg())
        e2.setNTrainSteps(90)
        e2.setMaxEpisodeLength(256)
        e2.setRestartFolderPath(ckpt)
        e2.run(app_main, max_wall_s=90)
        assert e2.n_grad_steps == 90

        # eval mode: serve deterministically, no grad steps
        e3 = smarties_tpu.Engine([])
        e3.setNEnvironments(2)
        e3.setSettings(cfg(bTrain=False))
        e3.setMaxEpisodeLength(256)
        e3.setRestartFolderPath(ckpt)
        e3.n_eval_episodes = 3
        e3.run(app_main, max_wall_s=90)
        assert e3.n_grad_steps == 60  # unchanged from the checkpoint

        # observation log written
        assert os.path.getsize(os.path.join(
            d, "agent_00_rank00_obs.raw")) > 0
