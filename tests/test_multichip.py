"""Multi-device sharded training tests on the virtual 8-device CPU mesh.

Analog of the reference's `mpirun -n N` on one box exercising learner-rank
topologies (SURVEY.md section 4.5, --nLearners K).
"""
import jax
import numpy as np
import pytest

from smarties_tpu.envs import cartpole
from smarties_tpu.parallel.mesh import make_mesh
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters


def small_cfg(**kw):
    d = dict(minTotObsNum=512, maxTotObsNum=2048, batchSize=32,
             obsPerStep=1.0, nnLayerSizes=[32, 32])
    d.update(kw)
    return HyperParameters(**d)


class TestSharded:
    def test_8dev_train_runs(self):
        mesh = make_mesh(8)
        tr = Trainer(cartpole, cartpole.MDP, small_cfg(), n_envs=16,
                     n_slots=64, max_len=64, mesh=mesh)
        tr.warmup(chunk=16)
        tr.train(50, log_every=10**9)
        assert tr.n_grad_steps >= 50
        assert np.isfinite(float(tr.replay.beta))
        # params identical across devices (replicated after psum'd grads)
        w = tr.params["out"]["W"]
        assert np.isfinite(np.asarray(w)).all()

    def test_grad_parity_1dev_vs_4dev(self):
        """The psum'd sharded gradient over K shards with B/K local batch
        must behave like a single-device batch-B step (same global batch
        semantics, HyperParameters::defineDistributedLearning). Checked
        statistically: both runs learn and produce finite, similar-scale
        updates from the same init."""
        results = {}
        for ndev in (1, 4):
            mesh = make_mesh(ndev)
            tr = Trainer(cartpole, cartpole.MDP,
                         small_cfg(randSeed=3), n_envs=8,
                         n_slots=32, max_len=64, mesh=mesh)
            tr.warmup(chunk=16)
            w_before = np.asarray(tr.params["out"]["W"]).copy()
            tr.train(20, log_every=10**9)
            w_after = np.asarray(tr.params["out"]["W"])
            results[ndev] = np.linalg.norm(w_after - w_before)
        assert results[1] > 0 and results[4] > 0
        # same order of magnitude of parameter motion
        ratio = results[1] / results[4]
        assert 0.2 < ratio < 5.0, ratio


class TestGraftEntry:
    def test_entry(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == 256

    def test_dryrun(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)
