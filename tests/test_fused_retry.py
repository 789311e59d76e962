"""Crash-recovery guard for Trainer.train_fused (VERDICT r4 #6).

The axon TPU worker can crash under a long dispatched queue
("UNAVAILABLE: TPU worker crashed or restarted"); train_fused keeps a
host snapshot at every fence and, on a recoverable backend error,
rolls the step ledger back to the snapshot and resumes. These tests
inject the failure by wrapping the jitted cycle.
"""
import jax
import pytest

from smarties_tpu.envs import cartpole
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters


def _trainer():
    cfg = HyperParameters(minTotObsNum=512, maxTotObsNum=8192,
                          batchSize=32, obsPerStep=1.0,
                          nnLayerSizes=[16], randSeed=0)
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=64, n_slots=256,
                 max_len=cartpole.MAX_STEPS)
    tr.log_flush_threshold = 10 ** 9
    tr.warmup(chunk=8, blind_sweeps=8)
    return tr


class _Unavailable(Exception):
    pass


def test_retry_resumes_from_snapshot(monkeypatch):
    tr = _trainer()
    real = tr._fused_cycle
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 5:
            raise _Unavailable("UNAVAILABLE: TPU worker crashed or "
                               "restarted")
        return real(*a, **kw)

    tr._fused_cycle = flaky
    monkeypatch.setattr("time.sleep", lambda s: None)
    tr.train_fused(64 * 8, log_every=10 ** 9, fence_every=64 * 2)
    # ledger reaches the target despite the mid-run crash
    assert tr.n_grad_steps >= 64 * 8
    # the crash rolled back to a fence snapshot and re-ran those steps
    assert calls["n"] > 8


def test_recovery_matches_uninterrupted_run(monkeypatch):
    """Exactly-once accounting: a crash + snapshot recovery must
    reproduce the uninterrupted run BITWISE (cycle keys derive from the
    carry, so replaying from a consistent snapshot is deterministic)."""
    import numpy as np

    ref = _trainer()
    ref.train_fused(64 * 8, log_every=10 ** 9, fence_every=64 * 2)

    tr = _trainer()
    real = tr._fused_cycle
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 5:
            raise _Unavailable("UNAVAILABLE: TPU worker crashed")
        return real(*a, **kw)

    tr._fused_cycle = flaky
    monkeypatch.setattr("time.sleep", lambda s: None)
    tr.train_fused(64 * 8, log_every=10 ** 9, fence_every=64 * 2)

    assert tr.n_grad_steps == ref.n_grad_steps
    assert tr.n_env_steps == ref.n_env_steps
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(tr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unrecoverable_error_propagates(monkeypatch):
    tr = _trainer()

    def dead(*a, **kw):
        raise _Unavailable("UNAVAILABLE: TPU worker crashed")

    tr._fused_cycle = dead
    monkeypatch.setattr("time.sleep", lambda s: None)
    with pytest.raises(_Unavailable):
        tr.train_fused(64 * 4, log_every=10 ** 9, fence_every=64,
                       max_retries=2)


def test_non_backend_errors_not_retried():
    tr = _trainer()

    def broken(*a, **kw):
        raise ValueError("some bug")

    tr._fused_cycle = broken
    with pytest.raises(ValueError):
        tr.train_fused(64 * 4, log_every=10 ** 9, fence_every=64)
