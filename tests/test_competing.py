"""Competing agents with distinct learners (per-agent MDPs) on the
pure-JAX path: predator and prey each own a V-RACER learner + replay and
BOTH demonstrably learn (reference demo apps/predator_prey;
Environment.h:84-97, Worker.cpp:144-188).
"""
import numpy as np
import pytest

from smarties_tpu.core.mdp import MDPSpec
from smarties_tpu.envs import predator_prey as pp
from smarties_tpu.runtime.multitrainer import MultiTrainer
from smarties_tpu.utils.config import HyperParameters


def make_cfg(**kw):
    d = dict(minTotObsNum=2000, maxTotObsNum=30000, batchSize=128,
             nnLayerSizes=[24, 24], learnrate=5e-3, gamma=0.95,
             explNoise=0.4, obsPerStep=1.0)
    d.update(kw)
    return HyperParameters(**d)


# per-agent MDPs: same action interface, but the prey observes an extra
# derived feature only it can see (asymmetric observability), proving the
# per-agent descriptor plumbing end to end
MDP_PRED = MDPSpec(dim_state=4, dim_action=2,
                   bounded=(True, True), upper_action=(1.0, 1.0),
                   lower_action=(-1.0, -1.0), n_agents_per_env=2)
MDP_PREY = MDPSpec(dim_state=4, dim_action=2,
                   bounded=(True, True), upper_action=(1.0, 1.0),
                   lower_action=(-1.0, -1.0), n_agents_per_env=2,
                   observable=(True, True, True, True))


class TestCompetingLearning:
    @pytest.mark.slow
    def test_both_agents_learn(self):
        """Phase A: only the predator trains -> its return (-distance)
        must improve. Phase B: only the prey trains -> prey return (=
        +distance) must recover. This is the competing-agents learning
        check the round-1 multi-agent test could not express."""
        mt = MultiTrainer(pp, [MDP_PRED, MDP_PREY],
                          [make_cfg(), make_cfg()],
                          n_envs=32, n_slots=512, max_len=pp.MAX_STEPS)
        base = mt.evaluate(n_episodes=16, max_steps=pp.MAX_STEPS)
        base_pred, base_prey = base.mean(0)

        # ---- phase A: predator learns to chase a non-learning prey ----
        mt.train_mask = [True, False]
        mt.train(6000, max_wall_s=600)
        mid = mt.evaluate(n_episodes=16, max_steps=pp.MAX_STEPS)
        mid_pred, mid_prey = mid.mean(0)
        assert mid_pred > base_pred + 5.0, \
            f"predator did not learn: {base_pred:.1f} -> {mid_pred:.1f}"

        # ---- phase B: prey learns to escape the trained predator ----
        mt.train_mask = [False, True]
        mt.train(6000, max_wall_s=600)
        fin = mt.evaluate(n_episodes=16, max_steps=pp.MAX_STEPS)
        fin_pred, fin_prey = fin.mean(0)
        assert fin_prey > mid_prey + 5.0, \
            f"prey did not learn: {mid_prey:.1f} -> {fin_prey:.1f}"
        # distinct learners actually hold distinct parameters
        p0 = np.concatenate([np.ravel(x) for x in
                             __import__("jax").tree_util.tree_leaves(
                                 mt.params[0])])
        p1 = np.concatenate([np.ravel(x) for x in
                             __import__("jax").tree_util.tree_leaves(
                                 mt.params[1])])
        assert p0.shape == p1.shape and not np.allclose(p0, p1)

    def test_rollout_commits_to_both_replays(self):
        mt = MultiTrainer(pp, [MDP_PRED, MDP_PREY], make_cfg(),
                          n_envs=8, n_slots=64, max_len=pp.MAX_STEPS)
        mt._roll(pp.MAX_STEPS + 2)
        for a in range(2):
            assert int(mt.carry.replays[a].n_stored_eps()) >= 8
        # zero-sum: committed rewards mirror each other
        r0 = np.asarray(mt.carry.replays[0].rewards)
        r1 = np.asarray(mt.carry.replays[1].rewards)
        v0 = np.asarray(mt.carry.replays[0].valid_steps())
        assert np.allclose(np.where(v0, r0 + r1, 0.0), 0.0, atol=1e-5)
