"""Replay buffer unit tests: ingestion, pruning, sampling, ReF-ER rules.

Reference behaviors tested: pushBackEpisode/removeBackEpisode FIFO semantics
(MemoryBuffer.cpp:469-520), applyEpisodesRemovalAlgo capacity rule
(MemoryProcessing.cpp:327-351), uniform transition sampling
(Sampling.cpp:49-99), beta fixed-point (MemoryProcessing.cpp:46-92).
"""
import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.replay import buffer as rb


def make_replay(n_slots=8, max_len=10, dim_s=3, dim_a=2, dim_pol=4, C=4.0):
    return rb.init_replay(n_slots, max_len, dim_s, dim_a, dim_pol, C)


def commit_one(rs, length, terminal=False, reward=1.0, seed=0,
               max_tot_obs=1000):
    """Commit a single synthetic episode via the batch-commit API."""
    rng = np.random.RandomState(seed)
    L1 = rs.max_len + 1
    V = 1
    sh = lambda *s: jnp.asarray(rng.randn(V, *s).astype(np.float32))
    rewards = np.zeros((V, L1), np.float32)
    rewards[:, 1:length + 1] = reward
    rho = np.zeros((V, L1), np.float32)
    rho[:, :length] = 1.0
    return rb.commit_episodes(
        rs, sh(L1, 3), sh(L1, 2), sh(L1, 4), jnp.asarray(rewards),
        jnp.zeros((V, L1)), jnp.zeros((V, L1)), jnp.zeros((V, L1)),
        jnp.asarray(rho), jnp.asarray([length], jnp.int32),
        jnp.asarray([terminal]), jnp.asarray([True]),
        max_tot_obs, "oldest")


class TestCommitPrune:
    def test_commit_fills_slots(self):
        rs = make_replay()
        rs = commit_one(rs, 5)
        assert int(rs.n_stored_eps()) == 1
        assert int(rs.n_stored_steps()) == 5
        assert int(rs.n_seen_eps) == 1
        rs = commit_one(rs, 7, terminal=True, seed=1)
        assert int(rs.n_stored_eps()) == 2
        assert int(rs.n_stored_steps()) == 12

    def test_fifo_prune_over_capacity(self):
        rs = make_replay()
        # capacity 20 steps; push 5 episodes of 8 -> prune oldest
        for i in range(5):
            rs = commit_one(rs, 8, seed=i, max_tot_obs=20)
        # reference rule: remove from back while total - candidate > maxN:
        # 40 -> 32 -> 24 -> stop (24 - 8 = 16 <= 20)
        assert int(rs.n_stored_steps()) == 24
        # oldest removed first: remaining ids are the newest
        ids = np.asarray(rs.ep_id)
        assert set(ids[ids >= 0]) == {2, 3, 4}

    def test_commit_overwrites_when_full(self):
        rs = make_replay(n_slots=3)
        for i in range(5):
            rs = commit_one(rs, 4, seed=i)
        ids = np.asarray(rs.ep_id)
        assert set(ids[ids >= 0]) == {2, 3, 4}  # oldest evicted

    def test_single_long_episode_kept(self):
        # safety: one episode longer than capacity must survive
        rs = make_replay(max_len=30)
        rs = commit_one(rs, 25, max_tot_obs=10)
        assert int(rs.n_stored_eps()) == 1


class TestSampling:
    def test_uniform_covers_transitions(self):
        rs = make_replay(n_slots=4, max_len=12)
        rs = commit_one(rs, 10, seed=0)
        rs = commit_one(rs, 4, seed=1)
        key = jax.random.PRNGKey(0)
        ep, t = rb.sample_uniform(key, rs, 4096)
        ep, t = np.asarray(ep), np.asarray(t)
        lens = np.asarray(rs.length)
        assert (t < lens[ep]).all()
        # both episodes sampled, roughly proportional to length
        frac_ep0 = np.mean(lens[ep] == 10)
        assert 0.6 < frac_ep0 < 0.8  # expect 10/14 ~ 0.714


class TestReferRules:
    def test_beta_decreases_when_far(self):
        rs = make_replay()
        rs = commit_one(rs, 8)
        # poison rho: all far-policy (resync the incremental counts)
        rs = rs._replace(rho=jnp.full_like(rs.rho, 100.0),
                         beta=jnp.float32(0.5))
        rs = rs._replace(far_count=rb.far_count_exact(rs))
        rs2, frac = rb.update_beta_alpha(rs, 32, 100, 0.1)
        assert float(frac) == 1.0
        assert float(rs2.beta) < 0.5

    def test_beta_increases_when_near(self):
        rs = make_replay()
        rs = commit_one(rs, 8)  # rho == 1 everywhere: near-policy
        rs = rs._replace(beta=jnp.float32(0.5))
        rs2, frac = rb.update_beta_alpha(rs, 32, 100, 0.1)
        assert float(frac) == 0.0
        assert float(rs2.beta) > 0.5

    def test_beta_fixed_point_formula(self):
        # exact one-step check vs MemoryProcessing.cpp:73-85
        rs = make_replay()
        rs = commit_one(rs, 8)
        rs = rs._replace(beta=jnp.float32(0.5))
        B, maxN, D = 32, 100, 0.1
        n_data = int(rs.n_stored_steps())
        lr = 0.1 * B / max(maxN, n_data)
        want = (1 - min(lr, 0.5)) * 0.5 + min(lr, 1 - 0.5)  # toward 1
        rs2, _ = rb.update_beta_alpha(rs, B, maxN, D)
        np.testing.assert_allclose(float(rs2.beta), want, rtol=1e-6)

    def test_cmax_anneal(self):
        rs = make_replay()
        rs = rb.update_cmax(rs, jnp.float32(0), 4.0, 0.0)
        np.testing.assert_allclose(float(rs.cmax_ret), 5.0)
        rs = rb.update_cmax(rs, jnp.float32(1000), 4.0, 1e-3)
        np.testing.assert_allclose(float(rs.cmax_ret), 1 + 4.0 / 2.0)

    def test_far_policy_mask(self):
        rho = jnp.asarray([0.1, 0.5, 1.0, 3.9, 4.1])
        far = rb.is_far_policy(rho, jnp.float32(4.0), jnp.float32(0.25))
        np.testing.assert_array_equal(
            np.asarray(far), [True, False, False, False, True])
        # C <= 1 disables filtering
        far = rb.is_far_policy(rho, jnp.float32(1.0), jnp.float32(1.0))
        assert not np.asarray(far).any()


class TestStats:
    def test_init_stats_exact(self):
        rs = make_replay(n_slots=4, max_len=20, dim_s=2)
        rng = np.random.RandomState(0)
        L1, T = 21, 15
        states = rng.randn(1, L1, 2).astype(np.float32) * 3 + 1
        states[:, T + 1:] = 0
        rewards = np.zeros((1, L1), np.float32)
        rewards[:, 1:T + 1] = rng.randn(T) * 2 + 5
        rho = np.zeros((1, L1), np.float32)
        rho[:, :T] = 1
        rs = rb.commit_episodes(
            rs, jnp.asarray(states), jnp.zeros((1, L1, 2)),
            jnp.zeros((1, L1, 4)), jnp.asarray(rewards),
            jnp.zeros((1, L1)), jnp.zeros((1, L1)), jnp.zeros((1, L1)),
            jnp.asarray(rho), jnp.asarray([T], jnp.int32),
            jnp.asarray([False]), jnp.asarray([True]), 1000, "oldest")
        rs = rb.update_state_rew_stats(rs, 1.0, b_init=True)
        r_valid = rewards[0, 1:T + 1]
        np.testing.assert_allclose(float(rs.rew_mean), r_valid.mean(),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(rs.rew_std), r_valid.std(),
                                   rtol=1e-3)
        s_valid = states[0, :T + 1]
        np.testing.assert_allclose(np.asarray(rs.state_mean),
                                   s_valid.mean(0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rs.state_std),
                                   s_valid.std(0), rtol=1e-3)
