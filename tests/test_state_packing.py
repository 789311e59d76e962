"""Exact-equivalence guard for the r5 state-packed record layout.

`init_replay(pack_states=True)` mirrors the raw f32 state rows into the
packed per-step record (buffer._ch: channels [WB0+5, R-3)) so
gather_minibatch needs ONE fused gather instead of two. Packing is a
pure layout change: every observable (minibatch fields, write-backs,
far counts, training trajectories) must match the unpacked layout
BITWISE — the gathered state values are the same f32 numbers read from
a different array.

Reference semantics under guard: MiniBatch.h:60-123 (sampling gather)
and MiniBatch.h:161-188 (setMseDklImpw/setValues write-backs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smarties_tpu.algos import base as ab
from smarties_tpu.replay import buffer as rb

E, L, DS, DA, DP = 16, 12, 4, 2, 4


def _pair(seed=0):
    """(unpacked, packed) replays holding identical committed episodes."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    V = 8
    ep_states = jax.random.normal(ks[0], (V, L + 1, DS))
    ep_actions = jax.random.normal(ks[1], (V, L + 1, DA))
    ep_mus = jax.random.normal(ks[2], (V, L + 1, DP))
    ep_rewards = jax.random.normal(ks[3], (V, L + 1))
    ep_value = jax.random.normal(ks[4], (V, L + 1))
    ep_adv = jax.random.normal(ks[5], (V, L + 1))
    ep_qret = jax.random.normal(ks[6], (V, L + 1))
    ep_rho = jnp.ones((V, L + 1))
    lens = jax.random.randint(ks[7], (V,), 3, L + 1)
    term = jnp.arange(V) % 2 == 0
    done = jnp.ones((V,), bool)
    out = []
    for pack in (False, True):
        rs = rb.init_replay(E, L, DS, DA, DP, clip_imp_weight=4.0,
                            pack_states=pack)
        rs = rb.commit_episodes(rs, ep_states, ep_actions, ep_mus,
                                ep_rewards, ep_value, ep_adv, ep_qret,
                                ep_rho, lens, term, done,
                                max_tot_obs=10 ** 6)
        out.append(rs)
    return out


def _same(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_commit_bitwise_identical():
    ru, rp = _pair()
    assert rp.dim_state_packed == DS and ru.dim_state_packed == 0
    _same(ru.states, rp.states)
    _same(ru.slot_meta, rp.slot_meta)
    for name in ("rewards", "actions", "mus", "qret", "rho", "kl",
                 "delta", "value", "advantage"):
        _same(getattr(ru, name), getattr(rp, name))
    # the mirror channels hold exactly the state rows
    st0 = rp._c[3] + 5
    _same(rp.steps[..., st0:st0 + DS], rp.states)


def test_gather_minibatch_bitwise_identical():
    ru, rp = _pair()
    stats = dict(state_mean=jnp.asarray([0.1, -0.2, 0.3, 0.0]),
                 state_scale=jnp.asarray([1.5, 0.7, 1.0, 2.0]),
                 rew_mean=jnp.float32(0.05), rew_scale=jnp.float32(1.3))
    ru, rp = ru._replace(**stats), rp._replace(**stats)
    ep, t = rb.sample_uniform(jax.random.PRNGKey(3), ru, 32)
    mu, mp = ab.gather_minibatch(ru, ep, t), ab.gather_minibatch(rp, ep, t)
    for f in ("s_t", "s_t1", "action", "mu", "qret", "reward_next",
              "is_last", "terminal_next", "truncated_next", "valid",
              "rho_old", "value_old"):
        _same(getattr(mu, f), getattr(mp, f))


def test_write_back_bitwise_identical():
    ru, rp = _pair()
    key = jax.random.PRNGKey(4)
    ep, t = rb.sample_uniform(key, ru, 32)
    mu, mp = ab.gather_minibatch(ru, ep, t), ab.gather_minibatch(rp, ep, t)
    ks = jax.random.split(key, 5)
    vals = [jax.random.normal(k, (32,)) for k in ks]
    ru2 = ab.write_back_with_next(ru, mu, *vals, v_next=vals[0] * 0.5)
    rp2 = ab.write_back_with_next(rp, mp, *vals, v_next=vals[0] * 0.5)
    for name in ("rho", "kl", "delta", "value", "advantage", "qret"):
        _same(getattr(ru2, name), getattr(rp2, name))
    _same(ru2.far_count, rp2.far_count)
    # re-emitted state mirror stays bit-identical to the state array
    st0 = rp2._c[3] + 5
    _same(rp2.steps[..., st0:st0 + DS], rp2.states)


@pytest.mark.parametrize("algo_name", ["VRACER", "DQN"])
def test_train_step_trajectory_identical(algo_name):
    """Same seeds, same sampled indices -> bitwise-equal params after a
    few train steps on packed vs unpacked replays."""
    from smarties_tpu.algos.dqn import DQN
    from smarties_tpu.algos.vracer import VRacer
    from smarties_tpu.core.mdp import MDPSpec
    from smarties_tpu.utils.config import HyperParameters

    if algo_name == "DQN":
        mdp = MDPSpec(dim_state=DS, dim_action=1, discrete_values=(3,))
        cls = DQN
    else:
        mdp = MDPSpec(dim_state=DS, dim_action=DA)
        cls = VRacer
    cfg = HyperParameters(batchSize=16, nnLayerSizes=[16],
                          minTotObsNum=32, maxTotObsNum=10 ** 6)
    algo = cls(mdp, cfg)
    params0, opt0 = algo.init(jax.random.PRNGKey(0))

    outs = []
    for pack in (False, True):
        rs = rb.init_replay(E, L, DS, mdp.dim_action, mdp.dim_policy,
                            cfg.clipImpWeight, mu_init=rb.safe_mu(mdp),
                            pack_states=pack)
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 8)
        V = 8
        mus = jnp.tile(jnp.asarray(rb.safe_mu(mdp)), (V, L + 1, 1))
        acts = (jax.random.randint(ks[1], (V, L + 1, 1), 0, 3).astype(
            jnp.float32) if algo_name == "DQN"
            else jax.random.normal(ks[1], (V, L + 1, DA)) * 0.3)
        rs = rb.commit_episodes(
            rs, jax.random.normal(ks[0], (V, L + 1, DS)), acts, mus,
            jax.random.normal(ks[2], (V, L + 1)) * 0.1,
            jnp.zeros((V, L + 1)), jnp.zeros((V, L + 1)),
            jnp.zeros((V, L + 1)), jnp.ones((V, L + 1)),
            jnp.full((V,), L, jnp.int32), jnp.zeros((V,), bool),
            jnp.ones((V,), bool), max_tot_obs=10 ** 6)
        rs = rb.recompute_returns(rs, cfg.gamma, cfg.lambda_,
                                  algo.returns_mode)
        params, opt = params0, opt0
        step = jax.jit(algo.train_step)
        for i in range(4):
            params, opt, rs, _m = step(params, opt, rs,
                                       jax.random.PRNGKey(100 + i))
        outs.append((params, rs))
    pu, pp = outs[0][0], outs[1][0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), pu, pp)
    for name in ("rho", "kl", "delta", "value", "advantage"):
        _same(getattr(outs[0][1], name), getattr(outs[1][1], name))
