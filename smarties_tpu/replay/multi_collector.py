"""Vectorized rollout collection for COMPETING agents: one shared env,
N learners with their own policies and replays.

Re-expresses the reference's per-agent-MDP serving mode
(Core/Environment.h:84-97 initDescriptors(true); Core/Worker.cpp:144-188:
each agent's state routes to learners[localID]) for the pure-JAX env path:
every env step computes each agent's actions with ITS learner's parameters,
steps the joint env once, and commits each agent's finished episodes into
ITS replay — all inside one jitted lax.scan.

Lane layout matches the single-learner collector: the env module exposes
V = E * A lanes ordered [env0-agent0, env0-agent1, env1-agent0, ...]
(envs/predator_prey.py). Per-agent arrays here are [E, ...] slices.
All agents must share dim_action (the env's joint-action interface);
observation masks / bounds / policy families may differ per agent.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from smarties_tpu.replay.buffer import ReplayState, commit_episodes
from smarties_tpu.replay.collector import InProgress, _reset_lanes

F32 = jnp.float32


class MultiRolloutCarry(NamedTuple):
    replays: Tuple[ReplayState, ...]   # one per agent/learner
    inprogs: Tuple[InProgress, ...]    # one per agent, [E, ...]
    env_state: object
    key: jnp.ndarray
    rnns: Tuple = ()                   # per-agent recurrent carries


def make_multi_rollout_chunk(env_module, mdps: Sequence,
                             act_fns: Sequence[Callable],
                             max_tot_obs: int, gamma: float, lam: float,
                             returns_modes: Sequence[str],
                             filter_algo: str = "oldest"):
    """Build a jittable `rollout_chunk(params_tuple, carry, n_steps)`.

    params_tuple: one params pytree per learner. Logs per chunk:
    (done[k, E, A], length[k, E, A], ret[k, E, A]) for the host reward
    writer."""
    A = len(mdps)
    assert len(act_fns) == A
    assert all(m.dim_action == mdps[0].dim_action for m in mdps), \
        "joint env action requires equal dim_action across agents"

    def one_step(params_tuple, carry: MultiRolloutCarry):
        rs_t, ip_t, es, key, rnn_t = carry
        E = ip_t[0].t.shape[0]
        L1 = ip_t[0].states.shape[1]
        keys = jax.random.split(key, 2 + A)
        key, k_reset, k_acts = keys[0], keys[1], keys[2:]
        lane = jnp.arange(E)

        obs_full = env_module.observe(es)            # [E*A, dimS]
        obs_env = obs_full.reshape(E, A, -1)

        # ---- act per agent with its own learner ----
        acts_env, new_ip, new_rnn = [], [], []
        for a in range(A):
            ip, rs = ip_t[a], rs_t[a]
            obs = mdps[a].observed(obs_env[:, a])
            tcur = ip.t
            ip = ip._replace(states=ip.states.at[lane, tcur].set(
                obs.astype(ip.states.dtype)))
            obs_std = (obs - rs.state_mean) * rs.state_scale
            act, mu, val, adv, rnn = act_fns[a](
                params_tuple[a], obs_std, k_acts[a], rnn_t[a])
            ip = ip._replace(
                actions=ip.actions.at[lane, tcur].set(act),
                mus=ip.mus.at[lane, tcur].set(mu),
                value=ip.value.at[lane, tcur].set(val),
                advantage=ip.advantage.at[lane, tcur].set(adv))
            acts_env.append(mdps[a].learner_to_env_action(act))
            new_ip.append(ip)
            new_rnn.append(rnn)

        env_act = jnp.stack(acts_env, axis=1).reshape(E * A, -1)
        es2, reward_v, done_v, terminal_v = env_module.step(es, env_act)
        reward = reward_v.reshape(E, A)
        done = done_v.reshape(E, A)
        terminal = terminal_v.reshape(E, A)
        obs2_env = None

        # ---- per-agent episode bookkeeping + commit ----
        new_rs, logs_done, logs_len, logs_ret = [], [], [], []
        tgrid = jnp.arange(L1)[None, :]
        for a in range(A):
            ip = new_ip[a]
            tnew = ip.t + 1
            done_a = done[:, a] | (tnew >= (L1 - 1))
            ip = ip._replace(
                rewards=ip.rewards.at[lane, tnew].set(reward[:, a]),
                cum_reward=ip.cum_reward + reward[:, a],
                t=tnew)
            if obs2_env is None:
                obs2_env = env_module.observe(es2).reshape(E, A, -1)
            obs2 = mdps[a].observed(obs2_env[:, a])
            ip = ip._replace(
                states=jnp.where(done_a[:, None, None],
                                 ip.states.at[lane, tnew].set(
                                     obs2.astype(ip.states.dtype)),
                                 ip.states))
            rho_ep = (tgrid < tnew[:, None]).astype(F32)
            rs = commit_episodes(
                rs_t[a], ip.states, ip.actions, ip.mus, ip.rewards,
                ip.value, ip.advantage, jnp.zeros_like(ip.value), rho_ep,
                tnew, terminal[:, a], done_a, max_tot_obs, filter_algo)
            logs_done.append(done_a)
            logs_len.append(tnew)
            logs_ret.append(ip.cum_reward)
            ip = _reset_lanes(ip, done_a)
            new_ip[a] = ip
            new_rs.append(rs)
            new_rnn[a] = jax.tree_util.tree_map(
                lambda h: jnp.where(
                    done_a.reshape((-1,) + (1,) * (h.ndim - 1)), 0.0, h),
                new_rnn[a])

        es2 = env_module.reset_where(es2, done_v, k_reset)
        log = (jnp.stack(logs_done, -1), jnp.stack(logs_len, -1),
               jnp.stack(logs_ret, -1))
        return MultiRolloutCarry(tuple(new_rs), tuple(new_ip), es2, key,
                                 tuple(new_rnn)), log

    def rollout_chunk(params_tuple, carry: MultiRolloutCarry,
                      n_steps: int):
        def body(c, _):
            return one_step(params_tuple, c)

        carry, logs = jax.lax.scan(body, carry, None, length=n_steps)
        return carry, logs

    return rollout_chunk
