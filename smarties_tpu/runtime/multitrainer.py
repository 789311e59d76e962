"""Host-side driver for COMPETING agents: N learners, one shared env.

The multi-learner analog of runtime/trainer.py — the reference trains
per-agent policies by instantiating one learner per MDP descriptor and
routing each agent's data to its own learner + replay
(Core/Environment.h:84-97, Core/Worker.cpp:144-188; demo
apps/predator_prey trains predator and prey as separate policies).
Here each agent owns (params, opt_state, ReplayState); acting and env
stepping happen in ONE jitted rollout chunk (replay/multi_collector.py),
and each learner's grad steps run under the shared obsPerStep pacing.
"""
from __future__ import annotations

import os
import pickle
import time
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.algos.registry import make_learner
from smarties_tpu.core.mdp import MDPSpec
from smarties_tpu.replay import buffer as rb
from smarties_tpu.replay.collector import init_inprogress
from smarties_tpu.replay.multi_collector import (MultiRolloutCarry,
                                                 make_multi_rollout_chunk)
from smarties_tpu.utils.config import HyperParameters


class MultiTrainer:
    def __init__(self, env_module, mdps: Sequence[MDPSpec],
                 cfgs, n_envs: int = 32, n_slots: Optional[int] = None,
                 max_len: int = 512, run_dir: Optional[str] = None,
                 train_mask: Optional[Sequence[bool]] = None):
        """n_envs: env INSTANCES (each with len(mdps) agent lanes).
        cfgs: one HyperParameters shared, or a list (one per learner).
        train_mask: per-learner flag; False freezes that learner's
        parameters (it still acts with exploration) — useful for
        alternating / curriculum training of competing agents."""
        A = len(mdps)
        self.A = A
        self.env = env_module
        self.mdps = list(mdps)
        self.cfgs = (list(cfgs) if isinstance(cfgs, (list, tuple))
                     else [cfgs] * A)
        for c in self.cfgs:
            c.check()
        self.n_envs = n_envs
        self.max_len = max_len
        self.run_dir = run_dir
        self.train_mask = list(train_mask) if train_mask is not None \
            else [True] * A
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            self._rew_files = [
                open(os.path.join(
                    run_dir, f"agent_{a:02d}_rank00_cumulative_rewards.dat"),
                    "a") for a in range(A)]
        else:
            self._rew_files = None

        self.algos = [make_learner(m, c)
                      for m, c in zip(self.mdps, self.cfgs)]
        cfg0 = self.cfgs[0]
        n_slots = n_slots or max(256, 2 * cfg0.maxTotObsNum // max(
            8, max_len // 8))
        self.n_slots = n_slots

        key = jax.random.PRNGKey(cfg0.randSeed)
        key, k_env, *k_inits = jax.random.split(key, 2 + A)
        self.key = key
        self.params: List = []
        self.opt_states: List = []
        replays, inprogs, rnns = [], [], []
        for a, algo in enumerate(self.algos):
            p, o = algo.init(k_inits[a])
            self.params.append(p)
            self.opt_states.append(o)
            m = self.mdps[a]
            replays.append(rb.init_replay(
                n_slots, max_len, m.dim_state_observed, m.dim_action,
                m.dim_policy, self.cfgs[a].clipImpWeight,
                mu_init=rb.safe_mu(m)))
            inprogs.append(init_inprogress(
                n_envs, max_len, m.dim_state_observed, m.dim_action,
                m.dim_policy))
            rnns.append(algo.init_rnn(n_envs)
                        if hasattr(algo, "init_rnn") else ())
        env_state = env_module.init(k_env, n_envs * A)
        self.key, k_roll = jax.random.split(self.key)
        self.carry = MultiRolloutCarry(tuple(replays), tuple(inprogs),
                                       env_state, k_roll, tuple(rnns))

        act_fns = [algo.make_act_fn(train=c.bTrain)
                   for algo, c in zip(self.algos, self.cfgs)]
        chunk_fn = make_multi_rollout_chunk(
            env_module, self.mdps, act_fns, cfg0.maxTotObsNum,
            cfg0.gamma, cfg0.lambda_,
            [a.returns_mode for a in self.algos], cfg0.ERoldSeqFilter)
        self._rollout = jax.jit(chunk_fn, static_argnums=2)

        def fix_returns(rs, a):
            return rb.refresh_new_returns(
                rs, self.cfgs[a].gamma, self.cfgs[a].lambda_,
                self.algos[a].returns_mode)

        self._fix_returns = [jax.jit(partial(fix_returns, a=a))
                             for a in range(A)]

        def train_chunk(a, params, opt_state, rs, key, n):
            def body(c, k):
                p, o, r = c
                p, o, r, m = self.algos[a].train_step(p, o, r, k)
                return (p, o, r), m

            keys = jax.random.split(key, n)
            (params, opt_state, rs), ms = jax.lax.scan(
                body, (params, opt_state, rs), keys)
            return params, opt_state, rs, ms

        self._train_chunks = [
            jax.jit(partial(train_chunk, a), static_argnums=4)
            for a in range(A)]
        self._refresh = [jax.jit(self.algos[a].refresh) for a in range(A)]
        self._init_stats = [jax.jit(self.algos[a].initialize_stats)
                            for a in range(A)]

        self.n_env_steps = 0          # per-lane steps (same for all agents)
        self.n_grad_steps = [0] * A
        self._initialized = [False] * A
        self._last_refresh = [0] * A
        self._ep_returns = [[] for _ in range(A)]

    # ------------------------------------------------------------------
    def _roll(self, n_steps: int):
        self.carry, logs = self._rollout(tuple(self.params), self.carry,
                                         n_steps)
        self.carry = self.carry._replace(replays=tuple(
            self._fix_returns[a](self.carry.replays[a])
            for a in range(self.A)))
        self.n_env_steps += n_steps * self.n_envs
        self._log_episodes(logs)

    def _log_episodes(self, logs):
        done, length, ret = (np.asarray(x) for x in logs)  # [k, E, A]
        for a in range(self.A):
            d = done[..., a]
            if not d.any():
                continue
            ls, rs_ = length[..., a][d], ret[..., a][d]
            self._ep_returns[a].extend(map(float, rs_))
            self._ep_returns[a] = self._ep_returns[a][-500:]
            if self._rew_files:
                for l, r in zip(ls, rs_):
                    self._rew_files[a].write(
                        f"{self.n_grad_steps[a]} {self.n_env_steps} "
                        f"{a} {l} {r}\n")

    # ------------------------------------------------------------------
    def warmup(self, chunk: int = 16):
        cfg0 = self.cfgs[0]
        while int(self.carry.replays[0].n_stored_steps()) \
                < cfg0.minTotObsNum:
            self._roll(chunk)
        self.carry = self.carry._replace(replays=tuple(
            self._init_stats[a](self.carry.replays[a])
            for a in range(self.A)))
        self._initialized = [True] * self.A
        self._start_env_steps = self.n_env_steps

    # ------------------------------------------------------------------
    def train(self, n_grad_steps: int, max_wall_s: float = float("inf")):
        """Each learner takes n_grad_steps more gradient steps, paced by
        ITS obsPerStep against the shared env-step counter."""
        if not all(self._initialized):
            self.warmup()
        targets = [g + n_grad_steps if self.train_mask[a] else g
                   for a, g in enumerate(self.n_grad_steps)]
        t0 = time.time()
        Q = 50
        while (any(self.n_grad_steps[a] < targets[a]
                   for a in range(self.A))
               and time.time() - t0 < max_wall_s):
            progressed = False
            for a in range(self.A):
                if not self.train_mask[a]:
                    continue
                allowed = int((self.n_env_steps - self._start_env_steps)
                              / self.cfgs[a].obsPerStep) \
                    - self.n_grad_steps[a]
                n_tr = min(Q, allowed,
                           targets[a] - self.n_grad_steps[a])
                if n_tr <= 0:
                    continue
                progressed = True
                self.key, k = jax.random.split(self.key)
                rs = self.carry.replays[a]
                p, o, rs, _ = self._train_chunks[a](
                    self.params[a], self.opt_states[a], rs, k, n_tr)
                self.params[a], self.opt_states[a] = p, o
                self.carry = self.carry._replace(replays=tuple(
                    rs if i == a else r
                    for i, r in enumerate(self.carry.replays)))
                self.n_grad_steps[a] += n_tr
                if self.n_grad_steps[a] // 1000 \
                        > self._last_refresh[a] // 1000:
                    self._last_refresh[a] = self.n_grad_steps[a]
                    self.carry = self.carry._replace(replays=tuple(
                        self._refresh[a](r, float(self.n_grad_steps[a]))
                        if i == a else r
                        for i, r in enumerate(self.carry.replays)))
            if not progressed or any(
                    self.n_grad_steps[a] < targets[a]
                    and int((self.n_env_steps - self._start_env_steps)
                            / self.cfgs[a].obsPerStep)
                    <= self.n_grad_steps[a]
                    for a in range(self.A) if self.train_mask[a]):
                self._roll(8)

    # ------------------------------------------------------------------
    def avg_return(self, a: int, last: int = 100) -> float:
        r = self._ep_returns[a][-last:]
        return float(np.mean(r)) if r else float("nan")

    def evaluate(self, n_episodes: int = 16, max_steps: int = 250):
        """Deterministic joint evaluation: returns [n_episodes, A]."""
        env, mdps, A = self.env, self.mdps, self.A
        act_fns = [algo.make_act_fn(False) for algo in self.algos]
        rnn0 = tuple(self.algos[a].init_rnn(n_episodes)
                     if hasattr(self.algos[a], "init_rnn") else ()
                     for a in range(A))

        def run(params_tuple, stats, k_env, k_act):
            es = env.init(k_env, n_episodes * A)

            def body(carry, k):
                es, rnns, rets, done = carry
                obs_env = env.observe(es).reshape(n_episodes, A, -1)
                acts, new_rnns = [], []
                ks = jax.random.split(k, A)
                for a in range(A):
                    mean, scale = stats[a]
                    obs = (mdps[a].observed(obs_env[:, a]) - mean) * scale
                    act, _, _, _, rnn = act_fns[a](params_tuple[a], obs,
                                                   ks[a], rnns[a])
                    acts.append(mdps[a].learner_to_env_action(act))
                    new_rnns.append(rnn)
                env_act = jnp.stack(acts, 1).reshape(n_episodes * A, -1)
                es, r, d, _ = env.step(es, env_act)
                r = r.reshape(n_episodes, A)
                d = d.reshape(n_episodes, A).any(-1)
                rets = rets + r * (~done)[:, None]
                return (es, tuple(new_rnns), rets, done | d), None

            init = (es, rnn0, jnp.zeros((n_episodes, A)),
                    jnp.zeros(n_episodes, bool))
            (es, _, rets, _), _ = jax.lax.scan(
                body, init, jax.random.split(k_act, max_steps))
            return rets

        stats = tuple((self.carry.replays[a].state_mean,
                       self.carry.replays[a].state_scale)
                      for a in range(self.A))
        self.key, k_env, k_act = jax.random.split(self.key, 3)
        if not hasattr(self, "_eval_jit"):
            self._eval_jit = jax.jit(run)
        return np.asarray(self._eval_jit(tuple(self.params), stats,
                                         k_env, k_act))

    # ------------------------------------------------------------------
    def save(self, path: str):
        state = {"learners": [
            {"params": jax.device_get(self.params[a]),
             "opt_state": jax.device_get(self.opt_states[a]),
             "replay": jax.device_get(self.carry.replays[a]),
             "n_grad_steps": self.n_grad_steps[a]}
            for a in range(self.A)],
            "n_env_steps": self.n_env_steps,
            "initialized": self._initialized}
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)
