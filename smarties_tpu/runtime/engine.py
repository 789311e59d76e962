"""Engine: public entry point for external (user-application) envs.

Re-implements the reference's Engine + master serving loop
(source/smarties/Engine.{h,cpp}, Core/Master.cpp, Core/Worker.cpp) for the
TPU runtime: env apps run in worker processes behind the Communicator API
(runtime/communicator.py); the learner batches all pending agent states
into one jitted action-selection call, assembles episodes host-side, and
commits them to the on-device replay; training interleaves under the
obsPerStep pacing invariant (Learner.cpp:102-123).

Usage (mirrors README.rst:104-133 / smarties_pybind11.cpp):

    import smarties_tpu
    def app_main(comm):
        comm.setStateActionDims(6, 1)
        comm.setActionScales([10.], [-10.], True)
        while True:
            comm.sendInitState(env.reset())
            while True:
                act = comm.recvAction()
                ...
                comm.sendState(s, r) / sendTermState / sendLastState

    e = smarties_tpu.Engine(sys.argv)
    e.setNEnvironments(8)
    e.run(app_main)
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.replay import buffer as rb
from smarties_tpu.runtime.communicator import CONT, INIT, LAST, TERM
from smarties_tpu.runtime.env_pool import EnvPool
from smarties_tpu.utils.config import HyperParameters


class _EpisodeAssembler:
    """Host-side in-progress episode for one agent lane
    (MemoryBuffer::inProgress analog)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.obs, self.acts, self.mus, self.rewards = [], [], [], []
        self.values, self.advs = [], []

    def add_state(self, obs, reward):
        self.obs.append(obs)
        self.rewards.append(reward)

    def add_action(self, act, mu, value, adv):
        self.acts.append(act)
        self.mus.append(mu)
        self.values.append(value)
        self.advs.append(adv)

    def finalize(self, terminal: bool, max_len: int):
        """-> (padded numpy arrays, length, terminal) for device commit."""
        T = len(self.acts)
        T = min(T, max_len)
        L1 = max_len + 1

        def pad(rows, dim):
            out = np.zeros((L1, dim), np.float32)
            k = min(len(rows), L1)
            if k:
                out[:k] = np.asarray(rows[:k], np.float32).reshape(k, dim)
            return out

        n_obs = len(self.obs[0])
        states = pad(self.obs, n_obs)
        acts = pad(self.acts, len(self.acts[0]) if self.acts else 1)
        mus = pad(self.mus, len(self.mus[0]) if self.mus else 1)
        rewards = np.zeros(L1, np.float32)
        rewards[:min(len(self.rewards), L1)] = self.rewards[:L1]
        value = np.zeros(L1, np.float32)
        value[:min(len(self.values), L1)] = self.values[:L1]
        adv = np.zeros(L1, np.float32)
        adv[:min(len(self.advs), L1)] = self.advs[:L1]
        ret = float(np.sum(self.rewards))
        self.reset()
        return states, acts, mus, rewards, value, adv, T, terminal, ret


class Engine:
    def __init__(self, argv: Optional[List[str]] = None):
        self.argv = argv or []
        self.cfg = HyperParameters()
        self.n_envs = 1
        self.train_steps = 10_000_000
        self.run_dir = None
        self.restart_path = None
        self.max_ep_len = 1024
        self.n_eval_episodes = 32   # --nEvalEpisodes when bTrain == 0
        self._parsed = False

    # ---------------- CLI (ExecutionInfo::parse, :95-170) ---------------
    def parse(self) -> bool:
        p = argparse.ArgumentParser(prog="smarties_tpu", add_help=True)
        p.add_argument("--nEnvironments", type=int, default=1)
        p.add_argument("--nTrainSteps", type=int, default=10_000_000)
        p.add_argument("--settings", type=str, default=None)
        p.add_argument("--runDir", type=str, default=None)
        p.add_argument("--restart", type=str, default=None)
        p.add_argument("--randSeed", type=int, default=0)
        p.add_argument("--maxEpisodeLength", type=int, default=1024)
        try:
            args, _ = p.parse_known_args(self.argv[1:])
        except SystemExit:
            return True
        if args.settings:
            self.cfg = HyperParameters.from_json(args.settings)
        self.cfg.randSeed = args.randSeed
        self.n_envs = args.nEnvironments
        self.train_steps = args.nTrainSteps
        self.run_dir = args.runDir
        self.restart_path = args.restart
        self.max_ep_len = args.maxEpisodeLength
        self._parsed = True
        return False

    # ---------------- setters (Engine.cpp:33-85) ------------------------
    def setNEnvironments(self, n: int):
        self.n_envs = n

    def setNTrainSteps(self, n: int):
        self.train_steps = n

    def setRandSeed(self, seed: int):
        self.cfg.randSeed = seed

    def setSettings(self, cfg: HyperParameters):
        self.cfg = cfg

    def setRestartFolderPath(self, path: str):
        self.restart_path = path

    def setMaxEpisodeLength(self, n: int):
        self.max_ep_len = n

    # ---------------- main loop (Engine::run, Master/Worker) ------------
    def run(self, app_main: Callable, max_wall_s: float = float("inf"),
            pool=None):
        """app_main: python callable run in forked workers; OR pass a
        ready-made pool (e.g. runtime.socket_pool.SocketEnvPool for native
        C++/Fortran apps) and app_main is ignored."""
        cfg = self.cfg
        if pool is None:
            pool = EnvPool(app_main, self.n_envs, seed=cfg.randSeed)
        mdp = pool.probe_spec()
        self.mdp = mdp

        from smarties_tpu.algos.registry import make_learner
        algo = make_learner(mdp, cfg)
        self.algo = algo

        key = jax.random.PRNGKey(cfg.randSeed)
        key, k_init = jax.random.split(key)
        params, opt_state = algo.init(k_init)
        n_slots = max(64, 2 * cfg.maxTotObsNum // max(8, self.max_ep_len // 8))
        rs = rb.init_replay(n_slots, self.max_ep_len,
                            mdp.dim_state_observed, mdp.dim_action,
                            mdp.dim_policy, cfg.clipImpWeight)

        act_jit = jax.jit(algo.make_act_fn(train=cfg.bTrain))

        def commit_one(rs, states, acts, mus, rewards, value, adv, length,
                       terminal):
            """Ingest one finished host-assembled episode
            (MemoryBuffer::terminateCurrentEpisode, :118-170)."""
            from smarties_tpu.ops.returns import batched_return_estimate
            L1 = rs.max_len + 1
            rho = (jnp.arange(L1)[None, :]
                   < length[:, None]).astype(jnp.float32)
            r_scaled = (rewards - rs.rew_mean) * rs.rew_scale
            mode = algo.returns_mode
            qret = (batched_return_estimate(
                r_scaled, value, adv, rho, length, terminal,
                cfg.gamma, cfg.lambda_, mode,
                err_baseline=rs.max_abs_error)
                if mode != "none" else jnp.zeros_like(value))
            return rb.commit_episodes(
                rs, states, acts, mus, rewards, value, adv, qret, rho,
                length, terminal, jnp.ones((1,), bool),
                cfg.maxTotObsNum, cfg.ERoldSeqFilter)

        commit_jit = jax.jit(commit_one, donate_argnums=0)

        def train_chunk(params, opt_state, rs, key, n):
            def body(c, k):
                p, o, r = c
                p, o, r, m = algo.train_step(p, o, r, k)
                return (p, o, r), m

            ks = jax.random.split(key, n)
            (params, opt_state, rs), ms = jax.lax.scan(
                body, (params, opt_state, rs), ks)
            return params, opt_state, rs, ms

        train_jit = jax.jit(train_chunk, static_argnums=4)
        refresh_jit = jax.jit(algo.refresh)
        init_stats_jit = jax.jit(algo.initialize_stats)

        lanes = [_EpisodeAssembler() for _ in range(pool.n_lanes)]
        start_env_steps = 0
        obs_idx = np.nonzero(mdp.observable_mask)[0]  # replay stores
        # observed dims only (latent dims are app-side, StateAction.h:125)
        # eval mode (bTrain == 0, --nEvalEpisodes): serve deterministic
        # actions, no training (Engine.cpp:92-95, Worker.cpp:91-111)
        eval_mode = not cfg.bTrain
        eval_episodes_done = 0
        eval_returns = []
        obs_file = None
        if self.run_dir:
            # raw obs logging (Agent::writeData analog, Agent.h:259-299):
            # f32 rows [lane, status, state..., reward]
            obs_file = open(os.path.join(self.run_dir,
                                         "agent_00_rank00_obs.raw"), "ab")
        n_env_steps = 0
        n_grad = 0
        initialized = False
        last_refresh = 0
        rew_file = None
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
            rew_file = open(os.path.join(
                self.run_dir, "agent_00_rank00_cumulative_rewards.dat"), "a")

        # restart from a checkpoint (Engine::setRestartFolderPath)
        if self.restart_path and os.path.exists(self.restart_path):
            import pickle
            with open(self.restart_path, "rb") as f:
                snap = pickle.load(f)
            params = jax.tree_util.tree_map(jnp.asarray, snap["params"])
            opt_state = jax.tree_util.tree_map(jnp.asarray,
                                               snap["opt_state"])
            rs = jax.tree_util.tree_map(jnp.asarray, snap["replay"])
            n_grad = snap.get("n_grad_steps", 0)
            n_env_steps = snap.get("n_env_steps", 0)
            initialized = snap.get("initialized", True)
            start_env_steps = snap.get("start_env_steps",
                                       max(0, n_env_steps - n_grad))

        t0 = time.time()
        try:
            while n_grad < self.train_steps and \
                    time.time() - t0 < max_wall_s:
                if eval_mode and eval_episodes_done >= self.n_eval_episodes:
                    break
                # ---- serve all envs one round ----
                events, states, rewards, statuses = pool.gather_states()
                untracked = set(pool.spec.get("untracked_agents", ()))
                for lane, status, state, reward in events:
                    if (lane % pool.n_agents) in untracked:
                        # acting-only agents: serve actions, store nothing
                        # (trackEpisodes=false fast path,
                        # MemoryBuffer.cpp:50-98)
                        continue
                    if obs_file is not None:
                        row = np.concatenate([[lane, status], state,
                                              [reward]]).astype(np.float32)
                        obs_file.write(row.tobytes())
                    if eval_mode and status in (TERM, LAST):
                        eval_episodes_done += 1
                    if status == INIT:
                        lanes[lane].reset()
                        lanes[lane].add_state(state[obs_idx], 0.0)
                    else:
                        lanes[lane].add_state(state[obs_idx], reward)
                        n_env_steps += 1
                    if status in (TERM, LAST):
                        arrs = lanes[lane].finalize(status == TERM,
                                                    self.max_ep_len)
                        *ep_arrays, T, term, ret = arrs
                        rs = commit_jit(
                            rs, *[jnp.asarray(a)[None] for a in ep_arrays],
                            jnp.asarray([T], jnp.int32),
                            jnp.asarray([term]))
                        if rew_file:
                            rew_file.write(f"{n_grad} {n_env_steps} "
                                           f"{lane} {T} {ret}\n")
                # ---- act on pending requests (batched) ----
                k_app = mdp.n_appended_obs
                if k_app:
                    # frame stacking from per-lane history (clamped at the
                    # episode start, Episode::standardizedState)
                    stacked = np.stack([
                        np.concatenate([
                            ln.obs[max(len(ln.obs) - 1 - j, 0)]
                            for j in range(k_app + 1)])
                        for ln in lanes])
                    obs = jnp.asarray(stacked, jnp.float32)
                else:
                    obs = mdp.observed(jnp.asarray(states, jnp.float32))
                n_tile = k_app + 1
                obs_std = ((obs.reshape(obs.shape[0], n_tile, -1)
                            - rs.state_mean) * rs.state_scale
                           ).reshape(obs.shape[0], -1)
                key, k_act = jax.random.split(key)
                a, mu, val, adv, _ = act_jit(params, obs_std, k_act)
                env_act = np.asarray(mdp.learner_to_env_action(a),
                                     np.float64)
                a_np, mu_np = np.asarray(a), np.asarray(mu)
                v_np, adv_np = np.asarray(val), np.asarray(adv)
                for lane in range(pool.n_lanes):
                    if (lane % pool.n_agents) in untracked:
                        lanes[lane].reset()
                        continue
                    lanes[lane].add_action(a_np[lane], mu_np[lane],
                                           v_np[lane], adv_np[lane])
                pool.send_actions(env_act)

                # ---- training, paced by obsPerStep ----
                if eval_mode:
                    continue
                if not initialized:
                    if int(rs.n_stored_steps()) >= cfg.minTotObsNum:
                        rs = init_stats_jit(rs)
                        initialized = True
                        start_env_steps = n_env_steps
                    continue
                allowed = int((n_env_steps - start_env_steps)
                              / cfg.obsPerStep) - n_grad
                n_tr = min(100, allowed, self.train_steps - n_grad)
                if n_tr > 0:
                    key, k_tr = jax.random.split(key)
                    params, opt_state, rs, _ = train_jit(
                        params, opt_state, rs, k_tr, n_tr)
                    n_grad += n_tr
                    if n_grad // 1000 > last_refresh // 1000:
                        last_refresh = n_grad
                        rs = refresh_jit(rs, float(n_grad))
        finally:
            pool.kill()
            if rew_file:
                rew_file.close()
            if obs_file:
                obs_file.close()
        self.params, self.opt_state, self.replay = params, opt_state, rs
        self.n_grad_steps, self.n_env_steps = n_grad, n_env_steps
        if self.run_dir and not eval_mode:
            import pickle
            snap = {"params": jax.device_get(params),
                    "opt_state": jax.device_get(opt_state),
                    "replay": jax.device_get(rs),
                    "n_grad_steps": n_grad, "n_env_steps": n_env_steps,
                    "initialized": initialized,
                    "start_env_steps": start_env_steps,
                    "cfg": cfg.to_dict()}
            tmp = os.path.join(self.run_dir, "checkpoint.pkl.tmp")
            with open(tmp, "wb") as f:
                pickle.dump(snap, f)
            os.replace(tmp, os.path.join(self.run_dir, "checkpoint.pkl"))
        return params
