"""Worker-process pool hosting user environment applications.

Re-implements the reference's forked-env serving model
(Core/Launcher.cpp:28-69 forkApplication + Core/Master.cpp:118-144
waitForStateActionCallers): each env app runs `app_main(comm)` forever in
its own process; the learner-side pool gathers one pending state per agent
lane, batches them for a single jitted action-selection call, and scatters
the replies.

Lane model: lane = (env, agent) pair, matching the reference's agent
vector (Environment.h:42-82). An env that ends an episode (TERM/LAST)
immediately starts the next (INIT) without an action in between, so every
lane always converges to exactly one outstanding action request per round.
"""
from __future__ import annotations

import multiprocessing as mp
import os
from typing import Callable, List, Optional, Tuple

import numpy as np

from smarties_tpu.runtime.communicator import (CONT, FAIL, INIT, KILL_ACTION,
                                               LAST, TERM, Communicator,
                                               TrainingTerminated,
                                               spec_to_mdp, spec_to_mdps)


def _stage_args(comm, launch_opts: dict):
    """Pick the active appSettings file by the child-local env-step
    counter and load its tokens (Launcher::initArgumentFileNames +
    readRunArgLst, Core/Launcher.cpp:122-151,190-236; '...'-quoted groups
    become one token like the reference's apostrophe handling)."""
    files = launch_opts.get("app_settings") or []
    if not files:
        comm.app_arguments = []
        return
    limits = launch_opts.get("arg_step_limits") or [0] * len(files)
    ind = 0
    for i, lim in enumerate(limits):
        if comm.global_tstep >= lim:
            ind = i
    import shlex
    path = files[ind]
    base = launch_opts.get("run_dir") or "."
    if not os.path.isabs(path):
        path = os.path.join(base, path)
    with open(path) as f:
        comm.app_arguments = shlex.split(f.read().replace("'", '"'))


def _enter_sim_dir(env_id: int, launch_counter: int, launch_opts: dict):
    """Per-launch working directory simulation_%03u_%05u with optional
    setup-folder copy (Launcher::createGoRunDir, Core/Launcher.cpp:154-186)."""
    base = launch_opts.get("run_dir") or "."
    while True:
        d = os.path.join(base, f"simulation_{env_id:03d}_"
                               f"{launch_counter:05d}")
        if not os.path.exists(d):
            break
        launch_counter += 1
    os.makedirs(d, exist_ok=True)
    setup = launch_opts.get("setup_folder")
    if setup:
        import shutil
        for name in os.listdir(setup):
            src = os.path.join(setup, name)
            dst = os.path.join(d, name)
            if os.path.isdir(src):
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy2(src, dst)
    os.chdir(d)
    return launch_counter


def _env_worker(app_main, conn, env_id: int, seed: int,
                launch_opts: Optional[dict] = None):
    np.random.seed(seed)
    comm = Communicator(conn, env_id)
    launch_opts = launch_opts or {}
    sim_dirs = launch_opts.get("sim_dirs", False)
    home = os.getcwd()
    launch_counter = 0
    try:
        while True:
            if launch_opts.get("app_settings"):
                _stage_args(comm, launch_opts)
            if sim_dirs:
                launch_counter = _enter_sim_dir(env_id, launch_counter,
                                                launch_opts) + 1
            try:
                app_main(comm)
            finally:
                if sim_dirs:
                    os.chdir(home)
    except (TrainingTerminated, EOFError, KeyboardInterrupt):
        pass
    finally:
        conn.close()


class EnvCrashed(RuntimeError):
    """An env worker died and could not be (re)spawned."""


class EnvPool:
    """max_respawns: how many times a crashed env app is restarted before
    the pool gives up (the reference only detects the crash and dies,
    Worker.cpp:146 'app crashed. TODO: handle'; here the episode is
    dropped via a FAIL event, Agent.h:83-86, and the app is relaunched)."""

    def __init__(self, app_main: Callable, n_envs: int, seed: int = 0,
                 max_respawns: int = 3,
                 launch_opts: Optional[dict] = None):
        """launch_opts (Launcher.cpp:122-236 features): dict with
        sim_dirs (bool), run_dir (str), setup_folder (str),
        app_settings (list of arg-file paths),
        arg_step_limits (list of child env-step thresholds)."""
        self._ctx = mp.get_context("fork")
        self._app_main = app_main
        self._seed = seed
        self._launch_opts = launch_opts
        self.n_envs = n_envs
        self.max_respawns = max_respawns
        self._respawns = [0] * n_envs
        self._conns: List = [None] * n_envs
        self._procs: List = [None] * n_envs
        for i in range(n_envs):
            self._spawn(i)
        self.spec = None
        self.mdp = None
        self.n_agents = 1

    def _spawn(self, i: int):
        parent, child = self._ctx.Pipe()
        p = self._ctx.Process(
            target=_env_worker,
            args=(self._app_main, child, i,
                  self._seed + i + self.n_envs * self._respawns[i],
                  self._launch_opts),
            daemon=True)
        p.start()
        child.close()
        self._conns[i], self._procs[i] = parent, p

    def probe_spec(self):
        """Wait for the first env's problem description (the reference
        broadcasts + verifies the MDP across all envs,
        Worker::synchronizeEnvironments, Worker.cpp:218-297)."""
        kind, spec = self._conns[0].recv()
        assert kind == "spec", kind
        self.spec = spec
        self.mdp = spec_to_mdp(spec)
        self.mdps = spec_to_mdps(spec)  # one per learner (different_mdps)
        self.n_agents = spec.get("n_agents", 1)
        self._pending0 = self._conns[0].recv()  # first state already sent
        return self.mdp

    @property
    def n_lanes(self) -> int:
        return self.n_envs * self.n_agents

    def _recv(self, e: int):
        """Blocking recv from env e that detects a dead worker: returns
        None if the process died (the reference's crash surfaces as a FAIL
        status, Agent.h:23; detection analog of Worker.cpp:146)."""
        conn = self._conns[e]
        while True:
            try:
                if conn.poll(0.05):
                    return conn.recv()
            except (EOFError, OSError):
                return None
            if not self._procs[e].is_alive():
                # drain anything the child flushed before dying
                try:
                    if conn.poll(0):
                        return conn.recv()
                except (EOFError, OSError):
                    pass
                return None

    def _handle_death(self, e: int):
        """Respawn a crashed env app (or give up after max_respawns)."""
        try:
            self._conns[e].close()
        except OSError:
            pass
        if self._respawns[e] >= self.max_respawns:
            raise EnvCrashed(
                f"env {e} crashed {self._respawns[e] + 1} times; giving up")
        self._respawns[e] += 1
        self._spawn(e)
        # fresh app re-sends its spec before the first state
        kind, _ = self._conns[e].recv()
        assert kind == "spec", kind

    def gather_states(self):
        """Collect, per lane, messages until each lane has a pending
        action request (INIT/CONT) — TERM/LAST messages are returned as
        completed-step records without action requests. A crashed worker
        yields FAIL events for its lanes (episode dropped by the caller,
        Agent.h:83-86) and is respawned.

        Returns (events, states [n_lanes, dimS], rewards [n_lanes],
                 statuses [n_lanes]).
        """
        n = self.n_lanes
        # rows sized to the largest per-agent state (per-agent MDPs may
        # declare different dims); shorter states are zero-padded
        dim_s = max(m.dim_state for m in getattr(self, "mdps", [self.mdp]))
        states = np.zeros((n, dim_s), np.float64)
        rewards = np.zeros(n)
        statuses = np.full(n, -1, np.int64)
        events = []   # ordered (lane, status, state, reward) records
        for e in range(self.n_envs):
            waiting = True
            while waiting:
                if e == 0 and getattr(self, "_pending0", None) is not None:
                    msg = self._pending0
                    self._pending0 = None
                else:
                    msg = self._recv(e)
                if msg is None:   # worker died mid-episode
                    zero = np.zeros(self.mdp.dim_state)
                    for a in range(self.n_agents):
                        events.append((e * self.n_agents + a, FAIL,
                                       zero, 0.0))
                    self._handle_death(e)
                    continue      # fresh app proceeds to its INIT state
                if msg[0] == "spec":
                    continue
                _, agent_id, status, state, reward = msg
                lane = e * self.n_agents + agent_id
                events.append((lane, status, state, reward))
                states[lane, :len(state)] = state
                rewards[lane] = reward
                statuses[lane] = status
                # INIT/CONT block the app in recvAction -> need a reply
                if status in (INIT, CONT):
                    waiting = False
        return events, states, rewards, statuses

    def send_actions(self, env_actions: np.ndarray):
        """Reply one action per lane (lane-major order)."""
        for e, conn in enumerate(self._conns):
            for a in range(self.n_agents):
                lane = e * self.n_agents + a
                try:
                    conn.send(env_actions[lane])
                except (BrokenPipeError, OSError):
                    pass  # death is detected on the next gather round

    def kill(self):
        for conn in self._conns:
            try:
                conn.send(KILL_ACTION)
            except (BrokenPipeError, OSError):
                pass
        for p in self._procs:
            p.join(timeout=2)
            if p.is_alive():
                p.terminate()
