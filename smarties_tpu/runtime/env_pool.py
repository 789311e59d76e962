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

from smarties_tpu.runtime.communicator import (CONT, INIT, KILL_ACTION,
                                               LAST, TERM, Communicator,
                                               TrainingTerminated,
                                               spec_to_mdp)


def _env_worker(app_main, conn, env_id: int, seed: int):
    np.random.seed(seed)
    comm = Communicator(conn, env_id)
    try:
        while True:
            app_main(comm)
    except (TrainingTerminated, EOFError, KeyboardInterrupt):
        pass
    finally:
        conn.close()


class EnvPool:
    def __init__(self, app_main: Callable, n_envs: int, seed: int = 0):
        ctx = mp.get_context("fork")
        self.n_envs = n_envs
        self._conns, self._procs = [], []
        for i in range(n_envs):
            parent, child = ctx.Pipe()
            p = ctx.Process(target=_env_worker,
                            args=(app_main, child, i, seed + i),
                            daemon=True)
            p.start()
            child.close()
            self._conns.append(parent)
            self._procs.append(p)
        self.spec = None
        self.mdp = None
        self.n_agents = 1

    def probe_spec(self):
        """Wait for the first env's problem description (the reference
        broadcasts + verifies the MDP across all envs,
        Worker::synchronizeEnvironments, Worker.cpp:218-297)."""
        kind, spec = self._conns[0].recv()
        assert kind == "spec", kind
        self.spec = spec
        self.mdp = spec_to_mdp(spec)
        self.n_agents = spec.get("n_agents", 1)
        self._pending0 = self._conns[0].recv()  # first state already sent
        return self.mdp

    @property
    def n_lanes(self) -> int:
        return self.n_envs * self.n_agents

    def gather_states(self):
        """Collect, per lane, messages until each lane has a pending
        action request (INIT/CONT) — TERM/LAST messages are returned as
        completed-step records without action requests.

        Returns (need_action [n_lanes] bool, states [n_lanes, dimS],
                 rewards [n_lanes], statuses [n_lanes]).
        """
        n = self.n_lanes
        states = np.zeros((n, self.mdp.dim_state), np.float64)
        rewards = np.zeros(n)
        statuses = np.full(n, -1, np.int64)
        events = []   # ordered (lane, status, state, reward) records
        for e, conn in enumerate(self._conns):
            waiting = True
            while waiting:
                if e == 0 and getattr(self, "_pending0", None) is not None:
                    msg = self._pending0
                    self._pending0 = None
                else:
                    msg = conn.recv()
                if msg[0] == "spec":
                    continue
                _, agent_id, status, state, reward = msg
                lane = e * self.n_agents + agent_id
                events.append((lane, status, state, reward))
                states[lane] = state
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
                conn.send(env_actions[lane])

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
