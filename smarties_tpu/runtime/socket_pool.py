"""UNIX-socket transport for native (C++/C/Fortran) environment apps.

Learner-side counterpart of native/smarties_tpu.{h,cpp}: listens on a
UNIX-domain socket, spawns (or accepts) N env-app processes, and exposes
the same gather_states / send_actions interface as the python EnvPool
(runtime/env_pool.py), so the Engine serves both transports identically.

This is the analog of the reference's Launcher::forkApplication + SocketsLib
(Core/Launcher.cpp:28-69, Utils/SocketsLib.h) with this framework's own
wire protocol (see native/smarties_tpu.h).
"""
from __future__ import annotations

import json
import os
import socket
import struct
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

from smarties_tpu.runtime.communicator import (CONT, INIT, LAST, TERM,
                                               spec_to_mdp)

MAGIC_SPEC = 0x43455053
MAGIC_STAT = 0x54415453
MAGIC_ACTN = 0x4E544341
MAGIC_KILL = 0x4C4C494B


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise EOFError("env app closed the connection")
        buf += chunk
    return buf


class SocketEnvPool:
    """Drop-in alternative to EnvPool for native apps.

    Args:
      command: argv to launch ONE env app process (launched n_envs times
               with SMARTIES_TPU_SOCKET set), or None to only accept
               externally-started clients.
    """

    def __init__(self, command: Optional[Sequence[str]], n_envs: int,
                 socket_path: Optional[str] = None):
        self.n_envs = n_envs
        self.socket_path = socket_path or os.path.join(
            tempfile.mkdtemp(prefix="smarties_tpu_"), "comm.sock")
        self._server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._server.bind(self.socket_path)
        self._server.listen(n_envs)
        self._procs = []
        env = dict(os.environ, SMARTIES_TPU_SOCKET=self.socket_path)
        if command is not None:
            for _ in range(n_envs):
                self._procs.append(subprocess.Popen(list(command), env=env))
        self._conns: List[socket.socket] = []
        for _ in range(n_envs):
            conn, _ = self._server.accept()
            self._conns.append(conn)
        self.spec = None
        self.mdp = None
        self.n_agents = 1
        self._pending = [None] * n_envs

    # ---------------- message parsing ----------------
    def _recv_msg(self, e: int):
        conn = self._conns[e]
        magic, = struct.unpack("<I", _read_exact(conn, 4))
        if magic == MAGIC_SPEC:
            ln, = struct.unpack("<I", _read_exact(conn, 4))
            spec = json.loads(_read_exact(conn, ln).decode())
            return ("spec", self._normalize_spec(spec))
        if magic == MAGIC_STAT:
            agent, status, dim = struct.unpack("<III", _read_exact(conn, 12))
            state = np.frombuffer(_read_exact(conn, 8 * dim), np.float64)
            reward, = struct.unpack("<d", _read_exact(conn, 8))
            return ("state", agent, status, state.copy(), reward)
        raise ValueError(f"bad magic {magic:#x} from env {e}")

    @staticmethod
    def _normalize_spec(spec: dict) -> dict:
        out = {"dim_state": spec.get("dim_state"),
               "dim_action": spec.get("dim_action"),
               "bounded": tuple(spec["bounded"]) if "bounded" in spec
               else None,
               "upper": tuple(spec.get("upper", ())) or None,
               "lower": tuple(spec.get("lower", ())) or None,
               "discrete_values": tuple(spec.get("discrete_values", ())),
               "observable": tuple(spec["observable"])
               if "observable" in spec else None,
               "n_agents": spec.get("n_agents", 1),
               "n_appended_obs": spec.get("n_appended_obs", 0),
               "conv_layers": tuple(tuple(c) for c in
                                    spec.get("conv_layers", ()))}
        return out

    # ---------------- EnvPool interface ----------------
    def probe_spec(self):
        kind, spec = self._recv_msg(0)
        assert kind == "spec", kind
        self.spec = spec
        self.mdp = spec_to_mdp(spec)
        self.n_agents = spec.get("n_agents", 1)
        self._pending[0] = self._recv_msg(0)
        return self.mdp

    @property
    def n_lanes(self) -> int:
        return self.n_envs * self.n_agents

    def gather_states(self):
        n = self.n_lanes
        states = np.zeros((n, self.mdp.dim_state), np.float64)
        rewards = np.zeros(n)
        statuses = np.full(n, -1, np.int64)
        events = []
        for e in range(self.n_envs):
            waiting = True
            while waiting:
                if self._pending[e] is not None:
                    msg = self._pending[e]
                    self._pending[e] = None
                else:
                    msg = self._recv_msg(e)
                if msg[0] == "spec":
                    continue
                _, agent_id, status, state, reward = msg
                lane = e * self.n_agents + agent_id
                events.append((lane, status, state, reward))
                states[lane] = state
                rewards[lane] = reward
                statuses[lane] = status
                if status in (INIT, CONT):
                    waiting = False
        return events, states, rewards, statuses

    def send_actions(self, env_actions: np.ndarray):
        for e in range(self.n_envs):
            for a in range(self.n_agents):
                lane = e * self.n_agents + a
                act = np.asarray(env_actions[lane], np.float64).ravel()
                msg = struct.pack("<II", MAGIC_ACTN, act.size) \
                    + act.tobytes()
                self._conns[e].sendall(msg)

    def kill(self):
        for conn in self._conns:
            try:
                conn.sendall(struct.pack("<I", MAGIC_KILL))
                conn.close()
            except OSError:
                pass
        for p in self._procs:
            try:
                p.wait(timeout=2)
            except subprocess.TimeoutExpired:
                p.terminate()
        try:
            os.unlink(self.socket_path)
        except OSError:
            pass
