"""Shared-memory serving transport tests (r4).

Covers the ShmChannel slab protocol (seqlock ring, action rounds), the
EnvPool shm hot path end-to-end vs the pipe transport, and the
SocketEnvPool serving-mode guard (ADVICE r3 #3).
"""
import os

import numpy as np
import pytest

from smarties_tpu.runtime.communicator import ShmChannel
from smarties_tpu.runtime.env_pool import EnvPool


def _counter_app(comm):
    """1-D env whose state counts served steps (deterministic)."""
    comm.setStateActionDims(2, 1)
    comm.setActionScales([1.0], [-1.0], True)
    t = 0
    while True:
        comm.sendInitState(np.asarray([float(t), 0.0]))
        for k in range(3):
            a = comm.recvAction()
            t += 1
            if k == 2:
                comm.sendTermState(np.asarray([float(t), a[0]]), 1.0)
            else:
                comm.sendState(np.asarray([float(t), a[0]]), 0.5)


def test_shm_channel_roundtrip():
    ch = ShmChannel.create(n_agents=2, dim_state=3, dim_action=2)
    try:
        peer = ShmChannel.attach(ch.name, 2, 3, 2, ch.ring_len)
        ch.push_state(0, 1, np.asarray([1.0, 2.0, 3.0]), 0.25)
        ch.push_state(1, 2, np.asarray([4.0, 5.0, 6.0]), -1.0)
        entries, seq = peer.read_new(0)
        assert seq == 2 and len(entries) == 2
        kind, agent, status, state, reward = entries[0]
        assert (kind, agent, status, reward) == ("state", 0, 1, 0.25)
        np.testing.assert_allclose(state, [1.0, 2.0, 3.0])
        _, agent1, status1, state1, reward1 = entries[1]
        assert (agent1, status1, reward1) == (1, 2, -1.0)
        # wrap the ring
        for i in range(ch.ring_len + 3):
            ch.push_state(0, 1, np.asarray([float(i), 0, 0]), 0.0)
        entries, seq = peer.read_new(seq)
        assert len(entries) == ch.ring_len + 3
        assert entries[-1][3][0] == float(ch.ring_len + 2)
        # action rows
        peer.write_action(1, np.asarray([7.0, 8.0]))
        peer.publish_round()
        assert int(ch.hdr[1]) == 1
        np.testing.assert_allclose(ch.acts[1], [7.0, 8.0])
        peer.close()
    finally:
        ch.close(unlink=True)


@pytest.mark.parametrize("use_shm", [False, True])
def test_env_pool_transports_equivalent(use_shm):
    """The slab transport must serve the same event stream as pipes."""
    pool = EnvPool(_counter_app, 2, seed=0, use_shm=use_shm)
    pool.probe_spec()
    assert bool(pool._shm) == use_shm or not use_shm
    seen = []
    served_rounds = 0
    def terms():
        return {ln for ln, s, _, _ in seen if s == 2}
    while served_rounds < 60 and terms() != {0, 1}:
        events, ready = pool.poll_states(timeout=1.0)
        for lane, status, state, reward in events:
            seen.append((lane, status, float(state[0]), float(reward)))
        if ready:
            pool.send_actions(
                [np.asarray([0.5]) if i in set(ready) else None
                 for i in range(pool.n_lanes)])
            served_rounds += 1
    pool.kill()
    # both transports produce per-lane monotone counters with the same
    # status cadence INIT,(CONT,CONT,TERM)
    for lane in (0, 1):
        rows = [(s, t) for ln, s, t, _ in seen if ln == lane]
        assert rows[0][0] == 0                       # INIT first
        ts = [t for _, t in rows]
        assert ts == sorted(ts)
        statuses = [s for s, _ in rows]
        assert 2 in statuses                         # TERM seen


def test_env_pool_shm_respawn():
    """A crashing shm worker surfaces FAIL and re-attaches a new slab."""

    def crashy(comm):
        comm.setStateActionDims(1, 1)
        comm.setActionScales([1.0], [-1.0], True)
        comm.sendInitState(np.zeros(1))
        comm.recvAction()
        os._exit(1)

    pool = EnvPool(crashy, 1, seed=0, max_respawns=2, use_shm=True)
    pool.probe_spec()
    fails = 0
    rounds = 0
    while fails < 1 and rounds < 40:
        events, ready = pool.poll_states(timeout=1.0)
        fails += sum(1 for _, s, _, _ in events if s == 4)
        if ready:
            pool.send_actions([np.asarray([0.0])])
        rounds += 1
    pool.kill()
    assert fails >= 1


def test_socket_pool_mode_guard():
    """gather_states after poll_states buffering must raise (one serving
    mode per pool instance; ADVICE r3 #3)."""
    from smarties_tpu.runtime.socket_pool import SocketEnvPool
    pool = SocketEnvPool.__new__(SocketEnvPool)
    pool._rbuf = [b"\x01"]          # a parked partial frame
    pool._chan_events = {}
    with pytest.raises(RuntimeError, match="ONE serving mode"):
        pool.gather_states()
