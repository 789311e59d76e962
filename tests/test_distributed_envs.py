"""P6: multi-process environment teams (SURVEY §2.9).

- TeamComm collectives (the environment_app_comm analog,
  ExecutionInfo.cpp:315-332);
- distributed ENVIRONMENTS: every team member is an agent channel,
  termination agreed by the team (reference apps/cart_pole_distribEnv);
- distributed AGENTS: one logical agent spans the team, rank-0 states
  ingested once, action broadcast to every member (Worker.cpp:371-383;
  reference apps/cart_pole_distribAgent);
- the cart_pole_many per-agent-MDP demo app end-to-end.
"""
import importlib.util
import multiprocessing as mp
import os

import numpy as np
import pytest

import smarties_tpu
from smarties_tpu.runtime.team import TeamComm, make_team_pipes
from smarties_tpu.utils.config import HyperParameters

APPS = os.path.join(os.path.dirname(__file__), "..", "apps")


def load_app(name):
    spec = importlib.util.spec_from_file_location(
        f"{name}_exec", os.path.join(APPS, name, "exec.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def cfg(**kw):
    d = dict(minTotObsNum=64, maxTotObsNum=512, batchSize=32,
             nnLayerSizes=[16, 16])
    d.update(kw)
    return HyperParameters(**d)


# ---------------------------------------------------------------------
def _team_member(rank, size, conns, out_q):
    team = TeamComm(rank, size, conns)
    g = team.allgather(rank * 10)
    s = team.allreduce(rank + 1.0)
    b = team.bcast("hello" if rank == 0 else None)
    team.barrier()
    arr = team.allgather_array(np.full(2, float(rank)))
    out_q.put((rank, g, s, b, arr.tolist()))


class TestTeamComm:
    def test_collectives_3way(self):
        ctx = mp.get_context("fork")
        size = 3
        root_ends, member_ends = make_team_pipes(ctx, size)
        q = ctx.Queue()
        procs = []
        for r in range(size):
            conns = root_ends if r == 0 else member_ends[r - 1]
            p = ctx.Process(target=_team_member, args=(r, size, conns, q))
            p.start()
            procs.append(p)
        results = {}
        for _ in range(size):
            r, g, s, b, arr = q.get(timeout=30)
            results[r] = (g, s, b, arr)
        for p in procs:
            p.join(timeout=10)
        for r in range(size):
            g, s, b, arr = results[r]
            assert g == [0, 10, 20]
            assert s == 6.0
            assert b == "hello"
            assert arr == [0.0, 0.0, 1.0, 1.0, 2.0, 2.0]

    def test_single_member(self):
        team = TeamComm(0, 1, [])
        assert team.allgather(7) == [7]
        assert team.allreduce(3) == 3
        team.barrier()


# ---------------------------------------------------------------------
class TestDistribEnv:
    def test_cartpole_distrib_env_trains(self, tmp_path):
        app = load_app("cart_pole_distribEnv")
        e = smarties_tpu.Engine([])
        e.setNEnvironments(1)
        e.setNworkersPerEnvironment(2)
        e.setSettings(cfg())
        e.setNTrainSteps(20)
        e.setMaxEpisodeLength(512)
        e.run_dir = str(tmp_path)
        e.run(app.app_main, max_wall_s=180)
        b = e.learners[0]
        # both team members are full agent channels: 1 env x 2 members
        assert b.n_env_steps > 0
        assert b.n_grad >= 20
        # episodes from BOTH lanes were committed (team termination works)
        rew = open(os.path.join(str(tmp_path),
                                "agent_00_rank00_cumulative_rewards.dat")
                   ).read().split("\n")
        lanes = {int(r.split()[2]) for r in rew if r.strip()}
        assert lanes == {0, 1}


class TestDistribAgent:
    def test_cartpole_distrib_agent_trains(self, tmp_path):
        app = load_app("cart_pole_distribAgent")
        e = smarties_tpu.Engine([])
        e.setNEnvironments(1)
        e.setNworkersPerEnvironment(2)
        e.setSettings(cfg())
        e.setNTrainSteps(20)
        e.setMaxEpisodeLength(512)
        e.run_dir = str(tmp_path)
        e.run(app.app_main, max_wall_s=180)
        b = e.learners[0]
        # ONE logical agent spans the team: a single lane, joint MDP
        assert b.mdp.dim_state == 8 and b.mdp.dim_action == 2
        assert b.n_env_steps > 0 and b.n_grad >= 20
        rew = open(os.path.join(str(tmp_path),
                                "agent_00_rank00_cumulative_rewards.dat")
                   ).read().split("\n")
        lanes = {int(r.split()[2]) for r in rew if r.strip()}
        assert lanes == {0}


# ---------------------------------------------------------------------
class TestPredatorPreyApp:
    def test_competing_demo_trains(self, tmp_path):
        """The external predator/prey demo (reference apps/predator_prey):
        two per-agent MDPs -> two learners, zero-sum rewards."""
        app = load_app("predator_prey")
        e = smarties_tpu.Engine([])
        e.setNEnvironments(2)
        e.setSettings(cfg())
        e.setNTrainSteps(10)
        e.setMaxEpisodeLength(512)
        e.run_dir = str(tmp_path)
        e.run(app.app_main, max_wall_s=240)
        assert len(e.learners) == 2
        b0, b1 = e.learners
        assert b0.n_grad >= 10 and b1.n_grad >= 10
        assert int(b0.rs.n_stored_eps()) > 0
        assert int(b1.rs.n_stored_eps()) > 0


# ---------------------------------------------------------------------
class TestCartPoleMany:
    def test_per_agent_mdps_two_learners(self, tmp_path):
        app = load_app("cart_pole_many")
        e = smarties_tpu.Engine([])
        e.setNEnvironments(2)
        e.setSettings(cfg())
        e.setNTrainSteps(15)
        e.setMaxEpisodeLength(512)
        e.run_dir = str(tmp_path)
        e.run(app.app_main, max_wall_s=180)
        assert len(e.learners) == 2
        b0, b1 = e.learners
        # agent 1 is partially observed: only 3 of 6 state vars visible
        assert b0.mdp.dim_state_observed > b1.mdp.dim_state_observed
        assert b1.mdp.dim_state_observed == 3
        assert b0.n_grad >= 15 and b1.n_grad >= 15
        assert int(b0.rs.n_stored_eps()) > 0
        assert int(b1.rs.n_stored_eps()) > 0


@pytest.mark.timeout(300)
def test_diffusion_control_team_app():
    """CUP2D-coupling-pattern demo (apps/diffusion_control): a 1-D heat
    rod DOMAIN-DECOMPOSED across a 2-process env team — halo exchange
    via TeamComm, one logical agent (envHasDistributedAgents), rank-0
    ingest + identical replies (reference apps/CUP2D_* shape)."""
    import runpy
    mod = runpy.run_path(os.path.join(
        os.path.dirname(__file__), "..", "apps", "diffusion_control",
        "exec.py"))
    import smarties_tpu
    from smarties_tpu.utils.config import HyperParameters
    e = smarties_tpu.Engine([])
    e.setNEnvironments(2)
    e.setNworkersPerEnvironment(2)
    e.setSettings(HyperParameters(minTotObsNum=128, maxTotObsNum=1024,
                                  batchSize=32, nnLayerSizes=[16, 16]))
    e.setNTrainSteps(30)
    e.setMaxEpisodeLength(mod["EP_LEN"] + 1)
    e.run(mod["app_main"], max_wall_s=240)
    assert e.n_grad_steps >= 30
    assert int(e.replay.n_stored_steps()) > 0
