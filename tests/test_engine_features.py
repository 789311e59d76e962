"""External-env Engine capabilities added for reference parity:

- per-agent MDPs -> multiple learners per session (competing agents;
  Environment.h:84-97, Worker.cpp:148,188, Communicator.cpp:207-219);
- recurrent serving with per-agent persistent contexts (AgentContext,
  Network/ThreadContext.h:19-100);
- FAIL-status / env-crash handling + worker respawn (Agent.h:83-86 vs
  Worker.cpp:146's die()).
"""
import os

import numpy as np
import pytest

import smarties_tpu
from smarties_tpu.utils.config import HyperParameters


def cfg(**kw):
    d = dict(minTotObsNum=128, maxTotObsNum=1024, batchSize=32,
             nnLayerSizes=[16, 16])
    d.update(kw)
    return HyperParameters(**d)


# ---------------------------------------------------------------------------
# a tiny 2-agent competing app with DIFFERENT per-agent MDPs: agent 0 is a
# 1-D continuous chaser, agent 1 a discrete evader on the same line
# (the external-app analog of reference apps/predator_prey)
def competing_app(comm):
    comm.setNumAgents(2)
    comm.agentsDefineDifferentMDP()
    comm.setStateActionDims(2, 1, 0)
    comm.setActionScales([1.0], [-1.0], True, 0)
    comm.setStateActionDims(3, 1, 1)          # evader sees an extra dim
    comm.setActionOptions(3, 1)               # discrete: left/stay/right
    rng = np.random.RandomState(comm.env_id)
    x0, x1 = rng.uniform(-1, 1, 2)
    comm.sendInitState(np.array([x0, x1 - x0]), 0)
    comm.sendInitState(np.array([x1, x1 - x0, 0.0]), 1)
    for t in range(40):
        a0 = comm.recvAction(0)
        a1 = comm.recvDiscreteAction(1)
        x0 = np.clip(x0 + 0.1 * float(a0[0]), -2, 2)
        x1 = np.clip(x1 + 0.1 * (a1 - 1), -2, 2)
        d = abs(x1 - x0)
        last = t == 39
        send0 = comm.sendLastState if last else comm.sendState
        send1 = comm.sendLastState if last else comm.sendState
        send0(np.array([x0, x1 - x0]), -d, 0)
        send1(np.array([x1, x1 - x0, float(t) / 40]), d, 1)


class TestCompetingAgents:
    def test_two_learners_train(self, tmp_path):
        e = smarties_tpu.Engine([])
        e.setNEnvironments(2)
        e.setSettings(cfg(minTotObsNum=64, maxTotObsNum=512))
        e.setNTrainSteps(30)
        e.setMaxEpisodeLength(64)
        e.run_dir = str(tmp_path)
        e.run(competing_app, max_wall_s=120)
        assert len(e.learners) == 2
        b0, b1 = e.learners
        # distinct MDPs routed to distinct learners
        assert b0.mdp.dim_state == 2 and not b0.mdp.is_discrete
        assert b1.mdp.dim_state == 3 and b1.mdp.is_discrete
        # both gathered data and both trained
        assert b0.n_env_steps > 0 and b1.n_env_steps > 0
        assert b0.n_grad >= 30 and b1.n_grad >= 30
        assert int(b0.rs.n_stored_eps()) > 0
        assert int(b1.rs.n_stored_eps()) > 0
        # checkpoint holds both learners
        import pickle
        with open(os.path.join(str(tmp_path), "checkpoint.pkl"), "rb") as f:
            snap = pickle.load(f)
        assert len(snap["learners"]) == 2


# ---------------------------------------------------------------------------
def lstm_app(comm):
    """1-D integrator with partial observation (needs memory)."""
    comm.setStateActionDims(1, 1)
    comm.setActionScales([1.0], [-1.0], True)
    rng = np.random.RandomState(comm.env_id)
    x = rng.uniform(-1, 1)
    comm.sendInitState(np.array([x]))
    for t in range(20):
        a = comm.recvAction()
        x = np.clip(x + 0.1 * float(a[0]), -2, 2)
        if t == 19:
            comm.sendLastState(np.array([x]), -abs(x))
        else:
            comm.sendState(np.array([x]), -abs(x))


class TestRecurrentServing:
    def test_lstm_over_envpool(self, tmp_path):
        """LSTM V-RACER serving external envs: per-agent recurrent carry
        (round-1 VERDICT: this crashed — no AgentContext analog)."""
        e = smarties_tpu.Engine([])
        e.setNEnvironments(2)
        e.setSettings(cfg(nnType="LSTM", nnLayerSizes=[8, 8],
                          minTotObsNum=64, maxTotObsNum=512,
                          nnBPTTseq=4))
        e.setNTrainSteps(10)
        e.setMaxEpisodeLength(32)
        e.run(lstm_app, max_wall_s=120)
        assert e.n_grad_steps >= 10
        # the serving carry exists and was advanced (nonzero states)
        rnn = e.learners[0].rnn
        assert rnn != ()
        leaves = [np.asarray(x) for x in
                  __import__("jax").tree_util.tree_leaves(rnn)]
        assert any(np.abs(x).sum() > 0 for x in leaves)


# ---------------------------------------------------------------------------
_CRASH_SENTINEL = "/tmp/smarties_tpu_test_crash_sentinel"


def crashing_app(comm):
    """App that hard-crashes mid-episode exactly once (sentinel file marks
    that the crash already happened, visible across respawns)."""
    comm.setStateActionDims(1, 1)
    comm.setActionScales([1.0], [-1.0], True)
    rng = np.random.RandomState(os.getpid())
    while True:
        x = rng.uniform(-1, 1)
        comm.sendInitState(np.array([x]))
        for t in range(10):
            a = comm.recvAction()
            x += 0.1 * float(a[0])
            if (comm.env_id == 0 and t == 3
                    and not os.path.exists(_CRASH_SENTINEL)):
                open(_CRASH_SENTINEL, "w").close()
                os._exit(1)     # simulated app crash
            if t == 9:
                comm.sendLastState(np.array([x]), -abs(x))
            else:
                comm.sendState(np.array([x]), -abs(x))


def simdir_app(comm):
    """App that records its CWD + staged args (one short episode)."""
    comm.setStateActionDims(1, 1)
    comm.setActionScales([1.0], [-1.0], True)
    with open("app_was_here.txt", "a") as f:
        f.write(" ".join(comm.app_arguments) + "\n")
    comm.sendInitState(np.zeros(1))
    for t in range(5):
        comm.recvAction()
        (comm.sendLastState if t == 4 else comm.sendState)(np.zeros(1),
                                                           1.0)


class TestSimDirsAndArgStages:
    def test_per_sim_dirs_and_staged_args(self, tmp_path):
        """Per-launch simulation_%03u_%05u dirs + setup-folder copy +
        staged app arg-files switching on the child's env-step counter
        (Core/Launcher.cpp:122-236)."""
        d = str(tmp_path)
        setup = os.path.join(d, "setup")
        os.makedirs(setup)
        open(os.path.join(setup, "data.cfg"), "w").write("cfg")
        for i, txt in enumerate(["--stage one", "--stage 'two words'"]):
            open(os.path.join(d, f"args{i}.txt"), "w").write(txt)

        e = smarties_tpu.Engine([])
        e.setNEnvironments(1)
        e.setSettings(cfg(minTotObsNum=16, maxTotObsNum=256, batchSize=8))
        e.setNTrainSteps(8)
        e.setMaxEpisodeLength(16)
        e.run_dir = d
        e.setSimulationArgumentsFilePath(
            os.path.join(d, "args0.txt") + ","
            + os.path.join(d, "args1.txt"), "10,0")
        e.setSimulationSetupFolderPath(setup)
        e.run(simdir_app, max_wall_s=120)

        sims = sorted(f for f in os.listdir(d)
                      if f.startswith("simulation_000_"))
        assert len(sims) >= 3, sims
        # setup folder copied into each sim dir + app ran there
        for s in sims[:3]:
            assert os.path.exists(os.path.join(d, s, "data.cfg"))
        # stage 0 args for the first launches (<10 steps), stage 1 later
        first = open(os.path.join(d, sims[0], "app_was_here.txt")).read()
        assert "--stage one" in first
        last = open(os.path.join(d, sims[-1], "app_was_here.txt")).read()
        assert "two words" in last    # quoted group == one token rejoined


class TestFailHandling:
    def test_crash_drops_episode_and_respawns(self):
        if os.path.exists(_CRASH_SENTINEL):
            os.remove(_CRASH_SENTINEL)
        e = smarties_tpu.Engine([])
        e.setNEnvironments(2)
        e.setSettings(cfg(minTotObsNum=48, maxTotObsNum=512))
        e.setNTrainSteps(5)
        e.setMaxEpisodeLength(32)
        e.run(crashing_app, max_wall_s=120)
        # training completed despite the crash; episodes from the healthy
        # env (and the respawned one) were stored
        assert e.n_grad_steps >= 5
        assert int(e.replay.n_stored_eps()) > 0


# ---------------------------------------------------------------------------
class TestR3Parity:
    def test_eval_cli_flags(self):
        """--nEvalEpisodes / --bTrain parse to eval mode with restart
        defaulting to run_dir (ExecutionInfo.cpp:95-170, Engine.cpp:92-95)."""
        e = smarties_tpu.Engine(["prog", "--nEvalEpisodes", "7",
                                 "--runDir", "/tmp/rd"])
        assert not e.parse()
        assert e.cfg.bTrain == 0
        assert e.n_eval_episodes == 7
        assert e.restart_path == os.path.join("/tmp/rd", "checkpoint.pkl")
        e2 = smarties_tpu.Engine(["prog", "--bTrain", "0",
                                  "--restart", "/tmp/x.pkl"])
        assert not e2.parse()
        assert e2.cfg.bTrain == 0 and e2.restart_path == "/tmp/x.pkl"
        e3 = smarties_tpu.Engine(["prog"])
        assert not e3.parse()
        assert e3.cfg.bTrain == 1

    def test_state_scales_seed_standardization(self):
        """setStateScales seeds state_mean/std until online stats warm up
        (Communicator.cpp:98-122)."""
        from smarties_tpu.runtime.communicator import spec_to_mdp
        from smarties_tpu.runtime.engine import _LearnerBundle
        spec = {"dim_state": 3, "dim_action": 1, "bounded": (True,),
                "upper": (1.0,), "lower": (-1.0,), "discrete_values": (),
                "observable": (True, False, True), "n_agents": 1,
                "n_appended_obs": 0, "agent_overrides": {},
                "different_mdps": False,
                "state_upper": (2.0, 9.0, 4.0),
                "state_lower": (-2.0, -9.0, 0.0)}
        mdp = spec_to_mdp(spec)
        b = _LearnerBundle(0, mdp, cfg(), [0], 16)
        np.testing.assert_allclose(np.asarray(b.rs.state_mean),
                                   [0.0, 2.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(b.rs.state_std),
                                   [4.0, 4.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(b.rs.state_scale),
                                   [0.25, 0.25], atol=1e-6)

    def test_distributed_agents_mutually_exclusive(self):
        """Reference die()s on the combination (Communicator.cpp:200-205)."""
        from smarties_tpu.runtime.communicator import Communicator
        c = Communicator(conn=None)
        c.setNumAgents(2)
        c.agentsDefineDifferentMDP()
        with pytest.raises(AssertionError):
            c.envHasDistributedAgents()
        c2 = Communicator(conn=None)
        c2.setNumAgents(2)
        c2.envHasDistributedAgents()
        with pytest.raises(AssertionError):
            c2.agentsDefineDifferentMDP()


# ---------------------------------------------------------------------------
class TestPerLearnerSettings:
    """Per-learner settings_%02u.json + programmatic overrides
    (AlgoFactory::findSettingsFile, AlgoFactory.cpp:37-58): competing
    agents may train with DIFFERENT algorithms and recipes."""

    def test_settings_json_and_programmatic(self, tmp_path):
        import json as _json
        e = smarties_tpu.Engine([])
        e.run_dir = str(tmp_path)
        e.setSettings(cfg())                       # shared default: VRACER
        with open(tmp_path / "settings_01.json", "w") as f:
            _json.dump({"learner": "DPG", "batchSize": 16,
                        "learnrate": 1e-5, "minTotObsNum": 128,
                        "maxTotObsNum": 1024, "nnLayerSizes": [16, 16]}, f)
        c0 = e._resolve_learner_cfg(0)
        c1 = e._resolve_learner_cfg(1)
        assert c0.learner == "VRACER" and c0.batchSize == 32
        assert c1.learner == "DPG" and c1.batchSize == 16
        e.setLearnerSettings(1, cfg(learner="NAF"))
        assert e._resolve_learner_cfg(1).learner == "NAF"

    def test_mixed_algo_engine_run(self, tmp_path):
        """Competing app trained end-to-end with DPG on the continuous
        agent 0 and V-RACER(->RACER-discrete) on agent 1 — the two
        bundles must run distinct algorithms."""
        from smarties_tpu.algos.dpg import DPG
        from smarties_tpu.algos.vracer import VRacer
        e = smarties_tpu.Engine([])
        e.setNEnvironments(2)
        e.setSettings(cfg(minTotObsNum=64, maxTotObsNum=512))
        e.setLearnerSettings(0, cfg(learner="DPG", minTotObsNum=64,
                                    maxTotObsNum=512, batchSize=16))
        e.setNTrainSteps(25)
        e.setMaxEpisodeLength(64)
        e.run(competing_app, max_wall_s=120)
        assert len(e.learners) == 2
        assert isinstance(e.learners[0].algo, DPG)
        assert isinstance(e.learners[1].algo, VRacer)
        assert e.learners[0].n_grad >= 25
        assert e.learners[1].n_grad >= 25
