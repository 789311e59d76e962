"""Learner factory: settings string -> algorithm instance.

Re-implements the reference AlgoFactory (source/smarties/Learners/
AlgoFactory.cpp:60-340): maps cfg.learner to the concrete learner with the
right policy/advantage family, including the V-RACER -> RACER rewrite for
discrete action spaces (:78-83).
"""
from __future__ import annotations

from smarties_tpu.core.mdp import MDPSpec
from smarties_tpu.utils.config import HyperParameters


def make_learner(mdp: MDPSpec, cfg: HyperParameters):
    name = cfg.learner
    if name in ("VRACER", "default"):
        if cfg.ESpopSize > 1:
            from smarties_tpu.algos.racer_es import RacerES
            return RacerES(mdp, cfg)  # VRACER_CMA derivative-free path
        from smarties_tpu.algos.vracer import VRacer
        return VRacer(mdp, cfg)       # discrete auto-rewrites to RACER
    if name == "RACER":
        if cfg.ESpopSize > 1:
            from smarties_tpu.algos.racer_es import RacerES
            return RacerES(mdp, cfg, adv_kind="discrete"
                           if mdp.is_discrete else "gaussian")
        from smarties_tpu.algos.vracer import Racer
        return Racer(mdp, cfg)
    if name in ("DQN", "NFQ"):
        from smarties_tpu.algos.dqn import DQN
        return DQN(mdp, cfg)
    if name in ("NAF",):
        from smarties_tpu.algos.naf import NAF
        return NAF(mdp, cfg)
    if name in ("DPG", "DDPG"):
        from smarties_tpu.algos.dpg import DPG
        return DPG(mdp, cfg)
    if name in ("PPO", "GAE"):
        from smarties_tpu.algos.ppo import PPO
        return PPO(mdp, cfg)
    if name == "MixedPG":
        from smarties_tpu.algos.mixedpg import MixedPG
        return MixedPG(mdp, cfg)
    if name == "ACER":
        if mdp.is_discrete:
            # the reference's ACER is continuous-only
            # (AlgoFactory.cpp instantiates Param_advantage with
            # Continuous_policy only); reject at configuration time
            # instead of asserting deep inside construction
            raise ValueError(
                "learner 'ACER' supports continuous action spaces only "
                "(reference parity); use RACER/DQN for discrete MDPs")
        from smarties_tpu.algos.acer import ACER
        return ACER(mdp, cfg)
    if name == "CMA":
        raise ValueError(
            "CMA is gradient-free and drives its own rollouts: use "
            "smarties_tpu.algos.cma.CMAES(env, mdp, cfg) directly")
    raise ValueError(f"unknown learner '{name}'")
