"""Predator-prey: two agents per env on a periodic 2-D arena.

The reference's competing-multi-agent demo (apps/predator_prey): the
predator is rewarded by closing distance to the prey, the prey by opening
it; both observe both positions; actions are bounded 2-D velocities, the
predator slightly slower. Episodes truncate at MAX_STEPS.

Lane layout for the vectorized collector: V = n_envs * 2 lanes, ordered
[env0-predator, env0-prey, env1-predator, ...] — each agent is an
independent replay lane feeding the shared learner, like the reference's
agent vector (Environment.h:42-82).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.core.mdp import MDPSpec

N_AGENTS = 2
ARENA = 1.0          # periodic box [0, 1)^2
SPEED_PRED = 0.01    # predator max step
SPEED_PREY = 0.012   # prey slightly faster
MAX_STEPS = 200

MDP = MDPSpec(dim_state=4, dim_action=2,
              bounded=(True, True), upper_action=(1.0, 1.0),
              lower_action=(-1.0, -1.0), n_agents_per_env=N_AGENTS)


class PPState(NamedTuple):
    pred: jnp.ndarray   # [E, 2] predator positions
    prey: jnp.ndarray   # [E, 2]
    step: jnp.ndarray   # [E]


def _n_envs(n_lanes: int) -> int:
    assert n_lanes % N_AGENTS == 0
    return n_lanes // N_AGENTS


def init(key, n_lanes: int) -> PPState:
    E = _n_envs(n_lanes)
    k1, k2 = jax.random.split(key)
    return PPState(pred=jax.random.uniform(k1, (E, 2)),
                   prey=jax.random.uniform(k2, (E, 2)),
                   step=jnp.zeros((E,), jnp.int32))


def _rel(a, b):
    """Shortest periodic displacement b - a."""
    d = b - a
    return d - jnp.round(d)


def observe(st: PPState) -> jnp.ndarray:
    """Per-lane obs: [own x, own y, rel dx, rel dy] (periodic)."""
    rel_pp = _rel(st.pred, st.prey)
    obs_pred = jnp.concatenate([st.pred, rel_pp], axis=-1)
    obs_prey = jnp.concatenate([st.prey, -rel_pp], axis=-1)
    return jnp.stack([obs_pred, obs_prey], axis=1).reshape(-1, 4)


def step(st: PPState, env_action: jnp.ndarray):
    E = st.pred.shape[0]
    act = env_action.reshape(E, N_AGENTS, 2)
    pred = jnp.mod(st.pred + SPEED_PRED * act[:, 0], ARENA)
    prey = jnp.mod(st.prey + SPEED_PREY * act[:, 1], ARENA)
    dist = jnp.linalg.norm(_rel(pred, prey), axis=-1)
    r_pred = -dist          # predator wants to close in
    r_prey = dist           # prey wants distance
    reward = jnp.stack([r_pred, r_prey], axis=1).reshape(-1)
    nstep = st.step + 1
    done_env = nstep >= MAX_STEPS
    done = jnp.repeat(done_env, N_AGENTS)
    terminal = jnp.zeros_like(done)   # always a truncation
    return PPState(pred=pred, prey=prey, step=nstep), reward, done, terminal


def reset_where(st: PPState, mask_lanes: jnp.ndarray, key) -> PPState:
    mask = mask_lanes.reshape(-1, N_AGENTS).any(axis=1)
    k1, k2 = jax.random.split(key)
    pred = jnp.where(mask[:, None], jax.random.uniform(k1, st.pred.shape),
                     st.pred)
    prey = jnp.where(mask[:, None], jax.random.uniform(k2, st.prey.shape),
                     st.prey)
    return PPState(pred=pred, prey=prey,
                   step=jnp.where(mask, 0, st.step))
