"""Vectorized continuous mountain-car (classic control) in pure JAX.

Matches gym's MountainCarContinuous-v0, which the reference reaches
through its gym adapter (reference bin/smarties.py:30-43;
apps/OpenAI_gym/exec.py): an underpowered car in a valley, continuous
force in [-1, 1], reward +100 for reaching the right hilltop minus
0.1 * action^2 per step — a sparse-reward exploration problem. 999-step
limit.

All functions are batched over a leading env axis V and jit/scan-safe.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from smarties_tpu.core.mdp import MDPSpec


class MountainCarState(NamedTuple):
    u: jnp.ndarray      # [V, 2]: position, velocity
    step: jnp.ndarray   # [V] i32


MDP = MDPSpec(dim_state=2, dim_action=1,
              bounded=(True,), upper_action=(1.0,), lower_action=(-1.0,))

MAX_STEPS = 999
MIN_POS, MAX_POS = -1.2, 0.6
MAX_SPEED = 0.07
GOAL_POS = 0.45
GOAL_VEL = 0.0
POWER = 0.0015


def init(key, n_envs: int) -> MountainCarState:
    pos = jax.random.uniform(key, (n_envs,), jnp.float32, -0.6, -0.4)
    u = jnp.stack([pos, jnp.zeros_like(pos)], axis=-1)
    return MountainCarState(u=u, step=jnp.zeros((n_envs,), jnp.int32))


def observe(state: MountainCarState) -> jnp.ndarray:
    return state.u


def step(state: MountainCarState, env_action: jnp.ndarray
         ) -> Tuple[MountainCarState, jnp.ndarray, jnp.ndarray,
                    jnp.ndarray]:
    force = jnp.clip(env_action[..., 0], -1.0, 1.0)
    pos, vel = state.u[..., 0], state.u[..., 1]
    vel = vel + force * POWER - 0.0025 * jnp.cos(3 * pos)
    vel = jnp.clip(vel, -MAX_SPEED, MAX_SPEED)
    pos = jnp.clip(pos + vel, MIN_POS, MAX_POS)
    vel = jnp.where((pos <= MIN_POS) & (vel < 0), 0.0, vel)
    nstep = state.step + 1
    solved = (pos >= GOAL_POS) & (vel >= GOAL_VEL)
    done = solved | (nstep >= MAX_STEPS)
    terminal = solved
    reward = jnp.where(solved, 100.0, 0.0) - 0.1 * force * force
    u = jnp.stack([pos, vel], axis=-1)
    return MountainCarState(u=u, step=nstep), reward, done, terminal


def reset_where(state: MountainCarState, mask: jnp.ndarray,
                key) -> MountainCarState:
    pos = jax.random.uniform(key, state.step.shape, jnp.float32,
                             -0.6, -0.4)
    u_new = jnp.stack([pos, jnp.zeros_like(pos)], axis=-1)
    u = jnp.where(mask[:, None], u_new, state.u)
    stp = jnp.where(mask, 0, state.step)
    return MountainCarState(u=u, step=stp)
