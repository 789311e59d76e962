"""Vectorized Acrobot (classic control) in pure JAX.

Matches the OpenAI-gym Acrobot-v1 the reference reaches through its gym
adapter (reference bin/smarties.py:30-43 --gym app selection;
apps/OpenAI_gym/exec.py): two-link underactuated pendulum, torque
{-1, 0, +1} on the second joint, reward -1 per step until the tip is a
link-length above the pivot, 500-step limit. Dynamics follow Sutton's
book equations as implemented in gym (RK4 on [th1, th2, w1, w2]).

All functions are batched over a leading env axis V and jit/scan-safe.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.core.mdp import MDPSpec


class AcrobotState(NamedTuple):
    u: jnp.ndarray      # [V, 4]: th1, th2, w1, w2
    step: jnp.ndarray   # [V] i32


MDP = MDPSpec(dim_state=6, dim_action=1, discrete_values=(3,))

DT = 0.2
MAX_STEPS = 500
M1 = M2 = 1.0
L1 = 1.0
LC1 = LC2 = 0.5
I1 = I2 = 1.0
G = 9.8
MAX_VEL_1 = 4 * np.pi
MAX_VEL_2 = 9 * np.pi


def _dynamics(u, torque):
    th1, th2, w1, w2 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    d1 = (M1 * LC1 ** 2 + M2 * (L1 ** 2 + LC2 ** 2
                                + 2 * L1 * LC2 * jnp.cos(th2)) + I1 + I2)
    d2 = M2 * (LC2 ** 2 + L1 * LC2 * jnp.cos(th2)) + I2
    phi2 = M2 * LC2 * G * jnp.cos(th1 + th2 - np.pi / 2)
    phi1 = (-M2 * L1 * LC2 * w2 ** 2 * jnp.sin(th2)
            - 2 * M2 * L1 * LC2 * w2 * w1 * jnp.sin(th2)
            + (M1 * LC1 + M2 * L1) * G * jnp.cos(th1 - np.pi / 2) + phi2)
    # "book" variant (gym's default book_or_nips="book")
    a2 = ((torque + d2 / d1 * phi1
           - M2 * L1 * LC2 * w1 ** 2 * jnp.sin(th2) - phi2)
          / (M2 * LC2 ** 2 + I2 - d2 ** 2 / d1))
    a1 = -(d2 * a2 + phi1) / d1
    return jnp.stack([w1, w2, a1, a2], axis=-1)


def _rk4(u, torque, dt):
    k1 = _dynamics(u, torque)
    k2 = _dynamics(u + dt / 2 * k1, torque)
    k3 = _dynamics(u + dt / 2 * k2, torque)
    k4 = _dynamics(u + dt * k3, torque)
    return u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def _wrap(x):
    return (x + np.pi) % (2 * np.pi) - np.pi


def init(key, n_envs: int) -> AcrobotState:
    u = jax.random.uniform(key, (n_envs, 4), jnp.float32, -0.1, 0.1)
    return AcrobotState(u=u, step=jnp.zeros((n_envs,), jnp.int32))


def observe(state: AcrobotState) -> jnp.ndarray:
    """[cos th1, sin th1, cos th2, sin th2, w1, w2] (gym observation)."""
    u = state.u
    return jnp.stack([jnp.cos(u[..., 0]), jnp.sin(u[..., 0]),
                      jnp.cos(u[..., 1]), jnp.sin(u[..., 1]),
                      u[..., 2], u[..., 3]], axis=-1)


def step(state: AcrobotState, env_action: jnp.ndarray
         ) -> Tuple[AcrobotState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    torque = env_action[..., 0].astype(jnp.float32) - 1.0   # {0,1,2}->{-1,0,1}
    u = _rk4(state.u, torque, DT)
    u = u.at[..., 0].set(_wrap(u[..., 0]))
    u = u.at[..., 1].set(_wrap(u[..., 1]))
    u = u.at[..., 2].set(jnp.clip(u[..., 2], -MAX_VEL_1, MAX_VEL_1))
    u = u.at[..., 3].set(jnp.clip(u[..., 3], -MAX_VEL_2, MAX_VEL_2))
    nstep = state.step + 1
    # solved: tip height -cos(th1) - cos(th1+th2) > 1
    solved = (-jnp.cos(u[..., 0])
              - jnp.cos(u[..., 0] + u[..., 1])) > 1.0
    done = solved | (nstep >= MAX_STEPS)
    terminal = solved
    reward = jnp.where(solved, 0.0, -1.0)
    return AcrobotState(u=u, step=nstep), reward, done, terminal


def reset_where(state: AcrobotState, mask: jnp.ndarray,
                key) -> AcrobotState:
    u_new = jax.random.uniform(key, state.u.shape, jnp.float32, -0.1, 0.1)
    u = jnp.where(mask[:, None], u_new, state.u)
    stp = jnp.where(mask, 0, state.step)
    return AcrobotState(u=u, step=stp)
