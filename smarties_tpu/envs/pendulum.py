"""Pendulum swing-up in pure JAX (classic-control benchmark).

Matches the standard Pendulum-v1 dynamics (public classic-control task used
by the reference's OpenAI_gym recipes): state (theta, theta_dot), obs
(cos, sin, theta_dot), bounded torque in [-2, 2], dense negative cost
reward, 200-step truncation, no terminal states.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.core.mdp import MDPSpec

MDP = MDPSpec(dim_state=3, dim_action=1, bounded=(True,),
              upper_action=(2.0,), lower_action=(-2.0,))

MAX_STEPS = 200
DT = 0.05
G, M, L = 10.0, 1.0, 1.0
MAX_SPEED = 8.0


class PendulumState(NamedTuple):
    th: jnp.ndarray     # [V]
    thdot: jnp.ndarray  # [V]
    step: jnp.ndarray   # [V]


def init(key, n: int) -> PendulumState:
    k1, k2 = jax.random.split(key)
    return PendulumState(
        th=jax.random.uniform(k1, (n,), jnp.float32, -np.pi, np.pi),
        thdot=jax.random.uniform(k2, (n,), jnp.float32, -1.0, 1.0),
        step=jnp.zeros((n,), jnp.int32))


def observe(st: PendulumState) -> jnp.ndarray:
    return jnp.stack([jnp.cos(st.th), jnp.sin(st.th), st.thdot], axis=-1)


def _angle_normalize(x):
    return ((x + np.pi) % (2 * np.pi)) - np.pi


def step(st: PendulumState, env_action):
    u = jnp.clip(env_action[..., 0], -2.0, 2.0)
    th, thdot = st.th, st.thdot
    cost = (_angle_normalize(th) ** 2 + 0.1 * thdot ** 2 + 0.001 * u ** 2)
    newthdot = thdot + (3 * G / (2 * L) * jnp.sin(th)
                        + 3.0 / (M * L ** 2) * u) * DT
    newthdot = jnp.clip(newthdot, -MAX_SPEED, MAX_SPEED)
    newth = th + newthdot * DT
    nstep = st.step + 1
    done = nstep >= MAX_STEPS
    terminal = jnp.zeros_like(done)   # pure time-limit task
    return (PendulumState(th=newth, thdot=newthdot, step=nstep),
            -cost, done, terminal)


def reset_where(st: PendulumState, mask, key):
    k1, k2 = jax.random.split(key)
    th = jnp.where(mask, jax.random.uniform(k1, st.th.shape, jnp.float32,
                                            -np.pi, np.pi), st.th)
    thdot = jnp.where(mask, jax.random.uniform(k2, st.th.shape, jnp.float32,
                                               -1.0, 1.0), st.thdot)
    return PendulumState(th=th, thdot=thdot,
                         step=jnp.where(mask, 0, st.step))
