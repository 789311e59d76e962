"""Glider ODE-control env in pure JAX.

Reference analog: apps/glider — controlling a falling elliptical plate
(Paoletti & Mahadevan dynamics) to land at a target; the reference's
canonical "ODE control" problem. This implementation uses the standard
reduced-order fluttering-plate model with torque control:

  u' = (M + rho * Gamma * v ... )   (dimensionless Paoletti-Mahadevan ODEs)

State: (u, v, w, x, y, theta) — horizontal/vertical body-frame velocities,
angular velocity, position, orientation. Observed: (u, v, w, cos th,
sin th, dx, dy) with dx, dy the vector to the target. Action: pitching
torque in [-1, 1]. Reward: progress toward the target; terminal bonus for
reaching it; episode truncates at MAX_STEPS or on leaving the domain.
RK4 integration.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.core.mdp import MDPSpec

MDP = MDPSpec(dim_state=7, dim_action=1, bounded=(True,),
              upper_action=(1.0,), lower_action=(-1.0,))

MAX_STEPS = 400
DT = 0.05
# dimensionless parameters (Paoletti-Mahadevan fluttering plate)
CT, CR = 1.2, np.pi      # translational/rotational drag
A_COEF, B_COEF = 1.4, 1.0
RHO = 200.0              # density ratio beta

TARGET = jnp.asarray([50.0, -50.0])


class GliderState(NamedTuple):
    q: jnp.ndarray      # [V, 6]: u, v, w, x, y, theta
    step: jnp.ndarray   # [V]


def _deriv(q, torque):
    u, v, w, x, y, th = (q[..., 0], q[..., 1], q[..., 2], q[..., 3],
                         q[..., 4], q[..., 5])
    speed2 = u * u + v * v
    speed = jnp.sqrt(speed2 + 1e-8)
    # circulation and drag (dimensionless model)
    gamma = (2.0 / jnp.pi) * (-CT * u * v / speed + CR * w)
    fdrag_u = (A_COEF - B_COEF * (u * u - v * v) / speed2) * speed * u
    fdrag_v = (A_COEF - B_COEF * (u * u - v * v) / speed2) * speed * v
    du = (RHO + 1) * w * v - gamma * v - jnp.sin(th) - fdrag_u
    du = du / (RHO + 1)
    dv = -(RHO + 1) * w * u + gamma * u - jnp.cos(th) - fdrag_v
    dv = dv / (RHO + 3)
    dw = (torque - (0.2 * w * jnp.abs(w)) - u * v) / (0.5 * (RHO + 2))
    dx = u * jnp.cos(th) - v * jnp.sin(th)
    dy = u * jnp.sin(th) + v * jnp.cos(th)
    return jnp.stack([du, dv, dw, dx, dy, w], axis=-1)


def init(key, n: int) -> GliderState:
    k1, k2 = jax.random.split(key)
    q = jnp.zeros((n, 6))
    q = q.at[:, 0].set(jax.random.uniform(k1, (n,), jnp.float32, 0.5, 1.5))
    q = q.at[:, 5].set(jax.random.uniform(k2, (n,), jnp.float32,
                                          -0.3, 0.3))
    return GliderState(q=q, step=jnp.zeros((n,), jnp.int32))


def observe(st: GliderState) -> jnp.ndarray:
    q = st.q
    dx = (TARGET[0] - q[..., 3]) / 50.0
    dy = (TARGET[1] - q[..., 4]) / 50.0
    return jnp.stack([q[..., 0], q[..., 1], q[..., 2],
                      jnp.cos(q[..., 5]), jnp.sin(q[..., 5]), dx, dy],
                     axis=-1)


def _dist(q):
    return jnp.sqrt((q[..., 3] - TARGET[0]) ** 2
                    + (q[..., 4] - TARGET[1]) ** 2)


def step(st: GliderState, env_action):
    torque = env_action[..., 0]
    q = st.q
    d_before = _dist(q)
    for _ in range(2):
        k1 = _deriv(q, torque)
        k2 = _deriv(q + DT / 4 * k1, torque)
        k3 = _deriv(q + DT / 4 * k2, torque)
        k4 = _deriv(q + DT / 2 * k3, torque)
        q = q + DT / 12 * (k1 + 2 * k2 + 2 * k3 + k4)
    d_after = _dist(q)
    nstep = st.step + 1
    reached = d_after < 2.0
    out = (jnp.abs(q[..., 3]) > 200.0) | (q[..., 4] < -200.0) \
        | (jnp.abs(q[..., 2]) > 50.0)
    done = (nstep >= MAX_STEPS) | reached | out
    terminal = reached | out
    reward = (d_before - d_after) / 10.0 + jnp.where(reached, 50.0, 0.0) \
        - jnp.where(out, 10.0, 0.0)
    return GliderState(q=q, step=nstep), reward, done, terminal


def reset_where(st: GliderState, mask, key):
    fresh = init(key, st.q.shape[0])
    q = jnp.where(mask[:, None], fresh.q, st.q)
    return GliderState(q=q, step=jnp.where(mask, 0, st.step))
