"""Vectorized cart-pole in pure JAX — the framework's canonical test env.

Dynamics, reward, termination and MDP spec replicate the reference demo app
(apps/cart_pole_py/exec.py:14-90, apps/cart_pole_cpp/cart-pole.cpp): pole
balancing with hidden angle (POMDP-lite: angle itself masked, cos/sin
observable), bounded 1-D force in [-10, 10], reward 1 - failed, episodes
truncated at 500 steps. The reference integrates with dopri5; here RK4 with
4 substeps of dt/4 — well within the accuracy needed at dt = 0.02.

All functions are batched over a leading env axis V and jit/scan-safe.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.core.mdp import MDPSpec


class CartPoleState(NamedTuple):
    u: jnp.ndarray      # [V, 4]: x, v, angle, omega
    step: jnp.ndarray   # [V] i32


MDP = MDPSpec(
    dim_state=6, dim_action=1,
    bounded=(True,), upper_action=(10.0,), lower_action=(-10.0,),
    observable=(True, True, False, True, True, True),
)

DT = 0.02
MAX_STEPS = 500


def _dynamics(u, force):
    """apps/cart_pole_py/exec.py:40-55 (non-swingup branch)."""
    mp, mc, ell, g = 0.1, 1.0, 0.5, 9.81
    x, v, a, w = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    cosy, siny = jnp.cos(a), jnp.sin(a)
    tot = mp + mc
    fac2 = ell * (4.0 / 3.0 - mp * cosy * cosy / tot)
    f1 = force + mp * ell * w * w * siny
    wdot = (g * siny - f1 * cosy / tot) / fac2
    vdot = (f1 - mp * ell * wdot * cosy) / tot
    return jnp.stack([v, vdot, w, wdot], axis=-1)


def _rk4(u, force, dt):
    k1 = _dynamics(u, force)
    k2 = _dynamics(u + dt / 2 * k1, force)
    k3 = _dynamics(u + dt / 2 * k2, force)
    k4 = _dynamics(u + dt * k3, force)
    return u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def init(key, n_envs: int) -> CartPoleState:
    u = jax.random.uniform(key, (n_envs, 4), jnp.float32, -0.05, 0.05)
    return CartPoleState(u=u, step=jnp.zeros((n_envs,), jnp.int32))


def observe(state: CartPoleState) -> jnp.ndarray:
    """[x, v, angle, omega, cos, sin] (exec.py:65-70)."""
    u = state.u
    return jnp.concatenate(
        [u, jnp.cos(u[..., 2:3]), jnp.sin(u[..., 2:3])], axis=-1)


def _failed(u):
    return (jnp.abs(u[..., 0]) > 2.4) | (jnp.abs(u[..., 2]) > np.pi / 15)


def step(state: CartPoleState, env_action: jnp.ndarray
         ) -> Tuple[CartPoleState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Advance one control step.

    Returns (new_state, reward [V], done [V] bool, terminal [V] bool) where
    `terminal` means a true failure state (sendTermState) and done without
    terminal is a time-limit truncation (sendLastState), exec.py:96-113.
    """
    force = env_action[..., 0]
    u = state.u
    for _ in range(4):
        u = _rk4(u, force, DT / 4)
    nstep = state.step + 1
    failed = _failed(u)
    done = (nstep >= MAX_STEPS) | failed
    truncated = (nstep >= MAX_STEPS) & (~failed)
    terminal = done & (~truncated)
    reward = 1.0 - failed.astype(jnp.float32)
    return CartPoleState(u=u, step=nstep), reward, done, terminal


def reset_where(state: CartPoleState, mask: jnp.ndarray,
                key) -> CartPoleState:
    """Re-draw initial conditions for masked lanes (exec.py:23-27)."""
    u_new = jax.random.uniform(key, state.u.shape, jnp.float32, -0.05, 0.05)
    u = jnp.where(mask[:, None], u_new, state.u)
    stp = jnp.where(mask, 0, state.step)
    return CartPoleState(u=u, step=stp)


class pomdp:
    """No-velocity cart-pole: only [x, cos(angle), sin(angle)] observable
    — the canonical recurrent-policy benchmark (the reference's
    RACER_RNN.json recipe targets exactly this class of partially
    observed task, README.rst:352: feed-forward nets cannot infer the
    velocities, an LSTM must carry them)."""

    MDP = MDPSpec(
        dim_state=6, dim_action=1,
        bounded=(True,), upper_action=(10.0,), lower_action=(-10.0,),
        observable=(True, False, False, False, True, True),
    )
    MAX_STEPS = MAX_STEPS

    init = staticmethod(init)
    observe = staticmethod(observe)
    reset_where = staticmethod(reset_where)
    step = staticmethod(step)


class discrete:
    """Discrete-action variant: force in {-10, +10} selected by label —
    the classic bang-bang cart-pole used to exercise the discrete learners
    (RACER-discrete / DQN), analog of running the cart-pole app with a
    discretized action space (Communicator::setActionOptions)."""

    MDP = MDPSpec(dim_state=6, dim_action=1, discrete_values=(2,),
                  observable=(True, True, False, True, True, True))
    MAX_STEPS = MAX_STEPS

    init = staticmethod(init)
    observe = staticmethod(observe)
    reset_where = staticmethod(reset_where)

    @staticmethod
    def step(state, env_action):
        force = (env_action[..., 0] * 2.0 - 1.0) * 10.0  # label {0,1}->{-10,10}
        return step(state, force[..., None])
