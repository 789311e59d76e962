"""Glider ODE-control env in pure JAX — faithful to the reference app.

Reference analog: /root/reference/apps/glider/{glider.h,glider.cpp} —
controlling a falling elliptical plate (Paoletti & Mahadevan, JFM 2011
planar gliding model) to land at x == 100 on the ground at y == -50.
This r5 rewrite matches the reference model EXACTLY (the r1-r4 env used
a different nondimensionalization, goal point and termination, which is
why no run ever landed — the task it trained was genuinely harder than
the reference's):

- dynamics Diff (glider.h:293-321): II = RHORATIO*ASPECTRATIO = 20,
  beta = 0.1, CT = 1.2, Aa = 1.4, Bb = 1, mu_t = nu_t = 0.2, CR = pi;
- integrator rk46_nl (Berland-Bogey-Bailly low-storage RK4, 6 stages,
  glider.h:80-101) at dt = 5e-3, nstep = 100 substeps per action
  (DT = 0.5), with the reference's mid-step termination check
  (glider.h:207-216: integration freezes once is_over());
- start state (glider.h:145-183, RANDOM_START == 1):
  u, v ~ U(-0.1, 0.1), w = 0, x ~ U(-10, 10), y = 0, a ~ U(-pi, pi);
- per-step reward (INSTREW == 1, glider.h:253-259): dist_gain - DT with
  dist = |x - 100| (getDistance, glider.h:332-338);
- termination (is_over, glider.h:190-199): ground contact
  y <= -50 - slack with slack = 0.4*max(0, min(x-50, 100-x)),
  wrong_xdir x < -50, way_too_far x > 200, or the step limit
  (reference timeover; MAX_STEPS truncates far earlier than the
  reference's time > 5000 but episodes end by ground contact long
  before either limit);
- terminal reward REPLACES the step reward (sendTermState,
  glider.cpp:59-62): 50*(xrew + arew), xrew = exp(-dist^2) within
  dist <= 5, arew = exp(-10*rela^2) within rela = |a mod 2pi - pi/4|
  <= pi/4 (glider.h:267-291); every termination is a true terminal
  state (info = 2), including timeover.

Observed state (glider.cpp:20-22 b_observable): the first 7 of the
reference's 10 dims — (u, v, w, x, y, cos a, sin a); the unobserved
Torque/vx/vy tail is logging-only in the reference. Action: torque in
[-1, 1] (bounded, glider.cpp:17-19).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.core.mdp import MDPSpec

MDP = MDPSpec(dim_state=7, dim_action=1, bounded=(True,),
              upper_action=(1.0,), lower_action=(-1.0,))

MAX_STEPS = 500
DT_SUB = 5e-3            # dt (glider.h:123)
N_SUB = 100              # nstep (glider.h:124)
DT = DT_SUB * N_SUB      # action-step time (0.5)

CT, AA, BB = 1.2, 1.4, 1.0
MUT, NUT, CR = 0.2, 0.2, np.pi
II = 200.0 * 0.1         # RHORATIO * ASPECTRATIO
BETA = 0.1
BETASQ = BETA * BETA
FACT1 = II + BETASQ
FACT2 = II + 1.0
FACT3 = 0.25 * (II * (1 + BETASQ) + 0.5 * (1 - BETASQ) ** 2)

GOAL_X = 100.0
TERM_REW_FAC = 50.0

# Berland-Bogey-Bailly rk46_nl coefficients (glider.h:83-89)
RK_A = np.asarray([0.000000000000, -0.737101392796, -1.634740794341,
                   -0.744739003780, -1.469897351522, -2.813971388035])
RK_B = np.asarray([0.032918605146, 0.823256998200, 0.381530948900,
                   0.200092213184, 1.718581042715, 0.270000000000])


class GliderState(NamedTuple):
    q: jnp.ndarray      # [V, 6]: u, v, w, x, y, a
    step: jnp.ndarray   # [V]


def _deriv(q, torque):
    """Diff (glider.h:293-321)."""
    u, v, w, th = q[..., 0], q[..., 1], q[..., 2], q[..., 5]
    eps = 2.2e-16
    uv2p = u * u + v * v
    uv2n = u * u - v * v
    f1 = u * v / (jnp.sqrt(uv2p) + eps)
    f2 = uv2n / (uv2p + eps)
    G = (2.0 / np.pi) * (CR * w - CT * f1)
    F = (1.0 / np.pi) * (AA - BB * f2) * jnp.sqrt(uv2p)
    M = (MUT + NUT * jnp.abs(w)) * w
    sinth, costh = jnp.sin(th), jnp.cos(th)
    du = (FACT2 * v * w - G * v - sinth - F * u) / FACT1
    dv = (-FACT1 * u * w + G * u - costh - F * v) / FACT2
    dw = ((BETASQ - 1.0) * u * v + torque - M) / FACT3
    dx = u * costh - v * sinth
    dy = u * sinth + v * costh
    return jnp.stack([du, dv, dw, dx, dy, w], axis=-1)


def _is_over_space(q):
    """Spatial termination only (glider.h:190-199 minus timeover): used
    for the mid-step integration freeze — the reference's timeover
    (time > 5000) ticks per SUBSTEP and is practically unreachable, so
    the per-action step limit must not freeze the integrator before the
    final action's substeps run."""
    x, y = q[..., 3], q[..., 4]
    slack = 0.4 * jnp.maximum(0.0, jnp.minimum(x - 50.0, 100.0 - x))
    hit_bottom = y <= -50.0 - slack
    wrong_xdir = x < -50.0
    way_too_far = x > 200.0
    return hit_bottom | wrong_xdir | way_too_far


def _is_over(q, nstep):
    return _is_over_space(q) | (nstep >= MAX_STEPS)


def init(key, n: int) -> GliderState:
    ks = jax.random.split(key, 4)
    u = jax.random.uniform(ks[0], (n,), jnp.float32, -0.1, 0.1)
    v = jax.random.uniform(ks[1], (n,), jnp.float32, -0.1, 0.1)
    x = jax.random.uniform(ks[2], (n,), jnp.float32, -10.0, 10.0)
    a = jax.random.uniform(ks[3], (n,), jnp.float32, -np.pi, np.pi)
    q = jnp.stack([u, v, jnp.zeros_like(u), x, jnp.zeros_like(u), a],
                  axis=-1)
    return GliderState(q=q, step=jnp.zeros((n,), jnp.int32))


def observe(st: GliderState) -> jnp.ndarray:
    q = st.q
    return jnp.stack([q[..., 0], q[..., 1], q[..., 2], q[..., 3],
                      q[..., 4], jnp.cos(q[..., 5]), jnp.sin(q[..., 5])],
                     axis=-1)


def _dist(q):
    """getDistance (glider.h:332-338): |x - 100| only."""
    return jnp.abs(q[..., 3] - GOAL_X)


def _terminal_reward(q):
    """getTerminalReward (glider.h:267-292): the landing bump MINUS the
    final distance (the `- dist` tail, glider.h:291, penalizes every
    non-landing termination in proportion to how far it ended)."""
    a = jnp.mod(q[..., 5], 2.0 * np.pi)
    dist = _dist(q)
    rela = jnp.abs(a - 0.25 * np.pi)
    xrew = jnp.where(dist > 5.0, 0.0, jnp.exp(-dist * dist))
    arew = jnp.where((rela > np.pi / 4) | (dist > 5.0), 0.0,
                     jnp.exp(-10.0 * rela * rela))
    return TERM_REW_FAC * (xrew + arew) - dist


def step(st: GliderState, env_action):
    torque = env_action[..., 0]
    q = st.q
    nstep = st.step + 1
    d_before = _dist(q)

    # rk46_nl over N_SUB substeps with the reference's mid-step stop:
    # once is_over() the state freezes (advance() returns immediately,
    # glider.h:207-216)
    def sub(i, carry):
        q, frozen = carry
        w = jnp.zeros_like(q)
        u = q
        for s in range(6):
            w = w * RK_A[s] + _deriv(u, torque) * DT_SUB
            u = u + w * RK_B[s]
        over = _is_over_space(u)
        q2 = jnp.where(frozen[:, None], q, u)
        return q2, frozen | over

    q, _ = jax.lax.fori_loop(0, N_SUB, sub,
                             (q, _is_over_space(q)))
    d_after = _dist(q)

    terminal = _is_over(q, nstep)
    done = terminal
    # INSTREW == 1 step reward; the terminal reward REPLACES it
    # (sendTermState, glider.cpp:59-62)
    reward = jnp.where(terminal, _terminal_reward(q),
                       (d_before - d_after) - DT)
    return GliderState(q=q, step=nstep), reward, done, terminal


def reset_where(st: GliderState, mask, key):
    fresh = init(key, st.q.shape[0])
    q = jnp.where(mask[:, None], fresh.q, st.q)
    return GliderState(q=q, step=jnp.where(mask, 0, st.step))
