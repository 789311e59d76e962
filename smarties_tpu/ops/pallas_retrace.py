"""Pallas TPU kernel: whole-buffer segmented backward Retrace sweep.

The refresh path recomputes the return estimator for EVERY stored episode
(replay/buffer.py recompute_returns). The recursion is affine,
q[t] = a[t] + b[t] * q[t+1], with the boundary/masking folded into (a, b)
(see ops/returns.py). The generic implementation is a lax.associative_scan:
log2(L) ~ 9 full passes over the [n_slots, L+1] arrays. This kernel does it
in ONE pass: episodes are tiled onto the 128-wide lane axis (time on the
sublane axis, so each recursion step reads one contiguous row), and the
backward loop runs entirely in VMEM.

Layout per grid step: blocks [L+1, 128] of the time-major transposed
coefficient arrays; VMEM footprint 3 * (L+1) * 128 * 4 B (~0.8 MB at
L = 500).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(a_ref, b_ref, out_ref):
    L1 = a_ref.shape[0]

    def body(i, q):
        t = L1 - 1 - i
        q = a_ref[t, :] + b_ref[t, :] * q
        out_ref[t, :] = q
        return q

    jax.lax.fori_loop(0, L1, body, jnp.zeros((LANES,), jnp.float32))


@partial(jax.jit, static_argnames=("interpret",))
def affine_suffix_scan(a, b, interpret: bool = False):
    """q[e, t] = a[e, t] + b[e, t] * q[e, t+1], q beyond L-1 treated as 0.

    a, b: [E, L1] float32. Returns q [E, L1].
    """
    E, L1 = a.shape
    Ep = int(np.ceil(E / LANES)) * LANES
    at = jnp.zeros((L1, Ep), jnp.float32).at[:, :E].set(a.T)
    bt = jnp.zeros((L1, Ep), jnp.float32).at[:, :E].set(b.T)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((L1, Ep), jnp.float32),
        grid=(Ep // LANES,),
        in_specs=[
            pl.BlockSpec((L1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L1, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(at, bt)
    return out[:, :E].T


def retrace_coeffs(r_scaled, value, advantage, rho, length, terminal,
                   gamma, lam, mode="retrace"):
    """Elementwise affine coefficients for the batched backward recursion
    (identical to the associative-scan path in ops/returns.py)."""
    E, L1 = r_scaled.shape
    idx = jnp.arange(L1)[None, :]
    bootstrap = jnp.where(terminal, 0.0,
                          jnp.take_along_axis(value, length[:, None],
                                              axis=1)[:, 0])
    if mode == "GAE":
        a = r_scaled + gamma * (1 - lam) * value
        b = jnp.full((E, L1), gamma * lam, jnp.float32)
    else:
        c_w = jnp.minimum(rho, 1.0)
        a = r_scaled + gamma * (value - lam * c_w * (advantage + value))
        b = gamma * lam * c_w
    a = jnp.roll(a, -1, axis=1)
    b = jnp.roll(b, -1, axis=1)
    ln = length[:, None]
    a = jnp.where(idx < ln, a, jnp.where(idx == ln,
                                         bootstrap[:, None], 0.0))
    b = jnp.where(idx < ln, b, 0.0)
    return a, b


def batched_retrace_pallas(r_scaled, value, advantage, rho, length,
                           terminal, gamma, lam, mode="retrace",
                           interpret=None):
    """Drop-in replacement for batched_return_estimate (retrace/GAE)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a, b = retrace_coeffs(r_scaled, value, advantage, rho, length,
                          terminal, gamma, lam, mode)
    q = affine_suffix_scan(a, b, interpret=interpret)
    idx = jnp.arange(r_scaled.shape[1])[None, :]
    return jnp.where(idx <= length[:, None], q, 0.0)
