"""Retrace/GAE scans vs a direct python port of the reference recursion.

Reference recursions: MemoryProcessing.cpp:391-416 (computeRetrace,
computeRetraceExplBonus, computeGAE) applied backward by
updateReturnEstimator (:23-44).
"""
import jax.numpy as jnp
import numpy as np

from smarties_tpu.ops.returns import (batched_return_estimate,
                                      episode_return_estimate)


def reference_recursion(r, V, A, rho, T, terminal, gamma, lam, mode="retrace",
                        baseline=0.0):
    """Literal python translation of the reference loops (float64)."""
    q = np.zeros(len(r))
    q[T] = 0.0 if terminal else V[T]
    for t in range(T - 1, -1, -1):
        cw = min(rho[t + 1], 1.0)
        if mode == "GAE":
            q[t] = r[t + 1] + gamma * (V[t + 1] + lam * (q[t + 1] - V[t + 1]))
        else:
            q[t] = r[t + 1] + gamma * (
                V[t + 1] + lam * cw * (q[t + 1] - A[t + 1] - V[t + 1]))
            if mode == "retraceExplore":
                e = abs(q[t + 1] - A[t + 1] - V[t + 1]) - baseline
                q[t] = (1 - gamma) * e + q[t]
    return q


def make_episode(L, T, terminal, seed=0):
    rng = np.random.RandomState(seed)
    r = np.zeros(L + 1)
    r[1:T + 1] = rng.randn(T)
    V = np.zeros(L + 1)
    V[:T + 1] = rng.randn(T + 1)
    if terminal:
        V[T] = 0.0
    A = np.zeros(L + 1)
    A[:T] = rng.randn(T)
    rho = np.zeros(L + 1)
    rho[:T] = np.exp(rng.randn(T))
    return r, V, A, rho


class TestRetrace:
    def test_matches_reference(self):
        L, T = 16, 11
        for terminal in (True, False):
            for mode in ("retrace", "GAE", "retraceExplore"):
                r, V, A, rho = make_episode(L, T, terminal)
                want = reference_recursion(r, V, A, rho, T, terminal,
                                           0.995, 0.95, mode, baseline=0.3)
                got = episode_return_estimate(
                    jnp.asarray(r, jnp.float32), jnp.asarray(V, jnp.float32),
                    jnp.asarray(A, jnp.float32), jnp.asarray(rho, jnp.float32),
                    jnp.asarray(T, jnp.int32), jnp.asarray(terminal),
                    0.995, 0.95, mode, err_baseline=0.3)
                np.testing.assert_allclose(got[:T + 1], want[:T + 1],
                                           rtol=1e-4, atol=1e-4)
                np.testing.assert_allclose(got[T + 1:], 0.0)

    def test_batched(self):
        L = 20
        eps = [make_episode(L, T, term, seed=T)
               for T, term in [(5, True), (20, False), (1, True), (13, False)]]
        lengths = np.asarray([5, 20, 1, 13], np.int32)
        terms = np.asarray([True, False, True, False])
        r = jnp.asarray(np.stack([e[0] for e in eps]), jnp.float32)
        V = jnp.asarray(np.stack([e[1] for e in eps]), jnp.float32)
        A = jnp.asarray(np.stack([e[2] for e in eps]), jnp.float32)
        rho = jnp.asarray(np.stack([e[3] for e in eps]), jnp.float32)
        got = batched_return_estimate(r, V, A, rho, jnp.asarray(lengths),
                                      jnp.asarray(terms), 0.995, 0.95)
        for i, (T, term) in enumerate(zip(lengths, terms)):
            want = reference_recursion(*[np.asarray(x[i]) for x in
                                         (r, V, A, rho)], T, term, 0.995, 0.95)
            np.testing.assert_allclose(got[i, :T + 1], want[:T + 1],
                                       rtol=1e-4, atol=1e-4)

    def test_terminal_last_step(self):
        # Qret[T-1] must equal r[T] + gamma*V[T] regardless of lambda/rho
        L, T = 8, 4
        r, V, A, rho = make_episode(L, T, True)
        got = episode_return_estimate(
            jnp.asarray(r, jnp.float32), jnp.asarray(V, jnp.float32),
            jnp.asarray(A, jnp.float32), jnp.asarray(rho, jnp.float32),
            jnp.asarray(T, jnp.int32), jnp.asarray(True), 0.9, 0.95)
        np.testing.assert_allclose(got[T - 1], r[T] + 0.9 * V[T], rtol=1e-5)
