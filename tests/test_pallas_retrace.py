"""Pallas segmented-Retrace kernel vs the reference recursion.

Runs in interpret mode on CPU (auto-detected); on TPU the same code
compiles to a single-pass Mosaic kernel (ops/pallas_retrace.py).
"""
import jax.numpy as jnp
import numpy as np
import sys

from smarties_tpu.ops.pallas_retrace import (affine_suffix_scan,
                                             batched_retrace_pallas)
from smarties_tpu.ops.returns import episode_return_estimate


class TestAffineSuffixScan:
    def test_simple_recursion(self):
        # q[t] = a[t] + b[t] q[t+1]
        a = np.asarray([[1.0, 2.0, 3.0, 4.0]], np.float32)
        b = np.asarray([[0.5, 0.5, 0.5, 0.0]], np.float32)
        want = np.zeros(4)
        q = 0.0
        for t in range(3, -1, -1):
            q = a[0, t] + b[0, t] * q
            want[t] = q
        got = affine_suffix_scan(jnp.asarray(a), jnp.asarray(b),
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-6)

    def test_many_rows_padding(self):
        rng = np.random.RandomState(0)
        E, L1 = 200, 37   # not multiples of the 128-lane tiling
        a = rng.randn(E, L1).astype(np.float32)
        b = (rng.rand(E, L1) * 0.9).astype(np.float32)
        got = np.asarray(affine_suffix_scan(jnp.asarray(a), jnp.asarray(b),
                                            interpret=True))
        for e in (0, 57, 199):
            q = 0.0
            for t in range(L1 - 1, -1, -1):
                q = a[e, t] + b[e, t] * q
                np.testing.assert_allclose(got[e, t], q, rtol=1e-4,
                                           atol=1e-5)


class TestBatchedRetracePallas:
    def test_matches_scan_path(self):
        rng = np.random.RandomState(1)
        E, L = 33, 21
        r = rng.randn(E, L + 1).astype(np.float32)
        V = rng.randn(E, L + 1).astype(np.float32)
        A = rng.randn(E, L + 1).astype(np.float32)
        rho = np.exp(rng.randn(E, L + 1)).astype(np.float32)
        lens = rng.randint(1, L + 1, E).astype(np.int32)
        terms = rng.rand(E) > 0.5
        for mode in ("retrace", "GAE"):
            got = np.asarray(batched_retrace_pallas(
                jnp.asarray(r), jnp.asarray(V), jnp.asarray(A),
                jnp.asarray(rho), jnp.asarray(lens), jnp.asarray(terms),
                0.995, 0.95, mode, interpret=True))
            for e in (0, 10, 32):
                want = np.asarray(episode_return_estimate(
                    jnp.asarray(r[e]), jnp.asarray(V[e]), jnp.asarray(A[e]),
                    jnp.asarray(rho[e]), jnp.asarray(lens[e]),
                    jnp.asarray(terms[e]), 0.995, 0.95, mode))
                np.testing.assert_allclose(got[e], want, rtol=1e-4,
                                           atol=1e-4)
