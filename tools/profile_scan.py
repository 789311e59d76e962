"""Isolate the per-iteration overhead of lax.scan on the axon TPU backend
and test unroll as the mitigation."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(name, f, *args, n=5, q=100):
    jf = jax.jit(f)
    t0 = time.perf_counter()
    jax.block_until_ready(jf(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<46s} {best*1e6/q:9.2f} us/step  (compile {comp:.1f}s)",
          flush=True)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    x = jnp.ones((128, 128))

    def scan_trivial(x):
        def body(c, _):
            return c + 1.0, None
        c, _ = jax.lax.scan(body, x, None, length=100)
        return c

    bench("scan(100) trivial add", scan_trivial, x)

    def scan_matmul(x):
        def body(c, _):
            return jnp.tanh(c @ c), None
        c, _ = jax.lax.scan(body, x, None, length=100)
        return c

    bench("scan(100) 128x128 matmul", scan_matmul, x)

    for unroll in (2, 4, 8, 16):
        def scan_unroll(x, u=unroll):
            def body(c, _):
                return jnp.tanh(c @ c), None
            c, _ = jax.lax.scan(body, x, None, length=100, unroll=u)
            return c
        bench(f"scan(100) matmul unroll={unroll}", scan_unroll, x)

    big = jnp.ones((2048, 2048), jnp.bfloat16)

    def scan_big(x):
        def body(c, _):
            return jax.nn.tanh(c @ c), None
        c, _ = jax.lax.scan(body, x, None, length=100)
        return c

    bench("scan(100) 2048x2048 bf16 matmul", scan_big, big)

    def fori(x):
        def body(i, c):
            return jnp.tanh(c @ c)
        return jax.lax.fori_loop(0, 100, body, x)

    bench("fori_loop(100) matmul", fori, x)

    # scatter-heavy body (the write-back pattern)
    E = jnp.zeros((4096, 501))
    idx = jnp.arange(256) * 3 % 4096
    tdx = jnp.arange(256) % 400

    def scan_scatter(E):
        def body(c, _):
            c = c.at[idx, tdx].add(1.0)
            return c, None
        c, _ = jax.lax.scan(body, E, None, length=100)
        return c

    bench("scan(100) one scatter into [4096,501]", scan_scatter, E)


if __name__ == "__main__":
    main()
