"""Is the axon slow-scan state sticky within a process? And do NUMPY
closure constants poison like DEVICE-array closures do?

Usage: python tools/profile_sticky.py <mode>
  clean      - run the clean scan only
  np_const   - clean, then scan with a numpy closure const, then clean
  dev_const  - clean, then scan with a device closure const, then clean
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
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
    print(f"{name:<48s} {best*1e6/q:9.2f} us/step  (compile {comp:.1f}s)",
          flush=True)


def clean_scan_factory(tag):
    def clean(x):
        def body(c, _):
            return jnp.tanh(c @ c) + tag, None
        c, _ = jax.lax.scan(body, x, None, length=100)
        return c
    return clean


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "clean"
    print(f"device={jax.devices()[0]} mode={mode}", flush=True)
    x = jnp.ones((128, 128)) * 0.01

    bench("clean scan (before)", clean_scan_factory(0.0), x)

    if mode == "np_const":
        xc = np.ones((256, 4), np.float32)   # numpy closure const

        def poisoned(p):
            def body(c, _):
                return c + jnp.sum(jnp.tanh(jnp.asarray(xc) @ p)), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=100)
            return c
        bench("scan w/ NUMPY closure const", poisoned,
              jnp.ones((4, 8)))
    elif mode == "dev_const":
        xc = jnp.ones((256, 4))              # device closure const

        def poisoned(p):
            def body(c, _):
                return c + jnp.sum(jnp.tanh(xc @ p)), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=100)
            return c
        bench("scan w/ DEVICE closure const", poisoned,
              jnp.ones((4, 8)))

    bench("clean scan (after, fresh jit)", clean_scan_factory(1e-7), x)


if __name__ == "__main__":
    main()
