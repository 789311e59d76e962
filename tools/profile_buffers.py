"""Does axon per-execution overhead scale with the number of LIVE device
buffers in the process? Allocate N small arrays, re-time a clean scan."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(tag):
    x = jnp.ones((128, 128)) * 0.01

    def f(x):
        def body(c, _):
            return jnp.tanh(c @ c) + tag, None
        c, _ = jax.lax.scan(body, x, None, length=100)
        return c
    jf = jax.jit(f)
    jax.block_until_ready(jf(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e6 / 100


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    keep = []
    print(f"N_live=0      clean scan {bench(0.0):9.2f} us/step", flush=True)
    for n in (100, 1000, 4000):
        while len(keep) < n:
            keep.append(jnp.zeros((8,)) + len(keep))
        jax.block_until_ready(keep[-1])
        print(f"N_live={n:<6d} clean scan {bench(n * 1e-9):9.2f} us/step",
              flush=True)
    # free them all and re-measure
    keep.clear()
    import gc
    gc.collect()
    print(f"freed         clean scan {bench(1e-3):9.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
