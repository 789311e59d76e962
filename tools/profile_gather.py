"""Pin down gather/scatter costs on the axon TPU backend: per-call vs
per-row, batched vs per-step, searchsorted variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

E, L1, D = 4096, 501, 4
B = 256


def bench(name, f, *args, n=5, per=1):
    jf = jax.jit(f)
    t0 = time.perf_counter()
    jax.block_until_ready(jf(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<52s} {best*1e6/per:9.2f} us/unit  (call {best*1e3:7.3f} ms,"
          f" compile {comp:.1f}s)", flush=True)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    big = jax.random.normal(key, (E, L1, D))
    big2d = big.reshape(E * L1, D)
    wide = jax.random.normal(key, (E, L1, 128))
    ep = jax.random.randint(key, (B,), 0, E)
    t = jax.random.randint(key, (B,), 0, L1 - 1)
    flat = ep * L1 + t
    ep_big = jax.random.randint(key, (100 * B,), 0, E)
    t_big = jax.random.randint(key, (100 * B,), 0, L1 - 1)

    # single gathers
    bench("gather 256 rows from [E,L1,4] (2d idx)",
          lambda a, e, tt: a[e, tt], big, ep, t)
    bench("gather 256 rows from [E*L1,4] (flat idx)",
          lambda a, f: a[f], big2d, flat)
    bench("gather 25600 rows from [E,L1,4]",
          lambda a, e, tt: a[e, tt], big, ep_big, t_big, per=100)
    bench("gather 256 rows from [E,L1,128]",
          lambda a, e, tt: a[e, tt], wide, ep, t)
    bench("take_along_axis slot-gather [E] by 256",
          lambda l, e: l[e], jnp.ones((E,)), ep)

    # scatters
    bench("scatter-set 256 into [E,L1]",
          lambda a, e, tt: a.at[e, tt].set(1.0), big[..., 0], ep, t)
    bench("scatter-add 256 into [E]",
          lambda a, e: a.at[e].add(1.0), jnp.zeros((E,)), ep)
    bench("scatter-set 25600 into [E,L1]",
          lambda a, e, tt: a.at[e, tt].set(1.0), big[..., 0],
          ep_big, t_big, per=100)

    # searchsorted variants
    csum = jnp.cumsum(jnp.ones((E,)) * 37.0)
    q = jax.random.uniform(key, (B,)) * csum[-1]
    bench("searchsorted default (scan) 256 in [4096]",
          lambda c, qq: jnp.searchsorted(c, qq), csum, q)
    bench("searchsorted sort 256 in [4096]",
          lambda c, qq: jnp.searchsorted(c, qq, method="sort"), csum, q)
    bench("searchsorted compare_all 256 in [4096]",
          lambda c, qq: jnp.searchsorted(c, qq, method="compare_all"),
          csum, q)

    # scan of gathers: per-iteration gather cost inside a loop
    def scan_gather(a, e, tt):
        def body(c, i):
            return c + jnp.sum(a[e, tt]), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(100))
        return c
    bench("scan(100) of one 256-row gather", scan_gather, big, ep, t,
          per=100)

    def scan_scatter(a, e, tt):
        def body(c, i):
            return c.at[e, tt].add(1.0), None
        c, _ = jax.lax.scan(body, a, jnp.arange(100))
        return c
    bench("scan(100) of one 256-scatter into [E,L1]", scan_scatter,
          big[..., 0], ep, t, per=100)


if __name__ == "__main__":
    main()
