"""Discriminate the axon-backend scan pathologies: closure-captured device
constants vs nested scans (searchsorted) vs scalar op chains."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, DIN, H, DOUT = 256, 4, 128, 4


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
    print(f"{name:<52s} {best*1e6/q:9.2f} us/step  (compile {comp:.1f}s)",
          flush=True)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    params = {"W1": jax.random.normal(ks[0], (DIN, H)) * 0.1,
              "W2": jax.random.normal(ks[1], (H, H)) * 0.1,
              "W3": jax.random.normal(ks[2], (H, DOUT)) * 0.1}
    x_arg = jax.random.normal(ks[3], (B, DIN))
    x_const = jax.random.normal(ks[4], (B, DIN))   # closed over below

    def mlp(p, x):
        return jnp.tanh(jnp.tanh(x @ p["W1"]) @ p["W2"]) @ p["W3"]

    def scan_arg(p, x):
        def body(c, _):
            g = jax.grad(lambda q: jnp.sum(mlp(q, x)))(p)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, c, g), \
                None
        c, _ = jax.lax.scan(body, p, None, length=100)
        return c

    bench("grad-scan, x as ARG", scan_arg, params, x_arg)

    def scan_const(p):
        def body(c, _):
            g = jax.grad(lambda q: jnp.sum(mlp(q, x_const)))(p)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, c, g), \
                None
        c, _ = jax.lax.scan(body, p, None, length=100)
        return c

    bench("grad-scan, x as CLOSURE CONST", scan_const, params)

    big_const = jax.random.normal(ks[5], (4096, 501))

    def scan_bigconst(p):
        def body(c, _):
            g = jax.grad(lambda q: jnp.sum(
                mlp(q, x_arg) * big_const[0, 0]))(p)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, c, g), \
                None
        c, _ = jax.lax.scan(body, p, None, length=100)
        return c

    bench("grad-scan, BIG closure const touched", scan_bigconst, params)

    # nested searchsorted in scan
    csum = jnp.cumsum(jax.random.uniform(ks[6], (4096,)))
    qv = jax.random.uniform(ks[7], (B,)) * csum[-1]

    for method in ("scan", "sort", "compare_all"):
        def scan_ss(c0, cs, q, m=method):
            def body(c, _):
                idx = jnp.searchsorted(cs, q, method=m)
                return c + jnp.sum(idx), None
            c, _ = jax.lax.scan(body, c0, None, length=100)
            return c
        bench(f"searchsorted({method}) inside scan", scan_ss,
              jnp.int32(0), csum, qv)

    # scalar chain (the adam beta_t updates)
    def scan_scalars(s):
        def body(c, _):
            b1, b2, st = c
            b1 = jnp.where(b1 * 0.9 < 1e-7, 0.0, b1 * 0.9)
            b2 = jnp.where(b2 * 0.999 < 1e-7, 0.0, b2 * 0.999)
            eta = 1e-4 / (1 + st * 5e-7)
            eta_t = eta * jnp.sqrt(1 - b2) / (1 - b1)
            return (b1 + eta_t * 0, b2, st + 1), None
        c, _ = jax.lax.scan(body, s, None, length=100)
        return c

    bench("scalar-chain scan (adam schedule)", scan_scalars,
          (jnp.float32(0.9), jnp.float32(0.999), jnp.float32(0)))

    # real adam_step with grads as args
    from smarties_tpu.models import optim
    acfg = optim.AdamConfig(eta=1e-4)
    ost = optim.adam_init(params)
    grads_arg = jax.tree_util.tree_map(jnp.ones_like, params)

    def scan_adam_arg(p, o, g):
        def body(c, _):
            pp, oo = c
            pp, oo = optim.adam_step(pp, g, oo, acfg, 1.0 / 256)
            return (pp, oo), None
        (p, o), _ = jax.lax.scan(body, (p, o), None, length=100)
        return p, o

    bench("real adam_step, grads as ARG", scan_adam_arg, params, ost,
          grads_arg)

    def scan_adam_const(p, o):
        def body(c, _):
            pp, oo = c
            pp, oo = optim.adam_step(pp, grads_arg, oo, acfg, 1.0 / 256)
            return (pp, oo), None
        (p, o), _ = jax.lax.scan(body, (p, o), None, length=100)
        return p, o

    bench("real adam_step, grads as CONST", scan_adam_const, params, ost)


if __name__ == "__main__":
    main()
