"""Why does a tiny MLP fwd/bwd scan cost ~245 us/iter when a raw matmul
scan costs ~1 us/iter? Isolate: fwd only, grad, pytree carry, param-head
concat, closure consts."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, DIN, H, DOUT = 256, 4, 128, 3


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
    params = {
        "l1": {"W": jax.random.normal(ks[0], (DIN, H)) * 0.1,
               "b": jnp.zeros((H,))},
        "l2": {"W": jax.random.normal(ks[1], (H, H)) * 0.1,
               "b": jnp.zeros((H,))},
        "out": {"W": jax.random.normal(ks[2], (H, DOUT)) * 0.1,
                "b": jnp.zeros((DOUT,))},
        "param": jnp.zeros((1,)),
    }
    x = jax.random.normal(ks[3], (B, DIN))

    def mlp(p, x):
        h = jnp.tanh(x @ p["l1"]["W"] + p["l1"]["b"])
        h = jnp.tanh(h @ p["l2"]["W"] + p["l2"]["b"])
        y = h @ p["out"]["W"] + p["out"]["b"]
        pp = jnp.broadcast_to(p["param"], y.shape[:-1] + (1,))
        return jnp.concatenate([y, pp], axis=-1)

    def scan_fwd(p, x):
        def body(c, _):
            return c + jnp.sum(mlp(p, x)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=100)
        return c

    bench("fwd only", scan_fwd, params, x)

    def scan_grad(p, x):
        def body(c, _):
            g = jax.grad(lambda q: jnp.sum(mlp(q, x)))(p)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-9 * b, c, g), None
        c, _ = jax.lax.scan(body, p, None, length=100)
        return c

    bench("fwd+grad, params carry", scan_grad, params, x)

    def scan_grad_scalar(p, x):
        def body(c, _):
            g = jax.grad(lambda q: jnp.sum(mlp(q, x)))(p)
            s = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=100)
        return c

    bench("fwd+grad, scalar carry", scan_grad_scalar, params, x)

    # no param-head concat
    def mlp2(p, x):
        h = jnp.tanh(x @ p["l1"]["W"] + p["l1"]["b"])
        h = jnp.tanh(h @ p["l2"]["W"] + p["l2"]["b"])
        return h @ p["out"]["W"] + p["out"]["b"]

    def scan_grad2(p, x):
        def body(c, _):
            g = jax.grad(lambda q: jnp.sum(mlp2(q, x)))(p)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-9 * b, c, g), None
        c, _ = jax.lax.scan(body, p, None, length=100)
        return c

    bench("fwd+grad, no concat/broadcast head", scan_grad2, params, x)

    # vjp with explicit cotangent (the algo's analytic-grad pattern)
    def scan_vjp(p, x):
        def body(c, _):
            out, vjp_fn = jax.vjp(lambda q: mlp(q, x), p)
            g = vjp_fn(jnp.ones_like(out))[0]
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-9 * b, c, g), None
        c, _ = jax.lax.scan(body, p, None, length=100)
        return c

    bench("fwd+vjp, params carry", scan_vjp, params, x)

    # per-step rng key consumption
    def scan_keys(p, x, key):
        def body(c, k):
            g = jax.grad(lambda q: jnp.sum(
                mlp(q, x + jax.random.normal(k, x.shape) * 0.0)))(p)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-9 * b, c, g), None
        keys = jax.random.split(key, 100)
        c, _ = jax.lax.scan(body, p, keys)
        return c

    bench("fwd+grad + per-step rng", scan_keys, params, x, key)


if __name__ == "__main__":
    main()
