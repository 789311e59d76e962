"""Layout shoot-out for the packed replay record on the axon TPU.

Per-train-step pattern under test: sample-gather rows at (ep, t) and
(ep, t+1), then scatter 5 values back at (ep, t). Variants:
  sep     six separate [E, L1] arrays (pre-packing layout): 6 gathers +
          5 scatters per step
  minor   [E, L1, R] channels-minor: 1 row-gather + 1 slice-scatter
  major   [R, E, L1] channels-major: 1 gather (slice leading) + 1 scatter
  fold    [E, R*L1] channels folded into time: 1 gather (B*R indices) +
          1 scatter (B*5 indices)
All timed transfer-forced inside a 256-iteration lax.scan (the honest
per-step cost; block_until_ready does not fence on this backend).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

E, L1, R, B, N = 4096, 501, 10, 256, 256
WB0 = 5


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(name, init_carry, body):
    def macro(carry, key):
        def step(c, k):
            return body(c, k), None
        return jax.lax.scan(step, carry, jax.random.split(key, N))[0]

    jm = jax.jit(macro)
    out = jm(init_carry, jax.random.PRNGKey(0))
    force(out)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = jm(out, jax.random.PRNGKey(i))
        force(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<8s} {best*1e6/N:9.1f} us/step", flush=True)


def sample(k):
    k1, k2 = jax.random.split(k)
    ep = jax.random.randint(k1, (B,), 0, E)
    t = jax.random.randint(k2, (B,), 0, L1 - 1)
    return ep, t


def main():
    print(f"device={jax.devices()[0]} E={E} L1={L1} R={R} B={B} N={N}",
          flush=True)
    key = jax.random.PRNGKey(7)

    # ---- sep: six [E, L1] arrays ----
    arrs = tuple(jax.random.normal(jax.random.fold_in(key, i), (E, L1))
                 for i in range(6))

    def body_sep(c, k):
        ep, t = sample(k)
        t1 = jnp.minimum(t + 1, L1 - 1)
        vals = [a[ep, t] for a in c] + [c[0][ep, t1]]
        s = sum(vals)
        out = []
        for i, a in enumerate(c):
            out.append(a.at[ep, t].set(s + i) if i < 5 else a)
        return tuple(out)

    run("sep", arrs, body_sep)

    # ---- minor: [E, L1, R] ----
    steps_minor = jax.random.normal(key, (E, L1, R))

    def body_minor(c, k):
        ep, t = sample(k)
        t1 = jnp.minimum(t + 1, L1 - 1)
        rows = c[jnp.concatenate([ep, ep]), jnp.concatenate([t, t1])]
        s = jnp.sum(rows[:B], axis=1) + rows[B:, 0]
        upd = jnp.stack([s, s + 1, s + 2, s + 3, s + 4], axis=-1)
        return c.at[ep, t, WB0:].set(upd)

    run("minor", steps_minor, body_minor)

    # ---- major: [R, E, L1] ----
    steps_major = jax.random.normal(key, (R, E, L1))

    def body_major(c, k):
        ep, t = sample(k)
        t1 = jnp.minimum(t + 1, L1 - 1)
        rows = c[:, jnp.concatenate([ep, ep]), jnp.concatenate([t, t1])]
        s = jnp.sum(rows[:, :B], axis=0) + rows[0, B:]
        upd = jnp.stack([s, s + 1, s + 2, s + 3, s + 4], axis=0)
        return c.at[WB0:, ep, t].set(upd)

    run("major", steps_major, body_major)

    # ---- fold: [E, R*L1] ----
    steps_fold = jax.random.normal(key, (E, R * L1))
    offs = jnp.arange(R) * L1
    wb_offs = (WB0 + jnp.arange(5)) * L1

    def body_fold(c, k):
        ep, t = sample(k)
        t1 = jnp.minimum(t + 1, L1 - 1)
        rows = c[ep[:, None], offs[None, :] + t[:, None]]     # [B, R]
        row1 = c[ep, t1]                                       # reward@t+1
        s = jnp.sum(rows, axis=1) + row1
        upd = jnp.stack([s, s + 1, s + 2, s + 3, s + 4], axis=-1)
        return c.at[ep[:, None], wb_offs[None, :] + t[:, None]].set(upd)

    run("fold", steps_fold, body_fold)

    # ---- fold1: same but t/t1 fused into the one gather ----
    def body_fold1(c, k):
        ep, t = sample(k)
        t1 = jnp.minimum(t + 1, L1 - 1)
        idx = jnp.concatenate([offs[None, :] + t[:, None],
                               t1[:, None]], axis=1)           # [B, R+1]
        rows = c[ep[:, None], idx]
        s = jnp.sum(rows[:, :R], axis=1) + rows[:, R]
        upd = jnp.stack([s, s + 1, s + 2, s + 3, s + 4], axis=-1)
        return c.at[ep[:, None], wb_offs[None, :] + t[:, None]].set(upd)

    run("fold1", steps_fold, body_fold1)


def extra():
    """Wide-row trailing-dim variants: is a [B, k]-row gather/scatter at
    (ep, t) priced per ROW (like the states gather) or per element?"""
    print("--- wide-row probes ---", flush=True)
    key = jax.random.PRNGKey(9)
    for k_w in (1, 4, 5, 8, 10):
        arr = jax.random.normal(key, (E, L1, k_w))

        def body_g(c, k, k_w=k_w):
            ep, t = sample(k)
            rows = c[ep, t]                       # [B, k_w]
            s = jnp.sum(rows, axis=-1)
            return c.at[ep, t].set(
                jnp.broadcast_to(s[:, None], (B, k_w)))

        run(f"row{k_w}", arr, body_g)

    # gather-only and scatter-only at width 5
    arr5 = jax.random.normal(key, (E, L1, 5))
    acc0 = (arr5, jnp.zeros((B, 5)))

    def body_gonly(c, k):
        a, acc = c
        ep, t = sample(k)
        return a, acc + a[ep, t]

    run("g5only", acc0, body_gonly)

    def body_sonly(c, k):
        a, acc = c
        ep, t = sample(k)
        return a.at[ep, t].set(acc), acc + 1.0

    run("s5only", acc0, body_sonly)

    # partial-width scatter (channel 3 of 5) — suspected slow path
    def body_part(c, k):
        a, acc = c
        ep, t = sample(k)
        return a.at[ep, t, 3].set(acc[:, 0]), acc + 1.0

    run("s5part", acc0, body_part)

    # [E] i32 meta gather + scatter-add (far_count pattern)
    meta = jnp.zeros((E,), jnp.float32)

    def body_meta(c, k):
        ep, t = sample(k)
        vals = c[ep]
        return c.at[ep].add(vals * 0.5 + 1.0)

    run("meta_e", meta, body_meta)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        print(f"device={jax.devices()[0]}", flush=True)
        extra()
        sys.exit(0)
    main()
