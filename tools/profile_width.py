"""Record-width shoot-out for the r5 state-packed layout (axon TPU).

The pack A/B (tools/profile_pack_ab.py) showed the packed train scan is
~12 us/step SLOWER at R=18 than the r4 two-gather layout at R=13+5,
while refresh_new_returns got FASTER — so row width is NOT free (the r4
"row10 ~= row1" rule breaks somewhere above R=13). This times the
train-step indexed-op pattern (one fused [2B, R] gather + one fused
[2B, R] scatter + far-count add) across widths, plus the two-array
variant (records [2B, R] + states [2B, S]).

Transfer-forced inside a 512-iteration lax.scan.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

E, L1, B, N = 4096, 501, 256, 512


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
    print(f"{name:<24s} {best*1e6/N:9.1f} us/step", flush=True)


def sample(k):
    k1, k2 = jax.random.split(k)
    ep = jax.random.randint(k1, (2 * B,), 0, E)
    t = jax.random.randint(k2, (2 * B,), 0, L1 - 1)
    return ep, t


def main():
    print(f"device={jax.devices()[0]} E={E} L1={L1} B={B} N={N}",
          flush=True)

    for R in (13, 16, 18, 24, 32):
        steps = jnp.zeros((E, L1, R), jnp.float32)
        fc = jnp.zeros((E,), jnp.float32)

        def body(c, k, R=R):
            st, f = c
            ep, t = sample(k)
            rows = st[ep, t]                        # [2B, R]
            rows = rows + jnp.mean(rows)            # touch all channels
            st = st.at[ep, t].set(rows, mode="drop")
            f = f.at[ep[:B]].add(jnp.sum(rows[:B], -1), mode="drop")
            return st, f
        run(f"one-array R={R}", (steps, fc), body)

    # r4 two-array variant: records R=13 + separate states S
    for S in (5, 8):
        steps = jnp.zeros((E, L1, 13), jnp.float32)
        states = jnp.zeros((E, L1, S), jnp.float32)
        fc = jnp.zeros((E,), jnp.float32)

        def body(c, k, S=S):
            st, xs, f = c
            ep, t = sample(k)
            rows = st[ep, t]
            x = xs[ep, t]                           # [2B, S] gather
            rows = rows + jnp.mean(rows) + jnp.mean(x)
            st = st.at[ep, t].set(rows, mode="drop")
            f = f.at[ep[:B]].add(jnp.sum(rows[:B], -1), mode="drop")
            return st, xs, f
        run(f"two-array R=13 + S={S}", (steps, states, fc), body)

    # wide-gather narrow-scatter: is it the gather or the scatter?
    for R in (18,):
        steps = jnp.zeros((E, L1, R), jnp.float32)
        fc = jnp.zeros((E,), jnp.float32)

        def g_only(c, k, R=R):
            st, f = c
            ep, t = sample(k)
            rows = st[ep, t]
            f = f.at[ep[:B]].add(jnp.sum(rows[:B], -1), mode="drop")
            return st, f
        run(f"gather-only R={R}", (steps, fc), g_only)

        def s_only(c, k, R=R):
            st, f = c
            ep, t = sample(k)
            rows = jnp.broadcast_to(f[ep][:, None], (2 * B, R)) * 1e-9
            st = st.at[ep, t].set(rows, mode="drop")
            return st, f
        run(f"scatter-only R={R}", (steps, fc), s_only)
    for R in (13,):
        steps = jnp.zeros((E, L1, R), jnp.float32)
        fc = jnp.zeros((E,), jnp.float32)

        def g_only13(c, k, R=R):
            st, f = c
            ep, t = sample(k)
            rows = st[ep, t]
            f = f.at[ep[:B]].add(jnp.sum(rows[:B], -1), mode="drop")
            return st, f
        run(f"gather-only R={R}", (steps, fc), g_only13)

        def s_only13(c, k, R=R):
            st, f = c
            ep, t = sample(k)
            rows = jnp.broadcast_to(f[ep][:, None], (2 * B, R)) * 1e-9
            st = st.at[ep, t].set(rows, mode="drop")
            return st, f
        run(f"scatter-only R={R}", (steps, fc), s_only13)


if __name__ == "__main__":
    main()
