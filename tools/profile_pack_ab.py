"""A/B the r5 state-packed record vs the r4 layout, phase by phase.

The first on-chip bench with pack_states=True showed: train chunk
FASTER (5040 -> 5374 grad steps/s, the expected one-gather win) but the
fused cycle SLOWER (114.4 -> 124.8 ms) and rollout sweeps -16%
(507k -> 426k env-steps/s). This probe times each phase of the fused
cycle separately under both layouts in ONE process to find where the
wider record hurts: env sweep + commit | refresh_new_returns (full-
buffer qret channel write) | train scan.

Run on the default (TPU) env, ONE job at a time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def force(x):
    import jax
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def build(pack: bool):
    if pack:
        os.environ["SMT_PACK_STATES"] = "1"
    else:
        os.environ.pop("SMT_PACK_STATES", None)
    from smarties_tpu.envs import cartpole
    from smarties_tpu.runtime.trainer import Trainer
    from smarties_tpu.utils.config import HyperParameters
    cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                          batchSize=256, obsPerStep=1.0,
                          nnLayerSizes=[128, 128], randSeed=0)
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=1024, n_slots=4096,
                 max_len=cartpole.MAX_STEPS)
    tr.log_flush_threshold = 10 ** 9
    tr.warmup(chunk=16, blind_sweeps=16)
    return tr


def timeit(label, fn, n=3):
    fn()          # warm (compile)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<28s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from smarties_tpu.replay import buffer as rb

    for pack in (False, True):
        print(f"=== pack_states={pack} ===", flush=True)
        tr = build(pack)
        cfg = tr.cfg
        R = tr.replay.steps.shape[-1]
        print(f"record width R={R}", flush=True)

        # 1. rollout sweeps (env steps + per-sweep commit), one dispatch
        SW = 64
        jroll = tr._rollout

        def roll():
            c, _ = jroll(tr.params, tr.carry, SW)
            force(c.replay.beta)
        timeit(f"rollout x{SW} (sweep+commit)", roll)

        # 2. refresh_new_returns alone (full-buffer qret channel write)
        jref = jax.jit(lambda r: rb.refresh_new_returns(
            r, cfg.gamma, cfg.lambda_, tr.algo.returns_mode,
            prefer_pallas=False))
        K = 64

        def refr():
            r = tr.replay
            for _ in range(K):
                r = jref(r)
            force(r.beta)
        timeit(f"refresh_new_returns x{K}", refr)

        # 3. train scan alone (1024 steps, one dispatch)
        key = jax.random.PRNGKey(1)

        def train():
            out = tr._train_chunk(tr.params, tr.opt_state,
                                  tr.carry.replay, key, 1024)
            force(out[0])
        timeit("train chunk x1024", train)

        # 4. the full fused macro (K cycles)
        KF = 8

        def macro(params, opt, carry):
            def body(c, i):
                p, o, cr = c
                p, o, cr, _ms, _logs = tr._fused_cycle(p, o, cr, 1,
                                                       tr.n_envs)
                return (p, o, cr), None
            return jax.lax.scan(body, (params, opt, carry),
                                jnp.arange(KF, dtype=jnp.float32))[0]
        jm = jax.jit(macro)
        st = [jm(tr.params, tr.opt_state, tr.carry)]

        def fused():
            st[0] = jm(*st[0])
            force(st[0][0])
        t = timeit(f"fused macro x{KF}", fused)
        print(f"  -> {t * 1e3 / KF:.2f} ms/cycle", flush=True)
        tr._pending_logs.clear()
        del tr


if __name__ == "__main__":
    main()
