"""Run ONE variant per fresh process to find what degrades the axon
backend in the real training path.

  adam          scan of the real adam_step, args only
  train         algo.train_step scan on a hand-built replay (no Trainer)
  chunk_first   Trainer built, train chunk timed BEFORE any rollout
  warm_chunk    Trainer warmup (rollout + Pallas returns sweep), THEN chunk
  pallas        clean scan, one refresh_new_returns call, clean scan again
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


def clean(tag):
    x = jnp.ones((128, 128)) * 0.01

    def f(x):
        def body(c, _):
            return jnp.tanh(c @ c) + tag, None
        c, _ = jax.lax.scan(body, x, None, length=100)
        return c
    bench(f"clean scan (tag={tag})", f, x)


def build():
    from smarties_tpu.envs import cartpole
    from smarties_tpu.runtime.trainer import Trainer
    from smarties_tpu.utils.config import HyperParameters
    cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                          batchSize=256, obsPerStep=1.0,
                          nnLayerSizes=[128, 128])
    return Trainer(cartpole, cartpole.MDP, cfg, n_envs=1024, n_slots=4096,
                   max_len=cartpole.MAX_STEPS)


def time_chunk(tr):
    algo = tr.algo

    def chunk_full(params, opt_state, rs, key):
        def body(c, k):
            p, o, r = c
            p, o, r, m = algo.train_step(p, o, r, k)
            return (p, o, r), m
        keys = jax.random.split(key, 100)
        (params, opt_state, rs), _ = jax.lax.scan(
            body, (params, opt_state, rs), keys)
        return params, opt_state, rs

    bench("train chunk (100 steps)", chunk_full, tr.params, tr.opt_state,
          tr.carry.replay, jax.random.PRNGKey(1))


def main():
    mode = sys.argv[1]
    print(f"device={jax.devices()[0]} mode={mode}", flush=True)
    if mode == "adam":
        from smarties_tpu.models import optim
        key = jax.random.PRNGKey(0)
        params = {f"l{i}": jax.random.normal(
            jax.random.fold_in(key, i), (128, 128)) * 0.1
            for i in range(4)}
        acfg = optim.AdamConfig(eta=1e-4)
        ost = optim.adam_init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)

        def f(p, o, g):
            def body(c, _):
                pp, oo = c
                return optim.adam_step(pp, g, oo, acfg, 1 / 256), None
            c, _ = jax.lax.scan(body, (p, o), None, length=100)
            return c
        bench("real adam_step scan (fresh)", f, params, ost, g)
    elif mode == "train":
        from smarties_tpu.algos.vracer import VRacer
        from smarties_tpu.envs import cartpole
        from smarties_tpu.replay import buffer as rb
        from smarties_tpu.utils.config import HyperParameters
        cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                              batchSize=256, nnLayerSizes=[128, 128])
        algo = VRacer(cartpole.MDP, cfg)
        params, opt = algo.init(jax.random.PRNGKey(0))
        rs = rb.init_replay(4096, 500, 5, 1, 2, cfg.clipImpWeight)
        # fill some fake episodes so sampling has data
        L1 = 501
        rs = rs._replace(
            ep_id=jnp.arange(4096, dtype=jnp.int32),
            length=jnp.full((4096,), 200, jnp.int32),
            states=jax.random.normal(jax.random.PRNGKey(1),
                                     (4096, L1, 5)) * 0.1,
            rho=jnp.ones((4096, L1)))

        def f(p, o, r, k):
            def body(c, kk):
                pp, oo, rr = c
                pp, oo, rr, _ = algo.train_step(pp, oo, rr, kk)
                return (pp, oo, rr), None
            keys = jax.random.split(k, 100)
            c, _ = jax.lax.scan(body, (p, o, r), keys)
            return c
        bench("train_step scan (fresh, no Trainer)", f, params, opt, rs,
              jax.random.PRNGKey(2))
    elif mode == "chunk_first":
        tr = build()
        time_chunk(tr)
        clean(1e-8)
    elif mode == "warm_chunk":
        tr = build()
        tr.warmup(chunk=16, adaptive=False)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "roll_only":
        tr = build()
        tr.carry, _ = tr._rollout(tr.params, tr.carry, 16)
        jax.block_until_ready(tr.carry.replay.length)
        print("rollout chunk ran", flush=True)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "fix_only":
        tr = build()
        rs = tr._fix_returns(tr.carry.replay)
        jax.block_until_ready(rs.qret)
        print("fix_returns (pallas, big replay) ran", flush=True)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "stats_only":
        tr = build()
        rs = tr._init_stats(tr.carry.replay)
        jax.block_until_ready(rs.state_mean)
        print("init_stats ran", flush=True)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "logs_kept":
        tr = build()
        for _ in range(3):
            tr._roll(16)          # appends device logs to _pending_logs
        jax.block_until_ready(tr.carry.replay.length)
        print(f"pending logs: {len(tr._pending_logs)}", flush=True)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "logs_dropped":
        tr = build()
        for _ in range(3):
            tr._roll(16)
        tr._pending_logs = []
        import gc
        gc.collect()
        jax.block_until_ready(tr.carry.replay.length)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "eager_ops":
        tr = build()
        tr.carry, _ = tr._rollout(tr.params, tr.carry, 16)
        for _ in range(20):
            int(tr.replay.n_stored_steps())       # eager reductions
            int(jnp.sum(tr.carry.inprog.t))
        time_chunk(tr)
        clean(1e-8)
    elif mode == "one_int":
        tr = build()
        tr.carry, _ = tr._rollout(tr.params, tr.carry, 16)
        print("stored:", int(tr.carry.replay.n_stored_steps()), flush=True)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "one_transfer":
        tr = build()
        tr.carry, _ = tr._rollout(tr.params, tr.carry, 16)
        import numpy as _np
        x = _np.asarray(tr.carry.replay.length)   # d2h of [4096] i32
        print("transferred:", x.sum(), flush=True)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "eager_split":
        tr = build()
        key = jax.random.PRNGKey(0)
        for _ in range(20):
            key, k = jax.random.split(key)     # eager op per cycle
        jax.block_until_ready(k)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "transfer_out":
        # transfer ONLY a rollout log output (not a buffer reused as a
        # future program input) — is that safe?
        tr = build()
        tr.carry, logs = tr._rollout(tr.params, tr.carry, 16)
        import numpy as _np
        x = _np.asarray(logs[1])
        print("log transferred:", int(x.sum()), flush=True)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "recover":
        tr = build()
        tr.carry, _ = tr._rollout(tr.params, tr.carry, 16)
        print("stored:", int(tr.carry.replay.n_stored_steps()), flush=True)
        time_chunk(tr)
        print("sleeping 240 s ...", flush=True)
        time.sleep(240)
        time_chunk(tr)
        clean(1e-8)
    elif mode == "train_transfer":
        # transfer after a TRAIN chunk only (no rollout ever ran)
        from smarties_tpu.algos.vracer import VRacer
        from smarties_tpu.envs import cartpole
        from smarties_tpu.replay import buffer as rb
        from smarties_tpu.utils.config import HyperParameters
        cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                              batchSize=256, nnLayerSizes=[128, 128])
        algo = VRacer(cartpole.MDP, cfg)
        params, opt = algo.init(jax.random.PRNGKey(0))
        rs = rb.init_replay(4096, 500, 5, 1, 2, cfg.clipImpWeight,
                            mu_init=rb.safe_mu(cartpole.MDP))
        L1 = 501
        rs = rs._replace(
            ep_id=jnp.arange(4096, dtype=jnp.int32),
            length=jnp.full((4096,), 200, jnp.int32),
            states=jax.random.normal(jax.random.PRNGKey(1),
                                     (4096, L1, 5)) * 0.1,
            rho=jnp.ones((4096, L1)))

        def f(p, o, r, k):
            def body(c, kk):
                pp, oo, rr = c
                pp, oo, rr, _ = algo.train_step(pp, oo, rr, kk)
                return (pp, oo, rr), None
            keys = jax.random.split(k, 100)
            c, _ = jax.lax.scan(body, (p, o, r), keys)
            return c

        def tchunk(tag):
            jf = jax.jit(f)
            t0 = time.perf_counter()
            out = jf(params, opt, rs, jax.random.PRNGKey(tag))
            jax.block_until_ready(out)
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                out = jf(params, opt, rs, jax.random.PRNGKey(tag))
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            print(f"train chunk: {best*1e4:9.2f} us/step "
                  f"(compile {comp:.1f}s)", flush=True)
            return out

        out = tchunk(2)
        w = np.asarray(out[0]["out"]["W"])     # d2h transfer
        print("transferred params", w.shape, flush=True)
        tchunk(3)
        clean(1e-8)
    elif mode == "act_transfer":
        # rollout WITHOUT commit: act + env step scan, then transfer
        from smarties_tpu.envs import cartpole
        from smarties_tpu.algos.vracer import VRacer
        from smarties_tpu.utils.config import HyperParameters
        cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                              batchSize=256, nnLayerSizes=[128, 128])
        algo = VRacer(cartpole.MDP, cfg)
        params, _ = algo.init(jax.random.PRNGKey(0))
        act = algo.make_act_fn(True)
        es = cartpole.init(jax.random.PRNGKey(1), 1024)

        def roll(p, es, key):
            def body(c, k):
                es = c
                obs = cartpole.MDP.observed(cartpole.observe(es))
                a, mu, v, adv, _ = act(p, obs, k, ())
                es, r, d, term = cartpole.step(
                    es, cartpole.MDP.learner_to_env_action(a))
                es = cartpole.reset_where(es, d, k)
                return es, jnp.sum(r)
            keys = jax.random.split(key, 16)
            es, rs_ = jax.lax.scan(body, es, keys)
            return es, rs_

        es2, rsum = jax.jit(roll)(params, es, jax.random.PRNGKey(2))
        jax.block_until_ready(es2)
        x = np.asarray(rsum)       # d2h transfer after act+step scan
        print("transferred", x.shape, flush=True)
        tr = build()
        time_chunk(tr)
        clean(1e-8)
    elif mode == "commit_transfer":
        # commit_episodes alone, then transfer
        from smarties_tpu.replay import buffer as rb
        rs = rb.init_replay(4096, 500, 5, 1, 2, 4.0)
        V, L1 = 1024, 501
        k = jax.random.PRNGKey(0)
        eps = dict(
            states=jax.random.normal(k, (V, L1, 5)),
            actions=jnp.zeros((V, L1, 1)), mus=jnp.zeros((V, L1, 2)),
            rewards=jnp.zeros((V, L1)), value=jnp.zeros((V, L1)),
            advantage=jnp.zeros((V, L1)), qret=jnp.zeros((V, L1)),
            rho=jnp.ones((V, L1)))
        done = jnp.ones((V,), bool)

        def f(rs):
            return rb.commit_episodes(
                rs, eps["states"], eps["actions"], eps["mus"],
                eps["rewards"], eps["value"], eps["advantage"],
                eps["qret"], eps["rho"],
                jnp.full((V,), 20, jnp.int32), jnp.zeros((V,), bool),
                done, 262144, "oldest")
        rs2 = jax.jit(f)(rs)
        jax.block_until_ready(rs2.length)
        x = np.asarray(rs2.n_seen_eps)   # transfer
        print("transferred, n_seen:", x, flush=True)
        tr = build()
        time_chunk(tr)
        clean(1e-8)
    elif mode == "pallas":
        clean(0.0)
        from smarties_tpu.replay import buffer as rb
        rs = rb.init_replay(256, 100, 4, 1, 2, 4.0)
        rs = rs._replace(ep_id=jnp.arange(256, dtype=jnp.int32),
                         length=jnp.full((256,), 50, jnp.int32))
        out = rb.refresh_new_returns(rs, 0.995, 0.95, "retrace")
        jax.block_until_ready(out.qret)
        print("pallas returns sweep ran", flush=True)
        clean(1e-8)


if __name__ == "__main__":
    main()
