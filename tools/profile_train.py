"""Decompose the V-RACER train-step cost on real TPU hardware.

Times jitted ablations of the train chunk (scan of Q grad steps) to find
where the per-step ~0.24 ms goes (VERDICT round-1: kernel-count bound at
<1% MFU). Run on the default (TPU) env, one job at a time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smarties_tpu.algos import base as ab
from smarties_tpu.envs import cartpole
from smarties_tpu.models import optim
from smarties_tpu.replay import buffer as rb
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters

Q = 100


def bench(name, f, *args, n=5, donate=None):
    jf = jax.jit(f, donate_argnums=donate) if donate else jax.jit(f)
    t0 = time.perf_counter()
    out = jf(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n):
        args2 = jax.tree_util.tree_map(lambda x: x, args)  # fresh (donation)
        t0 = time.perf_counter()
        out = jf(*args2)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<44s} {best*1e6/Q:9.1f} us/step   "
          f"({best*1e3:8.2f} ms/chunk, compile {compile_s:.1f}s)", flush=True)
    return best


def main():
    cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                          batchSize=256, obsPerStep=1.0,
                          nnLayerSizes=[128, 128])
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=1024, n_slots=4096,
                 max_len=cartpole.MAX_STEPS)
    tr.warmup(chunk=16, adaptive=False)
    algo = tr.algo
    params, opt_state, rs = tr.params, tr.opt_state, tr.carry.replay
    key = jax.random.PRNGKey(1)
    B = cfg.batchSize
    print(f"device={jax.devices()[0]}  batch={B}  Q={Q}", flush=True)

    # ---- 1. full train chunk (as bench.py measures it) ----
    def chunk_full(params, opt_state, rs, key):
        def body(c, k):
            p, o, r = c
            p, o, r, m = algo.train_step(p, o, r, k)
            return (p, o, r), m
        keys = jax.random.split(key, Q)
        (params, opt_state, rs), ms = jax.lax.scan(
            body, (params, opt_state, rs), keys)
        return params, opt_state, rs

    # NOTE: donate_argnums on the axon backend raises
    # INVALID_ARGUMENT TPU backend errors — all variants non-donated.
    bench("full chunk", chunk_full, params, opt_state, rs, key)

    # ---- 2. sample+gather only ----
    def chunk_sample(rs, key):
        def body(c, k):
            acc = c
            ep, t = rb.sample(k, rs, B, "uniform")
            mb = ab.gather_minibatch(rs, ep, t)
            return acc + jnp.sum(mb.s_t) + jnp.sum(mb.qret), None
        keys = jax.random.split(key, Q)
        acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return acc

    bench("sample+gather only", chunk_sample, rs, key)

    # ---- 3. fwd/bwd + analytic grads + adam, fixed minibatch ----
    ep, t = rb.sample(key, rs, B, "uniform")
    mb = ab.gather_minibatch(rs, ep, t)
    mb = jax.block_until_ready(mb)

    from smarties_tpu.models.net import apply_net
    from smarties_tpu.ops import continuous_policy as cp
    from smarties_tpu.ops.value_scale import scale_net2v, scale_vdiff
    spec = algo.spec

    def one_fwdbwd(p, o, k):
        def fwd(p):
            out, _ = apply_net(p, spec, mb.s_t)
            return out
        out, vjp_fn = jax.vjp(fwd, p)
        v_raw = out[..., 0]
        pol = out[..., 1:1 + 1]
        sraw = out[..., 2:3]
        sigma = cp.sigma_of(sraw)
        rho = cp.imp_weight(mb.action, pol, sigma, mb.mu, algo.bounded)
        dkl = cp.kl_div(mb.mu, pol, sigma)
        v_val = scale_net2v(v_raw)
        a_ret = mb.qret - v_val
        g_v = a_ret * scale_vdiff(v_raw)
        pg_m, pg_s = cp.pol_grad(mb.action, pol, sigma, sraw, a_ret,
                                 algo.bounded)
        g = jnp.concatenate([g_v[:, None], pg_m, pg_s], axis=-1)
        grads = vjp_fn(g)[0]
        return optim.adam_step(p, grads, o, algo.adam_cfg, 1.0 / B)

    def chunk_fwdbwd(params, opt_state, key):
        def body(c, k):
            p, o = c
            p, o = one_fwdbwd(p, o, k)
            return (p, o), None
        keys = jax.random.split(key, Q)
        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), keys)
        return params, opt_state

    bench("fwd/bwd+adam (fixed mb)", chunk_fwdbwd, params, opt_state, key)

    # ---- 4. adam only (tree) vs flat ----
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def chunk_adam(params, opt_state):
        def body(c, _):
            p, o = c
            p, o = optim.adam_step(p, grads, o, algo.adam_cfg, 1.0 / B)
            return (p, o), None
        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), None, length=Q)
        return params, opt_state

    bench("adam only (per-leaf)", chunk_adam, params, opt_state)

    flat_o = optim.adam_init_flat(params)

    def chunk_adam_flat(params, flat_o):
        def body(c, _):
            p, o = c
            p, o = optim.adam_step_flat(p, grads, o, algo.adam_cfg, 1.0 / B)
            return (p, o), None
        (params, flat_o), _ = jax.lax.scan(
            body, (params, flat_o), None, length=Q)
        return params, flat_o

    bench("adam only (flat)", chunk_adam_flat, params, flat_o)

    # ---- 5. write-backs + post-step only ----
    rho = jnp.ones((B,))
    def chunk_wb(rs, key):
        def body(r, k):
            ep, t = rb.sample(k, r, B, "uniform")
            mbi = ab.gather_minibatch(r, ep, t)
            r = ab.write_back(r, mbi, rho, rho * 0.01, rho * 0.1,
                              rho, rho * 0.0)
            r = ab.write_next_value(r, mbi, rho)
            r, _ = ab.post_step_processing(r, cfg, jnp.int32(10), rho)
            return r, None
        keys = jax.random.split(key, Q)
        rs, _ = jax.lax.scan(body, rs, keys)
        return rs

    bench("sample+gather+writeback+poststep", chunk_wb, rs, key)

    # ---- 6. pure net fwd+bwd only ----
    def chunk_net(params, key):
        def body(p, k):
            def loss(p):
                out, _ = apply_net(p, spec, mb.s_t)
                return jnp.sum(out)
            g = jax.grad(loss)(p)
            p = jax.tree_util.tree_map(lambda w, gg: w + 1e-9 * gg, p, g)
            return p, None
        keys = jax.random.split(key, Q)
        params, _ = jax.lax.scan(body, params, keys)
        return params

    bench("net fwd/bwd only", chunk_net, params, key)


if __name__ == "__main__":
    main()
