"""Decompose the Atari-scale RACER train step (transfer-forced).

Ablations of the bench.py atari config (batch 128, Mnih 84x84x4 conv ->
512 dense, uint8 replay, frame stacking n_appended=3).
r5 decomposition at N=1024 (us/step): scan floor 55 | gather+
standardize +68 | net fwd +88 | bwd+adam +132 | policy math +
write-backs +17 = ~361 total. The FLOP-carrying 220 us runs at ~30% of
bf16 peak; bf16 compute measured NEUTRAL twice (the conv bwd is bound
by its internal transposes/memory, not MXU flops), and the NHWC-direct
gather measured SLOWER (uint8 transpose cost) — both remain opt-in
probes (nnBf16, SMT_NHWC_GATHER). N below is 200 for quick runs:
subtract ~28ms/N of fixed dispatch cost before comparing absolutes.
Run on the default (TPU) env, ONE job at a time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.algos import base as ab
from smarties_tpu.algos.vracer import VRacer
from smarties_tpu.core.mdp import MDPSpec
from smarties_tpu.replay import buffer as rb
from smarties_tpu.utils.config import HyperParameters

N = 200


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    mdp = MDPSpec(dim_state=84 * 84, dim_action=1, discrete_values=(6,),
                  n_appended_obs=3,
                  conv_layers=((84, 84, 4, 32, 8, 4),
                               (20, 20, 32, 64, 4, 2),
                               (9, 9, 64, 64, 3, 1)))
    cfg = HyperParameters(batchSize=128, nnLayerSizes=[512], gamma=0.99,
                          minTotObsNum=16384, maxTotObsNum=262144)
    algo = VRacer(mdp, cfg)
    params0, opt0 = algo.init(jax.random.PRNGKey(0))
    E, L = 512, 128
    rs0 = rb.init_replay(E, L, mdp.dim_state_observed, mdp.dim_action,
                         mdp.dim_policy, cfg.clipImpWeight,
                         state_dtype=jnp.uint8, mu_init=rb.safe_mu(mdp))
    rs0 = rs0._replace(
        ep_id=jnp.arange(E, dtype=jnp.int32),
        length=jnp.full((E,), L, jnp.int32),
        states=jax.random.randint(jax.random.PRNGKey(1),
                                  (E, L + 1, mdp.dim_state_observed),
                                  0, 256, jnp.uint8),
        rho=jnp.ones((E, L + 1)))

    def timeit(name, body):
        def chunk(p, o, r, key):
            ks = jax.random.split(key, N)
            eps, ts = ab.presample_uniform(ks, r, cfg.batchSize)

            def step(c, x):
                return body(*c, *x), None

            (p, o, r), _ = jax.lax.scan(step, (p, o, r), (ks, eps, ts))
            return p, o, r

        jm = jax.jit(chunk)
        out = jm(params0, opt0, rs0, jax.random.PRNGKey(0))
        force(out[0])
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = jm(params0, opt0, rs0, jax.random.PRNGKey(i))
            force(out[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:<12s} {best*1e6/N:9.1f} us/step", flush=True)

    def b_full(p, o, r, k, e, t):
        p, o, r, _ = algo.train_step(p, o, r, k, sample_override=(e, t))
        return p, o, r

    def b_gather(p, o, r, k, e, t):
        mb = ab.gather_minibatch(r, e, t, n_appended=mdp.n_appended_obs)
        return p, o, r._replace(
            max_abs_error=r.max_abs_error
            + 1e-12 * (jnp.sum(mb.s_t) + jnp.sum(mb.qret)))

    from smarties_tpu.models.net import apply_net
    from smarties_tpu.models.optim import adam_step
    from smarties_tpu.ops import discrete_policy as dpol
    from smarties_tpu.ops.value_scale import scale_net2v, scale_vdiff

    def b_fwd(p, o, r, k, e, t):
        mb = ab.gather_minibatch(r, e, t, n_appended=mdp.n_appended_obs)
        B2 = mb.s_t.shape[0]
        xcat = jnp.concatenate([mb.s_t, mb.s_t1], axis=0)
        out_cat, vjp_fn = jax.vjp(
            lambda pp: apply_net(pp, algo.spec, xcat)[0], p)
        out = out_cat[:B2]
        v_raw, adv_out, pol, _ = algo._split_out(out)
        v_val = scale_net2v(v_raw)
        a_ret = mb.qret - v_val
        g_v = a_ret * scale_vdiff(v_raw)
        g = jnp.concatenate(
            [g_v[:, None], jnp.zeros_like(adv_out),
             jnp.zeros_like(pol)], axis=-1)
        grads = vjp_fn(jnp.concatenate([g, jnp.zeros_like(g)], 0))[0]
        p2, o2 = adam_step(p, grads, o, algo.adam_cfg,
                           1.0 / cfg.batchSize)
        return p2, o2, r

    timeit("gather", b_gather)
    timeit("fwd", b_fwd)
    timeit("full", b_full)


if __name__ == "__main__":
    main()
