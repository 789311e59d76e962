"""Transfer-forced measurement of the PACKED fused cycle / train chunk.

r3 correction applies: block_until_ready does not fence on this backend;
every timing here dispatches one jitted macro then reads a scalar
(np.asarray) to force completion. Run on the default (TPU) env, ONE job
at a time. A canary transfer first absorbs the cross-process wait.
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.envs import cartpole
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    done = threading.Event()
    t_can = time.perf_counter()

    def canary():
        np.asarray(jnp.arange(8) * 3)
        done.set()

    threading.Thread(target=canary, daemon=True).start()

    cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                          batchSize=256, obsPerStep=1.0,
                          nnLayerSizes=[128, 128])
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=1024, n_slots=4096,
                 max_len=cartpole.MAX_STEPS)
    tr.log_flush_threshold = 10 ** 9
    tr.warmup(chunk=16, blind_sweeps=16)
    K = 16

    def macro(params, opt, carry):
        def body(c, i):
            p, o, cr = c
            p, o, cr, _ms, _logs = tr._fused_cycle(p, o, cr, 1, tr.n_envs)
            return (p, o, cr), None
        return jax.lax.scan(body, (params, opt, carry),
                            jnp.arange(K, dtype=jnp.float32))[0]

    jm = jax.jit(macro)
    out = jm(tr.params, tr.opt_state, tr.carry)
    force(out[0])
    print(f"canary+compile+first force done "
          f"({time.perf_counter() - t_can:.1f}s)", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        out = jm(*out)
        force(out[0])
        dt = time.perf_counter() - t0
        print(f"fused cycle: {dt * 1e3 / K:7.2f} ms/cycle "
              f"({K * tr.n_envs / dt:8.1f} combined steps/s)", flush=True)

    # standalone train chunk
    NT = 500
    key = jax.random.PRNGKey(1)
    carry = out[2]
    o2 = tr._train_chunk(tr.params, tr.opt_state, carry.replay, key, NT)
    force(o2[0])
    for _ in range(2):
        t0 = time.perf_counter()
        o2 = tr._train_chunk(tr.params, tr.opt_state, carry.replay, key,
                             NT)
        force(o2[0])
        dt = time.perf_counter() - t0
        print(f"train chunk: {dt * 1e6 / NT:7.1f} us/step "
              f"({NT / dt:8.1f} grad steps/s)", flush=True)

    # pure rollout sweeps
    SW = 64
    c2, _ = tr._rollout(tr.params, carry, SW)
    force(c2.replay.beta)
    for _ in range(2):
        t0 = time.perf_counter()
        c2, _ = tr._rollout(tr.params, c2, SW)
        force(c2.replay.beta)
        dt = time.perf_counter() - t0
        print(f"rollout: {dt * 1e3 / SW:7.2f} ms/sweep "
              f"({SW * tr.n_envs / dt:9.1f} env steps/s)", flush=True)


if __name__ == "__main__":
    main()
