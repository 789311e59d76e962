"""Bisect which packed-layout program crashes the TPU worker."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.envs import cartpole
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters


def force(x, tag):
    t0 = time.perf_counter()
    v = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel())[:1]
    print(f"OK {tag}: force {time.perf_counter()-t0:.1f}s val={v}",
          flush=True)


def main():
    cfg = HyperParameters(minTotObsNum=2048, maxTotObsNum=262144,
                          batchSize=256, obsPerStep=1.0,
                          nnLayerSizes=[128, 128])
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=1024, n_slots=4096,
                 max_len=cartpole.MAX_STEPS)
    tr.log_flush_threshold = 10 ** 9
    force(tr.carry.replay.beta, "init")
    tr._roll(2)
    force(tr.carry.replay.samp_cl, "rollout+fix_returns")
    tr.carry = tr.carry._replace(
        replay=tr._init_stats(tr.carry.replay))
    tr._initialized = True
    force(tr.carry.replay.state_mean, "init_stats")
    key = jax.random.PRNGKey(1)
    out = tr._train_chunk(tr.params, tr.opt_state, tr.carry.replay, key,
                          4)
    force(out[0], "train_chunk4")
    out = tr._train_chunk(tr.params, tr.opt_state, tr.carry.replay, key,
                          500)
    force(out[0], "train_chunk500")
    rs = tr._refresh(tr.carry.replay, 1024.0)
    force(rs.beta, "refresh")
    st = tr._fused_cycle(tr.params, tr.opt_state, tr.carry, 1, 1024)
    force(st[0], "fused_cycle")
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
