"""Bit-parity guard for the NHWC conv-input gather (r5 Atari path).

gather_minibatch(nhwc_hw=(H, W)) emits s_t/s_t1 as [B, H, W, C] conv
inputs directly (uint8 transpose before the f32 promotion) instead of
flat rows that apply_net reshapes + transposes; the conv consumes the
same logical NHWC tensor either way, so the whole train step must be
BITWISE identical. Reference semantics: Episode::standardizedState
frame stacking (Episode.h:171-183) + Conv2D preprocessing.
"""
import jax
import jax.numpy as jnp
import numpy as np

import smarties_tpu.algos.base as ab  # noqa: F401 (kept for the flat-values test)
import smarties_tpu.algos.vracer as vmod  # noqa: F401
from smarties_tpu.algos.vracer import VRacer
from smarties_tpu.core.mdp import MDPSpec
from smarties_tpu.replay import buffer as rb
from smarties_tpu.utils.config import HyperParameters

H = W = 12


def _setup():
    mdp = MDPSpec(dim_state=H * W, dim_action=1, discrete_values=(4,),
                  n_appended_obs=3,
                  conv_layers=((H, W, 4, 8, 4, 2), (5, 5, 8, 8, 3, 1)))
    cfg = HyperParameters(batchSize=16, nnLayerSizes=[32],
                          minTotObsNum=64, maxTotObsNum=100000)
    algo = VRacer(mdp, cfg)
    params, opt = algo.init(jax.random.PRNGKey(0))
    E, L = 32, 24
    rs = rb.init_replay(E, L, mdp.dim_state_observed, mdp.dim_action,
                        mdp.dim_policy, cfg.clipImpWeight,
                        state_dtype=jnp.uint8, mu_init=rb.safe_mu(mdp))
    rs = rs._replace(
        ep_id=jnp.arange(E, dtype=jnp.int32),
        length=jnp.full((E,), L, jnp.int32),
        states=jax.random.randint(jax.random.PRNGKey(1),
                                  (E, L + 1, mdp.dim_state_observed),
                                  0, 256, jnp.uint8),
        rho=jnp.ones((E, L + 1)))
    return algo, params, opt, rs


def test_nhwc_train_step_bitwise_identical(monkeypatch):
    algo, params, opt, rs = _setup()
    key = jax.random.PRNGKey(5)
    monkeypatch.setenv("SMT_NHWC_GATHER", "1")   # opt-in probe path
    p1, _, r1, _ = jax.jit(algo.train_step)(params, opt, rs, key)

    monkeypatch.delenv("SMT_NHWC_GATHER")        # default flat path
    p2, _, r2, _ = jax.jit(algo.train_step)(params, opt, rs, key)

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(r1.rho), np.asarray(r2.rho))


def test_nhwc_gather_matches_flat_values():
    algo, params, opt, rs = _setup()
    ep, t = rb.sample_uniform(jax.random.PRNGKey(3), rs, 16)
    flat = ab.gather_minibatch(rs, ep, t, n_appended=3)
    nhwc = ab.gather_minibatch(rs, ep, t, n_appended=3, nhwc_hw=(H, W))
    # NHWC channels j are frames newest-first; flat is [frame0; frame1..]
    f = np.asarray(flat.s_t).reshape(16, 4, H, W)
    n = np.asarray(nhwc.s_t)
    np.testing.assert_array_equal(np.moveaxis(f, 1, -1), n)
    f1 = np.asarray(flat.s_t1).reshape(16, 4, H, W)
    n1 = np.asarray(nhwc.s_t1)
    np.testing.assert_array_equal(np.moveaxis(f1, 1, -1), n1)
