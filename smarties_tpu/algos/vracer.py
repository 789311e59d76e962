"""V-RACER: off-policy policy gradient with ReF-ER and Retrace targets.

TPU-native re-expression of the reference's V-RACER learner
(source/smarties/Learners/RACER.{h,cpp}, RACER_common.cpp, RACER_train.cpp
instantiated with Zero_advantage — AlgoFactory.cpp:114-153): a single
network outputs [V, policy mean, (param head) policy stdev]; training is ONE
jitted function: sample minibatch -> batched forward -> analytic
output-space gradients (ReF-ER beta mix of policy gradient and KL penalty,
far-policy gated) -> vjp pullback -> Adam ascent -> scatter write-backs of
rho/KL/TD-error into the on-device replay.

The reference spreads this across OpenMP train tasks + a TaskQueue state
machine (RACER.cpp:62-110); here the whole grad step is one XLA program.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.algos.base import (default_metrics, gather_minibatch,
                                     post_step_processing, write_back,
                                     write_next_value)
from smarties_tpu.core.mdp import MDPSpec
from smarties_tpu.models.net import NetSpec, apply_net, init_params
from smarties_tpu.models.optim import (AdamConfig, AdamState, adam_init,
                                       adam_step)
from smarties_tpu.ops import continuous_policy as cp
from smarties_tpu.ops import discrete_policy as dpol
from smarties_tpu.ops.value_scale import scale_net2v, scale_vdiff
from smarties_tpu.replay import buffer as rb
from smarties_tpu.utils.config import HyperParameters, anneal_rate

F32 = jnp.float32


class VRacer:
    """Static algorithm object: builds net spec, act fn and train step."""

    def __init__(self, mdp: MDPSpec, cfg: HyperParameters):
        self.mdp = mdp
        self.cfg = cfg
        self.discrete = mdp.is_discrete
        nA = mdp.dim_action
        if self.discrete:
            n_opts = mdp.max_action_label
            # outputs: [V, probs-head] (RACER<Discrete_...> count_outputs)
            self.spec = NetSpec(
                n_in=mdp.dim_net_input, hidden=tuple(cfg.nnLayerSizes),
                n_out=1 + n_opts, kind=cfg.nnType, act=cfg.nnFunc,
                out_prefac=cfg.outWeightsPrefac)
            self.n_opts = n_opts
        else:
            # outputs: [V, mean(nA)] + ParamLayer stdev(nA)
            # (RACER_simpleSigma, RACER_common.cpp:77-108)
            sig0 = float(cp.initial_sigma_raw(cfg.explNoise))
            self.spec = NetSpec(
                n_in=mdp.dim_net_input, hidden=tuple(cfg.nnLayerSizes),
                n_out=1 + nA, kind=cfg.nnType, act=cfg.nnFunc,
                out_prefac=cfg.outWeightsPrefac,
                n_param_out=nA, param_init=tuple([sig0] * nA))
        self.bounded = np.asarray(mdp.bounded_mask) if not self.discrete \
            else None
        self.adam_cfg = AdamConfig(eta=cfg.learnrate, lambda_=cfg.nnLambda,
                                   eps_anneal=cfg.epsAnneal)
        self.returns_mode = ("retrace" if cfg.returnsEstimator
                             in ("default", "retrace")
                             else cfg.returnsEstimator)

    # ------------------------------------------------------------------
    def init(self, key):
        params = init_params(key, self.spec)
        return params, adam_init(params)

    # ------------------------------------------------------------------
    def _split_out(self, out):
        if self.discrete:
            v_raw = out[..., 0]
            pol = out[..., 1:]
            return v_raw, pol, None
        nA = self.mdp.dim_action
        return out[..., 0], out[..., 1:1 + nA], out[..., 1 + nA:]

    # ------------------------------------------------------------------
    def make_act_fn(self, train: bool = True):
        """Batched action selection (Learner::select / RACER::selectAction,
        RACER.cpp:31-47): forward, sample, record V and mu. V-RACER's
        Zero_advantage means A == 0, Q == V (Zero_advantage.h:18-45)."""
        spec, mdp, bounded = self.spec, self.mdp, self.bounded
        discrete = self.discrete

        def act(params, obs_std, key):
            out, _ = apply_net(params, spec, obs_std)
            v_raw, pol, sraw = self._split_out(out)
            value = scale_net2v(v_raw)
            zeros = jnp.zeros_like(value)
            if discrete:
                _, _, probs = dpol.probs_of(pol)
                opt = dpol.select(key, probs, train)
                action = opt[..., None].astype(F32)
                return action, probs, value, zeros
            mean = pol
            sigma = cp.sigma_of(sraw)
            if train:
                a = cp.sample(key, mean, sigma, bounded)
            else:
                a = cp.eff_mean(mean, bounded)
            mu = cp.mu_vector(mean, sigma, bounded)
            return a, mu, value, zeros

        return act

    # ------------------------------------------------------------------
    def train_step(self, params, opt_state: AdamState, rs: rb.ReplayState,
                   key, axis_name=None):
        """One gradient step (RACER_train.cpp:14-67 as one XLA program).

        When axis_name is given, the function runs inside shard_map over a
        learner mesh axis: each shard samples batchSize/n_shards transitions
        from ITS replay shard, gradients are psum'd before Adam (the
        reference's MPI_Iallreduce across learners_train_comm,
        Optimizer.cpp:110-119), and ReF-ER counters are globally reduced
        (HyperParameters::defineDistributedLearning semantics).

        Returns (params, opt_state, rs, metrics).
        """
        cfg, mdp = self.cfg, self.mdp
        n_shards = (jax.lax.psum(1, axis_name) if axis_name is not None
                    else 1)
        B = cfg.batchSize // n_shards if axis_name is not None \
            else cfg.batchSize
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_samp, = jax.random.split(key, 1)

        ep, t = rb.sample_uniform(k_samp, rs, B)
        mb = gather_minibatch(rs, ep, t)
        s_t, a_t, mu_t, qret_t = mb.s_t, mb.action, mb.mu, mb.qret

        spec = self.spec

        def fwd(p, x):
            out, _ = apply_net(p, spec, x)
            return out

        out, vjp_fn = jax.vjp(lambda p: fwd(p, s_t), params)
        v_raw, pol, sraw = self._split_out(out)
        v_val = scale_net2v(v_raw)

        if self.discrete:
            opt = a_t[..., 0].astype(jnp.int32)
            un, norm, probs = dpol.probs_of(pol)
            rho = dpol.imp_weight(opt, probs, mu_t)
            dkl = dpol.kl_mu_pi(mu_t, probs)
        else:
            sigma = cp.sigma_of(sraw)
            rho = cp.imp_weight(a_t, pol, sigma, mu_t, self.bounded)
            dkl = cp.kl_div(mu_t, pol, sigma)

        cmax, cinv, beta = rs.cmax_ret, rs.cinv_ret, rs.beta
        is_far = rb.is_far_policy(rho, cmax, cinv)

        # Zero_advantage: Aval = 0; A_RET = Qret - V; deltaQ = A_RET
        a_ret = qret_t - v_val
        delta_q = a_ret
        ver = jnp.minimum(1.0, rho) * delta_q

        # ---- analytic output gradient (ascent), RACER_train.cpp:46-57 ----
        g_v = jnp.where(is_far, 0.0, ver * beta * scale_vdiff(v_raw))
        pg_coef = jnp.where(is_far, 0.0,
                            a_ret * jnp.minimum(cmax, rho))
        if self.discrete:
            pol_g = dpol.pol_grad(opt, pol, un, norm, probs, pg_coef)
            pol_g = jnp.where(is_far[:, None], 0.0, pol_g)
            pen_g = dpol.kl_grad(mu_t, pol, un, norm, probs,
                                 -jnp.ones_like(pg_coef))
            mixed = beta * pol_g + (1 - beta) * pen_g
            g = jnp.concatenate([g_v[:, None], mixed], axis=-1)
        else:
            pg_m, pg_s = cp.pol_grad(a_t, pol, sigma, sraw, pg_coef,
                                     self.bounded)
            pg_m = jnp.where(is_far[:, None], 0.0, pg_m)
            pg_s = jnp.where(is_far[:, None], 0.0, pg_s)
            pn_m, pn_s = cp.kl_grad(mu_t, pol, sigma, sraw,
                                    -jnp.ones_like(pg_coef))
            g = jnp.concatenate([
                g_v[:, None],
                beta * pg_m + (1 - beta) * pn_m,
                beta * pg_s + (1 - beta) * pn_s], axis=-1)

        grads = vjp_fn(g)[0]
        if axis_name is not None:
            # sum gradients across learner shards before the (replicated)
            # Adam update — MPI_Iallreduce analog (Optimizer.cpp:110-119);
            # the grad factor divides by the GLOBAL batch (Optimizer.h:48).
            grads = jax.lax.psum(grads, axis_name)
        new_params, new_opt = adam_step(params, grads, opt_state,
                                        self.adam_cfg, 1.0 / cfg.batchSize)

        # ---- write-backs (MiniBatch::setMseDklImpw / setValues) ----
        rs = write_back(rs, mb, rho, dkl, delta_q, v_val,
                        jnp.zeros_like(v_val))
        # refresh V(s_T) when the sampled step precedes a truncation
        # (RACER_train.cpp:22-27): forward the next state, no gradient
        out_next = fwd(params, mb.s_t1)
        v_next = scale_net2v(out_next[..., 0])
        rs = write_next_value(rs, mb, v_next)

        rs, frac_off = post_step_processing(rs, cfg, new_opt.step, delta_q,
                                            axis_name)
        metrics = default_metrics(dkl, rho, is_far, frac_off, rs.beta,
                                  delta_q, v_val, axis_name)
        return new_params, new_opt, rs, metrics

    # ------------------------------------------------------------------
    def refresh(self, rs: rb.ReplayState, n_grad_steps, axis_name=None):
        """Every-1000-steps sweep (updateTrainingStatistics recompute branch
        + updateRewardsStats(.., rRateFac=10), Learner.cpp:74-100).

        Order preserved: returns recomputed with the OLD reward scaling,
        then scaling updated (affects subsequent ingests/sweeps)."""
        cfg = self.cfg
        rs = rb.recompute_returns(rs, cfg.gamma, cfg.lambda_,
                                  self.returns_mode)
        lr = anneal_rate(cfg.learnrate, n_grad_steps, cfg.epsAnneal)
        rs = rb.update_state_rew_stats(rs, 10.0 * lr, axis_name=axis_name)
        return rs

    # ------------------------------------------------------------------
    def initialize_stats(self, rs: rb.ReplayState, axis_name=None):
        """At training start: exact state/reward stats from gathered data,
        then rescale all return estimators (Learner::initializeLearner,
        Learner.cpp:47-72)."""
        rs = rb.update_state_rew_stats(rs, 1.0, b_init=True,
                                       axis_name=axis_name)
        rs = rb.recompute_returns(rs, self.cfg.gamma, self.cfg.lambda_,
                                  self.returns_mode)
        return rs
