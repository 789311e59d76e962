"""Replay/training statistics: console table + importance-weight histogram.

Reference: the per-1000-grad-steps stats table (MemoryBuffer::getMetrics,
MemoryBuffer.cpp:522-575 + Learner::processStats, Learner.cpp:158-195;
column meanings documented in README.rst:375-388) and the off-policy
importance-weight histogram (MemoryProcessing::histogramImportanceWeights,
MemoryProcessing.cpp:353-389).
"""
from __future__ import annotations

import numpy as np

from smarties_tpu.replay import buffer as rb


def replay_metrics(rs: rb.ReplayState) -> dict:
    """Exact whole-buffer statistics (the reference recomputes these every
    1000 steps via episode aggregates; one masked reduction here)."""
    import jax.numpy as jnp
    mask = rs.valid_steps()
    maskf = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(maskf), 1.0)
    far = rb.is_far_policy(rs.rho, rs.cmax_ret, rs.cinv_ret) & mask
    q = rs.value + rs.advantage
    valid_eps = rs.valid_slots()
    tot_r_per_ep = jnp.sum(rs.rewards * maskf, axis=1)
    n_eps = jnp.maximum(jnp.sum(valid_eps.astype(jnp.float32)), 1.0)
    out = {
        "nEp": jnp.sum(valid_eps.astype(jnp.int32)),
        "nObs": rs.n_stored_steps(),
        "totEp": rs.n_seen_eps,
        "totObs": rs.n_seen_steps,
        "avgR": jnp.sum(jnp.where(valid_eps, tot_r_per_ep, 0.0)) / n_eps,
        "stdr": rs.rew_std,
        "DKL": jnp.sum(rs.kl * maskf) / n,
        "RMSE": jnp.sqrt(jnp.sum(rs.delta * rs.delta * maskf) / n),
        "avgQ": jnp.sum(q * maskf) / n,
        "minQ": jnp.min(jnp.where(mask, q, jnp.inf)),
        "maxQ": jnp.max(jnp.where(mask, q, -jnp.inf)),
        "nFarP": jnp.sum(far.astype(jnp.int32)),
        "beta": rs.beta,
        "alpha": rs.alpha,
        "maxAbsE": rs.max_abs_error,
    }
    return {k: float(np.asarray(v)) for k, v in out.items()}


def stats_header() -> str:
    """Column header matching the reference's console table
    (README.rst:375-388)."""
    return ("|  nEp |   nObs |  totEp |  totObs | oldEp |nFarP "
            "| avgR | stdr | DKL | RMSE | avgQ | minQ | maxQ | beta")


def stats_row(rs: rb.ReplayState, grad_step: int) -> str:
    m = replay_metrics(rs)
    return (f"{grad_step:>7d} {m['nEp']:>6.0f} {m['nObs']:>8.0f} "
            f"{m['totEp']:>7.0f} {m['totObs']:>8.0f} {m['nFarP']:>6.0f} "
            f"{m['avgR']:>8.2f} {m['stdr']:>6.2f} {m['DKL']:>7.4f} "
            f"{m['RMSE']:>6.3f} {m['avgQ']:>7.2f} {m['minQ']:>7.2f} "
            f"{m['maxQ']:>7.2f} {m['beta']:>5.3f}")


def iw_histogram(rs: rb.ReplayState, n_bins: int = 81) -> str:
    """Importance-weight histogram printout
    (histogramImportanceWeights, MemoryProcessing.cpp:353-389):
    log-spaced bins in [1e-3, 50], fraction of dataset per bin."""
    mask = np.asarray(rs.valid_steps())
    rho = np.asarray(rs.rho)[mask]
    if rho.size == 0:
        return "(empty replay)"
    beg, end = np.log(1e-3), np.log(50.0)
    bounds = np.concatenate([
        [0.0], np.exp(beg + (end - beg) * (np.arange(1, n_bins) - 1.0)
                      / (n_bins - 2.0)), [np.finfo(np.float32).max]])
    counts, _ = np.histogram(rho, bounds)
    frac = counts / rho.size
    hmean = 2 * bounds[:-1] * bounds[1:] / np.maximum(
        bounds[:-1] + bounds[1:], 1e-12)
    lines = ["OFF-POLICY IMP WEIGHTS HISTOGRAM (bin harmonic mean: frac)"]
    row = "  ".join(f"{h:.3g}:{f:.3f}" for h, f in zip(hmean, frac)
                    if f > 0)
    lines.append(row)
    return "\n".join(lines)
