"""Headline benchmark: V-RACER on vectorized JAX cart-pole, single chip.

Headline: the FUSED actor-learner loop at the reference's obsPerStep=1
pacing — each cycle is one XLA program doing an env sweep (1024 obs),
at-ingest Retrace, and the matching 1024 ReF-ER grad steps.

MEASUREMENT METHODOLOGY (r3 correction — this is important).
On the axon backend `jax.block_until_ready` does NOT wait for device
completion: execution is asynchronous and only a device->host TRANSFER
forces it. Measured evidence (r3 probes): a jitted chunk of Q=20 vs
Q=400 scanned train steps "completes" in the same 0.6-1.6 ms wall
(dispatch, not compute); one dispatch of K fused cycles with a closing
transfer costs 206 ms/cycle at K=16 and K=64 alike (real device time).
The r01/r02 benches timed with block_until_ready, so the r02 "2.65M
combined steps/s (667x)" headline was a dispatch-rate mirage, and the
r02 finding "the first transfer permanently degrades later executions"
was the same artifact inverted: after a transfer, timings become REAL.
Every timed phase here is therefore TRANSFER-FORCED: dispatch one big
compiled macro, then read one scalar; wall time covers real execution.
A canary transfer runs first (overlapped with trainer build/compiles) to
absorb the cross-process transfer-wait (~1-6 min after any predecessor
TPU process exits) before the clock starts.

Honest single-chip numbers are ~200 us per ReF-ER grad step (the
backend executes each small XLA kernel in ~25 us — measured floor for a
trivial 1-op scan body — and a train step is ~8 kernels; batch-256
128x128 MLPs are latency-bound, not FLOP-bound, on every backend).

Phases:
  fused     headline combined env+grad steps/s: ONE dispatch of K fused
            cycles (+ closing transfer)
  steady    decoupled rollout sweep + standalone jitted train chunk,
            each one dispatch + closing transfer
  atari     Atari-scale RACER train step (batch 128, Mnih 84x84x4 conv
            -> 512 dense, uint8 replay) + TFLOP/s + MFU from compiled-
            module cost analysis of ONE step
  quality   episodes-to-threshold on cart-pole, reference-default
            recipe, up to 3 seeds (BASELINE.md primary gate:
            trailing-20-episode mean NOISY training return >= THRESHOLD,
            + a separate noise-free 32-episode eval proving the
            deterministic policy). Chunked macro-scan sized by the
            remaining budget: always emits at least a partial curve.

The XLA compile cache persists in .jax_cache/ (shared across bench
invocations); the process re-execs itself once to set the cache env vars
before sitecustomize imports jax.

vs_baseline is reported against this framework's round-1 capture
(BENCH_r01.json headline 3968.3 env-steps/s == 1.0 — r01 read counters
back every cycle, so ITS number was transfer-forced and real); the
reference publishes no absolute throughput (BASELINE.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import os
import signal
import sys
import threading
import time

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 480.0))
R01_HEADLINE = 3968.3
# quality gate: trailing-TRAIL-episode mean of NOISY training returns
# (explNoise 0.447 caps those near ~250 on cart-pole even when the
# deterministic policy scores 500/500 — "balancing under noise");
# the deterministic claim is proven by the separate noise-free eval,
# and the observed ceiling is emitted as noisy_return_ceiling.
THRESHOLD, TRAIL = 150.0, 20

# bf16 peak FLOP/s per chip by device-kind substring (MFU denominator)
PEAKS = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
         "v4": 275e12, "v6": 918e12}

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")


class _Terminated(Exception):
    """Raised in the main thread on SIGTERM: emit the partial capture
    before exiting (never leave the driver with an empty stdout)."""


def _on_sigterm(signum, frame):
    raise _Terminated()


def _reexec_with_cache_env():
    """Set the persistent-compile-cache env vars and re-exec once:
    sitecustomize imports jax at interpreter start, so the vars must be
    in the process environment before python begins."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=CACHE_DIR,
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    os.execve(sys.executable,
              [sys.executable] + [os.path.abspath(sys.argv[0])]
              + sys.argv[1:], env)


def _force(x):
    """Transfer-forced completion: the ONLY reliable fence on this
    backend (block_until_ready returns before execution finishes)."""
    import jax
    import numpy as np
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _start_canary():
    """First transfer of the process in a daemon thread: absorbs the
    cross-process transfer wait while the main thread builds/compiles.
    Returns (event, start_time)."""
    done = threading.Event()

    def work():
        import jax.numpy as jnp
        import numpy as np
        np.asarray(jnp.arange(8) * 3)
        done.set()

    t0 = time.perf_counter()
    threading.Thread(target=work, daemon=True).start()
    return done, t0


# ======================================================================
# phases
# ======================================================================

def _build_trainer(seed=0):
    from smarties_tpu.envs import cartpole
    from smarties_tpu.runtime.trainer import Trainer
    from smarties_tpu.utils.config import HyperParameters
    cfg = HyperParameters(minTotObsNum=16384, maxTotObsNum=262144,
                          batchSize=256, obsPerStep=1.0,
                          nnLayerSizes=[128, 128], randSeed=seed)
    tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=1024, n_slots=4096,
                 max_len=cartpole.MAX_STEPS)
    tr.log_flush_threshold = 10 ** 9   # defer all episode-log transfers
    return tr


def _make_macro(tr, K):
    """ONE compiled program of K fused cycles (env sweep + 1024 grad
    steps each) — the honest unit of fused-throughput measurement."""
    import jax
    import jax.numpy as jnp

    def macro(params, opt, carry):
        def body(c, i):
            p, o, cr = c
            p, o, cr, _ms, _logs = tr._fused_cycle(p, o, cr, 1,
                                                   tr.n_envs)
            return (p, o, cr), None
        return jax.lax.scan(body, (params, opt, carry),
                            jnp.arange(K, dtype=jnp.float32))[0]
    return jax.jit(macro)


def phase_fused(budget):
    """Headline: ONE dispatch of K fused cycles, transfer-forced."""
    import jax
    tr = _build_trainer()
    tr.warmup(chunk=16, blind_sweeps=16)
    K = 32 if budget < 25 else 64
    jm = _make_macro(tr, K)
    p, o, carry = jm(tr.params, tr.opt_state, tr.carry)   # compile+run
    _force(p)
    t0 = time.perf_counter()
    p, o, carry = jm(p, o, carry)
    _force(p)
    dt = time.perf_counter() - t0
    tr.params, tr.opt_state, tr.carry = p, o, carry
    steps = K * tr.n_envs
    return tr, {
        "combined_env_steps_per_s": round(steps / dt, 1),
        "combined_grad_steps_per_s": round(steps / dt, 1),
        "fused_cycle_ms": round(dt * 1e3 / K, 2),
        "device": str(jax.devices()[0])}


def phase_steady(tr):
    """Decoupled throughputs, each ONE dispatch + closing transfer."""
    import jax
    key = jax.random.PRNGKey(1)
    SW = 64     # rollout sweeps in one dispatch
    carry, _logs = tr._rollout(tr.params, tr.carry, SW)   # compile
    _force(carry.replay.length)
    t0 = time.perf_counter()
    carry, _logs = tr._rollout(tr.params, carry, SW)
    _force(carry.replay.length)
    dt_roll = time.perf_counter() - t0
    tr.carry = carry

    NT = 500    # standalone train chunk length
    out = tr._train_chunk(tr.params, tr.opt_state, tr.carry.replay, key,
                          NT)
    _force(out[0])
    t0 = time.perf_counter()
    out = tr._train_chunk(tr.params, tr.opt_state, tr.carry.replay, key,
                          NT)
    _force(out[0])
    dt_train = time.perf_counter() - t0
    tr._pending_logs.clear()
    return {"rollout_env_steps_per_s": round(SW * tr.n_envs / dt_roll, 1),
            "train_chunk_grad_steps_per_s": round(NT / dt_train, 1)}


def phase_atari():
    """Atari-scale RACER train step (reference RACER_atari.json recipe:
    batch 128, layers [512], conv preprocessing; Mnih et al. 84x84x4
    stack), uint8 image replay, full ReF-ER pipeline on synthetic data.
    Timed as one dispatch of a Q-step scan + closing transfer; FLOPs
    from cost analysis of ONE unscanned step (cost analysis of a scan
    reports the body once, not xQ — r02's per-step MFU divided both time
    and flops by Q, so its ratio was right but its step time was 20x
    optimistic)."""
    import jax
    import jax.numpy as jnp
    from smarties_tpu.algos.vracer import VRacer
    from smarties_tpu.core.mdp import MDPSpec
    from smarties_tpu.replay import buffer as rb
    from smarties_tpu.utils.config import HyperParameters

    mdp = MDPSpec(dim_state=84 * 84, dim_action=1, discrete_values=(6,),
                  n_appended_obs=3,
                  conv_layers=((84, 84, 4, 32, 8, 4),
                               (20, 20, 32, 64, 4, 2),
                               (9, 9, 64, 64, 3, 1)))
    cfg = HyperParameters(batchSize=128, nnLayerSizes=[512], gamma=0.99,
                          minTotObsNum=16384, maxTotObsNum=262144)
    algo = VRacer(mdp, cfg)   # discrete -> RACER rewrite
    params, opt = algo.init(jax.random.PRNGKey(0))
    E, L = 512, 128
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
    Q = 100

    def chunk(p, o, r, k):
        def body(c, kk):
            pp, oo, rr = c
            pp, oo, rr, _ = algo.train_step(pp, oo, rr, kk)
            return (pp, oo, rr), None
        c, _ = jax.lax.scan(body, (p, o, r), jax.random.split(k, Q))
        return c

    jf = jax.jit(chunk)
    key = jax.random.PRNGKey(2)
    out = jf(params, opt, rs, key)
    _force(out[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = jf(params, opt, rs, key)
        _force(out[0])
        best = min(best, time.perf_counter() - t0)
    step_ms = best * 1e3 / Q
    res = {"atari_train_step_ms": round(step_ms, 3),
           "atari_grad_steps_per_s": round(Q / best, 1)}
    try:  # FLOPs of ONE step -> achieved TFLOP/s and MFU
        one = jax.jit(algo.train_step)
        cost = one.lower(params, opt, rs, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            tflops = flops / (step_ms * 1e-3) / 1e12
            res["atari_flops_per_step_g"] = round(flops / 1e9, 2)
            res["atari_tflops_achieved"] = round(tflops, 1)
            kind = jax.devices()[0].device_kind.lower()
            peak = next((v for s, v in PEAKS.items() if s in kind), None)
            if peak:
                res["atari_mfu_vs_bf16_peak"] = round(
                    tflops * 1e12 / peak, 4)
    except Exception as e:  # cost analysis may be unsupported remotely
        res["atari_cost_analysis_error"] = repr(e)[:120]
    return res


def phase_quality(seed, budget):
    """Episodes until the trailing-TRAIL-episode mean return crosses
    THRESHOLD (BASELINE.md primary gate). Reference-default recipe
    except minTotObsNum 131072->65536 (the 4096-slot ring cannot hold
    131k obs of short random-policy warmup episodes).

    The curve tracker runs on device inside a jitted macro-scan, chunked
    KC cycles per program execution with a host wall-clock check between
    chunks — a shrinking budget degrades the result to a partial curve
    instead of nothing. The per-chunk curve readback doubles as the
    completion fence."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    t_q0 = time.perf_counter()
    res = {"seed": seed}
    tr = _build_trainer(seed)
    tr.cfg.minTotObsNum = tr.n_obs_b4_start = 65536
    tr.warmup(chunk=16, blind_sweeps=65536 // 1024)
    n_train = tr.n_envs                  # obsPerStep == 1 pacing
    K = 256                              # <= 262144 grad steps
    KC = 16                              # cycles per jitted chunk
    TOPK = 128                           # max episode completions/sweep

    def fold(trk, done, ret):
        # completed lanes first; at most TOPK completions per 1-step
        # sweep; completions beyond TOPK are counted in the overflow
        # output instead of silently dropped (no-silent-caps rule)
        order = jnp.argsort(~done)
        d, r = done[order][:TOPK], ret[order][:TOPK]
        ovf = jnp.maximum(done.sum() - TOPK, 0)

        def push(t, dr):
            ring, cnt = t
            dd, rr = dr
            ring2 = jnp.where(dd, ring.at[cnt % TRAIL].set(rr), ring)
            return (ring2, cnt + dd.astype(jnp.int32)), None

        return lax.scan(push, trk, (d, r))[0], ovf

    def macro(params, opt, carry, trk, base):
        def body(c, i):
            p, o, cr, t = c
            p, o, cr, _ms, logs = tr._fused_cycle(p, o, cr, 1, n_train)
            done, _length, ret = logs[0], logs[1], logs[2]
            t, ovf = fold(t, done.reshape(-1), ret.reshape(-1))
            # the reference's every-1000-grad-steps replay refresh
            # (cadence == once per 1024-step cycle, like train_fused)
            cr = cr._replace(replay=tr._refresh(
                cr.replay, (base + i + 1.0) * n_train))
            return (p, o, cr, t), (t[1], t[0].mean(), ovf)

        return lax.scan(body, (params, opt, carry, trk),
                        jnp.arange(KC, dtype=jnp.float32))

    jm = jax.jit(macro)
    trk = (jnp.zeros(TRAIL), jnp.zeros((), jnp.int32))
    p, o, carry = tr.params, tr.opt_state, tr.carry
    cnts_all, means_all, overflow = [], [], 0
    cycles = 0
    deadline = budget - 10.0
    try:
        while cycles < K:
            (p, o, carry, trk), (cnts, means, ovf) = jm(
                p, o, carry, trk, float(cycles))
            cycles += KC
            cnts_all.append(np.asarray(cnts))
            means_all.append(np.asarray(means))
            overflow += int(np.asarray(ovf).sum())
            if time.perf_counter() - t_q0 > deadline:
                break
    except _Terminated:
        pass     # emit the curve collected so far
    if not cnts_all:
        return dict(res, partial=True, terminated_in="first_chunk")
    tr.params, tr.opt_state, tr.carry = p, o, carry   # for the eval below
    cnts = np.concatenate(cnts_all)
    means = np.concatenate(means_all)
    ok = (cnts >= TRAIL) & (means >= THRESHOLD)
    ep = int(cnts[np.argmax(ok)]) if ok.any() else None
    res.update({
        "episodes_to_threshold": ep,
        "episodes_total": int(cnts[-1]),
        "grad_steps": cycles * n_train, "env_steps": cycles * tr.n_envs,
        "final_trail_mean": round(float(means[-1]), 1)
        if cnts[-1] >= TRAIL else None,
        "noisy_return_ceiling": round(float(means.max()), 1),
        "tracker_overflow_episodes": overflow,
        "curve_every_cycle": [[int(c), round(float(m), 1)]
                              for c, m in zip(cnts[::16], means[::16])]})
    if cycles < K:
        res["partial"] = True     # budget ran out; curve above is real
    # deterministic-policy proof (32-episode noise-free eval)
    if budget - (time.perf_counter() - t_q0) > 30.0:
        try:
            ev = tr.evaluate(32)
            res["eval_mean_deterministic"] = round(float(np.mean(ev)), 1)
        except _Terminated:
            res["eval_skipped_for_budget"] = True
    else:
        res["eval_skipped_for_budget"] = True
    return res


# ======================================================================
# main
# ======================================================================

def main():
    _reexec_with_cache_env()
    signal.signal(signal.SIGTERM, _on_sigterm)
    t_start = time.time()

    def left():
        return BUDGET_S - (time.time() - t_start)

    extras = {"n_envs": 1024, "batch_size": 256,
              "timing": "transfer-forced (block_until_ready does not "
                        "fence on this backend; see bench.py docstring)"}
    errors, skipped = [], []
    etts = []
    value = 0.0
    # first transfer of the process: absorb the cross-process wait in a
    # daemon thread while the fused phase builds and compiles
    canary, t_can = _start_canary()
    try:
        try:
            # phase_fused's first (untimed) _force queues behind the
            # canary and absorbs the cross-process transfer wait; its
            # TIMED dispatch runs with a sane transfer path
            tr, head = phase_fused(left())
            extras["transfer_canary_s"] = round(
                time.perf_counter() - t_can, 1) if canary.is_set() \
                else None
            extras.update(head)
            value = head.get("combined_env_steps_per_s", 0.0)
        except _Terminated:
            raise
        except Exception as e:
            errors.append(f"fused: {e!r}"[:300])
            tr = None

        if tr is not None and left() > 40:
            try:
                extras.update(phase_steady(tr))
            except Exception as e:
                errors.append(f"steady: {e!r}"[:300])
        elif tr is None or left() <= 40:
            skipped.append("steady")

        if left() > 60:
            try:
                extras.update(phase_atari())
            except Exception as e:
                errors.append(f"atari: {e!r}"[:300])
        else:
            skipped.append("atari")

        del tr
        for seed in (0, 1, 2):
            if left() < 60:
                skipped.append(f"quality{seed}")
                continue
            try:
                etts.append(phase_quality(seed, left() - 15))
            except Exception as e:
                errors.append(f"quality{seed}: {e!r}"[:300])
    except _Terminated:
        errors.append("terminated before completion (partial capture)")

    if etts:
        vals = [q.get("episodes_to_threshold") for q in etts]
        ok = sorted(v for v in vals if v is not None)
        extras["episodes_to_threshold"] = vals
        extras["episodes_to_threshold_median"] = (
            ok[len(ok) // 2] if ok else None)
        extras["quality_detail"] = etts

    extras["wall_s"] = round(time.time() - t_start, 1)
    if errors:
        extras["errors"] = errors
    if skipped:   # no silent caps: say what the budget dropped
        extras["skipped_for_budget"] = skipped
    print(json.dumps({
        "metric": "combined_env_steps_per_s",
        "value": value,
        "unit": "env-steps/s/chip",
        "vs_baseline": round(value / R01_HEADLINE, 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
