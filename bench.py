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
transfer costs the same per-cycle at K=16 and K=64 alike (real device
time). The r01/r02 benches timed with block_until_ready, so the r02
"2.65M combined steps/s (667x)" headline was a dispatch-rate mirage.
Every timed phase here is therefore TRANSFER-FORCED: dispatch one big
compiled macro, then read one scalar; wall time covers real execution.

CAPTURE STRUCTURE (r4 redesign — stall-proof). A process's FIRST
transfer waits out the previous TPU process's tunnel claim (~1-10 min);
in r2/r3 the driver capture sequenced all phases behind that canary and
starved them. Execution is asynchronous, so the fix is to DISPATCH all
heavy compute (fused warmup + the full quality-seed training + evals +
the atari warmup) up front while the canary waits, fence once on the
LAST dispatch (execution is in-order: forcing the last stage-1 output
drains the whole queue), then run each short TIMED region against an
idle device, then read the already-computed quality results (cheap).
A partial JSON is flushed to BENCH_partial.json after every phase so
even a SIGKILL leaves a usable capture; SIGTERM prints the partial
capture to stdout.

Honest single-chip numbers (packed replay layout, r4): per-step cost
tracks indexed-op count and in-body RNG, not FLOPs (cost model in
docs/RESULTS.md + tools/profile_layout.py); the r4 packing + RNG hoist
collapsed the train step from ~8 gathers + 6 scatters + in-body
sampling to 2 gathers + 1 fused full-row scatter + 1 far-count add.

Phases:
  fused     headline combined env+grad steps/s: ONE dispatch of K fused
            cycles (+ closing transfer)
  steady    decoupled rollout sweep + standalone jitted train chunk,
            each one dispatch + closing transfer
  atari     Atari-scale RACER train step (batch 128, Mnih 84x84x4 conv
            -> 512 dense, uint8 replay) + TFLOP/s + MFU from compiled-
            module cost analysis of ONE step
  quality   episodes-to-threshold on cart-pole, reference-default
            recipe, 3 seeds (BASELINE.md primary gate: trailing-20-
            episode mean NOISY training return >= THRESHOLD, + a
            noise-free 32-episode eval proving the deterministic
            policy). Dispatched entirely during the canary stall.

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
# HBM bandwidth (bytes/s): the roofline that actually binds the atari
# step (adam moments alone move ~91 MB/step at 3.2M params)
HBM_PEAKS = {"v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9,
             "v4": 1228e9, "v6": 1640e9}

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(HERE, ".jax_cache")
PARTIAL_PATH = os.path.join(HERE, "BENCH_partial.json")


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
    cross-process transfer wait while the main thread builds/compiles/
    dispatches. Returns (event, start_time)."""
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


class QualityDispatch:
    """Quality seed: builds the trainer and DISPATCHES the full training
    (warmup + K cycles in KC-sized jitted chunks + the deterministic
    eval) without a single device->host transfer; `finish()` later
    materializes the already-computed curve (cheap readbacks).

    Gate definition: BASELINE.md primary gate; per-episode metric stream
    /root/reference/source/smarties/ReplayMemory/MemoryBuffer.cpp:491-513.
    Reference-default recipe except minTotObsNum 131072->65536 (the
    4096-slot ring cannot hold 131k obs of short random-policy warmup
    episodes)."""

    K = 256     # total cycles -> 262144 grad steps
    KC = 16     # cycles per jitted chunk
    TOPK = 128  # max episode completions folded per 1-step sweep

    def __init__(self, seed):
        import jax
        import jax.numpy as jnp
        from jax import lax
        self.seed = seed
        tr = self.tr = _build_trainer(seed)
        tr.cfg.minTotObsNum = tr.n_obs_b4_start = 65536
        tr.warmup(chunk=16, blind_sweeps=65536 // 1024)
        n_train = tr.n_envs                  # obsPerStep == 1 pacing
        TRAIL_, TOPK = TRAIL, self.TOPK

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
                ring2 = jnp.where(dd, ring.at[cnt % TRAIL_].set(rr), ring)
                return (ring2, cnt + dd.astype(jnp.int32)), None

            return lax.scan(push, trk, (d, r))[0], ovf

        def macro(params, opt, carry, trk, base):
            def body(c, i):
                p, o, cr, t = c
                p, o, cr, _ms, logs = tr._fused_cycle(p, o, cr, 1,
                                                      n_train)
                done, _length, ret = logs[0], logs[1], logs[2]
                t, ovf = fold(t, done.reshape(-1), ret.reshape(-1))
                # the reference's every-1000-grad-steps replay refresh
                # (cadence == once per 1024-step cycle, like train_fused)
                cr = cr._replace(replay=tr._refresh(
                    cr.replay, (base + i + 1.0) * n_train))
                return (p, o, cr, t), (t[1], t[0].mean(), ovf)

            return lax.scan(body, (params, opt, carry, trk),
                            jnp.arange(self.KC, dtype=jnp.float32))

        jm = jax.jit(macro)
        trk = (jnp.zeros(TRAIL), jnp.zeros((), jnp.int32))
        p, o, carry = tr.params, tr.opt_state, tr.carry
        self.chunks = []           # device futures: (cnts, means, ovf)
        cycles = 0
        while cycles < self.K:
            (p, o, carry, trk), out = jm(p, o, carry, trk, float(cycles))
            cycles += self.KC
            self.chunks.append(out)
        self.cycles = cycles
        tr.params, tr.opt_state, tr.carry = p, o, carry
        # dispatch the deterministic-policy proof (32-episode noise-free
        # eval); depends on the final params, so it queues after training
        self.eval_dev = tr.evaluate(32, materialize=False)

    @property
    def last_future(self):
        return self.eval_dev

    def finish(self):
        """Materialize the (already-executed) curve + eval."""
        import numpy as np
        res = {"seed": self.seed}
        cnts = np.concatenate([np.asarray(c) for c, _, _ in self.chunks])
        means = np.concatenate([np.asarray(m) for _, m, _ in self.chunks])
        overflow = int(sum(int(np.asarray(v).sum())
                           for _, _, v in self.chunks))
        ok = (cnts >= TRAIL) & (means >= THRESHOLD)
        ep = int(cnts[np.argmax(ok)]) if ok.any() else None
        n_train = self.tr.n_envs
        res.update({
            "episodes_to_threshold": ep,
            "episodes_total": int(cnts[-1]),
            "grad_steps": self.cycles * n_train,
            "env_steps": self.cycles * self.tr.n_envs,
            "final_trail_mean": round(float(means[-1]), 1)
            if cnts[-1] >= TRAIL else None,
            "noisy_return_ceiling": round(float(means.max()), 1),
            "tracker_overflow_episodes": overflow,
            "curve_every_cycle": [[int(c), round(float(m), 1)]
                                  for c, m in zip(cnts[::16],
                                                  means[::16])]})
        ev = np.asarray(self.eval_dev)
        if np.isfinite(ev).all():
            res["eval_mean_deterministic"] = round(float(np.mean(ev)), 1)
        else:
            res["eval_nonfinite"] = True
        self.tr._pending_logs.clear()
        return res


def dispatch_fused(budget):
    """Build + dispatch the headline macro (warmup + one untimed run);
    returns (tr, jm, state) with NO transfers issued."""
    tr = _build_trainer()
    tr.warmup(chunk=16, blind_sweeps=16)
    K = 32 if budget < 25 else 64
    jm = _make_macro(tr, K)
    state = jm(tr.params, tr.opt_state, tr.carry)   # compile + run
    return tr, jm, K, state


def time_fused(tr, jm, K, state):
    """Timed region: device is idle (caller fenced the queue)."""
    import jax
    t0 = time.perf_counter()
    state = jm(*state)
    _force(state[0])
    dt = time.perf_counter() - t0
    tr.params, tr.opt_state, tr.carry = state
    steps = K * tr.n_envs
    return {
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
    _force(carry.replay.beta)
    t0 = time.perf_counter()
    carry, _logs = tr._rollout(tr.params, carry, SW)
    _force(carry.replay.beta)
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


def build_atari():
    """Atari-scale RACER setup (reference RACER_atari.json recipe: batch
    128, layers [512], conv preprocessing; Mnih et al. 84x84x4 stack),
    uint8 image replay, full ReF-ER pipeline on synthetic data. Returns
    (jf, args, warm_out) with one untimed dispatch issued."""
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
    # Q amortizes the ~28 ms fixed dispatch+transfer cost down to the
    # steady-state floor (~27 us/step at 1024, vs 70 us at the r4
    # Q=400) — the same per-dispatch iteration count the fused loop and
    # the cost model (CLAUDE.md) use; program runtime ~0.35 s, far
    # under the ~30 s worker-crash limit
    Q = 1024

    def chunk(p, o, r, k):
        from smarties_tpu.algos.base import presample_uniform
        ks = jax.random.split(k, Q)
        eps, ts = presample_uniform(ks, r, cfg.batchSize)

        def body(c, x):
            pp, oo, rr = c
            kk, e, t = x
            pp, oo, rr, _ = algo.train_step(pp, oo, rr, kk,
                                            sample_override=(e, t))
            return (pp, oo, rr), None
        c, _ = jax.lax.scan(body, (p, o, r), (ks, eps, ts))
        return c

    jf = jax.jit(chunk)
    key = jax.random.PRNGKey(2)
    warm = jf(params, opt, rs, key)
    return algo, jf, Q, (params, opt, rs, key), warm


def time_atari(algo, jf, Q, args, warm):
    """Timed atari region (device idle; warm-run output already forced).
    FLOPs from cost analysis of ONE unscanned step (cost analysis of a
    scan reports the body once, not xQ — r02's per-step MFU divided both
    time and flops by Q, so its ratio was right but its step time was
    20x optimistic)."""
    import jax
    params, opt, rs, key = args
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
        # memory roofline floor: EVERY train step streams the full
        # f32 adam state (read p/m/v/grad + write p/m/v = 28 B/param;
        # models/optim.py) — at 3.2M params that alone is ~91 MB/step,
        # a hard >100 us floor on v5e regardless of MXU speed. Report
        # it so the MFU gap reads as the memory-bound fact it is.
        # (XLA cost_analysis "bytes accessed" is NOT used: it counts
        # fusion-internal operand reads and exceeds HBM peak 9x here.)
        n_par = sum(int(l.size) for l in
                    jax.tree_util.tree_leaves(params))
        hpeak = next((v for s, v in HBM_PEAKS.items() if s in kind),
                     None)
        if hpeak:
            floor_ms = n_par * 28 / hpeak * 1e3
            res["atari_adam_hbm_floor_ms"] = round(floor_ms, 3)
            res["atari_adam_hbm_floor_frac"] = round(
                floor_ms / step_ms, 3)
    except Exception as e:  # cost analysis may be unsupported remotely
        res["atari_cost_analysis_error"] = repr(e)[:120]
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

    extras = {"n_envs": 1024, "batch_size": 256, "packed_replay": True,
              "timing": "transfer-forced (see bench.py docstring)",
              "capture": "dispatch-all-then-read"}
    errors, skipped = [], []
    etts = []
    value = 0.0

    def flush_partial(stage):
        """Crash-proof incremental capture (atomic rename). This file is
        ALSO the home of all bulky detail (per-seed quality curves): the
        printed line must stay under the driver's 2000-char tail window
        (r4's line embedded the curves and broke the driver parse)."""
        try:
            doc = {"stage": stage, "value": value, "extras": extras,
                   "quality_detail": etts,
                   "errors": errors, "skipped_for_budget": skipped,
                   "wall_s": round(time.time() - t_start, 1)}
            tmp = PARTIAL_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(doc, f)
            os.replace(tmp, PARTIAL_PATH)
        except Exception:
            pass

    # first transfer of the process: absorb the cross-process wait in a
    # daemon thread while stage 1 builds, compiles and dispatches
    canary, t_can = _start_canary()
    quality, tr = [], None
    try:
        # ---- stage 1: build + dispatch EVERYTHING (no transfers) ----
        fence = []            # futures to drain before timing
        atari = None
        try:
            tr, jm, K, fused_state = dispatch_fused(left())
            fence.append(fused_state[0])
        except _Terminated:
            raise
        except Exception as e:
            errors.append(f"fused: {e!r}"[:300])
            tr = None
        flush_partial("dispatch_fused")
        for seed in (0, 1, 2):
            try:
                q = QualityDispatch(seed)
                quality.append(q)
                fence.append(q.last_future)
            except _Terminated:
                raise
            except Exception as e:
                errors.append(f"quality{seed}: {e!r}"[:300])
            flush_partial(f"dispatch_quality{seed}")
        try:
            atari = build_atari()
            fence.append(atari[4][0])
        except _Terminated:
            raise
        except Exception as e:
            errors.append(f"atari: {e!r}"[:300])
        flush_partial("dispatch_atari")

        # ---- stage 2: fence the queue, then short timed regions ----
        for x in fence:
            _force(x)         # first force absorbs canary + all compute
        extras["transfer_canary_s"] = round(
            time.perf_counter() - t_can, 1) if canary.is_set() else None
        extras["dispatch_drain_s"] = round(time.time() - t_start, 1)
        if tr is not None:
            try:
                head = time_fused(tr, jm, K, fused_state)
                extras.update(head)
                value = head.get("combined_env_steps_per_s", 0.0)
            except _Terminated:
                raise
            except Exception as e:
                errors.append(f"fused_timed: {e!r}"[:300])
        flush_partial("fused")
        if tr is not None and left() > 25:
            try:
                extras.update(phase_steady(tr))
            except _Terminated:
                raise
            except Exception as e:
                errors.append(f"steady: {e!r}"[:300])
        elif tr is not None:
            skipped.append("steady")
        flush_partial("steady")
        if atari is not None and left() > 15:
            try:
                extras.update(time_atari(*atari))
            except _Terminated:
                raise
            except Exception as e:
                errors.append(f"atari_timed: {e!r}"[:300])
        elif atari is not None:
            skipped.append("atari")
        flush_partial("atari")

        # ---- stage 3: cheap readbacks of the precomputed quality ----
        for q in quality:
            try:
                etts.append(q.finish())
            except _Terminated:
                raise
            except Exception as e:
                errors.append(f"quality{q.seed}_read: {e!r}"[:300])
            flush_partial(f"quality{q.seed}")
    except _Terminated:
        errors.append("terminated before completion (partial capture)")
        # salvage whatever quality results already executed
        for q in quality[len(etts):]:
            try:
                etts.append(q.finish())
            except Exception:
                break

    if etts:
        vals = [q.get("episodes_to_threshold") for q in etts]
        ok = sorted(v for v in vals if v is not None)
        extras["episodes_to_threshold"] = vals
        extras["episodes_to_threshold_median"] = (
            ok[len(ok) // 2] if ok else None)
        # compact per-seed proof scalars only; full curves live in
        # BENCH_partial.json (quality_detail) — NOT in the printed line
        extras["eval_mean_deterministic"] = [
            q.get("eval_mean_deterministic") for q in etts]
        extras["final_trail_mean"] = [
            q.get("final_trail_mean") for q in etts]

    extras["wall_s"] = round(time.time() - t_start, 1)
    if errors:
        extras["errors"] = errors
    if skipped:   # no silent caps: say what the budget dropped
        extras["skipped_for_budget"] = skipped
    doc = {
        "metric": "combined_env_steps_per_s",
        "value": value,
        "unit": "env-steps/s/chip",
        "vs_baseline": round(value / R01_HEADLINE, 2),
        "extras": extras,
    }
    flush_partial("done")
    # HARD GUARD (VERDICT r4 #1): the driver reads only the last ~2000
    # chars of stdout; a longer line truncates the {"metric": ... header
    # away and the official artifact records parsed:null (happened in
    # r4). Shed optional extras until the line fits with margin; the
    # full detail always survives in BENCH_partial.json.
    LINE_BUDGET = 1800
    shed_order = ["quality_detail", "curve_every_cycle", "capture",
                  "timing", "final_trail_mean", "device", "errors",
                  "dispatch_drain_s", "transfer_canary_s"]
    line = json.dumps(doc)
    for key in shed_order:
        if len(line) <= LINE_BUDGET:
            break
        if key in extras:
            del extras[key]
            line = json.dumps(doc)
    if len(line) > LINE_BUDGET:   # last resort: keep the core scalars
        doc["extras"] = {k: extras[k] for k in
                         ("fused_cycle_ms", "episodes_to_threshold",
                          "eval_mean_deterministic", "atari_mfu_vs_bf16_peak",
                          "wall_s") if k in extras}
        line = json.dumps(doc)
    print(line)


if __name__ == "__main__":
    main()
