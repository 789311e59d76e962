"""End-to-end learning test: V-RACER on JAX cart-pole.

Replaces the reference's apps-as-integration-tests (cart_pole_* demo apps,
README.rst:226-260): a deterministic short training run must show clear
learning progress (the full solve takes minutes; CI asserts the trend).
"""
import jax
import numpy as np
import pytest

from smarties_tpu.envs import cartpole
from smarties_tpu.runtime.trainer import Trainer
from smarties_tpu.utils.config import HyperParameters


class TestCartPoleLearning:
    @pytest.mark.slow
    def test_vracer_improves(self):
        cfg = HyperParameters(minTotObsNum=2048, maxTotObsNum=16384,
                              batchSize=128, learnrate=1e-4, obsPerStep=1.0,
                              randSeed=1)
        tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=32, n_slots=512,
                     max_len=cartpole.MAX_STEPS)
        tr.warmup(chunk=32)
        base = np.mean(tr.evaluate(16))
        tr.train(6000, log_every=10**9)
        trained = np.mean(tr.evaluate(16))
        # random policy survives ~25-40 steps; after 6k grad steps the
        # deterministic policy must be clearly better
        assert trained > base + 30, (base, trained)
        assert trained > 80, trained

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = HyperParameters(minTotObsNum=256, maxTotObsNum=1024,
                              batchSize=32, obsPerStep=1.0,
                              nnLayerSizes=[32, 32])
        tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=8, n_slots=64,
                     max_len=64)
        tr.warmup(chunk=16)
        tr.train(20, log_every=10**9)
        path = str(tmp_path / "ckpt.pkl")
        tr.save(path)

        tr2 = Trainer(cartpole, cartpole.MDP, cfg, n_envs=8, n_slots=64,
                      max_len=64)
        tr2.restore(path)
        assert tr2.n_grad_steps == tr.n_grad_steps
        assert tr2.n_env_steps == tr.n_env_steps
        np.testing.assert_array_equal(
            np.asarray(tr2.params["out"]["W"]),
            np.asarray(tr.params["out"]["W"]))
        np.testing.assert_array_equal(
            np.asarray(tr2.replay.length), np.asarray(tr.replay.length))
        # resumed training continues (counters preserved => pacing resumes)
        tr2.train(10, log_every=10**9)
        assert tr2.n_grad_steps == tr.n_grad_steps + 10

    def test_checkpoint_roundtrip_recurrent(self, tmp_path):
        """Recurrent trainer: the per-env acting carry (AgentContext
        analog) must survive save/restore bitwise."""
        cfg = HyperParameters(minTotObsNum=256, maxTotObsNum=1024,
                              batchSize=32, obsPerStep=1.0,
                              nnLayerSizes=[16], nnType="GRU", nnBPTTseq=4)
        tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=8, n_slots=64,
                     max_len=64)
        tr.warmup(chunk=16)
        tr.train(20, log_every=10**9)
        path = str(tmp_path / "ckpt.pkl")
        tr.save(path)
        tr2 = Trainer(cartpole, cartpole.MDP, cfg, n_envs=8, n_slots=64,
                      max_len=64)
        tr2.restore(path)
        for a, b in zip(jax.tree_util.tree_leaves(tr.carry.rnn),
                        jax.tree_util.tree_leaves(tr2.carry.rnn)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert any(np.asarray(x).any()
                   for x in jax.tree_util.tree_leaves(tr2.carry.rnn))
        tr2.train(10, log_every=10**9)
        assert tr2.n_grad_steps == tr.n_grad_steps + 10

    def test_obs_log_stream(self, tmp_path):
        """Trainer obs_log writes the Engine-compatible raw stream:
        f32 rows [lane, status, state..., reward] with INIT at episode
        starts and TERM/LAST rows at episode ends."""
        cfg = HyperParameters(minTotObsNum=256, maxTotObsNum=1024,
                              batchSize=32, obsPerStep=1.0,
                              nnLayerSizes=[16])
        run_dir = str(tmp_path / "run")
        tr = Trainer(cartpole, cartpole.MDP, cfg, n_envs=8, n_slots=64,
                     max_len=64, run_dir=run_dir, obs_log=True)
        tr.warmup(chunk=16)
        tr.train(30, log_every=10**9)
        tr._flush_logs()
        tr._obs_file.flush()
        dim_s = cartpole.MDP.dim_state_observed
        rows = np.fromfile(
            f"{run_dir}/agent_00_rank00_obs.raw", np.float32)
        assert rows.size % (dim_s + 3) == 0 and rows.size > 0
        rows = rows.reshape(-1, dim_s + 3)
        status = rows[:, 1].astype(int)
        assert (status == 0).sum() >= 8          # INITs (>= one per lane)
        assert ((status == 2) | (status == 3)).sum() > 0  # episode ends
        n_done = int(((status == 2) | (status == 3)).sum())
        # row count audit: one row per served step + one per episode end
        assert len(rows) == (status < 2).sum() + n_done
        assert np.isfinite(rows).all()
        # grads dump exists and parses
        tr.log_status()
        g = np.fromfile(f"{run_dir}/grads_rank00.raw", np.float32)
        assert g.size % 3 == 0 and g.size > 0 and np.isfinite(g).all()


class TestEnvDynamics:
    def test_matches_reference_recursion(self):
        """RK4 vs scipy dopri5 on the same ODE (exec.py:40-55)."""
        import jax.numpy as jnp
        try:
            from scipy.integrate import ode
        except ImportError:
            pytest.skip("scipy unavailable")

        def system(t, y, act):
            mp, mc, ell, g = 0.1, 1, 0.5, 9.81
            x, v, a, w = y
            cosy, siny = np.cos(a), np.sin(a)
            tot = mp + mc
            fac2 = ell * (4. / 3. - mp * cosy * cosy / tot)
            f1 = act + mp * ell * w * w * siny
            wdot = (g * siny - f1 * cosy / tot) / fac2
            vdot = (f1 - mp * ell * wdot * cosy) / tot
            return [v, vdot, w, wdot]

        rng = np.random.RandomState(0)
        u0 = rng.uniform(-0.05, 0.05, 4)
        force = 3.7
        r = ode(system).set_integrator("dopri5")
        r.set_initial_value(u0, 0).set_f_params(force)
        want = r.integrate(cartpole.DT)

        st = cartpole.CartPoleState(
            u=jnp.asarray(u0[None, :], jnp.float32),
            step=jnp.zeros((1,), jnp.int32))
        st2, _, _, _ = cartpole.step(st, jnp.asarray([[force]]))
        np.testing.assert_allclose(np.asarray(st2.u[0]), want, atol=1e-5)

    def test_termination(self):
        import jax
        import jax.numpy as jnp
        st = cartpole.init(jax.random.PRNGKey(0), 4)
        # push one lane over the position limit
        u = st.u.at[0, 0].set(2.5)
        st = st._replace(u=u)
        st2, r, done, term = cartpole.step(st, jnp.zeros((4, 1)))
        assert bool(done[0]) and bool(term[0])
        assert float(r[0]) == 0.0
        # time-limit truncation is done-but-not-terminal
        st = st._replace(step=jnp.full((4,), 499, jnp.int32),
                         u=jnp.zeros((4, 4)))
        st2, r, done, term = cartpole.step(st, jnp.zeros((4, 1)))
        assert bool(done[0]) and not bool(term[0])
        assert float(r[0]) == 1.0
