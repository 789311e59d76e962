"""Gradient-parity tests for policy math.

The reference verifies its hand-written policy/KL gradients with central
finite differences (units/Math/Continuous_policy.cpp:19-60,
Math/Math_tests.cpp:21). Here the analytic output-space gradients are checked
against (a) finite differences of the corresponding scalar functions and
(b) jax.grad of the same functions where the formulas are unclamped.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smarties_tpu.ops import continuous_policy as cp
from smarties_tpu.ops import discrete_policy as dp
from smarties_tpu.ops.softplus import softplus, softplus_diff, softplus_inv
from smarties_tpu.ops.value_scale import scale_net2v, scale_v2net, scale_vdiff


def fd_grad(f, x, eps=1e-4):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp, xm = x.copy(), x.copy()
        xp.flat[i] += eps
        xm.flat[i] -= eps
        g.flat[i] = (f(xp) - f(xm)) / (2 * eps)
    return g


class TestSoftPlus:
    def test_inverse(self):
        x = np.linspace(-3, 5, 17)
        y = softplus(jnp.asarray(x))
        np.testing.assert_allclose(softplus_inv(y), x, rtol=1e-5, atol=1e-5)

    def test_diff(self):
        x = np.linspace(-3, 3, 13)
        g = fd_grad(lambda v: float(np.sum((v + np.sqrt(1 + v * v)) / 2)), x)
        np.testing.assert_allclose(softplus_diff(jnp.asarray(x)), g,
                                   rtol=1e-4, atol=1e-5)


class TestValueScale:
    def test_roundtrip(self):
        v = np.linspace(-50, 50, 31)
        np.testing.assert_allclose(scale_net2v(scale_v2net(jnp.asarray(v))),
                                   v, rtol=2e-3, atol=2e-3)

    def test_vdiff_is_derivative(self):
        x = np.linspace(-2, 2, 21)
        g = fd_grad(lambda v: float(np.sum(np.where(
            v > 0, 100 * (v + 51) - 100 * np.sqrt(2601 + 100 * v),
            100 * (v - 51) + 100 * np.sqrt(2601 - 100 * v)))), x)
        np.testing.assert_allclose(scale_vdiff(jnp.asarray(x)), g,
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("bounded", [(False, False), (True, True),
                                     (True, False)])
class TestGaussianPolicy:
    nA = 2

    def setup_arrays(self, bounded, seed=0):
        rng = np.random.RandomState(seed)
        mean = rng.randn(self.nA).astype(np.float32)
        sigma_raw = rng.randn(self.nA).astype(np.float32)
        act = rng.randn(self.nA).astype(np.float32)
        mu_mean = rng.randn(self.nA).astype(np.float32)
        mu_sig = softplus(jnp.asarray(rng.randn(self.nA).astype(np.float32)))
        mu = jnp.concatenate([jnp.asarray(mu_mean), mu_sig])
        b = np.asarray(bounded)
        return jnp.asarray(mean), jnp.asarray(sigma_raw), jnp.asarray(act), mu, b

    def test_polgrad_matches_autodiff(self, bounded):
        mean, sigma_raw, act, mu, b = self.setup_arrays(bounded)

        def lp(m, sraw):
            return cp.logprob(act, m, cp.sigma_of(sraw), b)

        gm_ad, gs_ad = jax.grad(lp, argnums=(0, 1))(mean, sigma_raw)
        gm, gs = cp.pol_grad(act, mean, cp.sigma_of(sigma_raw), sigma_raw,
                             jnp.float32(1.0), b)
        np.testing.assert_allclose(gm, gm_ad, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gs, gs_ad, rtol=1e-4, atol=1e-5)

    def test_klgrad_matches_autodiff(self, bounded):
        mean, sigma_raw, act, mu, b = self.setup_arrays(bounded)

        def kl(m, sraw):
            return cp.kl_div(mu, m, cp.sigma_of(sraw))

        gm_ad, gs_ad = jax.grad(kl, argnums=(0, 1))(mean, sigma_raw)
        gm, gs = cp.kl_grad(mu, mean, cp.sigma_of(sigma_raw), sigma_raw,
                            jnp.float32(1.0))
        np.testing.assert_allclose(gm, gm_ad, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gs, gs_ad, rtol=1e-4, atol=1e-5)

    def test_imp_weight_of_self_is_one(self, bounded):
        mean, sigma_raw, act, _, b = self.setup_arrays(bounded)
        sigma = cp.sigma_of(sigma_raw)
        mu_self = cp.mu_vector(mean, sigma, b)
        rho = cp.imp_weight(act, mean, sigma, mu_self, b)
        np.testing.assert_allclose(rho, 1.0, rtol=1e-5)

    def test_kl_of_self_is_zero(self, bounded):
        mean, sigma_raw, _, _, b = self.setup_arrays(bounded)
        # kl uses the unclamped mean; with unsaturated means this is exact
        sigma = cp.sigma_of(sigma_raw)
        mu_self = cp.mu_vector(mean, sigma, b)
        kl = cp.kl_div(mu_self, mean, sigma)
        np.testing.assert_allclose(kl, 0.0, atol=1e-6)

    def test_sample_respects_clip(self, bounded):
        mean, sigma_raw, _, _, b = self.setup_arrays(bounded)
        key = jax.random.PRNGKey(0)
        acts = jax.vmap(lambda k: cp.sample(k, mean, cp.sigma_of(sigma_raw),
                                            b))(jax.random.split(key, 512))
        assert bool(jnp.all(jnp.isfinite(acts)))
        if b.any():
            assert bool(jnp.all(jnp.abs(acts[:, b]) <= cp.MEAN_MAX + 1e-6))
        # noise must be clipped to +-NORMDIST_MAX
        z = (acts - cp.eff_mean(mean, b)) / cp.sigma_of(sigma_raw)
        assert bool(jnp.all(jnp.abs(z[:, ~b]) <= cp.NORMDIST_MAX + 1e-5))


class TestSquashedAntiNan:
    def test_saturated_mean_grad_gated(self):
        b = np.array([True])
        mean = jnp.asarray([cp.MEAN_MAX + 1.0])
        sigma_raw = jnp.asarray([0.5])
        sigma = cp.sigma_of(sigma_raw)
        # an action above the saturated mean would push it further up -> gate
        act = jnp.asarray([cp.MEAN_MAX + 2.0])
        gm, _ = cp.pol_grad(act, mean, sigma, sigma_raw, jnp.float32(1.0), b)
        np.testing.assert_allclose(gm, 0.0)
        # pushing back down is allowed
        act = jnp.asarray([0.0])
        gm, _ = cp.pol_grad(act, mean, sigma, sigma_raw, jnp.float32(1.0), b)
        assert float(gm[0]) < 0


class TestDiscretePolicy:
    nO = 5

    def setup_arrays(self, seed=0):
        rng = np.random.RandomState(seed)
        out = jnp.asarray(rng.randn(self.nO).astype(np.float32))
        mu_out = jnp.asarray(rng.randn(self.nO).astype(np.float32))
        _, _, mu = dp.probs_of(mu_out)
        return out, mu

    def test_probs_normalized(self):
        out, _ = self.setup_arrays()
        _, _, p = dp.probs_of(out)
        np.testing.assert_allclose(jnp.sum(p), 1.0, rtol=1e-6)
        assert bool(jnp.all(p > 0))

    def test_polgrad_matches_autodiff(self):
        out, _ = self.setup_arrays()
        opt = jnp.asarray(2, jnp.int32)

        def lp(o):
            _, _, p = dp.probs_of(o)
            return dp.logprob(opt, p)

        g_ad = jax.grad(lp)(out)
        un, norm, p = dp.probs_of(out)
        g = dp.pol_grad(opt, out, un, norm, p, jnp.float32(1.0))
        np.testing.assert_allclose(g, g_ad, rtol=1e-4, atol=1e-6)

    def test_klgrad_matches_autodiff(self):
        out, mu = self.setup_arrays()

        def kl(o):
            _, _, p = dp.probs_of(o)
            return dp.kl_mu_pi(mu, p)

        g_ad = jax.grad(kl)(out)
        un, norm, p = dp.probs_of(out)
        g = dp.kl_grad(mu, out, un, norm, p, jnp.float32(1.0))
        np.testing.assert_allclose(g, g_ad, rtol=1e-4, atol=1e-6)

    def test_imp_weight_self(self):
        out, _ = self.setup_arrays()
        un, norm, p = dp.probs_of(out)
        rho = dp.imp_weight(jnp.asarray(1, jnp.int32), p, p)
        np.testing.assert_allclose(rho, 1.0, rtol=1e-6)
