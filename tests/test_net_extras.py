"""NN library parity extras: HardSigmoid/SoftRBF/ExpPlus activations,
bias init via activation inverse, residual connections
(Network/Layers/Functions.h:255-525, Layer_Base.h:122-125,
Layers.h:421-470).
"""
import jax
import jax.numpy as jnp
import numpy as np

from smarties_tpu.models.net import (NetSpec, _ACTS, _INVERSE, apply_net,
                                     init_params, join)


class TestActivations:
    def test_new_activations_match_reference_formulas(self):
        x = np.linspace(-3, 3, 41)
        np.testing.assert_allclose(
            _ACTS["HardSigmoid"](jnp.asarray(x)),
            0.5 * (1 + x / np.sqrt(1 + x * x)), rtol=1e-6)
        np.testing.assert_allclose(
            _ACTS["SoftRBF"](jnp.asarray(x)), 1 / (1 + x * x), rtol=1e-6)
        np.testing.assert_allclose(
            _ACTS["ExpPlus"](jnp.asarray(x)), np.log1p(np.exp(x)),
            rtol=1e-5)

    def test_inverses_roundtrip(self):
        for name in ("Linear", "Tanh", "Sigm", "SoftSign", "HardSign",
                     "HardSigmoid", "SoftPlus", "ExpPlus", "Exp"):
            y = np.asarray([0.12, 0.4, 0.73])  # in every act's range
            x = _INVERSE[name](y)
            np.testing.assert_allclose(
                np.asarray(_ACTS[name](jnp.asarray(x, jnp.float32))), y,
                rtol=1e-4, atol=1e-5,
                err_msg=f"inverse roundtrip failed for {name}")

    def test_nets_run_with_new_activations(self):
        for fn in ("HardSigmoid", "SoftRBF", "ExpPlus"):
            spec = NetSpec(n_in=4, hidden=(8, 8), n_out=3, act=fn)
            p = init_params(jax.random.PRNGKey(0), spec)
            y, _ = apply_net(p, spec, jnp.ones((5, 4)))
            assert y.shape == (5, 3) and np.isfinite(np.asarray(y)).all()


class TestBiasInverseInit:
    def test_initial_output_matches_requested(self):
        """Layer_Base.h:122-125: biases = act.inverse(initVals), so at init
        (with the 0.1-prefac'd weights driven by a zero input) the output
        equals the requested values through the activation."""
        want = (0.3, 0.7)
        spec = NetSpec(n_in=4, hidden=(8,), n_out=2, out_act="Sigm",
                       out_bias_init=want)
        p = init_params(jax.random.PRNGKey(0), spec)
        # zero hidden output isolates the bias path
        y = np.asarray(_ACTS["Sigm"](jnp.zeros((2,)) @ jnp.zeros((2, 2))
                                     + p["out"]["b"]))
        np.testing.assert_allclose(y, want, rtol=1e-5)


class TestResidual:
    def test_residual_adds_skip(self):
        spec_r = NetSpec(n_in=4, hidden=(8, 8, 8), n_out=2, residual=True)
        spec_p = NetSpec(n_in=4, hidden=(8, 8, 8), n_out=2, residual=False)
        p = init_params(jax.random.PRNGKey(1), spec_r)
        x = jnp.ones((3, 4))
        y_r, _ = apply_net(p, spec_r, x)
        y_p, _ = apply_net(p, spec_p, x)  # same params, no skip
        assert not np.allclose(np.asarray(y_r), np.asarray(y_p))
        # gradient flows through the skip path
        g = jax.grad(lambda pp: jnp.sum(apply_net(pp, spec_r, x)[0]))(p)
        assert np.isfinite(np.asarray(g["layers"][0]["W"])).all()

    def test_join_concats(self):
        a, b = jnp.ones((3, 2)), jnp.zeros((3, 4))
        assert join(a, b).shape == (3, 6)
