"""MDP spec codecs: discrete label round-trip, action squashing inverses.

Reference analog: units/Core/StateAction.cpp (discrete action
label<->component codec and MDP serialization round-trip).
"""
import jax.numpy as jnp
import numpy as np

from smarties_tpu.core.mdp import MDPSpec


class TestDiscreteCodec:
    def test_label_roundtrip(self):
        mdp = MDPSpec(dim_state=4, dim_action=3,
                      discrete_values=(3, 2, 4))
        assert mdp.max_action_label == 24
        assert mdp.discrete_shifts == (1, 3, 6)
        labels = jnp.arange(24)
        comps = mdp.label_to_components(labels)
        back = mdp.components_to_label(comps)
        np.testing.assert_array_equal(np.asarray(back), np.arange(24))
        # components stay within their value ranges
        comps = np.asarray(comps)
        assert (comps[:, 0] < 3).all()
        assert (comps[:, 1] < 2).all()
        assert (comps[:, 2] < 4).all()


class TestActionMapping:
    def test_bounded_roundtrip(self):
        mdp = MDPSpec(dim_state=2, dim_action=2, bounded=(True, False),
                      upper_action=(10.0, 3.0), lower_action=(-10.0, 1.0))
        a = jnp.asarray([[0.7, -0.3], [2.0, 1.5]])
        env = mdp.learner_to_env_action(a)
        back = mdp.env_to_learner_action(env)
        np.testing.assert_allclose(np.asarray(back), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
        # bounded dim stays in range
        env = np.asarray(env)
        assert (np.abs(env[:, 0]) <= 10.0).all()

    def test_scale_shift(self):
        mdp = MDPSpec(dim_state=1, dim_action=1, bounded=(True,),
                      upper_action=(4.0,), lower_action=(2.0,))
        np.testing.assert_allclose(mdp.action_scale, [1.0])
        np.testing.assert_allclose(mdp.action_shift, [3.0])

    def test_observed_filter(self):
        mdp = MDPSpec(dim_state=4, dim_action=1,
                      observable=(True, False, True, False))
        s = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        np.testing.assert_array_equal(np.asarray(mdp.observed(s)),
                                      [[1.0, 3.0]])
        assert mdp.dim_state_observed == 2
