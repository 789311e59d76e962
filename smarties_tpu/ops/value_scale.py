"""R2D2-style value <-> network-output rescaling.

Reference: source/smarties/Learners/RACER_common.cpp:14-32 (scaleV2Net,
scaleNet2V, scaleVdiff), after https://openreview.net/pdf?id=r1lyTjAqYX.
The network learns a compressed value v = h(V); the learner converts back
with h^{-1} and chains gradients with (h^{-1})'.
All functions are elementwise jnp, safe under jit/vmap/grad.
"""
import jax.numpy as jnp


def scale_v2net(x):
    """V -> net target: sign(x)*(sqrt(1+|x|)-1) + 1e-2*x."""
    pos = 1e-2 * x + jnp.sqrt(1 + x) - 1
    neg = 1e-2 * x - jnp.sqrt(1 - x) + 1
    return jnp.where(x > 0, pos, jnp.where(x < 0, neg, 0.0))


def scale_net2v(x):
    """net output -> V (inverse of scale_v2net)."""
    pos = 100 * (x + 51) - 100 * jnp.sqrt(2601 + 100 * x)
    neg = 100 * (x - 51) + 100 * jnp.sqrt(2601 - 100 * x)
    return jnp.where(x > 0, pos, jnp.where(x < 0, neg, 0.0))


def scale_vdiff(x):
    """d scale_net2v / d x — chain-rule factor for value gradients."""
    pos = 100 - 5000 / jnp.sqrt(2601 + 100 * x)
    neg = 100 - 5000 / jnp.sqrt(2601 - 100 * x)
    return jnp.where(x > 0, pos, neg)
