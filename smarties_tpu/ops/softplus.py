"""The reference's positive-definite mapping ("cheap SoftPlus").

Reference: source/smarties/Network/Layers/Functions.h:541-584 (struct
SoftPlus): f(x) = (x + sqrt(1+x^2))/2, f'(x) = (1 + x/sqrt(1+x^2))/2,
f^{-1}(y) = (y^2 - 1/4)/y. Used to map raw network outputs to strictly
positive stdevs (Continuous_policy.h:70) and to unnormalized categorical
weights (Discrete_policy.h via Discrete_policy_t<SoftPlus>).
"""
import jax.numpy as jnp


def softplus(x):
    return (x + jnp.sqrt(1 + x * x)) / 2


def softplus_diff(x):
    return (1 + x / jnp.sqrt(1 + x * x)) / 2


def softplus_inv(y):
    """Inverse; requires y > 0."""
    return (y * y - 0.25) / y


def exp_fn(x):
    """Alternative pos-def mapping (Functions.h Exp), for Boltzmann DQN."""
    return jnp.exp(x)


def exp_diff(x):
    return jnp.exp(x)
