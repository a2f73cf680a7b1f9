"""Small MLP conditioners used inside coupling layers.

Functional re-implementation of the conditioner nets in the reference
(RealNVP scale/translate nets ``networks.py:271-282``, spline conditioner
``networks.py:393-409``). Params are nested dicts so the whole flow is one
pytree. Weight init follows torch's ``nn.Linear`` default (uniform
±1/sqrt(fan_in) for both weight and bias) so training dynamics match the
reference closely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(key, n_in: int, n_out: int):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.maximum(n_in, 1)).astype(jnp.float32)
    w = jax.random.uniform(kw, (n_in, n_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (n_out,), jnp.float32, -bound, bound)
    return {'w': w, 'b': b}


def mlp_init(key, sizes):
    """sizes: [n_in, h1, ..., n_out] → list of linear layer params."""
    keys = jax.random.split(key, len(sizes) - 1)
    return [linear_init(k, sizes[i], sizes[i + 1]) for i, k in enumerate(keys)]


_ACTS = {
    'relu': jax.nn.relu,
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'leaky_relu': lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
}


def mlp_apply(params, x, act: str):
    """Apply the MLP; activation after every layer except the last."""
    f = _ACTS[act]
    for layer in params[:-1]:
        x = f(x @ layer['w'] + layer['b'])
    last = params[-1]
    return x @ last['w'] + last['b']
