"""Testing oracles for flows.

The reference carries a dead autograd Jacobian checker
(``nnest/trainer.py:373-382``); here it becomes a live test oracle:
``brute_force_logdet`` computes log|det ∂f⁻¹(z)/∂z| with ``jax.jacfwd`` so
unit tests can verify every bijector's analytic logdet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def brute_force_logdet(model, params, z):
    """log|det dx/dz| of the flow inverse at each row of z, via full
    Jacobians (O(d³); testing only)."""

    def inv_one(zi):
        x, _ = model.inverse(params, zi[None, :])
        return x[0]

    jac = jax.vmap(jax.jacfwd(inv_one))(z)
    sign, logdet = jnp.linalg.slogdet(jac)
    return logdet


def brute_force_forward_logdet(model, params, x):
    """log|det dz/dx| of the flow forward at each row of x."""

    def fwd_one(xi):
        z, _ = model.forward(params, xi[None, :])
        return z[0]

    jac = jax.vmap(jax.jacfwd(fwd_one))(x)
    sign, logdet = jnp.linalg.slogdet(jac)
    return logdet
