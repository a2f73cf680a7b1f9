"""Every flow's analytic logdet must match the brute-force Jacobian
determinant (the live version of the reference's dead autograd checker,
trainer.py:373-382)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu.flows import build_flow
from nnest_tpu.flows.testing import (brute_force_logdet,
                                     brute_force_forward_logdet)


@pytest.mark.parametrize('flow', ['choleksy', 'nvp', 'spline'])
@pytest.mark.parametrize('dims', [2, 3, 5])
def test_logdet_matches_jacobian(flow, dims):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(6, dims)), dtype=jnp.float32)
    model = build_flow(dims, flow=flow)
    params = model.init(jax.random.PRNGKey(0), x)

    z, logdet_fwd = model.forward(params, x)
    bf = brute_force_forward_logdet(model, params, x)
    np.testing.assert_allclose(np.asarray(logdet_fwd), np.asarray(bf),
                               rtol=1e-3, atol=1e-3)

    x2, logdet_inv = model.inverse(params, z)
    bf_inv = brute_force_logdet(model, params, z)
    np.testing.assert_allclose(np.asarray(logdet_inv), np.asarray(bf_inv),
                               rtol=1e-3, atol=1e-3)


def test_fast_slow_logdet_matches_jacobian():
    rng = np.random.RandomState(1)
    dims, num_slow = 5, 2
    x = jnp.asarray(rng.normal(size=(4, dims)), dtype=jnp.float32)
    model = build_flow(dims, flow='spline', num_slow=num_slow)
    params = model.init(jax.random.PRNGKey(0), x)
    z, logdet_fwd = model.forward(params, x)
    bf = brute_force_forward_logdet(model, params, x)
    np.testing.assert_allclose(np.asarray(logdet_fwd), np.asarray(bf),
                               rtol=1e-3, atol=1e-3)
