"""2D segment-matmul Pallas spline inverse must match FlowModel.inverse
(interpret mode on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu.flows import build_flow
from nnest_tpu.ops.pallas_spline import (
    make_pallas_inverse, pack_pallas_consts, inverse_body_2d)


@pytest.mark.parametrize('dims', [4, 16, 5])
def test_body_2d_matches_model(dims):
    model = build_flow(dims, flow='spline')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(32, dims)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    z = jnp.asarray(np.random.RandomState(1).normal(size=(32, dims)) * 2,
                    jnp.float32)
    consts, meta = pack_pallas_consts(model, params)
    x2, ld2 = inverse_body_2d(z, consts, meta)
    x_ref, ld_ref = model.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_ref),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ld2[:, 0]), np.asarray(ld_ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize('dims', [4, 16])
def test_pallas_interpret_matches_model(dims):
    model = build_flow(dims, flow='spline')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(64, dims)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    z = jnp.asarray(np.random.RandomState(1).normal(size=(70, dims)) * 2,
                    jnp.float32)  # pad path
    inv = make_pallas_inverse(model, tile=32, interpret=True)
    x2, ld2 = inv(params, z)
    x_ref, ld_ref = model.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_ref),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(ld_ref),
                               rtol=3e-4, atol=3e-4)
