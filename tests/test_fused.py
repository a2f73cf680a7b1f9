"""Packed (hot-path) spline inverse must match the reference XLA
implementation, including odd dims and the packed-consts structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu.flows import build_flow
from nnest_tpu.ops.fused_spline import (
    is_fusable_spline, fused_inverse_fn, _inverse_body,
    pack_inverse_consts)


@pytest.mark.parametrize('dims', [4, 16, 5])
def test_inverse_body_matches_model(dims):
    model = build_flow(dims, flow='spline')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(32, dims)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    z = jnp.asarray(np.random.RandomState(1).normal(size=(32, dims)) * 2,
                    jnp.float32)

    packed = pack_inverse_consts(model, params)
    x_fused, ld_fused = _inverse_body(z, packed, model)
    x_ref, ld_ref = model.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_fused), np.asarray(ld_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_inverse_fn_jits(tmp_path):
    model = build_flow(4, flow='spline')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(16, 4)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    inv = jax.jit(fused_inverse_fn(model))
    z = jnp.asarray(np.random.RandomState(1).normal(size=(16, 4)),
                    jnp.float32)
    x1, ld1 = inv(params, z)
    x2, ld2 = model.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=2e-5,
                               atol=2e-5)


def test_is_fusable():
    assert is_fusable_spline(build_flow(4, flow='spline'))
    assert not is_fusable_spline(build_flow(4, flow='nvp'))
    assert not is_fusable_spline(build_flow(4, flow='choleksy'))
    assert not is_fusable_spline(build_flow(4, flow='spline', num_slow=2))
