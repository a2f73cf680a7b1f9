"""Ensemble move zoo: every native move (stretch/de/snooker/kde) must
sample a known Gaussian correctly, individually and mixed — the native
replacement for the reference's emcee move mapping (ensemble.py:120-134)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu.flows import build_flow
from nnest_tpu.samplers.kernels import LatentKernels


@pytest.fixture(scope='module')
def setup():
    dim = 2
    model = build_flow(dim, flow='choleksy')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(64, dim)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def like_fn(u):
        return -0.5 * jnp.sum(u ** 2, -1), jnp.zeros((u.shape[0], 0),
                                                     jnp.float32)

    def prior_fn(u):
        return jnp.zeros(u.shape[0])

    kern = LatentKernels(model, like_fn, prior_fn)
    return model, params, kern


@pytest.mark.parametrize('moves', [
    (('stretch', 1.0),),
    (('de', 1.0),),
    (('snooker', 1.0),),
    (('kde', 1.0),),
    (('stretch', 0.5), ('de', 0.3), ('snooker', 0.1), ('kde', 0.1)),
])
def test_move_targets_gaussian(setup, moves):
    model, params, kern = setup
    num_walkers, steps = 64, 400
    z0 = jax.random.normal(jax.random.PRNGKey(5), (num_walkers, 2))
    out = kern.stretch(params, jax.random.PRNGKey(6), z0, mcmc_steps=steps,
                       moves=moves)
    xs = np.asarray(out['samples'])[:, 150:, :].reshape(-1, 2)
    assert abs(np.mean(xs)) < 0.2
    assert abs(np.std(xs) - 1.0) < 0.2
    acc = int(out['accepted']) / (steps * num_walkers)
    assert acc > 0.05
