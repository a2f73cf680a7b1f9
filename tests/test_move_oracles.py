"""Per-move oracle pinning for the ensemble move zoo.

The reference delegates its moves dict to emcee
(``/root/reference/nnest/ensemble.py:120-134``: StretchMove / DEMove /
DESnookerMove / KDEMove). Here each native move is pinned against a numpy
oracle implementing the same red-black half-ensemble update with the
published proposal algorithms (Goodman & Weare 2010 stretch; ter Braak &
Vrugt 2008 DE + snooker, the algorithms emcee implements; KDE
independence move with the diagonal-bandwidth Scott's-rule spec the
kernel documents as its divergence from scipy's full-covariance KDE).
Oracle and kernel run on the SAME latent target (flow log-det + prior +
likelihood through the same jitted ``latent_log_prob``); per-move
acceptance rates and latent posterior moments must agree quantitatively —
a wrong snooker Jacobian exponent or KDE MH correction shifts both.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu.flows import build_flow
from nnest_tpu.samplers.kernels import LatentKernels

DIM = 4
WALKERS = 64
STEPS = 500
BURN = 150


@pytest.fixture(scope='module')
def setup():
    model = build_flow(DIM, flow='choleksy')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(64, DIM)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def like_fn(u):
        return -0.5 * jnp.sum(u ** 2, -1), jnp.zeros((u.shape[0], 0),
                                                     jnp.float32)

    def prior_fn(u):
        return jnp.zeros(u.shape[0])

    kern = LatentKernels(model, like_fn, prior_fn)
    lp_fn = jax.jit(lambda z: kern.latent_log_prob(params, z)[0])
    return model, params, kern, lp_fn


# ------------------------------------------------------------- oracle ---

def _oracle_propose(name, rng, s, c):
    """Published proposal algorithms; returns (proposal, log MH factor)."""
    n, dim = s.shape
    m = c.shape[0]
    if name == 'stretch':
        a = 2.0
        u = rng.uniform(size=n)
        zeta = ((a - 1.0) * u + 1.0) ** 2 / a
        partner = c[rng.randint(0, m, size=n)]
        prop = partner + zeta[:, None] * (s - partner)
        return prop, (dim - 1.0) * np.log(zeta)
    if name == 'de':
        g0 = 2.38 / np.sqrt(2.0 * dim)
        za = c[rng.randint(0, m, size=n)]
        zb = c[rng.randint(0, m, size=n)]
        prop = s + g0 * (za - zb) + 1e-5 * rng.normal(size=s.shape)
        return prop, np.zeros(n)
    if name == 'snooker':
        # ter Braak & Vrugt (2008): q = x + gamma_s * ((z1-z2)·u) u with
        # u along (x - z); MH factor (||q - z|| / ||x - z||)^{dim-1}
        z = c[rng.randint(0, m, size=n)]
        z1 = c[rng.randint(0, m, size=n)]
        z2 = c[rng.randint(0, m, size=n)]
        d_vec = s - z
        norm = np.maximum(np.linalg.norm(d_vec, axis=1, keepdims=True),
                          1e-12)
        u = d_vec / norm
        proj = np.sum((z1 - z2) * u, axis=1, keepdims=True)
        prop = s + 1.7 * proj * u
        norm_new = np.maximum(np.linalg.norm(prop - z, axis=1), 1e-12)
        return prop, (dim - 1.0) * (np.log(norm_new) - np.log(norm[:, 0]))
    if name == 'kde':
        # diagonal-bandwidth Scott's-rule KDE independence move (the
        # kernel's documented divergence from scipy's full-cov KDE)
        h = (np.std(c, axis=0) + 1e-6) * m ** (-1.0 / (dim + 4))
        center = c[rng.randint(0, m, size=n)]
        prop = center + h * rng.normal(size=s.shape)

        def logq(pts):
            d2 = np.sum(((pts[:, None, :] - c[None, :, :]) / h) ** 2,
                        axis=2)
            mx = -0.5 * np.min(d2, axis=1)
            lse = mx + np.log(np.sum(np.exp(-0.5 * d2 - mx[:, None]),
                                     axis=1))
            return (lse - np.log(m) - np.sum(np.log(h))
                    - 0.5 * dim * np.log(2.0 * np.pi))

        return prop, logq(s) - logq(prop)
    raise ValueError(name)


def _oracle_run(name, lp_fn, z0, steps, seed):
    """Red-black half-ensemble MCMC with numpy proposals and the shared
    jitted latent target; mirrors the kernel's update order."""
    rng = np.random.RandomState(seed)
    z = np.array(z0, dtype=np.float64)
    half = z.shape[0] // 2
    lp = np.asarray(lp_fn(jnp.asarray(z, jnp.float32)), np.float64)
    chains = [z.copy()]
    n_acc = 0
    for _ in range(steps):
        for lo, hi, other in ((0, half, slice(half, None)),
                              (half, None, slice(0, half))):
            sl = slice(lo, hi)
            prop, extra = _oracle_propose(name, rng, z[sl], z[other])
            lp_prop = np.asarray(lp_fn(jnp.asarray(prop, jnp.float32)),
                                 np.float64)
            log_ratio = extra + lp_prop - lp[sl]
            acc = rng.uniform(size=prop.shape[0]) < np.exp(
                np.minimum(log_ratio, 0.0))
            z[sl][acc] = prop[acc]
            lp[sl][acc] = lp_prop[acc]
            n_acc += int(acc.sum())
        chains.append(z.copy())
    chains = np.stack(chains, axis=1)  # (walkers, steps+1, dim)
    return chains, n_acc / (steps * z.shape[0])


@pytest.mark.parametrize('move', ['stretch', 'de', 'snooker', 'kde'])
def test_move_matches_numpy_oracle(setup, move):
    model, params, kern, lp_fn = setup
    z0 = jax.random.normal(jax.random.PRNGKey(5), (WALKERS, DIM))

    out = kern.stretch(params, jax.random.PRNGKey(6), z0,
                       mcmc_steps=STEPS, moves=((move, 1.0),))
    kern_acc = int(out['accepted']) / (STEPS * WALKERS)
    kern_z = np.asarray(out['latent'])[:, BURN:, :].reshape(-1, DIM)

    orc_chains, orc_acc = _oracle_run(move, lp_fn, np.asarray(z0), STEPS,
                                      seed=7)
    orc_z = orc_chains[:, BURN:, :].reshape(-1, DIM)

    # per-move acceptance rates must agree (same target, same proposal law)
    assert abs(kern_acc - orc_acc) < 0.06, (move, kern_acc, orc_acc)
    # latent posterior moments must agree between kernel and oracle
    assert np.allclose(kern_z.mean(0), orc_z.mean(0), atol=0.15), move
    assert np.allclose(kern_z.std(0), orc_z.std(0), atol=0.15), move
