"""MCMCSampler / EnsembleSampler integration tests: posterior moments on a
known 2-D Gaussian, ensemble bootstrap end-to-end."""

import glob

import numpy as np
import pytest

from nnest_tpu import MCMCSampler, EnsembleSampler
from nnest_tpu.likelihoods import Gaussian
from nnest_tpu.priors import UniformPrior


@pytest.fixture
def gauss_problem():
    like = Gaussian(2, 0.0, lim=5)
    prior = UniformPrior(2, -5, 5)
    prior.seed(0)
    # training samples from the true posterior (unit normal)
    rng = np.random.RandomState(0)
    training = rng.normal(size=(800, 2))
    return like, prior, training


def test_mcmc_sampler_posterior_moments(tmp_path, gauss_problem):
    like, prior, training = gauss_problem
    s = MCMCSampler(2, like, prior=prior, log_dir=str(tmp_path / 'mcmc'),
                    seed=1)
    s.run(400, 16, training, stats_interval=400)
    # discard warmup, pool chains
    samp = s.samples[:, 100:, :2].reshape(-1, 2)
    assert abs(np.mean(samp)) < 0.2
    assert abs(np.std(samp) - 1.0) < 0.2
    assert s.latent_samples.shape[0] == 16
    assert s.total_calls > 0


def test_ensemble_sampler_run(tmp_path, gauss_problem):
    like, prior, training = gauss_problem
    s = EnsembleSampler(2, like, prior=prior,
                        log_dir=str(tmp_path / 'ens'), seed=2)
    s.run(300, 32, training, stats_interval=300)
    samp = s.samples[:, 100:, :2].reshape(-1, 2)
    assert abs(np.mean(samp)) < 0.2
    assert abs(np.std(samp) - 1.0) < 0.2


def test_ensemble_bootstrap(tmp_path, gauss_problem):
    import os
    like, prior, training = gauss_problem
    s = EnsembleSampler(2, like, prior=prior,
                        log_dir=str(tmp_path / 'boot'), seed=3)
    out = s.bootstrap(200, 32, iters=2, thin=5)
    assert out.shape[1] == 2
    assert out.shape[0] > 100
    assert abs(np.mean(out)) < 0.35
    assert abs(np.std(out) - 1.0) < 0.35
    # Each phase is persisted (reference streams to an HDF backend,
    # ensemble.py:140-141; here one checkpoint per completed phase).
    ck = s.logs['checkpoint']
    for ph in (0, 1, 2):
        assert os.path.exists(os.path.join(ck, 'bootstrap_%d.npz' % ph))
    # End-of-training triptych is auto-emitted (reference trainer.py:241-245)
    plots = os.listdir(s.logs['plots'])
    assert any(f.startswith('plot_') for f in plots)


def test_ensemble_bootstrap_resume(tmp_path, gauss_problem):
    """A crashed bootstrap resumes from the last completed phase instead of
    redoing the whole run."""
    like, prior, training = gauss_problem
    s = EnsembleSampler(2, like, prior=prior, append_run_num=False,
                        log_dir=str(tmp_path / 'bootres'), seed=3)
    s.bootstrap(200, 32, iters=1, thin=5)
    calls_after_first = s.total_calls

    s2 = EnsembleSampler(2, like, prior=prior, append_run_num=False,
                         log_dir=str(tmp_path / 'bootres'), seed=3)
    out = s2.bootstrap(200, 32, iters=2, thin=5, resume=True)
    # phase 0 + phase 1 were reloaded, only phase 2 ran: one latent round
    assert s2.total_calls == calls_after_first + 200 * 32
    assert out.shape[1] == 2
    assert abs(np.mean(out)) < 0.35

    # a corrupted NEWEST phase archive (crash mid-write) must fall back
    # to the previous completed phase, not restart the whole bootstrap
    import os
    ck = os.path.join(s2.log_dir, 'checkpoint')
    phases = sorted(int(os.path.basename(p).split('_')[1].split('.npz')[0])
                    for p in glob.glob(os.path.join(ck, 'bootstrap_*.npz')))
    assert len(phases) >= 2
    with open(os.path.join(ck, 'bootstrap_%d.npz' % phases[-1]), 'wb') as f:
        f.write(b'PK corrupt')
    s3 = EnsembleSampler(2, like, prior=prior, append_run_num=False,
                         log_dir=str(tmp_path / 'bootres'), seed=3)
    loaded = s3._bootstrap_load_latest(10)
    assert loaded is not None and loaded[0] == phases[-2]


def test_ensemble_bootstrap_bit_exact_resume(tmp_path, gauss_problem):
    """Kill-and-resume of a bootstrap equals the uninterrupted bootstrap
    BIT-FOR-BIT: phase checkpoints persist the sampler PRNG + the
    cross-phase trainer state (flow params, Adam moments, trainer key),
    so the resumed phase's retrain and latent ensemble round replay
    exactly. The constructor seed of the resuming sampler differs on
    purpose — every PRNG bit must come from the checkpoint. Each sampler
    gets a FRESH identically-seeded prior (the prior's host RNG advances
    on phase-0 init draws, so a shared prior object would make run B's
    phase 0 differ from run A's)."""
    like, _, training = gauss_problem

    def fresh_prior():
        p = UniformPrior(2, -5, 5)
        p.seed(0)
        return p

    sA = EnsembleSampler(2, like, prior=fresh_prior(),
                         append_run_num=False,
                         log_dir=str(tmp_path / 'bootA'), seed=3)
    outA = sA.bootstrap(100, 32, iters=2, thin=5)

    sB = EnsembleSampler(2, like, prior=fresh_prior(),
                         append_run_num=False,
                         log_dir=str(tmp_path / 'bootB'), seed=3)
    sB.bootstrap(100, 32, iters=1, thin=5)
    sC = EnsembleSampler(2, like, prior=fresh_prior(),
                         append_run_num=False,
                         log_dir=str(tmp_path / 'bootB'), seed=99)
    outC = sC.bootstrap(100, 32, iters=2, thin=5, resume=True)

    np.testing.assert_array_equal(outA, outC)
    assert sC.total_calls == sA.total_calls


def test_ensemble_corrupt_bootstrap_checkpoint(tmp_path, gauss_problem):
    """A bootstrap checkpoint that loads partially (npz member reads are
    lazy — a truncated archive can raise on the 2nd/3rd access) must leave
    the sampler state COMPLETELY untouched: a half-restored PRNG key on one
    rank would silently desync multi-process lockstep."""
    import os
    import jax
    like, prior, training = gauss_problem
    s = EnsembleSampler(2, like, prior=prior, append_run_num=False,
                        log_dir=str(tmp_path / 'bootcorrupt'), seed=3)
    ck = os.path.join(s.logs['checkpoint'], 'bootstrap_1.npz')
    # key_data present, training_samples/total_calls missing
    np.savez(ck, key_data=np.asarray(jax.random.key_data(
        jax.random.PRNGKey(999))))
    key_before = np.asarray(jax.random.key_data(s._key)).copy()
    calls_before = s.total_calls
    assert s._bootstrap_load_latest(5) is None
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(s._key)), key_before)
    assert s.total_calls == calls_before


def test_make_single_samples_getdist_parity(tmp_path, gauss_problem):
    """The bootstrap re-thin is the getdist makeSingleSamples unit-weight
    Bernoulli(1/thin) draw (reference ensemble.py:180-182), derived from
    the sampler's checkpointed PRNG stream (NOT the constructor seed —
    resume deliberately changes that); degenerate draws fall back to the
    stride."""
    like, prior, training = gauss_problem

    def fresh(seed):
        return EnsembleSampler(2, like, prior=prior,
                               log_dir=str(tmp_path / ('ens%d' % seed)),
                               seed=seed)

    rng = np.random.RandomState(5)
    chains = rng.normal(size=(8, 100, 2))
    flat = chains.reshape(-1, 2)
    # identical key streams -> identical draws (seed reproducibility)
    out = fresh(11)._make_single_samples(chains, thin=4, phase=1)
    np.testing.assert_array_equal(
        out, fresh(11)._make_single_samples(chains, thin=4, phase=1))
    # every row of the draw is a row of the input (unit-weight subsample)
    assert all(any(np.array_equal(r, f) for f in flat[:]) for r in out[:5])
    # ~n/thin rows survive (unit weights)
    assert 0.5 * flat.shape[0] / 4 <= out.shape[0] <= 2 * flat.shape[0] / 4
    # consecutive draws consume the key stream -> different subsets
    s = fresh(12)
    a = s._make_single_samples(chains, 4, 1)
    b = s._make_single_samples(chains, 4, 2)
    assert a.shape != b.shape or not np.array_equal(a, b)
    # degenerate: absurd thin falls back to stride thinning
    np.testing.assert_array_equal(
        fresh(13)._make_single_samples(chains, 10 ** 6, 1),
        chains[:, ::10 ** 6, :].reshape(-1, 2))


def test_emcee_h5_seeds_phase0(tmp_path, gauss_problem):
    """An existing emcee HDF backend file in the run dir seeds bootstrap
    phase 0 (reference parity: the reference persists/reuses
    <log_dir>/emcee.h5, ensemble.py:114,140-141): the stored chain
    replaces the phase-0 ensemble run — no phase-0 likelihood calls are
    paid — and later phases proceed normally."""
    import h5py
    like, prior, training = gauss_problem
    s = EnsembleSampler(2, like, prior=prior, append_run_num=False,
                        log_dir=str(tmp_path / 'h5seed'), seed=4)
    # emcee HDFBackend layout: group 'mcmc', chain (iteration, walkers,
    # dim), attr 'iteration'
    rng = np.random.RandomState(0)
    chain = rng.normal(size=(60, 16, 2))
    with h5py.File(f"{s.log_dir}/emcee.h5", 'w') as f:
        g = f.create_group('mcmc')
        g.create_dataset('chain', data=chain)
        g.attrs['iteration'] = 60
    calls_before = s.total_calls
    out = s.bootstrap(40, 16, iters=1, thin=3)
    # phase 0 came from the file: only phase-1 kernel calls were paid
    assert s.total_calls - calls_before <= 40 * 16
    assert out.shape[1] == 2
    # mismatched dimension is rejected loudly
    s2 = EnsembleSampler(3, Gaussian(3, 0.0, lim=5),
                         prior=UniformPrior(3, -5, 5),
                         append_run_num=False,
                         log_dir=str(tmp_path / 'h5bad'), seed=4)
    with h5py.File(f"{s2.log_dir}/emcee.h5", 'w') as f:
        g = f.create_group('mcmc')
        g.create_dataset('chain', data=chain)
        g.attrs['iteration'] = 60
    with pytest.raises(ValueError, match='does not match x_dim'):
        s2.bootstrap(40, 16, iters=1, thin=3)
