"""Merged-run (dynamic nested sampling) evidence machinery
(utils/evaluation.thread_birth_logl / merged_run_evidence / merge_runs —
arXiv:1704.03459; no reference counterpart, the reference's nested.py only
ever runs one constant-N pass).

The analytic harness simulates EXACT nested sampling on the volume
likelihood L(X) = X^(-1/2)/2 over X in (0,1] (so Z = 1, logZ = 0, and
logl = -log(X)/2 stays float64-resolvable down to X ~ e^-700 — a
polynomial-in-X likelihood plateaus in float64 at tiny volumes and
produces tied deaths): live points are uniform volumes, each death
replaces the worst with a uniform draw inside its volume — the in-place
replacement scheme the real sampler uses, giving true thread slots.
"""

import os

import numpy as np
import pytest

from nnest_tpu.utils.evaluation import (merge_runs, merged_run_evidence,
                                        thread_birth_logl)


def _logl_of_vol(x):
    return -0.5 * np.log(np.maximum(x, 1e-300)) - np.log(2.0)


def simulate_run(n_live, n_iter, seed):
    """Exact NS simulation with slot tracking. Returns (logl, slots) over
    deaths THEN final live points (slot i closes thread i), the sampler's
    saved order."""
    rng = np.random.RandomState(seed)
    vols = rng.uniform(size=n_live)
    logl, slots = [], []
    for _ in range(n_iter):
        worst = int(np.argmax(vols))
        logl.append(_logl_of_vol(vols[worst]))
        slots.append(worst)
        vols[worst] = rng.uniform() * vols[worst]
    for i in range(n_live):
        logl.append(_logl_of_vol(vols[i]))
        slots.append(i)
    return np.asarray(logl), np.asarray(slots)


def static_accumulation(logl_deaths, logl_live, n_live):
    """Replicates samplers/nested.py:395-403 + the equal-split tail
    (nested.py:924-931) on simulated points."""
    logz, h = -1e300, 0.0
    logvol = float(np.log(1.0 - np.exp(-1.0 / n_live)))
    for ll in logl_deaths:
        logwt = logvol + ll
        logz_new = np.logaddexp(logz, logwt)
        h = (np.exp(logwt - logz_new) * ll
             + np.exp(logz - logz_new) * (h + logz) - logz_new)
        logz = logz_new
        logvol -= 1.0 / n_live
    logvol = -len(logl_deaths) / n_live - np.log(n_live)
    for ll in logl_live:
        logwt = logvol + ll
        logz_new = np.logaddexp(logz, logwt)
        h = (np.exp(logwt - logz_new) * ll
             + np.exp(logz - logz_new) * (h + logz) - logz_new)
        logz = logz_new
    return logz, h


def test_thread_birth_logl_handcrafted():
    # n_live=2; deaths in slots 0,1,0 then closing points (slots 0,1)
    logl = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    slots = np.array([0, 1, 0, 0, 1])
    births = thread_birth_logl(logl, slots, 2)
    assert np.isneginf(births[0]) and np.isneginf(births[1])
    assert births[2] == 1.0   # slot 0's second point born at first death
    assert births[3] == 3.0
    assert births[4] == 2.0
    # batch floor propagates to first occupants
    births = thread_birth_logl(logl, slots, 2, birth_floor=-7.5)
    assert births[0] == -7.5 and births[1] == -7.5 and births[2] == 1.0


def test_single_run_merge_matches_static():
    n_live, n_iter = 100, 3000
    logl, slots = simulate_run(n_live, n_iter, seed=1)
    births = thread_birth_logl(logl, slots, n_live)
    out = merged_run_evidence(logl, births)
    # live counts: constant n_live over the deaths, ramp n..1 on the tail
    assert np.all(out['n_live'][:n_iter] == n_live)
    assert np.array_equal(out['n_live'][n_iter:],
                          np.arange(n_live, 0, -1))
    logz_static, h_static = static_accumulation(
        logl[:n_iter], logl[n_iter:], n_live)
    # run long enough that X_final ~ e^-30: the tail-convention
    # difference is far below any error bar
    assert abs(out['logz'] - logz_static) < 1e-6
    assert abs(out['h'] - h_static) < 1e-4
    assert abs(out['logzerr'] - np.sqrt(h_static / n_live)) \
        < 0.05 * out['logzerr']
    # truth: logZ = 0 by construction
    assert abs(out['logz']) < 3.5 * out['logzerr']
    # logwt is returned in INPUT order: normalized weights sum to 1
    w = np.exp(out['logwt'] - out['logz'])
    assert np.sum(w) == pytest.approx(1.0, rel=1e-6)


def test_merged_runs_cut_error_like_sqrt_k():
    n_live, n_iter, n_rep = 100, 3000, 24
    singles, merged = [], []
    for rep in range(n_rep):
        runs = []
        for k in range(4):
            logl, slots = simulate_run(n_live, n_iter, seed=100 * rep + k)
            runs.append({'logl': logl,
                         'birth_logl': thread_birth_logl(
                             logl, slots, n_live)})
        out1 = merged_run_evidence(runs[0]['logl'], runs[0]['birth_logl'])
        out4 = merge_runs(runs)
        # merged live counts sum: 4*n_live through the bulk
        assert np.max(out4['n_live']) == 4 * n_live
        assert out4['logzerr'] < out1['logzerr']
        singles.append(out1['logz'])
        merged.append(out4['logz'])
    # reported error bar halves (1/sqrt(4)), observed scatter follows
    assert out4['logzerr'] == pytest.approx(out1['logzerr'] / 2.0,
                                            rel=0.15)
    s1 = np.std(singles, ddof=1)
    s4 = np.std(merged, ddof=1)
    assert s4 < 0.75 * s1
    assert abs(np.mean(merged)) < 4.0 * s4 / np.sqrt(n_rep) + 0.01
    # run_index/point_index map every merged point back to its source
    assert np.all(np.bincount(out4['run_index']) == n_iter + n_live)


def test_birth_floor_batch_merge():
    """A 'dynamic batch' simulated above a volume floor X* merges exactly:
    base run + batch born at logl(X*) must tighten the error in the
    batch's interval and keep logZ unbiased."""
    n_live, n_iter = 100, 3000
    rng = np.random.RandomState(7)
    logl, slots = simulate_run(n_live, n_iter, seed=7)
    base = {'logl': logl,
            'birth_logl': thread_birth_logl(logl, slots, n_live)}
    # batch: n_b threads born at volume X* = e^-2, run to tiny volumes
    x_star = np.exp(-2.0)
    floor = _logl_of_vol(x_star)
    n_b, n_bi = 100, 2000
    vols = rng.uniform(size=n_b) * x_star
    blogl, bslots = [], []
    for _ in range(n_bi):
        worst = int(np.argmax(vols))
        blogl.append(_logl_of_vol(vols[worst]))
        bslots.append(worst)
        vols[worst] = rng.uniform() * vols[worst]
    for i in range(n_b):
        blogl.append(_logl_of_vol(vols[i]))
        bslots.append(i)
    batch = {'logl': np.asarray(blogl),
             'birth_logl': thread_birth_logl(
                 np.asarray(blogl), np.asarray(bslots), n_b,
                 birth_floor=floor)}
    out = merge_runs([base, batch])
    base_only = merged_run_evidence(base['logl'], base['birth_logl'])
    assert out['logzerr'] < base_only['logzerr']
    assert abs(out['logz']) < 3.5 * out['logzerr']
    # live count rises to ~2*n inside the batch interval only
    inside = np.sort(np.concatenate([base['logl'],
                                     batch['logl']]))  # ascending deaths
    n = out['n_live']
    assert np.max(n[inside < floor]) <= n_live
    assert np.max(n) > 1.8 * n_live


@pytest.fixture(scope='module')
def gauss_run(tmp_path_factory):
    """One real 2-D Gaussian run shared by the artifact-level tests.
    Returns (summary dict, run_dir)."""
    from nnest_tpu import NestedSampler
    from nnest_tpu.likelihoods import Gaussian

    root = tmp_path_factory.mktemp('merge_e2e')
    like = Gaussian(2, 0.0, lim=3.0)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=100, hidden_dim=16, num_blocks=3,
                      flow='spline', log_dir=str(root / 'g2'),
                      resume=False, seed=0)
    s.run(train_iters=50, log_interval=50, dlogz=0.1)
    return ({'logz': float(s.logz), 'logzerr': float(s.logzerr),
             'loglikes': np.asarray(s.loglikes)}, s.logs['run_dir'])


def test_real_run_threads_npz_roundtrip(gauss_run):
    """E2E: a real 2-D Gaussian run writes threads.npz, and the merged-run
    machinery reproduces the run's own logz/logzerr from it (tail
    convention differs only at the O(X_final/N) level)."""
    import math
    s, run_dir = gauss_run
    path = os.path.join(run_dir, 'results', 'threads.npz')
    assert os.path.exists(path)
    rec = np.load(path)
    assert int(rec['n_live']) == 100
    assert np.isneginf(float(rec['birth_floor']))
    assert rec['logl'].shape == rec['slots'].shape
    assert rec['logl'].size == s['loglikes'].size
    np.testing.assert_allclose(rec['logl'], s['loglikes'], rtol=0, atol=0)
    births = thread_birth_logl(rec['logl'], rec['slots'],
                               int(rec['n_live']))
    out = merged_run_evidence(rec['logl'], births)
    assert abs(out['logz'] - s['logz']) < 0.01
    assert out['logzerr'] == pytest.approx(s['logzerr'], rel=0.1)
    truth = 2 * (math.log(math.erf(3 / math.sqrt(2))) - math.log(6))
    assert abs(out['logz'] - truth) < 4 * out['logzerr']
    # merging the run with itself halves the reported error
    two = merge_runs([{'logl': rec['logl'], 'birth_logl': births}] * 2)
    assert two['logzerr'] == pytest.approx(out['logzerr'] / math.sqrt(2),
                                           rel=0.1)


def test_analyse_merge_cli(gauss_run, capsys):
    """analyse.py --merge combines run dirs via threads.npz: duplicate the
    run dir and check the merged evidence + chain come out."""
    import argparse
    import importlib.util
    import shutil

    s, run_dir = gauss_run
    root = os.path.dirname(run_dir)       # .../g2 (contains run1)
    run2 = os.path.join(root, 'run2')
    if not os.path.isdir(run2):
        shutil.copytree(run_dir, run2)
    spec = importlib.util.spec_from_file_location(
        'analyse', os.path.join(os.path.dirname(__file__), '..',
                                'examples', 'nested', 'analyse.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    args = argparse.Namespace(root=root, dim=2, feedback=0, plot=False,
                              merge=True, merge_chain=True)
    mod.main(args)
    outp = capsys.readouterr().out
    assert 'Merged logZ (combined run):' in outp
    line = [ln for ln in outp.splitlines()
            if ln.startswith('Merged logZ')][0]
    merged_logz = float(line.split(':')[1].split('+/-')[0])
    merged_err = float(line.split('+/-')[1].split('(')[0])
    # duplicate-run self-merge: same logz, error down by ~sqrt(2)
    assert abs(merged_logz - s['logz']) < 0.02
    assert merged_err == pytest.approx(s['logzerr'] / np.sqrt(2), rel=0.15)
    assert 'peak live points 200' in line
    mpath = os.path.join(root, 'merged_chain.txt')
    assert os.path.exists(mpath)
    dat = np.loadtxt(mpath)
    assert dat.shape[0] == 2 * s['loglikes'].size
    assert np.sum(dat[:, 0]) == pytest.approx(1.0, abs=1e-3)
