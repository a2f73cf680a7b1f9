"""Chain diagnostics (reference ``nnest/utils/evaluation.py``), fully
vectorized — the reference computes acceptance rate and jump distance with
nested Python loops over (chains × steps); here every diagnostic is a handful
of numpy array ops, and the autocorrelation-based ESS matches the reference's
truncated-sum estimator (``evaluation.py:17-39``).

All functions expect chains shaped (num_chains, num_steps, dim).
"""

from __future__ import annotations

import numpy as np

from nnest_tpu import runtime as _native


def auto_correlation_time(x, s, mu, var):
    """Lag-s autocorrelation averaged over chains (reference
    ``evaluation.py:6-14``)."""
    x = np.asarray(x)
    y = x - mu
    p, n = y[:, :-s, :], y[:, s:, :]
    return np.mean(p * n, axis=(0, 1)) / var


def effective_sample_size(x, mu, var):
    """Truncated-autocorrelation ESS per dimension (reference
    ``evaluation.py:17-39``): accumulate 2*rho_s*(1 - s/t) while any dim has
    rho_s > 0.05, then ESS = t / sum."""
    x = np.asarray(x)
    native = _native.ess(x, mu, var)
    if native is not None:
        return native
    b, t, d = x.shape
    ess = np.ones(d)
    for s in range(1, t):
        p = auto_correlation_time(x, s, mu, var)
        active = p > 0.05
        if not np.any(active):
            break
        ess[active] += 2.0 * p[active] * (1.0 - float(s) / t)
    return t / ess


def acceptance_rate(x):
    """Fraction of steps where the chain moved (reference
    ``evaluation.py:42-56``), vectorized."""
    x = np.asarray(x)
    native = _native.acceptance_rate(x)
    if native is not None:
        return native
    moved = np.any(x[:, 1:, :] != x[:, :-1, :], axis=-1)
    return float(np.mean(moved))


def mean_jump_distance(x):
    """Mean Euclidean step length (reference ``evaluation.py:59-73``)."""
    x = np.asarray(x)
    native = _native.mean_jump(x)
    if native is not None:
        return native
    jumps = np.linalg.norm(x[:, 1:, :] - x[:, :-1, :], axis=-1)
    return float(np.mean(jumps))


def gelman_rubin_diagnostic(x, mu=None):
    """Gelman–Rubin R-hat per dimension (reference ``evaluation.py:76-92``,
    same estimator including its 1e-5 regularizer)."""
    x = np.asarray(x)
    m, n = x.shape[0], x.shape[1]
    theta = np.mean(x, axis=1)
    sigma = np.var(x, axis=1)
    theta_m = mu if mu is not None else np.mean(theta, axis=0)
    b = float(n) / float(m - 1) * np.sum((theta - theta_m) ** 2, axis=0)
    w = 1.0 / (float(m) * np.sum(sigma, axis=0) + 1e-5)
    v = float(n - 1) / float(n) * w + float(m + 1) / float(m * n) * b
    return np.sqrt(v / w)


def integrated_autocorr_time(x, c: float = 5.0, tol: float = 50.0):
    """FFT-based integrated autocorrelation time per dimension, emcee-style
    (used by EnsembleSampler.bootstrap thinning — the reference delegates to
    ``emcee.get_autocorr_time``, ``ensemble.py:146``). x: (chains, steps, dim).
    """
    x = np.asarray(x, dtype=np.float64)
    m, t, d = x.shape
    taus = np.empty(d)
    for j in range(d):
        f = np.zeros(t)
        for i in range(m):
            y = x[i, :, j] - np.mean(x[i, :, j])
            n = 1 << (2 * t - 1).bit_length()
            fy = np.fft.fft(y, n=n)
            acf = np.fft.ifft(fy * np.conjugate(fy))[:t].real
            if acf[0] > 0:
                f += acf / acf[0]
        f /= m
        taus_cum = 2.0 * np.cumsum(f) - 1.0
        window = np.arange(len(taus_cum)) >= c * taus_cum
        idx = np.argmax(window) if np.any(window) else len(taus_cum) - 1
        taus[j] = max(taus_cum[idx], 1.0)
    return taus


def kolmogorov_pvalue(d, n):
    """Asymptotic two-sided Kolmogorov-Smirnov p-value for statistic ``d``
    over ``n`` samples (Stephens' small-sample correction, the same
    approximation scipy.stats.kstest uses asymptotically). Pure numpy so
    the sampler has no scipy runtime dependency."""
    n = int(n)
    if n <= 0 or d <= 0.0:
        return 1.0
    lam = (np.sqrt(n) + 0.12 + 0.11 / np.sqrt(n)) * float(d)
    k = np.arange(1, 101)
    p = 2.0 * np.sum((-1.0) ** (k - 1) * np.exp(-2.0 * (k * lam) ** 2))
    return float(min(max(p, 0.0), 1.0))


def insertion_ks(ranks, n_live):
    """Insertion-index uniformity test for nested sampling (Fowlie,
    Handley & Su 2020, arXiv:2006.03371 — NOT in the reference; this is
    the standard check that the constrained sampler actually draws
    uniformly within the likelihood shell). Under exact constrained
    sampling the insertion rank of each replacement point among the
    surviving ``n_live - 1`` live points is Uniform{0, ..., n_live-1};
    under-mixed MCMC proposals (chains stuck near their start point)
    skew the ranks and drive the p-value to 0.

    Returns ``(D, p)``: the KS distance of ``(ranks + 0.5) / n_live``
    from U[0,1] and its asymptotic p-value."""
    r = np.asarray(ranks, dtype=np.float64)
    n = r.size
    if n == 0:
        return 0.0, 1.0
    u = np.sort((r + 0.5) / float(n_live))
    i = np.arange(1, n + 1)
    d = float(np.max(np.maximum(i / n - u, u - (i - 1) / n)))
    return d, kolmogorov_pvalue(d, n)


def rolling_insertion_ks(ranks, n_live, block=None):
    """Blockwise insertion test: the whole-run KS can average away a
    failure confined to one likelihood regime (the paper's recommended
    refinement), so also test each consecutive block of ``block``
    iterations (default ``n_live``) and Bonferroni-correct the smallest
    block p-value. Returns ``(min_corrected_p, n_blocks)``."""
    r = np.asarray(ranks, dtype=np.float64)
    if block is None:
        block = int(n_live)
    block = max(int(block), 1)
    n_blocks = max(r.size // block, 1)
    pmin = 1.0
    for b in range(n_blocks):
        chunk = r[b * block:(b + 1) * block] if b < n_blocks - 1 \
            else r[(n_blocks - 1) * block:]
        _, p = insertion_ks(chunk, n_live)
        pmin = min(pmin, p)
    return float(min(pmin * n_blocks, 1.0)), n_blocks


def bootstrap_logz_error(saved_logl, slots, n_live, n_boot=200, seed=0):
    """Single-run thread-bootstrap logZ error (Higson, Handley, Hobson &
    Lasenby 2019, arXiv:1804.06406 / nestcheck's ``run_std_bootstrap`` —
    NOT in the reference). A non-dynamic nested run with in-place
    replacement decomposes exactly into ``n_live`` single-live-point
    threads (= slot lineages, recorded in ``slots``). Resampling whole
    threads with replacement and re-running the standard constant-N
    evidence accumulation on each resample estimates the run's SAMPLING
    error non-parametrically; on exact runs it reproduces the analytic
    sqrt(h/N) bar (measured: ratio 0.99-1.01 on 2-D Gaussian), so a
    ratio far from 1 flags a mis-calibrated error bar. NOTE (measured,
    BENCHMARKS.md): under-mixed MCMC proposals correlate a new point
    with a random OTHER live point, i.e. BETWEEN threads — a failure
    the single-run bootstrap cannot see (ratios stayed 0.8-0.9 on a
    deliberately crippled run whose logZ was ~1 nat off). Detecting it
    needs >=2 runs: the implementation-error decomposition
    sqrt(max(0, Var_runs(logz) - mean(bootstrap^2))) reported by
    examples/nested/analyse.py (nestcheck's two-run estimator,
    arXiv:1804.06406 sec 5).

    ``saved_logl``/``slots`` must cover the FULL run including the final
    live points (slot k's final point closes thread k). Deterministic:
    fixed ``seed``, host numpy only — never touches the sampler's key
    stream, and identical on every process. Returns the bootstrap std of
    logZ over ``n_boot`` replicates."""
    saved_logl = np.asarray(saved_logl, dtype=np.float64)
    slots = np.asarray(slots)
    groups = [saved_logl[slots == k] for k in range(n_live)]
    rng = np.random.RandomState(seed)
    shell = np.log1p(-np.exp(-1.0 / n_live))
    zs = np.empty(n_boot)
    for b in range(n_boot):
        pick = rng.randint(0, n_live, size=n_live)
        logls = np.concatenate([groups[k] for k in pick])
        logls.sort()
        # ascending-logl deaths: the i-th death leaves log-volume -i/N
        # (matches the run loop's logvol init + 1/N shrink per accept)
        logwt = logls + shell - np.arange(logls.size) / n_live
        m = logwt.max()
        zs[b] = m + np.log(np.sum(np.exp(logwt - m)))
    return float(np.std(zs))


# --------------------------------------------------------------------------
# Merged-run (dynamic nested sampling) evidence machinery — Higson, Handley,
# Hobson & Lasenby 2019 ("Dynamic nested sampling", arXiv:1704.03459) and
# nestcheck's combined-run formalism. NOT in the reference: its nested
# sampler (nested.py:436-496) only supports a single constant-live-point
# run. These functions operate on the (birth, death) representation that
# the sampler's thread tracking already records, enabling (a) exact
# merging of independent runs into one higher-resolution run and (b)
# dynamic runs whose batches carry a birth floor. Pure host float64.
# --------------------------------------------------------------------------


def thread_birth_logl(saved_logl, slots, n_live, birth_floor=-np.inf):
    """Per-point birth log-likelihood from the slot (= thread) record.

    Under in-place replacement the point occupying slot ``k`` was born at
    the likelihood threshold equal to the PREVIOUS death in slot ``k``
    (its insertion replaced that death at loglstar = that death's logl);
    the first occupant of each slot was born at ``birth_floor`` (-inf for
    a prior-seeded run, the batch floor for a dynamic batch). Vectorized
    per slot. Returns float64 births aligned with ``saved_logl``."""
    saved_logl = np.asarray(saved_logl, dtype=np.float64)
    slots = np.asarray(slots)
    births = np.full(saved_logl.shape, float(birth_floor), np.float64)
    for k in range(int(n_live)):
        idx = np.nonzero(slots == k)[0]
        if idx.size > 1:
            births[idx[1:]] = saved_logl[idx[:-1]]
    return births


def merged_run_evidence(logl, birth_logl):
    """Evidence/weights of a (possibly merged, possibly dynamic) nested
    run given each point's death and birth log-likelihoods.

    The number of live points at the i-th death (ascending death logl) is
    ``n_i = #{birth_j < logl_i} - #{death_j < logl_i}`` — a point is alive
    on the interval (birth, death]. The volume shrinks by the standard
    ``E[ln t] = -1/n_i`` per death and each point gets the proper mass
    difference ``X_{i-1} - X_i``, exactly the constant-N accumulation of
    ``samplers/nested.py:395-403`` generalized to varying ``n_i``. Final
    live points (deaths never triggered by the sampler) simply appear as
    deaths with the alive count ramping down — the nestcheck/dynesty tail
    convention. For a single constant-N run this differs from the run
    loop's equal-volume-split tail only by O(X_final/N), far below the
    sqrt(h/N) error at any sane termination dlogz (asserted in tests).

    The logZ variance follows dynesty's accumulation
    ``var = sum_i dh_i / n_i`` (equal to h/N for constant N).

    Returns a dict: ``logz, h, logzerr, logwt`` (aligned with the INPUT
    order), ``n_live`` (per-death live counts, in ascending-death order),
    and ``order`` (the ascending-death permutation)."""
    logl = np.asarray(logl, dtype=np.float64)
    birth = np.asarray(birth_logl, dtype=np.float64)
    if logl.shape != birth.shape:
        raise ValueError('logl and birth_logl must align')
    order = np.argsort(logl, kind='stable')
    l_sorted = logl[order]
    births_sorted = np.sort(birth)
    n_alive = (np.searchsorted(births_sorted, l_sorted, side='left')
               - np.searchsorted(l_sorted, l_sorted, side='left'))
    n_alive = np.maximum(n_alive, 1)
    dln = 1.0 / n_alive
    ln_x_prev = np.concatenate(([0.0], -np.cumsum(dln)[:-1]))
    logwt_sorted = l_sorted + ln_x_prev + np.log(-np.expm1(-dln))
    finite = np.isfinite(logwt_sorted)
    if not np.any(finite):
        return {'logz': -np.inf, 'h': 0.0, 'logzerr': 0.0,
                'logwt': logwt_sorted.copy(), 'n_live': n_alive,
                'order': order}
    m = np.max(logwt_sorted[finite])
    w = np.where(finite, np.exp(logwt_sorted - m), 0.0)
    a_cum = np.cumsum(w)
    b_cum = np.cumsum(np.where(finite, w * l_sorted, 0.0))
    logz_cum = m + np.log(np.maximum(a_cum, 1e-300))
    h_cum = np.where(a_cum > 0, b_cum / np.maximum(a_cum, 1e-300)
                     - logz_cum, 0.0)
    dh = np.diff(np.concatenate(([0.0], h_cum)))
    logzvar = float(np.sum(dh * dln))
    logwt = np.empty_like(logwt_sorted)
    logwt[order] = logwt_sorted
    return {'logz': float(logz_cum[-1]), 'h': float(h_cum[-1]),
            'logzerr': float(np.sqrt(max(logzvar, 0.0))),
            'logwt': logwt, 'n_live': n_alive, 'order': order}


def load_threads_npz(path):
    """Load a run's ``results/threads.npz`` artifact into the
    ``{'logl', 'birth_logl'}`` dict ``merge_runs`` consumes (births
    reconstructed per slot via ``thread_birth_logl``, honoring the run's
    saved birth floor)."""
    rec = np.load(path)
    logl = np.asarray(rec['logl'], np.float64)
    floor = float(rec['birth_floor']) if 'birth_floor' in rec else -np.inf
    return {'logl': logl,
            'birth_logl': thread_birth_logl(
                logl, np.asarray(rec['slots']), int(rec['n_live']),
                birth_floor=floor)}


def merge_runs(runs):
    """Merge independent nested runs (same likelihood + prior) into one
    combined run (arXiv:1704.03459 sec 3 / nestcheck ``combine_ns_runs``):
    concatenate the (death, birth) pairs and recompute the evidence with
    per-death live counts — the live counts of the constituents ADD over
    any likelihood interval where both are alive, so K merged constant-N
    runs behave like one ~K*N-live-point run (error shrinks ~1/sqrt(K)).

    ``runs``: list of dicts with ``logl`` and ``birth_logl`` arrays (e.g.
    from ``thread_birth_logl`` or a saved ``threads.npz``). Returns the
    ``merged_run_evidence`` dict plus ``run_index`` / ``point_index``
    arrays mapping each merged point back to (which run, which row)."""
    if not runs:
        raise ValueError('no runs to merge')
    logl = np.concatenate([np.asarray(r['logl'], np.float64)
                           for r in runs])
    birth = np.concatenate([np.asarray(r['birth_logl'], np.float64)
                            for r in runs])
    out = merged_run_evidence(logl, birth)
    out['run_index'] = np.concatenate(
        [np.full(len(np.asarray(r['logl'])), i, np.int32)
         for i, r in enumerate(runs)])
    out['point_index'] = np.concatenate(
        [np.arange(len(np.asarray(r['logl'])), dtype=np.int64)
         for r in runs])
    return out


def metropolis_mix_null(steps, dim, adapt_cov=False):
    """Expected healthy eigenbasis mixing ratio for the constrained
    Metropolis kernel at this step budget.

    Measured on calibrated (seed-scatter == sqrt(h/N)) Gaussian runs at
    production settings (256 chains, auto-adapted scale): the
    min-over-eigendirections start-decorrelation ratio scales as
    c * steps / dim^2 with c ~= 1.4 for the isotropic proposal
    (10-D/50 steps -> 0.68, 30-D/150 steps -> 0.24; BENCHMARKS.md
    round 4). A random-walk kernel pays a dim factor for the step-size
    scaling and another for the min-statistic over dim directions.
    The covariance-preconditioned proposal (``mcmc_adapt='cov'``, the
    round-5 default) adapts the per-direction scale to the live-set
    covariance and decorrelates measurably faster on the SAME healthy
    controls, with a WEAKER dim penalty: production-default (auto
    capacity, red-black covariance, dimension-scaled jitter) Gaussian
    cov controls measure 0.689 at 10-D/50 steps, 0.459 at 30-D/150 and
    0.398 at 50-D/250, pinning null = 0.31 * steps / dim^1.35 (the
    implied constant is 0.301-0.313 across all three dims; predictions
    within 3% everywhere — BENCHMARKS.md round 5 part 2). Fit domain
    10-50-D. The RELATIVE ratio measured/expected is ~1 on whitened
    unimodal problems at any dim and collapses on curved degeneracies
    the flow cannot whiten — the regime where sqrt(h/N) under-covers
    (20-D Rosenbrock at default 5d steps: rel 0.65, flag fires, and the
    run is indeed ~1.5 nats low).

    The null never drops below its value at the DEFAULT budget (5*dim
    steps, the calibration design point): a deliberately starved kernel
    (mcmc_steps=2) would otherwise look "healthy for its budget" while
    its evidence is biased ~1 nat (the measured crippled-run regime) —
    too few steps must lower R and fire the flag, not relax the bar.
    """
    if adapt_cov:
        return min(1.0, 0.31 * max(steps, 5 * dim) / float(dim) ** 1.35)
    return min(1.0, 1.4 * max(steps, 5 * dim) / float(dim) ** 2)


def slice_mix_null(steps, dim):
    """Expected healthy eigenbasis mixing ratio for the latent slice
    kernel. Each slice move decorrelates along one random direction, so
    the frozen fraction decays exponentially in steps/dim — but the
    statistic is a MIN over dim directions and each move only partially
    decorrelates (shrinkage truncation within the shell), which
    steepens the dim dependence. Fit on calibrated Gaussian slice
    controls at default steps=2d (10-D: 0.48, 30-D: 0.27 measured;
    0.52 / 0.29 predicted), validated out-of-sample on the 20-D
    Rosenbrock slice A/B at 100 and 400 steps (BENCHMARKS.md round 4).
    As with the Metropolis null, the default budget (2*dim moves) is a
    floor: starving the kernel lowers R, it does not relax the bar.
    """
    return min(1.0, 1.0 - float(
        np.exp(-1.3 * max(steps, 2 * dim) / float(dim) ** 1.6)))


def latent_cond_null(dim, n_chains):
    """Healthy-run latent condition number of a chain-start population.

    The kernel measures the condition number of the empirical latent
    covariance of each pool generation's n_chains start points. When the
    flow whitens the constrained prior, the TRUE latent covariance is
    ~identity and the measured condition number is pure sample noise: by
    Marchenko-Pastur the eigenvalue support edges of a d-variate,
    n-sample identity-covariance estimate are (1 ± sqrt(d/n))^2, so the
    noise-floor condition number is their ratio. Healthy (seed-scatter
    == sqrt(h/N)) Gaussian controls measure slightly above the MP edge
    ratio with a dim-growing residual (real residual anisotropy the
    flow leaves behind): 10-D/256 chains -> 2.3 (MP 2.2), 30-D -> 5.8
    (4.2), 50-D -> 11.3 (6.7), fit by MP_edge_ratio^1.25 (BENCHMARKS.md
    rounds 4-5). Curved degeneracies the flow CANNOT whiten sit 3-6x
    above this null at EVERY step count (20-D Rosenbrock: 14-20 vs null
    4.2) — the structural signal behind the excess logZ seed scatter
    that within-generation mixing statistics are measured blind to.
    """
    q = min(float(dim) / float(max(n_chains, dim + 1)), 0.98)
    edge = ((1.0 + q ** 0.5) / (1.0 - q ** 0.5)) ** 2
    return edge ** 1.25


def adjusted_logzerr(logzerr, mix_rels, x_dim, cond_rels=None):
    """Calibrated single-run logZ uncertainty (BENCHMARKS.md rounds 4-5).

    ``mix_rels``: per-generation relative eigenbasis mixing ratios
    (measured / kernel null) — the KINETIC term; inflation follows
    1/R^2 of the median. ``cond_rels``: per-generation relative latent
    condition numbers (measured / ``latent_cond_null``) from METROPOLIS
    generations — the STRUCTURAL term, step-count-independent;
    inflation follows the median ratio directly. The quoted bar
    inflates by the LARGER of the two terms: a starved kernel
    under-mixes (kinetic fires even when the geometry is benign — the
    crippled-run regime), while a well-stepped random-walk kernel on a
    curved degeneracy mixes "healthily" within each generation yet
    keeps between-thread start correlation alive (structural fires;
    measured: 20-D Rosenbrock cov@400 needs ~4x where 1/R^2 reads only
    2.2x). Slice generations are excluded from ``cond_rels`` by the
    caller: the slice kernel's kinetic term alone calibrates on the
    same geometry (round-4 slice@100/@400 both in band) and the
    structural ratio would 3x-over-cover it. Clipped to [1, 100] and
    applied only inside the calibration domain (x_dim >= 8; low-D
    curved problems measure R << 1 yet calibrate at or below
    sqrt(h/N)). Falls back to the raw sqrt(h/N) bar when no chain
    kernel ran (pure-rejection runs cannot under-mix).
    """
    if not mix_rels or x_dim < 8:
        return float(logzerr)
    r = float(np.median(mix_rels))
    inflation = max(1.0, r ** -2)
    if cond_rels:
        inflation = max(inflation, float(np.median(cond_rels)))
    return float(logzerr) * min(100.0, inflation)


def eig_mix_from_moments(cov, msd):
    """Eigenbasis mixing ratio + latent condition number from the kernel's
    second-moment outputs (``kernels.mix_moments_device``), in float64 on
    host: eigh of the start covariance C, then
    r_eig = min_i (v_i^T M v_i) / (2 lambda_i) and
    cond = lambda_max / lambda_min. Returns ``(r_eig, cond)``."""
    c = np.asarray(cov, dtype=np.float64)
    m = np.asarray(msd, dtype=np.float64)
    dim = c.shape[0]
    eps = 1e-6 * (np.trace(c) / dim + 1e-12)
    c = c + eps * np.eye(dim)
    w, v = np.linalg.eigh(c)
    ratio = np.einsum('ij,jk,ki->i', v.T, m, v) / (2.0 * w + 1e-12)
    cond = float(w[-1] / max(w[0], 1e-30))
    return float(np.min(ratio)), cond
