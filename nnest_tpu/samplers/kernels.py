"""Latent-space sampling kernels, fully device-resident.

TPU-native redesign of the reference's sampling kernels
(``nnest/sampler.py:229-724``). The reference runs a host Python loop over
MCMC steps with a device round-trip per proposal (``sampler.py:291-452``);
here the entire multi-chain trajectory is ONE jitted ``lax.scan`` with
``vmap``-style batched chains, accept/reject as ``jnp.where`` masks, the
likelihood constraint folded in, and dynamic step-size adaptation carried
through the scan. Rejection/density sampling become batched trial programs
instead of one-candidate-at-a-time host loops (``sampler.py:529-630``), and
the emcee stretch move is implemented natively so the ensemble path never
leaves the device (``sampler.py:632-724``).

Likelihood-call accounting matches the reference: in constrained mode the
reference only evaluates the likelihood for chains whose prior+Jacobian
proposal was accepted (``sampler.py:358-368``), so ``ncall`` counts exactly
those lanes even though the vectorized kernel computes every lane (free on
TPU for batched pure-JAX likelihoods).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

# Finite sentinel for "impossible" log-densities inside jitted kernels.
# CRITICAL TPU performance rule discovered by bisection: arithmetic on
# ±inf/NaN lanes runs ~150x slower than finite arithmetic on TPU v5e
# (20.5 ms vs 0.13 ms per scan step at 4096x16), so the reference's
# -np.inf prior indicator (priors.py:39-43) and NaN-producing -inf - -inf
# ratios must never reach the hot path. LOG_NEG is chosen < -1e30 so the
# reference's `< -1e30` validity checks keep their semantics; exp() of any
# difference underflows cleanly to 0.
LOG_NEG = -1e31

# Number of full chains kept for diagnostics in endpoint-only MCMC mode
# (ESS / acceptance stats without transferring all chains).
_N_DIAG = 4


def sanitize_log_density(lp):
    """Map NaN/±inf/very-negative log-densities to the finite LOG_NEG."""
    lp = jnp.where(jnp.isfinite(lp), lp, LOG_NEG)
    return jnp.maximum(lp, LOG_NEG)


def _accept_mask(key, log_ratio):
    ratio = jnp.exp(jnp.minimum(log_ratio, 0.0))
    return jax.random.uniform(key, log_ratio.shape) < ratio


def ess_device(chains, mu, var):
    """Truncated-autocorrelation ESS per dimension, on device.

    Same estimator as the reference (``nnest/utils/evaluation.py:17-39``):
    rho_s averaged over chains, contributions 2*rho_s*(1 - s/t) accumulated
    for dims with rho_s > 0.05 until no dim is active, ESS = t / sum. The
    lag loop is replaced by one FFT autocorrelation over the step axis plus
    a masked sum — compiler-friendly (static shapes, no host loop) and
    O(t log t) instead of O(t^2).

    chains: (num_chains, t, dim); mu/var: (dim,) normalizing moments (the
    nested-sampling caller passes live-point moments, reference
    ``sampler.py:481-483``).
    """
    b, t, d = chains.shape
    var = jnp.maximum(var, 1e-12)
    y = chains - mu[None, None, :]
    nfft = 1 << (2 * t - 1).bit_length()
    fy = jnp.fft.rfft(y, n=nfft, axis=1)
    acf = jnp.fft.irfft(fy * jnp.conj(fy), n=nfft, axis=1)[:, :t, :]
    lags = jnp.arange(1, t)
    # mean over chains and the (t-s) overlapping pairs, per dim
    rho = (jnp.sum(acf, axis=0)[1:]
           / (b * (t - lags)[:, None] * var[None, :]))
    active = rho > 0.05
    any_active = jnp.any(active, axis=1)
    has_break = jnp.any(~any_active)
    s_break = jnp.where(has_break, jnp.argmax(~any_active), t - 1)
    within = (jnp.arange(t - 1) < s_break)[:, None]
    contrib = jnp.where(jnp.logical_and(active, within),
                        2.0 * rho * (1.0 - lags[:, None] / t), 0.0)
    return t / (1.0 + jnp.sum(contrib, axis=0))


def mix_ratio_device(z_end, z0):
    """Start-decorrelation statistic for endpoint kernels, on device.

    Per latent dim, the chains' mean-square displacement from their
    starts over 2x the start population's variance; the MIN over dims is
    returned. Endpoints that are fresh draws from the start distribution
    give E(z_end - z0)^2 = 2 var per dim -> ratio ~1 in every direction;
    a kernel whose endpoints remember their starts (too few steps, or an
    un-whitened slow mode on a curved degeneracy) shows << 1 along the
    slow direction. This is the single-run flag for the regime where the
    insertion-rank KS and the thread-bootstrap error are both measured
    blind (between-thread start correlation, BENCHMARKS.md part 4): those
    tests compare threads to each other, while this one asks whether a
    thread ever left its parent.

    Latent space is the right basis: the flow globally whitens, so the
    live-set latent covariance is near-diagonal and per-dim ratios track
    the kernel's actual proposal geometry (see _latent_cov_chol for the
    measured residual anisotropy on curved degeneracies).
    """
    dz = z_end - z0
    ref = 2.0 * jnp.var(z0, axis=0) + 1e-12
    return jnp.min(jnp.mean(dz * dz, axis=0) / ref)


def mix_moments_device(z_end, z0):
    """Second-moment matrices for the eigenbasis mixing diagnostic.

    Returns ``(cov, msd)``: the start population's latent covariance
    C = E[(z0-mu)(z0-mu)^T] and the displacement second moment
    M = E[dz dz^T]. The eigen-analysis itself
    (``utils.evaluation.eig_mix_from_moments``) runs on HOST in f64:
    mix_ratio_eig = min_i (v_i^T M v_i) / (2 lambda_i) over eigenpairs
    of C, and latent_cond = lambda_max/lambda_min. An in-program
    jnp.linalg.eigh was measured at ~70 ms per pool generation on v5e
    (tiny iterative QR is scalar-unit-bound), adding ~4 s to a warm
    10-D run; the two d x d matmuls here are MXU-trivial and the
    matrices are a KB-scale transfer.

    Rationale for the eigenbasis statistic (measured, BENCHMARKS.md
    round 4): the coordinate-basis min falls with dimension even for
    perfectly calibrated isotropic runs (30-D Gaussian: 0.31 with logZ
    scatter matching sqrt(h/N) exactly), so it cannot separate "slow
    everywhere because d is large" from the dangerous regime — a
    structurally slow PRINCIPAL direction (the 20-D Rosenbrock ridge,
    not axis-aligned, seed scatter ~6.7x sqrt(h/N)). For isotropic sets
    the eigenbasis is a random rotation and the statistic matches the
    coordinate one; on a curved degeneracy the top-eigenvalue direction
    IS the ridge and its ratio collapses. latent_cond stays at the
    Marchenko-Pastur noise floor when the flow whitens the problem and
    is large at EVERY step count on the ridge — matching the measured
    step-count-INDEPENDENT excess scatter.

    Diagnostic-only outputs: never feed accept decisions or the key
    stream, so they are bit-neutral for evidence. HIGHEST-precision
    matmuls because the result calibrates the reported error bar (TPU
    MXU would bf16-truncate the moments).
    """
    n = np.float32(z0.shape[0])
    zc = z0 - jnp.mean(z0, axis=0, keepdims=True)
    cov = jnp.matmul(zc.T, zc, precision=jax.lax.Precision.HIGHEST) / n
    dz = z_end - z0
    msd = jnp.matmul(dz.T, dz, precision=jax.lax.Precision.HIGHEST) / n
    return cov, msd


class LatentKernels:
    """Kernels bound to a flow model + pure-JAX likelihood/prior closures.

    Args:
      model: FlowModel (params passed per call).
      like_fn: (batch, dim) → ((batch,) loglike, (batch, num_derived)).
        Pure JAX; outputs are sanitized to finite values here (the
        reference clamps to -1e100 host-side, ``sampler.py:128``).
      prior_fn: (batch, dim) → (batch,) log prior (0/-inf box indicator for
        nested sampling; -inf sanitized to LOG_NEG here).
      num_slow / oversample_rate: fast-slow proposal masking
        (``sampler.py:311-315``).
    """

    def __init__(self, model, like_fn, prior_fn, num_slow=0,
                 oversample_rate=1.0, num_derived=0):
        self.model = model

        def safe_like(u):
            logl, derived = like_fn(u)
            return sanitize_log_density(logl), derived

        def safe_prior(u):
            return sanitize_log_density(prior_fn(u))

        self.like_fn = safe_like
        self.prior_fn = safe_prior
        self.num_slow = num_slow
        self.oversample_rate = oversample_rate
        self.num_derived = num_derived
        dim = model.dim
        # 1 on fast dims, 0 on slow dims: multiplying dz by this freezes the
        # slow block for a fast-only move.
        self._fast_mask = jnp.asarray(
            [0.0] * num_slow + [1.0] * (dim - num_slow), dtype=jnp.float32)

        self._mcmc = jax.jit(self._mcmc_impl, static_argnames=(
            'mcmc_steps', 'constrained', 'dynamic_step_size',
            'prior_volume_steps', 'collect_chains', 'own_moments'))
        self._mcmc_live = jax.jit(self._mcmc_from_live_impl,
                                  static_argnames=(
                                      'num_chains', 'mcmc_steps',
                                      'dynamic_step_size',
                                      'prior_volume_steps', 'adapt_cov'))
        self._mcmc_gens = jax.jit(self._mcmc_pool_generations_impl,
                                  static_argnames=(
                                      'num_chains', 'mcmc_steps',
                                      'max_gens', 'dynamic_step_size',
                                      'prior_volume_steps', 'speculate',
                                      'adapt_cov'))
        self._slice = jax.jit(self._slice_impl, static_argnames=(
            'slice_steps', 'max_expand', 'max_shrink', 'own_moments'))
        self._slice_live = jax.jit(self._slice_from_live_impl,
                                   static_argnames=(
                                       'num_chains', 'slice_steps',
                                       'max_expand', 'max_shrink',
                                       'adapt_cov'))
        self._slice_gens = jax.jit(self._slice_pool_generations_impl,
                                   static_argnames=(
                                       'num_chains', 'slice_steps',
                                       'max_gens', 'max_expand',
                                       'max_shrink', 'speculate',
                                       'adapt_cov'))
        self._fusable = None  # resolved lazily (import cycle + cheap check)
        self._live_split_fn = None  # lazily-jitted host red-black split
        self._rejection_prior = None  # built lazily (needs a prior sampler)
        self._rejection_flow = jax.jit(self._rejection_flow_impl,
                                       static_argnames=('num_trials',
                                                        'use_usample'))
        self._rejection_flow_live = jax.jit(
            self._rejection_flow_live_impl,
            static_argnames=('num_trials', 'use_usample'))
        self._rejection_flow_gens = jax.jit(
            self._rejection_flow_generations_impl,
            static_argnames=('num_trials', 'max_gens', 'use_usample',
                             'adapt_trials', 'can_double', 'can_halve'))
        self._density = jax.jit(self._density_impl,
                                static_argnames=('num_trials',))
        self._envelope = jax.jit(self._envelope_impl)
        self._stretch = jax.jit(self._stretch_impl,
                                static_argnames=('mcmc_steps',
                                                 'constrained', 'moves'))

    def _hot_inverse(self, params):
        """Loop-invariant-hoisted flow inverse for use inside scan bodies.

        For single-speed spline flows this packs the chain params once
        (inverting the 1x1-conv matrices, folding constant logdets) and uses
        the gather-free inverse body — both essential on TPU: a
        ``jnp.linalg.solve`` or ``take_along_axis`` on the scan's carried
        dependency chain costs ~70x the whole step (see ops/fused_spline.py
        and bijectors/rqs.py docstrings)."""
        if self._fusable is None:
            from nnest_tpu.ops import fused_spline
            self._fusable = (fused_spline.is_fusable_spline(self.model),
                             fused_spline)
        fusable, fused_spline = self._fusable
        if fusable:
            consts = fused_spline.pack_inverse_consts(self.model, params)
            return lambda z: fused_spline._inverse_body(
                z, consts, self.model)
        return lambda z: self.model.inverse(params, z)

    # ------------------------------------------------------------- MCMC ---

    def mcmc(self, params, key, init_z, init_logl, init_derived,
             init_logl_prior, *, loglstar=None, step_size, mcmc_steps,
             dynamic_step_size=False, prior_volume_steps=1,
             collect_chains=True, stat_moments=None, cov_from=None,
             cov_mask=None):
        """Vectorized multi-chain latent Metropolis.

        Two modes as in the reference: hard-likelihood-constraint (nested
        sampling; accept on prior+Jacobian ratio then require
        logl > loglstar, ``sampler.py:299-370``) and full
        Metropolis-Hastings (ratio = ΔlogdetJ + Δlogl + Δlogprior,
        ``sampler.py:372-416``).

        With ``collect_chains=True`` returns chains stacked
        (num_chains, mcmc_steps+1, ...) plus scalar counters. With
        ``collect_chains=False`` only the *final* state per chain plus a
        per-chain ``moved`` flag and summary statistics are returned — this
        is what nested sampling consumes (the chain endpoint,
        ``nested.py:429-439``) and it keeps the device→host transfer per
        kernel call tiny (critical over a remote-TPU link). The full
        trajectories still exist *on device* for the duration of the
        program, so ESS / acceptance / jump statistics are computed there
        over ALL chains (matching the reference's full-chain stats,
        ``sampler.py:474-492``) and only the per-dim ESS vector crosses the
        link.

        ``stat_moments``: optional (mean, var) arrays of shape (dim,) used
        to normalize the ESS autocorrelation — nested sampling passes
        live-point moments (reference ``sampler.py:481-483``); default is
        the chains' own moments.

        ``cov_from``: optional (n_live, dim) f32 live set enabling the
        covariance-PRECONDITIONED proposal dz ~ N(0, scale^2 * C_live)
        with C_live the live set's latent covariance
        (``_latent_cov_chol`` — the Metropolis analogue of
        ``slice_adapt='cov'``). Subsumes the reference's isotropic
        proposal (``sampler.py:307-316``): C -> I recovers it exactly.
        Exactness: the proposal stays Gaussian and symmetric for any
        FIXED covariance (q(z'|z) = q(z|z')), and with the red-black
        ``cov_mask`` (live rows the chain starts were NOT drawn from;
        required for exactness — see ``_latent_cov_chol`` for the
        measured full-set bias) C is independent of the chain state, so
        the accept rule and the invariant distribution are exact. On curved
        degeneracies the globally-whitening flow leaves the within-shell
        latent cloud anisotropic (20-D Rosenbrock: the non-axis-aligned
        ridge direction never decorrelated under isotropic proposals at
        ANY step count, BENCHMARKS.md round 4); preconditioning gives
        each proposal the live set's 1-sigma extent per eigendirection.
        """
        constrained = loglstar is not None
        ll_star = np.float32(loglstar if constrained else LOG_NEG)
        dim = init_z.shape[-1]
        if stat_moments is None:
            mu = np.zeros((dim,), np.float32)
            var = np.ones((dim,), np.float32)
            own_moments = True
        else:
            mu = np.asarray(stat_moments[0], np.float32)
            var = np.asarray(stat_moments[1], np.float32)
            own_moments = False
        return self._mcmc(params, key, init_z, init_logl, init_derived,
                          init_logl_prior, ll_star,
                          np.float32(step_size), mu, var,
                          None if cov_from is None
                          else np.asarray(cov_from, np.float32),
                          None if cov_mask is None
                          else np.asarray(cov_mask, bool),
                          mcmc_steps=mcmc_steps,
                          constrained=constrained,
                          dynamic_step_size=dynamic_step_size,
                          prior_volume_steps=prior_volume_steps,
                          collect_chains=collect_chains,
                          own_moments=own_moments)

    def _mcmc_impl(self, params, key, z0, logl0, derived0, logl_prior0,
                   loglstar, step_size, stat_mu, stat_var, cov_from=None,
                   cov_mask=None, *, mcmc_steps, constrained,
                   dynamic_step_size, prior_volume_steps,
                   collect_chains=True, own_moments=True):
        like_fn, prior_fn = self.like_fn, self.prior_fn
        num_chains = z0.shape[0]
        logl0 = sanitize_log_density(logl0)
        logl_prior0 = sanitize_log_density(logl_prior0)
        # Hoist params-only preprocessing (1x1-conv inversion etc.) out of
        # the scan: inverse() below closes over packed constants.
        inverse = self._hot_inverse(params)
        x0, ldj0 = inverse(z0)
        # Covariance preconditioning (fixed per kernel invocation, and —
        # via the red-black cov_mask — estimated from live points the
        # chain starts were NOT drawn from, so the Gaussian proposal is
        # symmetric AND its covariance is independent of the chain state:
        # the invariant distribution is exact (see _latent_cov_chol for
        # the measured full-set bias this prevents).
        cov_chol = (None if cov_from is None
                    else self._latent_cov_chol(
                        params, cov_from, mask=cov_mask,
                        n_masked=None if cov_mask is None
                        else cov_from.shape[0] - cov_from.shape[0] // 2))

        def propose(z, scale, k):
            kdz, kfast = jax.random.split(k)
            dz = jax.random.normal(kdz, z.shape)
            if cov_chol is not None:
                # Exact matmul: proposal values feed the accepted chain
                # state, and TPU matmuls bf16-truncate f32 inputs on the
                # MXU by default — HIGHEST keeps fused/unfused/mesh
                # routes bit-identical.
                dz = jnp.matmul(dz, cov_chol.T,
                                precision=jax.lax.Precision.HIGHEST)
            dz = dz * scale
            fast = jnp.logical_and(
                self.num_slow > 0,
                jax.random.uniform(kfast) < self.oversample_rate)
            dz = jnp.where(fast, dz * self._fast_mask, dz)
            return z + dz, fast

        def step(carry, k):
            (z, x, ldj, logl, logl_prior, derived, scale, acc_ctr,
             rej_ctr, ncall, fast_calls) = carry

            if constrained:
                # Inner loop: find a move passing prior+Jacobian
                # (prior_volume_steps proposals, reference
                # sampler.py:307-343), then one likelihood check.
                def inner(i, state):
                    z_pr, x_pr, ldj_pr, any_mask, fast_last, kk = state
                    kk, kp, ku = jax.random.split(kk, 3)
                    z_prop, fast = propose(z, scale, kp)
                    x_prop, ldj_prop = inverse(z_prop)
                    log_ratio = ldj_prop - ldj
                    lp_prior = prior_fn(x_prop)
                    m = jnp.logical_and(_accept_mask(ku, log_ratio),
                                        lp_prior > -1e30)
                    mcol = m[:, None]
                    return (jnp.where(mcol, z_prop, z_pr),
                            jnp.where(mcol, x_prop, x_pr),
                            jnp.where(m, ldj_prop, ldj_pr),
                            jnp.logical_or(any_mask, m), fast, kk)

                k, kin = jax.random.split(k)
                init = (z, x, ldj, jnp.zeros(num_chains, bool),
                        jnp.asarray(False), kin)
                z_pr, x_pr, ldj_pr, mask1, fast, _ = jax.lax.fori_loop(
                    0, prior_volume_steps, inner, init)

                logl_prop, derived_prop = like_fn(x_pr)
                lp_prior_pr = prior_fn(x_pr)
                n_evals = jnp.sum(mask1.astype(jnp.int32))
                ncall = ncall + n_evals
                fast_calls = fast_calls + jnp.where(fast, n_evals, 0)
                accept = jnp.logical_and(
                    mask1, jnp.logical_and(jnp.isfinite(logl_prop),
                                           logl_prop > loglstar))
                z_new, x_new, ldj_new = z_pr, x_pr, ldj_pr
                lp_prior_new = lp_prior_pr
            else:
                # Full MH ratio (reference sampler.py:372-416).
                k, kp, ku = jax.random.split(k, 3)
                z_new, fast = propose(z, scale, kp)
                x_new, ldj_new = inverse(z_new)
                logl_prop, derived_prop = like_fn(x_new)
                lp_prior_new = prior_fn(x_new)
                log_ratio = (ldj_new - ldj) + (logl_prop - logl) \
                    + (lp_prior_new - logl_prior)
                accept = _accept_mask(ku, log_ratio)
                ncall = ncall + num_chains
                fast_calls = fast_calls + jnp.where(fast, num_chains, 0)

            acol = accept[:, None]
            x_old = x
            z = jnp.where(acol, z_new, z)
            x = jnp.where(acol, x_new, x)
            ldj = jnp.where(accept, ldj_new, ldj)
            logl = jnp.where(accept, logl_prop, logl)
            logl_prior = jnp.where(accept, lp_prior_new, logl_prior)
            derived = jnp.where(acol, derived_prop, derived)

            n_acc = jnp.sum(accept.astype(jnp.int32))
            if dynamic_step_size:
                # Adapt toward 50% acceptance (reference sampler.py:422-431).
                win = 2 * n_acc > num_chains
                acc_ctr = acc_ctr + jnp.where(win, 1, 0)
                rej_ctr = rej_ctr + jnp.where(win, 0, 1)
                scale = jnp.where(
                    acc_ctr > rej_ctr,
                    scale * jnp.exp(1.0 / (1.0 + acc_ctr)), scale)
                scale = jnp.where(
                    acc_ctr < rej_ctr,
                    scale / jnp.exp(1.0 / (1.0 + rej_ctr)), scale)

            new_carry = (z, x, ldj, logl, logl_prior, derived, scale,
                         acc_ctr, rej_ctr, ncall, fast_calls)
            if collect_chains:
                out = (x, z, logl, derived, n_acc)
            else:
                jump = jnp.sum(jnp.where(
                    accept, jnp.linalg.norm(x_new - x_old, axis=-1), 0.0))
                # Full per-step states stay on device for endpoint-mode
                # statistics; they are never transferred to host.
                out = (n_acc, accept, jump, x)
            return new_carry, out

        keys = jax.random.split(key, mcmc_steps)
        carry0 = (z0, x0, ldj0, logl0, logl_prior0, derived0,
                  step_size, jnp.float32(0.0), jnp.float32(0.0),
                  jnp.int32(0), jnp.int32(0))
        carry, outs = jax.lax.scan(step, carry0, keys)

        common = {
            'scale': carry[6],
            'ncall': carry[9],
            'fast_calls': carry[10],
        }

        if not collect_chains:
            n_accs, accepts, jumps, xs_all = outs
            total_acc = jnp.sum(n_accs)
            moved = jnp.any(accepts, axis=0)
            # (chains, steps+1, dim), device-resident only.
            chains = jnp.swapaxes(jnp.concatenate(
                [x0[None], xs_all], axis=0), 0, 1)
            if own_moments:
                stat_mu = jnp.mean(chains, axis=(0, 1))
                stat_var = jnp.var(chains, axis=(0, 1))
            ess = ess_device(chains, stat_mu, stat_var)
            mix_cov, mix_msd = mix_moments_device(carry[0], z0)
            return dict(common, **{
                'final_x': carry[1],
                'final_z': carry[0],
                'final_logl': carry[3],
                'final_derived': carry[5],
                'moved': moved,
                'mean_jump': jnp.sum(jumps) / jnp.maximum(total_acc, 1),
                'mix_ratio': mix_ratio_device(carry[0], z0),
                'mix_cov': mix_cov,
                'mix_msd': mix_msd,
                'diag_chains': chains[:_N_DIAG],
                'ess': ess,
                'acceptance': total_acc / jnp.float32(
                    mcmc_steps * z0.shape[0]),
                'accepted': total_acc,
                'rejected': mcmc_steps * z0.shape[0] - total_acc,
            })

        xs, zs, logls, deriveds, n_accs = outs

        # Prepend the initial state so chain length is steps+1, then move the
        # chain axis first: (chains, steps+1, dim).
        def stack(first, seq):
            return jnp.swapaxes(
                jnp.concatenate([first[None], seq], axis=0), 0, 1)

        total_acc = jnp.sum(n_accs)
        return dict(common, **{
            'samples': stack(x0, xs),
            'latent': stack(z0, zs),
            'loglikes': stack(logl0, logls),
            'derived': stack(derived0, deriveds),
            'accepted': total_acc,
            'rejected': mcmc_steps * z0.shape[0] - total_acc,
        })

    def mcmc_from_live(self, params, key_idx, key_chain, active_u,
                       active_logl, active_derived, *, num_chains,
                       loglstar, step_size, mcmc_steps,
                       dynamic_step_size=False, prior_volume_steps=1,
                       adapt_cov=False):
        """Constrained endpoint-only Metropolis launched FROM the live set
        in one dispatch: chain-start index draw, gather-free live-point
        selection, forward/inverse numerical re-projection
        (reference ``sampler.py:262-289``) and the chain scan are a single
        device program. Replaces the host-side randint → index → project →
        kernel sequence (3 dispatches + 2 pulls per pool generation over
        the remote-TPU link). Consumes the same two keys in the same roles
        as the unfused path, and one-hot selection of f32 rows is exact,
        so the chain trajectories are bit-identical to the unfused path —
        the mesh-sharded route still uses that path, and mesh vs no-mesh
        evidence equality holds. ``adapt_cov`` enables the covariance-
        preconditioned proposal (see ``mcmc``), with the covariance
        computed from the SAME live set the chains start from.
        """
        return self._mcmc_live(
            params, key_idx, key_chain,
            np.asarray(active_u, np.float32),
            np.asarray(active_logl, np.float32),
            np.asarray(active_derived, np.float32),
            np.float32(loglstar), np.float32(step_size),
            num_chains=num_chains, mcmc_steps=mcmc_steps,
            dynamic_step_size=dynamic_step_size,
            prior_volume_steps=prior_volume_steps, adapt_cov=adapt_cov)

    def _latent_cov_chol(self, params, live_u, mask=None, n_masked=None):
        """Cholesky factor of the live set's LATENT covariance.

        The flow whitens globally, but the within-shell latent cloud can
        stay strongly anisotropic on curved degeneracies (measured: 20-D
        Rosenbrock live sets reach condition numbers >> 1 in z,
        BENCHMARKS.md) — the regime where isotropic slice directions
        under-mix and the evidence error bar under-covers. Drawing
        directions ``d = L @ n_hat`` (PolyChord's per-iteration whitening,
        Handley et al. 2015 §3.2, applied in latent space) gives each
        slice move the live set's 1-sigma extent along its direction, so
        ``width=1.0`` brackets stay well-scaled in every direction.

        Exactness REQUIRES the red-black split (``mask``): the kernel
        parameter must be independent of the chains' own states. A
        covariance estimated from the FULL live set includes the chain
        starts, so the proposal law correlates with the state it proposes
        from — the adaptive-MCMC pitfall (the same reason emcee's stretch
        move uses complementary ensemble halves, Goodman & Weare 2010,
        and the mechanism behind dynesty's documented high-D rwalk bias).
        Measured on v5e (BENCHMARKS.md round 5): full-set cov Metropolis
        biases the 50-D Gaussian evidence +0.35 nats (7 sigma; +0.67 at
        hidden_dim=16) while the isotropic control is unbiased (+0.09,
        0.9 sigma). With ``mask`` the covariance uses only the live
        points the starts were NOT drawn from (``_live_starts`` red-black
        halves), restoring independence: conditioned on the mask half,
        each chain's start is still uniform in the shell and its kernel
        parameter is a constant, so the invariant distribution is exact.

        ``n_masked``: static row count of the mask (python int) so the
        normalization stays shape-static. A tiny relative jitter keeps
        the factorization PSD; a NaN factor (degenerate live set) falls
        back to the diagonal scales."""
        z, _ = self.model.forward(params, live_u)
        if mask is None:
            n = np.float32(z.shape[0])
            mean = jnp.mean(z, axis=0, keepdims=True)
            zc = z - mean
        else:
            n = np.float32(n_masked)
            w = mask.astype(z.dtype)[:, None]
            mean = jnp.sum(z * w, axis=0, keepdims=True) / n
            zc = (z - mean) * w
        cov = jnp.matmul(zc.T, zc,
                         precision=jax.lax.Precision.HIGHEST) / n
        dim = cov.shape[0]
        eps = 1e-6 * (jnp.trace(cov) / dim + 1e-12)
        cov = cov + eps * jnp.eye(dim, dtype=cov.dtype)
        chol = jnp.linalg.cholesky(cov)
        fallback = jnp.diag(jnp.sqrt(jnp.maximum(jnp.diag(cov), 1e-12)))
        return jnp.where(jnp.any(jnp.isnan(chol)), fallback, chol)

    @staticmethod
    def _red_black_split(key, n_live):
        """Random half split of the live set for red-black covariance
        adaptation: (start-half indices (n_live//2,), complement mask
        (n_live,) bool). A random permutation assigns each live point to
        the start half with probability nA/n_live, so starts drawn
        uniformly from the half are uniform over the whole live set
        marginally; the complement carries the covariance estimate,
        independent of every start (see ``_latent_cov_chol``). The
        permutation/gathers run once per kernel invocation, outside the
        chain scan (the no-gather rule is about the scan's carried
        critical path)."""
        perm = jax.random.permutation(key, n_live)
        idx_a = perm[: n_live // 2]
        mask_a = jnp.zeros((n_live,), bool).at[idx_a].set(True)
        return idx_a, jnp.logical_not(mask_a)

    def live_split(self, key, n_live, num_chains):
        """Host-facing red-black start/covariance split for the mesh
        route: (start indices (num_chains,), covariance mask (n_live,)
        bool). Computed with exactly the ops and key roles the fused
        kernels use internally (``_live_starts(red_black=True)``), so the
        explicitly-sharded route draws bit-identical start indices and
        covariance halves from the same ``Sampler._next_key`` key."""
        if self._live_split_fn is None:
            def impl(key, *, n_live, num_chains):
                key_half, key_sel = jax.random.split(key)
                idx_a, cov_mask = self._red_black_split(key_half, n_live)
                idx = idx_a[jax.random.randint(
                    key_sel, (num_chains,), 0, n_live // 2)]
                return idx, cov_mask
            self._live_split_fn = jax.jit(
                impl, static_argnames=('n_live', 'num_chains'))
        return self._live_split_fn(key, n_live=n_live,
                                   num_chains=num_chains)

    def _live_starts(self, params, key_idx, active_u, active_logl,
                     active_derived, num_chains, red_black=False):
        """Chain starts drawn uniformly from the live set, on device.

        Gather-free row selection (TPU rule: no dynamic row gathers).
        Elementwise masked where + sum, NOT a matmul: TPU matmuls
        truncate f32 inputs to bf16 on the MXU by default, which would
        round the selected live points / loglikes; masked-sum on the
        VPU picks rows bit-exactly (999 exact zeros + the row). The
        where (rather than onehot-multiply) keeps non-selected rows out
        of the arithmetic entirely: live loglikes can be -inf in f32
        (host clamps failed likelihoods to -1e100, which overflows
        float32), and 0*inf = NaN would poison EVERY chain's start
        state instead of only the chain that picked that row as in the
        unfused host-indexing route (sanitize at kernel entry then
        maps the picked -inf to LOG_NEG identically on both routes).

        ``red_black=True`` (covariance-adapted kernels): ``key_idx``
        splits into (half key, selection key); starts are drawn from a
        random HALF of the live set and the complement mask is returned
        for the covariance estimate — removing the kernel-parameter /
        chain-state correlation that measurably biases full-set
        adaptation (+0.35 nats at 50-D, see ``_latent_cov_chol``).

        Returns (z0, logl0, derived0, lp_prior0, mu, var, cov_mask);
        ``cov_mask`` is None unless red_black."""
        n_live = active_u.shape[0]
        cov_mask = None
        if red_black:
            key_half, key_sel = jax.random.split(key_idx)
            idx_a, cov_mask = self._red_black_split(key_half, n_live)
            idx = idx_a[jax.random.randint(key_sel, (num_chains,), 0,
                                           n_live // 2)]
        else:
            idx = jax.random.randint(key_idx, (num_chains,), 0, n_live)
        iota = jax.lax.broadcasted_iota(jnp.int32, (num_chains, n_live), 1)
        mask = iota == idx[:, None]
        x0 = jnp.sum(jnp.where(mask[:, :, None], active_u[None, :, :], 0.0),
                     axis=1)
        logl0 = jnp.sum(jnp.where(mask, active_logl[None, :], 0.0), axis=1)
        derived0 = jnp.sum(jnp.where(mask[:, :, None],
                                     active_derived[None, :, :], 0.0),
                           axis=1)
        z0, _ = self.model.forward(params, x0)
        x0p, _ = self.model.inverse(params, z0)
        lp_prior0 = self.prior_fn(x0p)
        # live-point moments normalize the diagnostic ESS only
        # (reference sampler.py:481-483); they never touch the chains
        mu = jnp.mean(active_u, axis=0)
        var = jnp.var(active_u, axis=0)
        return z0, logl0, derived0, lp_prior0, mu, var, cov_mask

    def _mcmc_from_live_impl(self, params, key_idx, key_chain, active_u,
                             active_logl, active_derived, loglstar,
                             step_size, *, num_chains, mcmc_steps,
                             dynamic_step_size, prior_volume_steps,
                             adapt_cov=False):
        (z0, logl0, derived0, lp_prior0, mu, var,
         cov_mask) = self._live_starts(
            params, key_idx, active_u, active_logl, active_derived,
            num_chains, red_black=adapt_cov)
        return self._mcmc_impl(
            params, key_chain, z0, logl0, derived0, lp_prior0, loglstar,
            step_size, mu, var, active_u if adapt_cov else None,
            cov_mask=cov_mask,
            mcmc_steps=mcmc_steps, constrained=True,
            dynamic_step_size=dynamic_step_size,
            prior_volume_steps=prior_volume_steps, collect_chains=False,
            own_moments=False)

    def _consume_pool(self, au, al, ad, it, accept_flags, cand_logl,
                      cand_x, cand_derived, update_interval=None):
        """On-device replay of the host's pool-consumption state machine
        (one scan step per candidate; reference ``nested.py:375-385,
        429-439``): candidates compared in order against the *current*
        worst live point; an accept replaces it (one-hot masked-where —
        TPU rules: no row scatter, no onehot*x with possible ±inf) and
        advances the iteration counter. Candidates with
        ``accept_flags=False`` never enter the host pool, so they are
        no-ops here exactly as there. With ``update_interval`` set, also
        reports whether any accept landed on a retrain boundary
        (``it % update_interval == 0``, reference ``nested.py:311-314``).

        Returns (au, al, ad, it, crossed)."""
        live_iota = jax.lax.iota(jnp.int32, au.shape[0])

        def consume_one(carry, cand):
            au, al, ad, it, crossed = carry
            flag_i, logl_i, x_i, d_i = cand
            loglstar = jnp.min(al)
            acc = jnp.logical_and(flag_i, logl_i > loglstar)
            sel = jnp.logical_and(acc, live_iota == jnp.argmin(al))
            au = jnp.where(sel[:, None], x_i[None, :], au)
            al = jnp.where(sel, logl_i, al)
            ad = jnp.where(sel[:, None], d_i[None, :], ad)
            it = it + acc.astype(jnp.int32)
            if update_interval is not None:
                crossed = jnp.logical_or(crossed, jnp.logical_and(
                    acc, it % update_interval == 0))
            return (au, al, ad, it, crossed), None

        (au, al, ad, it, crossed), _ = jax.lax.scan(
            consume_one, (au, al, ad, it, jnp.asarray(False)),
            (accept_flags, cand_logl, cand_x, cand_derived))
        return au, al, ad, it, crossed

    def mcmc_pool_generations(self, params, key, active_u, active_logl,
                              active_derived, it, step_size,
                              update_interval, max_iters, *, num_chains,
                              mcmc_steps, max_gens, dynamic_step_size=False,
                              prior_volume_steps=1, speculate=False,
                              adapt_cov=False):
        """Run up to ``max_gens`` MCMC pool generations in ONE dispatch.

        The nested sampler's MCMC phase is dispatch-count bound on the
        remote-TPU link (55 generations x ~110 ms at 10-D, most of it
        round-trip latency): each generation's chains start from the
        *current* live set, so the host had to consume every pool before
        dispatching the next one. This kernel moves that consumption on
        device: after each generation it replays the host's exact pool
        state machine (argmin-worst selection, ``logl > loglstar`` accept,
        one-hot replacement — reference ``nested.py:375-385, 429-439``) so
        the next generation can launch from the evolved live set without a
        link round-trip. The host then replays the identical consumption
        in float64 for evidence accumulation, serving generations from the
        returned buffers — results are bit-identical to the one-dispatch-
        per-generation route whenever every live loglike is exactly
        f32-representable (the caller gates on that): the f32 cast is
        monotonic so ``min``/``argmin``/compares agree, candidate values
        are f32 by construction, and the key split sequence matches
        ``Sampler._next_key`` (two splits per generation, same order).

        The device stops early (before *starting* another generation) when
        consumption crosses an ``update_interval`` iteration boundary —
        the host may retrain the flow there (``nested.py:300-320``), and
        any later generation must see the new params. ``max_iters`` is
        deliberately NOT a device stop rule (pure host-side terminator:
        stopping on it would change the key stream, and a run killed by
        max_iters must checkpoint identically to a crash there).
        Generations the host never consumes (dlogz
        termination mid-buffer) are discarded: their likelihood calls are
        never added to ``total_calls``, matching the unfused accounting.

        Returns (buffers, meta, n_gens, key_out) where ``buffers`` stacks
        each generation's endpoint outputs along a leading ``max_gens``
        axis, ``meta`` records each generation's start (loglstar, it) for
        host-side lockstep assertions, and ``key_out`` is the PRNG key
        advanced past the ``n_gens`` generations actually run.
        """
        return self._mcmc_gens(
            params, key,
            np.asarray(active_u, np.float32),
            np.asarray(active_logl, np.float32),
            np.asarray(active_derived, np.float32),
            np.int32(it), np.float32(step_size),
            np.int32(update_interval), np.int32(max_iters),
            num_chains=num_chains, mcmc_steps=mcmc_steps,
            max_gens=max_gens, dynamic_step_size=dynamic_step_size,
            prior_volume_steps=prior_volume_steps, speculate=speculate,
            adapt_cov=adapt_cov)

    def _mcmc_pool_generations_impl(self, params, key, active_u,
                                    active_logl, active_derived, it0,
                                    step_size, update_interval, max_iters,
                                    *, num_chains, mcmc_steps, max_gens,
                                    dynamic_step_size, prior_volume_steps,
                                    speculate=False, adapt_cov=False):
        del max_iters  # pure host-side terminator, see _pool_generations
        def core(key_idx, key_chain, au, al, ad, loglstar):
            # With adapt_cov the proposal covariance is recomputed per
            # generation from the EVOLVING device live set — exactly the
            # live set the one-dispatch-per-generation route would pass.
            return self._mcmc_from_live_impl(
                params, key_idx, key_chain, au, al, ad, loglstar,
                step_size, num_chains=num_chains, mcmc_steps=mcmc_steps,
                dynamic_step_size=dynamic_step_size,
                prior_volume_steps=prior_volume_steps,
                adapt_cov=adapt_cov)

        return self._pool_generations(
            core, key, active_u, active_logl, active_derived, it0,
            update_interval, max_gens, speculate=speculate)

    def _pool_generations(self, core, key, active_u, active_logl,
                          active_derived, it0, update_interval, max_gens,
                          speculate=False):
        """Shared endpoint-kernel pool-generation driver: run ``core``
        (an endpoint-only constrained kernel launched from the live set,
        consuming two keys per generation in ``Sampler._next_key`` order)
        up to ``max_gens`` times in one program, replaying the host's pool
        consumption on device between generations (``_consume_pool``).

        ``speculate=True`` removes the update_interval stop rule: the
        device keeps generating past retrain boundaries with the CURRENT
        params, speculating that the host's NLL-gated retrain check
        (``nested.run(retrain_nll_threshold=...)``) will decide not to
        retrain — the warm-run common case. To keep the key stream exact
        when the speculation loses, ``meta['key_before']`` records each
        generation's key value BEFORE its two splits: the host discards
        the not-yet-started generations and rewinds its key to the first
        discarded one, so the regeneration under the new params consumes
        exactly the keys the one-dispatch-per-generation route would
        have."""
        out_sd = jax.eval_shape(core, key, key, active_u, active_logl,
                                active_derived, jnp.float32(0.0))
        bufs0 = jax.tree.map(
            lambda s: jnp.zeros((max_gens,) + tuple(s.shape), s.dtype),
            out_sd)
        kd0 = jax.random.key_data(key)
        meta0 = {'start_loglstar': jnp.zeros((max_gens,), jnp.float32),
                 'start_it': jnp.zeros((max_gens,), jnp.int32)}
        if speculate:
            meta0['key_before'] = jnp.zeros(
                (max_gens,) + tuple(kd0.shape), kd0.dtype)

        def cond(state):
            _, _, _, _, _, gen, stop, _, _ = state
            return jnp.logical_and(gen < max_gens, jnp.logical_not(stop))

        def body(state):
            key, au, al, ad, it, gen, stop, bufs, meta = state
            key_before = jax.random.key_data(key)
            key, key_idx = tuple(jax.random.split(key))
            key, key_chain = tuple(jax.random.split(key))
            loglstar = jnp.min(al)
            out = core(key_idx, key_chain, au, al, ad, loglstar)
            au, al, ad, it2, crossed = self._consume_pool(
                au, al, ad, it, out['moved'], out['final_logl'],
                out['final_x'], out['final_derived'],
                update_interval=update_interval)
            bufs = jax.tree.map(
                lambda b, v: jax.lax.dynamic_update_index_in_dim(
                    b, v, gen, 0), bufs, out)
            meta = dict(
                meta,
                start_loglstar=jax.lax.dynamic_update_index_in_dim(
                    meta['start_loglstar'], loglstar, gen, 0),
                start_it=jax.lax.dynamic_update_index_in_dim(
                    meta['start_it'], it, gen, 0))
            if speculate:
                meta['key_before'] = jax.lax.dynamic_update_index_in_dim(
                    meta['key_before'], key_before, gen, 0)
            # NOTE: max_iters is deliberately NOT a stop rule: it is a
            # pure host-side loop terminator. Generations past it are
            # discarded unconsumed, so stopping on it would only change
            # the key stream — a run killed by max_iters must leave the
            # same checkpoint state as a crash at that iteration.
            stop = (jnp.asarray(False) if speculate else crossed)
            return (key, au, al, ad, it2, gen + jnp.int32(1), stop, bufs,
                    meta)

        state0 = (key, active_u, active_logl, active_derived, it0,
                  jnp.int32(0), jnp.asarray(False), bufs0, meta0)
        (key_out, _, _, _, _, n_gens, _, bufs,
         meta) = jax.lax.while_loop(cond, body, state0)
        return bufs, meta, n_gens, key_out

    # ------------------------------------------------------------ slice ---

    def slice_(self, params, key, init_z, init_logl, init_derived, *,
               loglstar, width, slice_steps, max_expand=4, max_shrink=10,
               stat_moments=None, cov_from=None, cov_mask=None):
        """Vectorized constrained latent-space SLICE sampling (Neal 2003).

        A capability the reference lacks: its only within-shell kernel is
        fixed-scale latent Metropolis (``sampler.py:291-370``), which
        under-mixes on curved degenerate targets (measured: 20-D Rosenbrock
        needs >=20*d Metropolis steps and still shows 3-4x the analytic
        seed scatter, BENCHMARKS.md). Slice sampling adapts its step length
        per move via stepping-out/shrinkage, so one slice step decorrelates
        along its direction regardless of the local scale — the same reason
        PolyChord (Handley et al. 2015) replaced Metropolis with slice
        moves inside nested sampling.

        Target: the flow-pushforward prior restricted to the hard
        likelihood shell, f(z) = |J(z)| * 1[prior ok] * 1[logl > loglstar]
        — identical invariant distribution to the constrained Metropolis
        kernel, so the two are interchangeable inside nested sampling.

        Per chain and per slice step (all chains batched, whole trajectory
        one ``lax.scan`` — TPU rules: finite sentinels, no gathers, masked
        lanes instead of data-dependent trip counts):

        1. random isotropic latent direction d;
        2. log slice height logy = logdetJ(z) + log U, U ~ (0,1] (drawn as
           ``log1p(-uniform)`` — no -inf lanes in the kernel);
        3. stepping-out (Neal fig. 3): interval [L, R] of width ``width``
           randomly positioned around t=0, expansion budget ``max_expand``
           randomly apportioned between the ends, each end pushed out in
           ``width`` steps while it remains inside the slice — fixed
           ``max_expand`` iterations with masked lanes (one batched
           inverse+likelihood per iteration for both ends stacked);
        4. shrinkage (Neal fig. 5): proposals t ~ U(L, R); an
           out-of-slice proposal shrinks the bracket toward t=0, an
           in-slice one is accepted. Shrinkage runs TO ACCEPTANCE: the
           bracket always contains t=0 and halves per rejection, so it
           collapses onto the current point, which the ``>=`` height
           test accepts (Neal's shrinkage limit) — a while_loop exits as
           soon as every lane accepted (common case: within a few
           iterations, FEWER than the old fixed ``max_shrink`` trip
           count) and is safety-bounded at ``max_shrink + 40``
           iterations (f32 bracket collapse needs ~26 halvings). The
           pre-round-5 implementation truncated at ``max_shrink`` and
           left unaccepted lanes in place, a measured ~0.9%-per-lane-
           step stay-put bias on adversarial thin shells; the run-to-
           acceptance form has none (tests/test_slice_stuck_bias.py:
           0 unaccepted lanes at every shrink budget, adversarial and
           end-to-end evidence A/B unchanged).

        ``ncall`` counts likelihood evaluations a sequential implementation
        would pay: lanes whose geometry test (prior box + logdetJ > logy)
        passed and that were still active — the reference's masked-
        evaluation accounting rule (``sampler.py:358-368``) applied to
        slice moves. Returns the same endpoint-only dict as ``mcmc`` with
        ``collect_chains=False`` (chain statistics computed on device).
        """
        dim = init_z.shape[-1]
        if stat_moments is None:
            mu = np.zeros((dim,), np.float32)
            var = np.ones((dim,), np.float32)
            own_moments = True
        else:
            mu = np.asarray(stat_moments[0], np.float32)
            var = np.asarray(stat_moments[1], np.float32)
            own_moments = False
        return self._slice(params, key, init_z, init_logl, init_derived,
                           np.float32(loglstar), np.float32(width), mu,
                           var,
                           None if cov_from is None
                           else np.asarray(cov_from, np.float32),
                           None if cov_mask is None
                           else np.asarray(cov_mask, bool),
                           slice_steps=slice_steps,
                           max_expand=max_expand, max_shrink=max_shrink,
                           own_moments=own_moments)

    def _slice_impl(self, params, key, z0, logl0, derived0, loglstar,
                    width, stat_mu, stat_var, cov_from=None,
                    cov_mask=None, *, slice_steps, max_expand, max_shrink,
                    own_moments):
        like_fn, prior_fn = self.like_fn, self.prior_fn
        num_chains = z0.shape[0]
        logl0 = sanitize_log_density(logl0)
        inverse = self._hot_inverse(params)
        x0, ldj0 = inverse(z0)
        # Covariance-adapted directions (slice_adapt='cov'): d = L @ n_hat
        # carries the live set's scale along its direction, so the t-units
        # bracket of size ``width`` spans width x (1 sigma) everywhere.
        # The red-black cov_mask keeps the direction law independent of
        # the chain starts (see _latent_cov_chol).
        cov_chol = (None if cov_from is None
                    else self._latent_cov_chol(
                        params, cov_from, mask=cov_mask,
                        n_masked=None if cov_mask is None
                        else cov_from.shape[0] - cov_from.shape[0] // 2))

        def in_slice(zc, logy, loglstar):
            """(geom, full, x, ldj, logl, derived): geom = prior box +
            Jacobian height test (no likelihood call needed); full adds
            the hard likelihood constraint."""
            xc, ldjc = inverse(zc)
            lp = prior_fn(xc)
            # >= (not >): the shrinkage bracket always contains t=0 and
            # halves per rejection, so it collapses onto the CURRENT point,
            # whose height test is ldj >= logy = ldj + log1p(-u). With f32
            # rounding log1p(-u) can vanish against a large |ldj|, making
            # the strict test fail at collapse and the lane spin; >= makes
            # collapse a guaranteed accept (the proposal converged to the
            # current in-slice point — Neal's shrinkage limit), which is
            # what eliminates the stuck-lane bias (VERDICT r4 item 5).
            geom = jnp.logical_and(lp > -1e30, ldjc >= logy)
            loglc, derc = like_fn(xc)
            full = jnp.logical_and(geom, loglc > loglstar)
            return geom, full, xc, ldjc, loglc, derc

        def step(carry, k):
            z, x, ldj, logl, derived, ncall = carry
            kd, kh, kv, kj, kshr = jax.random.split(k, 5)
            d = jax.random.normal(kd, z.shape)
            d = d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
            if cov_chol is not None:
                # direction values feed only proposal geometry, but keep
                # the matmul exact so fused/unfused/mesh routes agree
                # bit-for-bit (TPU matmuls bf16-truncate by default)
                d = jnp.matmul(d, cov_chol.T,
                               precision=jax.lax.Precision.HIGHEST)
            # log height: U in (0,1] via log1p(-u) — finite lanes only.
            logy = ldj + jnp.log1p(-jax.random.uniform(kh, (num_chains,)))
            v = jax.random.uniform(kv, (num_chains,))
            left = -width * v
            right = left + width
            jmax = jax.random.randint(kj, (num_chains,), 0, max_expand) \
                if max_expand > 0 else jnp.zeros((num_chains,), jnp.int32)
            kmax = (max_expand - 1) - jmax

            def expand(i, st):
                left, right, done_l, done_r, ncall = st
                # Both endpoints in ONE batched inverse+likelihood: the
                # expansion cost is per-iteration dispatch depth, not lane
                # count.
                zc = jnp.concatenate([z + left[:, None] * d,
                                      z + right[:, None] * d], axis=0)
                geom, full, _, _, _, _ = in_slice(
                    zc, jnp.concatenate([logy, logy]),
                    loglstar)
                geom_l, geom_r = geom[:num_chains], geom[num_chains:]
                in_l, in_r = full[:num_chains], full[num_chains:]
                act_l = jnp.logical_and(~done_l, i < jmax)
                act_r = jnp.logical_and(~done_r, i < kmax)
                ncall = ncall \
                    + jnp.sum(jnp.logical_and(act_l, geom_l)
                              .astype(jnp.int32)) \
                    + jnp.sum(jnp.logical_and(act_r, geom_r)
                              .astype(jnp.int32))
                move_l = jnp.logical_and(act_l, in_l)
                move_r = jnp.logical_and(act_r, in_r)
                left = jnp.where(move_l, left - width, left)
                right = jnp.where(move_r, right + width, right)
                done_l = jnp.logical_or(done_l,
                                        jnp.logical_and(act_l, ~in_l))
                done_r = jnp.logical_or(done_r,
                                        jnp.logical_and(act_r, ~in_r))
                return left, right, done_l, done_r, ncall

            if max_expand > 0:
                falses = jnp.zeros((num_chains,), bool)
                left, right, _, _, ncall = jax.lax.fori_loop(
                    0, max_expand, expand,
                    (left, right, falses, falses, ncall))

            def shrink(st):
                (left, right, acc, z_n, x_n, ldj_n, logl_n, der_n,
                 ncall, kk, i) = st
                kk, kt = jax.random.split(kk)
                t = left + (right - left) * jax.random.uniform(
                    kt, (num_chains,))
                zc = z + t[:, None] * d
                geom, ok, xc, ldjc, loglc, derc = in_slice(
                    zc, logy, loglstar)
                act = ~acc
                ncall = ncall + jnp.sum(
                    jnp.logical_and(act, geom).astype(jnp.int32))
                take = jnp.logical_and(act, ok)
                tcol = take[:, None]
                z_n = jnp.where(tcol, zc, z_n)
                x_n = jnp.where(tcol, xc, x_n)
                ldj_n = jnp.where(take, ldjc, ldj_n)
                logl_n = jnp.where(take, loglc, logl_n)
                der_n = jnp.where(tcol, derc, der_n)
                acc = jnp.logical_or(acc, take)
                shr = jnp.logical_and(act, ~ok)
                left = jnp.where(jnp.logical_and(shr, t < 0), t, left)
                right = jnp.where(jnp.logical_and(shr, t >= 0), t, right)
                return (left, right, acc, z_n, x_n, ldj_n, logl_n, der_n,
                        ncall, kk, i + 1)

            # Shrinkage runs TO ACCEPTANCE (Neal's procedure terminates
            # w.p. 1: the bracket halves per rejection and collapses onto
            # the current point, which the >= height test accepts), with a
            # while_loop that exits as soon as every lane has accepted —
            # identical accept decisions to the old fixed-trip loop for
            # lanes that accept within ``max_shrink`` (inert iterations
            # were no-ops), FEWER device iterations in the common case,
            # and no stay-put truncation bias for the rest. ``hard_cap``
            # is an f32-collapse safety bound (~26 halvings reach ulp),
            # not a statistical truncation.
            hard_cap = max_shrink + 40

            def shrink_cond(st):
                return jnp.logical_and(st[-1] < hard_cap,
                                       jnp.logical_not(jnp.all(st[2])))

            st0 = (left, right, jnp.zeros((num_chains,), bool),
                   z, x, ldj, logl, derived, ncall, kshr, jnp.int32(0))
            (_, _, acc, z_n, x_n, ldj_n, logl_n, der_n, ncall, _,
             _) = jax.lax.while_loop(shrink_cond, shrink, st0)

            n_acc = jnp.sum(acc.astype(jnp.int32))
            jump = jnp.sum(jnp.where(
                acc, jnp.linalg.norm(x_n - x, axis=-1), 0.0))
            new_carry = (z_n, x_n, ldj_n, logl_n, der_n, ncall)
            return new_carry, (n_acc, acc, jump, x_n)

        keys = jax.random.split(key, slice_steps)
        carry0 = (z0, x0, ldj0, logl0, derived0, jnp.int32(0))
        carry, outs = jax.lax.scan(step, carry0, keys)
        n_accs, accepts, jumps, xs_all = outs
        total_acc = jnp.sum(n_accs)
        moved = jnp.any(accepts, axis=0)
        chains = jnp.swapaxes(jnp.concatenate(
            [x0[None], xs_all], axis=0), 0, 1)
        if own_moments:
            stat_mu = jnp.mean(chains, axis=(0, 1))
            stat_var = jnp.var(chains, axis=(0, 1))
        ess = ess_device(chains, stat_mu, stat_var)
        mix_cov, mix_msd = mix_moments_device(carry[0], z0)
        return {
            'scale': jnp.float32(width),
            'ncall': carry[5],
            'fast_calls': jnp.int32(0),
            'final_x': carry[1],
            'final_z': carry[0],
            'final_logl': carry[3],
            'final_derived': carry[4],
            'moved': moved,
            'mean_jump': jnp.sum(jumps) / jnp.maximum(total_acc, 1),
            'mix_ratio': mix_ratio_device(carry[0], z0),
            'mix_cov': mix_cov,
            'mix_msd': mix_msd,
            'diag_chains': chains[:_N_DIAG],
            'ess': ess,
            'acceptance': total_acc / jnp.float32(
                slice_steps * num_chains),
            'accepted': total_acc,
            'rejected': slice_steps * num_chains - total_acc,
        }

    def slice_from_live(self, params, key_idx, key_chain, active_u,
                        active_logl, active_derived, *, num_chains,
                        loglstar, width, slice_steps, max_expand=4,
                        max_shrink=10, adapt_cov=False):
        """Fused slice-sampling pool generation launched FROM the live set
        in one dispatch — the slice analogue of ``mcmc_from_live`` (same
        key roles, same exact one-hot start selection). ``adapt_cov``
        draws directions from the live set's latent covariance
        (``_latent_cov_chol``) instead of the unit sphere."""
        return self._slice_live(
            params, key_idx, key_chain,
            np.asarray(active_u, np.float32),
            np.asarray(active_logl, np.float32),
            np.asarray(active_derived, np.float32),
            np.float32(loglstar), np.float32(width),
            num_chains=num_chains, slice_steps=slice_steps,
            max_expand=max_expand, max_shrink=max_shrink,
            adapt_cov=adapt_cov)

    def _slice_from_live_impl(self, params, key_idx, key_chain, active_u,
                              active_logl, active_derived, loglstar,
                              width, *, num_chains, slice_steps,
                              max_expand, max_shrink, adapt_cov=False):
        z0, logl0, derived0, _lp, mu, var, cov_mask = self._live_starts(
            params, key_idx, active_u, active_logl, active_derived,
            num_chains, red_black=adapt_cov)
        return self._slice_impl(
            params, key_chain, z0, logl0, derived0, loglstar, width, mu,
            var, active_u if adapt_cov else None, cov_mask=cov_mask,
            slice_steps=slice_steps, max_expand=max_expand,
            max_shrink=max_shrink, own_moments=False)

    def slice_pool_generations(self, params, key, active_u, active_logl,
                               active_derived, it, width, update_interval,
                               max_iters, *, num_chains, slice_steps,
                               max_gens, max_expand=4, max_shrink=10,
                               speculate=False, adapt_cov=False):
        """Run up to ``max_gens`` slice pool generations in ONE dispatch —
        the slice analogue of ``mcmc_pool_generations`` (same on-device
        pool-consumption replay, same stop rules, same key discipline; see
        that kernel's docstring for the exactness argument). With
        ``adapt_cov`` the direction covariance is recomputed per
        generation from the EVOLVING device live set — exactly the live
        set the one-dispatch-per-generation route would hand the kernel."""
        return self._slice_gens(
            params, key,
            np.asarray(active_u, np.float32),
            np.asarray(active_logl, np.float32),
            np.asarray(active_derived, np.float32),
            np.int32(it), np.float32(width),
            np.int32(update_interval), np.int32(max_iters),
            num_chains=num_chains, slice_steps=slice_steps,
            max_gens=max_gens, max_expand=max_expand,
            max_shrink=max_shrink, speculate=speculate,
            adapt_cov=adapt_cov)

    def _slice_pool_generations_impl(self, params, key, active_u,
                                     active_logl, active_derived, it0,
                                     width, update_interval, max_iters, *,
                                     num_chains, slice_steps, max_gens,
                                     max_expand, max_shrink,
                                     speculate=False, adapt_cov=False):
        del max_iters  # pure host-side terminator, see _pool_generations
        def core(key_idx, key_chain, au, al, ad, loglstar):
            return self._slice_from_live_impl(
                params, key_idx, key_chain, au, al, ad, loglstar, width,
                num_chains=num_chains, slice_steps=slice_steps,
                max_expand=max_expand, max_shrink=max_shrink,
                adapt_cov=adapt_cov)

        return self._pool_generations(
            core, key, active_u, active_logl, active_derived, it0,
            update_interval, max_gens, speculate=speculate)

    # ----------------------------------------------------- rejection/prior

    def _prior_impls(self, prior):
        """(raw, jitted, jitted_gens) rejection-prior programs for
        ``prior``, built lazily (the prior arrives per call, not at
        construction)."""
        if self._rejection_prior is None or \
                self._rejection_prior[0] is not prior:
            def impl(key, loglstar, *, num_trials):
                x = prior.sample_jax(key, num_trials)
                logl, derived = self.like_fn(x)
                ok = jnp.logical_and(jnp.isfinite(logl), logl > loglstar)
                return x, logl, derived, ok

            def gens_impl(key, active_u, active_logl, active_derived,
                          it0, max_iters, it_stop, window_vals,
                          window_count, expiry_thr, trials_target, *,
                          num_trials, max_gens, adapt_trials, can_double,
                          can_halve):
                # explicit signature: static_argnames cannot bind through
                # a *args/**kw catch-all
                return self._rejection_prior_generations_impl(
                    impl, key, active_u, active_logl, active_derived,
                    it0, max_iters, it_stop, window_vals, window_count,
                    expiry_thr, trials_target, num_trials=num_trials,
                    max_gens=max_gens, adapt_trials=adapt_trials,
                    can_double=can_double, can_halve=can_halve)

            self._rejection_prior = (
                prior,
                jax.jit(impl, static_argnames=('num_trials',)),
                jax.jit(gens_impl, static_argnames=(
                    'num_trials', 'max_gens', 'adapt_trials',
                    'can_double', 'can_halve')))
        return self._rejection_prior

    def rejection_prior(self, prior, key, loglstar, num_trials):
        """Batched brute-force rejection from the prior (reference
        ``sampler.py:529-543``): draw ``num_trials`` prior points, evaluate
        all, return successes and the effective cost
        ncall = trials/successes."""
        return self._prior_impls(prior)[1](key, np.float32(loglstar),
                                           num_trials=num_trials)

    def rejection_prior_generations(self, prior, key, active_u,
                                    active_logl, active_derived, it,
                                    max_iters, it_stop, window_vals,
                                    window_count, expiry_thr,
                                    trials_target, *, num_trials, max_gens,
                                    adapt_trials, can_double, can_halve):
        """Run up to ``max_gens`` prior-rejection pool generations in ONE
        dispatch — the prior-rejection phase analogue of
        ``mcmc_pool_generations`` (same on-device consumption state
        machine, one key split per generation matching
        ``Sampler._next_key``). The device stops *before starting* a
        generation the host's replay might not consume, so the key stream
        stays bit-identical to the one-dispatch-per-generation route:

        - ladder stop (exact, integer): the adaptive trial batch would
          double/halve after this generation (``nested.py`` efficiency
          controller) — the next generation needs a different static
          trial count;
        - volume-switch stop (exact, conservative): ``it`` reached
          ``it_stop``, the host-precomputed iteration two before
          ``expected_vol`` can cross ``volume_switch`` (reference
          ``nested.py:330-334``);
        - expiry proxy stop (conservative by a 10% margin): the f32
          mirror of the host's 20-entry mean-calls window exceeds
          ``expiry_thr`` = 0.9 x the f64 expiry threshold — f32 rounding
          is ~1e-7 relative, so the host's true expiry can never fire
          while the proxy is below threshold (``nested.py:345-348``).

        ``max_iters`` is deliberately NOT a device stop rule (host-only
        terminator; see the mcmc impl note on key-stream invariance).

        ``window_vals``/``window_count`` mirror the host's ``ncs`` window
        as a ring keyed on absolute push index (vals[i % 20]); each
        generation pushes nc = trials/max(n_ok,1) repeated
        min(max(n_ok,1),5) times, exactly as the host extends ``ncs``.

        Returns (buffers, meta, n_gens, key_out)."""
        return self._prior_impls(prior)[2](
            key,
            np.asarray(active_u, np.float32),
            np.asarray(active_logl, np.float32),
            np.asarray(active_derived, np.float32),
            np.int32(it), np.int32(max_iters), np.int32(it_stop),
            np.asarray(window_vals, np.float32), np.int32(window_count),
            np.float32(expiry_thr), np.int32(trials_target),
            num_trials=num_trials, max_gens=max_gens,
            adapt_trials=adapt_trials, can_double=can_double,
            can_halve=can_halve)

    @staticmethod
    def _ladder_window_update(n_ok, nc, wvals, wcount, expiry_thr,
                              trials_target, adapt_trials, can_double,
                              can_halve):
        """Device replica of the host's integer trial ladder + ncs
        efficiency-window push (the pool-consumption block in
        ``samplers/nested.py``): shared by the prior- and flow-rejection
        generation loops so the two prefetch paths cannot silently
        diverge. MUST stay bit-identical to the host logic — any change
        here must be mirrored in nested.py's consume block and vice
        versa. Returns (ladder_or_expiry_stop, wvals, wcount)."""
        # host ladder, replicated in exact integer arithmetic
        ladder = jnp.asarray(False)
        if adapt_trials:
            if can_double:
                ladder = jnp.logical_or(ladder,
                                        n_ok < trials_target // 2)
            if can_halve:
                ladder = jnp.logical_or(ladder,
                                        n_ok > 2 * trials_target)
        # host ncs window mirror: nc pushed min(max(n_ok,1),5) times
        # into a 20-slot ring keyed on absolute push index
        push = jnp.minimum(jnp.maximum(n_ok, 1), 5)
        for j in range(5):
            do = j < push
            wvals = jnp.where(
                do,
                jax.lax.dynamic_update_index_in_dim(
                    wvals, nc, wcount % 20, 0),
                wvals)
            wcount = wcount + do.astype(jnp.int32)
        # conservative f32 proxy of the host's f64 mean-calls expiry
        proxy = jnp.where(wcount > 20, jnp.sum(wvals) / 20.0,
                          jnp.float32(0.0))
        return jnp.logical_or(ladder, proxy > expiry_thr), wvals, wcount

    def _rejection_prior_generations_impl(self, gen_impl, key, active_u,
                                          active_logl, active_derived,
                                          it0, max_iters, it_stop,
                                          window_vals0, window_count0,
                                          expiry_thr, trials_target, *,
                                          num_trials, max_gens,
                                          adapt_trials, can_double,
                                          can_halve):
        # close over num_trials: eval_shape would abstract a kwarg int
        out_sd = jax.eval_shape(
            lambda k, ls: gen_impl(k, ls, num_trials=num_trials),
            key, jnp.float32(0.0))
        names = ('x', 'logl', 'derived', 'ok')
        bufs0 = {n: jnp.zeros((max_gens,) + tuple(s.shape), s.dtype)
                 for n, s in zip(names, out_sd)}
        meta0 = {'start_loglstar': jnp.zeros((max_gens,), jnp.float32),
                 'start_it': jnp.zeros((max_gens,), jnp.int32)}

        def cond(state):
            gen, stop = state[5], state[6]
            return jnp.logical_and(gen < max_gens, jnp.logical_not(stop))

        def body(state):
            (key, au, al, ad, it, gen, stop, wvals, wcount, bufs,
             meta) = state
            key, kgen = tuple(jax.random.split(key))
            loglstar = jnp.min(al)
            x, logl, derived, ok = gen_impl(kgen, loglstar,
                                            num_trials=num_trials)
            au, al, ad, it2, _ = self._consume_pool(
                au, al, ad, it, ok, logl, x, derived)
            bufs = jax.tree.map(
                lambda b, v: jax.lax.dynamic_update_index_in_dim(
                    b, v, gen, 0),
                bufs, {'x': x, 'logl': logl, 'derived': derived, 'ok': ok})
            meta = {
                'start_loglstar': jax.lax.dynamic_update_index_in_dim(
                    meta['start_loglstar'], loglstar, gen, 0),
                'start_it': jax.lax.dynamic_update_index_in_dim(
                    meta['start_it'], it, gen, 0)}
            n_ok = jnp.sum(ok.astype(jnp.int32))
            nc = jnp.where(n_ok > 0,
                           jnp.float32(num_trials)
                           / jnp.maximum(n_ok, 1).astype(jnp.float32),
                           jnp.float32(num_trials))
            ladder_stop, wvals, wcount = self._ladder_window_update(
                n_ok, nc, wvals, wcount, expiry_thr, trials_target,
                adapt_trials, can_double, can_halve)
            # max_iters is a pure host stopper (see mcmc impl note)
            stop = jnp.logical_or(ladder_stop, it2 >= it_stop)
            return (key, au, al, ad, it2, gen + jnp.int32(1), stop,
                    wvals, wcount, bufs, meta)

        state0 = (key, active_u, active_logl, active_derived, it0,
                  jnp.int32(0), jnp.asarray(False), window_vals0,
                  window_count0, bufs0, meta0)
        (key_out, _, _, _, _, n_gens, _, _, _, bufs,
         meta) = jax.lax.while_loop(cond, body, state0)
        return bufs, meta, n_gens, key_out

    # ------------------------------------------------------ rejection/flow

    def _envelope_impl(self, params, live_u, enlargement_factor):
        """Envelope cache for flow rejection sampling (reference
        ``sampler.py:555-560``): max |det dx/dz| over live points (the
        enlargement factor scales the log, as in the reference) and the max
        latent radius."""
        z, ldj = self.model.forward(params, live_u)
        max_log_det_j = enlargement_factor * jnp.max(-ldj)
        max_r = jnp.max(jnp.linalg.norm(z, axis=1))
        return max_log_det_j, max_r

    def envelope(self, params, live_u, enlargement_factor=1.1):
        return self._envelope_impl(params,
                                   np.asarray(live_u, dtype=np.float32),
                                   np.float32(enlargement_factor))

    def rejection_flow(self, params, key, loglstar, max_log_det_j, max_r,
                       enlargement_factor, num_trials):
        """Batched latent rejection sampling with Jacobian envelope
        (reference ``sampler.py:545-607``). Returns per-trial accept flags
        and the count of likelihood evaluations actually incurred (only
        candidates passing prior+Jacobian cost a call)."""
        use_usample = getattr(self.model.base_dist, 'has_usample', False)
        return self._rejection_flow(
            params, key, np.float32(loglstar), np.float32(max_log_det_j),
            np.float32(max_r), np.float32(enlargement_factor),
            num_trials=num_trials, use_usample=use_usample)

    def rejection_flow_live(self, params, key, loglstar, live_u, prev_mld,
                            prev_mr, fold, enlargement_factor,
                            draw_enlargement, num_trials):
        """Fused envelope + latent rejection: recompute the Jacobian
        envelope from the live set, max-fold it into the carried maxima,
        and run the rejection draw — ONE device program instead of the
        two-dispatch envelope→rejection sequence (a full extra link
        round-trip per pool generation). Bit-identical to the unfused
        route: float max is exact, the key role matches (the envelope
        consumes no key), and the rejection body is the same traced
        function. ``fold=False`` replaces the maxima outright (periodic
        recompute / post-retrain invalidation); ``draw_enlargement``
        differs from ``enlargement_factor`` only in constant-efficiency
        mode (reference ``sampler.py:569-575``). Returns the rejection
        outputs plus the updated (max_log_det_j, max_r)."""
        use_usample = getattr(self.model.base_dist, 'has_usample', False)
        return self._rejection_flow_live(
            params, key, np.float32(loglstar),
            np.asarray(live_u, dtype=np.float32), np.float32(prev_mld),
            np.float32(prev_mr), np.bool_(fold),
            np.float32(enlargement_factor), np.float32(draw_enlargement),
            num_trials=num_trials, use_usample=use_usample)

    def _rejection_flow_live_impl(self, params, key, loglstar, live_u,
                                  prev_mld, prev_mr, fold,
                                  enlargement_factor, draw_enlargement, *,
                                  num_trials, use_usample):
        mld_new, mr_new = self._envelope_impl(params, live_u,
                                              enlargement_factor)
        mld = jnp.where(fold, jnp.maximum(prev_mld, mld_new), mld_new)
        mr = jnp.where(fold, jnp.maximum(prev_mr, mr_new), mr_new)
        out = self._rejection_flow_impl(
            params, key, loglstar, mld, mr, draw_enlargement,
            num_trials=num_trials, use_usample=use_usample)
        return out + (mld, mr)

    def rejection_flow_generations(self, params, key, active_u,
                                   active_logl, active_derived, it,
                                   max_iters, update_interval,
                                   window_vals, window_count, expiry_thr,
                                   trials_target, env_valid, env_gens,
                                   max_log_det_j, max_r, cache_interval,
                                   enlargement_factor, draw_enlargement, *,
                                   num_trials, max_gens, adapt_trials,
                                   can_double, can_halve):
        """Run up to ``max_gens`` flow-rejection pool generations in ONE
        dispatch — the flow-phase analogue of
        ``rejection_prior_generations`` plus the Jacobian-envelope cache
        machinery (reference ``sampler.py:555-560``): per generation the
        envelope is recomputed from the device-tracked live set and either
        max-folded into the carried maxima or replaces them outright on
        the ``cache_interval`` cadence (exact integer counter, identical
        to the host's ``env_gens`` bookkeeping). Stop rules are the
        prior-phase set (integer ladder, f32 expiry proxy at 0.9x —
        ``max_iters`` is again host-only) plus the
        ``update_interval`` boundary crossing
        — flow mode retrains there, which invalidates both the flow
        params and the envelope, so no later generation may be prefetched.

        Returns (buffers, meta, n_gens, key_out); buffers include the
        per-generation ``n_evals`` (masked likelihood-call count, the
        host's ncall currency) and the updated envelope (mld, mr) so the
        host cache stays bit-identical on replay."""
        use_usample = getattr(self.model.base_dist, 'has_usample', False)
        return self._rejection_flow_gens(
            params, key,
            np.asarray(active_u, np.float32),
            np.asarray(active_logl, np.float32),
            np.asarray(active_derived, np.float32),
            np.int32(it), np.int32(max_iters), np.int32(update_interval),
            np.asarray(window_vals, np.float32), np.int32(window_count),
            np.float32(expiry_thr), np.int32(trials_target),
            np.bool_(env_valid), np.int32(env_gens),
            np.float32(max_log_det_j), np.float32(max_r),
            np.int32(cache_interval), np.float32(enlargement_factor),
            np.float32(draw_enlargement), num_trials=num_trials,
            max_gens=max_gens, use_usample=use_usample,
            adapt_trials=adapt_trials, can_double=can_double,
            can_halve=can_halve)

    def _rejection_flow_generations_impl(self, params, key, active_u,
                                         active_logl, active_derived, it0,
                                         max_iters, update_interval,
                                         window_vals0, window_count0,
                                         expiry_thr, trials_target,
                                         env_valid0, env_gens0, mld0, mr0,
                                         cache_interval,
                                         enlargement_factor,
                                         draw_enlargement, *, num_trials,
                                         max_gens, use_usample,
                                         adapt_trials, can_double,
                                         can_halve):
        def draw(k, loglstar, mld, mr):
            return self._rejection_flow_impl(
                params, k, loglstar, mld, mr, draw_enlargement,
                num_trials=num_trials, use_usample=use_usample)

        out_sd = jax.eval_shape(
            lambda k, ls: draw(k, ls, jnp.float32(0.0), jnp.float32(1.0)),
            key, jnp.float32(0.0))
        names = ('x', 'logl', 'derived', 'ok', 'n_evals')
        bufs0 = {n: jnp.zeros((max_gens,) + tuple(s.shape), s.dtype)
                 for n, s in zip(names, out_sd)}
        bufs0['mld'] = jnp.zeros((max_gens,), jnp.float32)
        bufs0['mr'] = jnp.zeros((max_gens,), jnp.float32)
        meta0 = {'start_loglstar': jnp.zeros((max_gens,), jnp.float32),
                 'start_it': jnp.zeros((max_gens,), jnp.int32)}

        def cond(state):
            gen, stop = state[5], state[6]
            return jnp.logical_and(gen < max_gens, jnp.logical_not(stop))

        def body(state):
            (key, au, al, ad, it, gen, stop, wvals, wcount, env_valid,
             env_gens, mld, mr, bufs, meta) = state
            key, kgen = tuple(jax.random.split(key))
            loglstar = jnp.min(al)
            # envelope cache: replace on cadence/invalidation, else fold
            # (host: _rejection_flow_sample + nested.py env_gens counter)
            recompute = jnp.logical_or(jnp.logical_not(env_valid),
                                       env_gens >= cache_interval)
            mld_new, mr_new = self._envelope_impl(params, au,
                                                  enlargement_factor)
            mld = jnp.where(recompute, mld_new, jnp.maximum(mld, mld_new))
            mr = jnp.where(recompute, mr_new, jnp.maximum(mr, mr_new))
            env_gens = jnp.where(recompute, jnp.int32(0), env_gens + 1)
            env_valid = jnp.asarray(True)
            x, logl, derived, ok, n_evals = draw(kgen, loglstar, mld, mr)
            au, al, ad, it2, crossed = self._consume_pool(
                au, al, ad, it, ok, logl, x, derived,
                update_interval=update_interval)
            bufs = jax.tree.map(
                lambda b, v: jax.lax.dynamic_update_index_in_dim(
                    b, v, gen, 0),
                bufs, {'x': x, 'logl': logl, 'derived': derived, 'ok': ok,
                       'n_evals': n_evals, 'mld': mld, 'mr': mr})
            meta = {
                'start_loglstar': jax.lax.dynamic_update_index_in_dim(
                    meta['start_loglstar'], loglstar, gen, 0),
                'start_it': jax.lax.dynamic_update_index_in_dim(
                    meta['start_it'], it, gen, 0)}
            n_ok = jnp.sum(ok.astype(jnp.int32))
            nev_f = n_evals.astype(jnp.float32)
            nc = jnp.where(n_ok > 0,
                           nev_f / jnp.maximum(n_ok, 1).astype(jnp.float32),
                           jnp.maximum(nev_f, 1.0))
            ladder_stop, wvals, wcount = self._ladder_window_update(
                n_ok, nc, wvals, wcount, expiry_thr, trials_target,
                adapt_trials, can_double, can_halve)
            # max_iters is a pure host stopper (see mcmc impl note)
            stop = jnp.logical_or(ladder_stop, crossed)
            return (key, au, al, ad, it2, gen + jnp.int32(1), stop,
                    wvals, wcount, env_valid, env_gens, mld, mr, bufs,
                    meta)

        state0 = (key, active_u, active_logl, active_derived, it0,
                  jnp.int32(0), jnp.asarray(False), window_vals0,
                  window_count0, env_valid0, env_gens0, mld0, mr0, bufs0,
                  meta0)
        out_state = jax.lax.while_loop(cond, body, state0)
        key_out, n_gens = out_state[0], out_state[5]
        bufs, meta = out_state[13], out_state[14]
        return bufs, meta, n_gens, key_out

    def _rejection_flow_impl(self, params, key, loglstar, max_log_det_j,
                             max_r, enlargement_factor, *, num_trials,
                             use_usample):
        model = self.model
        dim = model.dim
        kz, ku, kr = jax.random.split(key, 3)
        if use_usample:
            z = model.base_dist.usample(kz, num_trials) * enlargement_factor
        else:
            # Uniform in the latent ball of radius enlargement*max_r
            # (reference sampler.py:578-581).
            g = jax.random.normal(kz, (num_trials, dim))
            r = jax.random.uniform(kr, (num_trials, 1)) ** (1.0 / dim)
            g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
            z = enlargement_factor * max_r * g * r
        x, ldj = self._hot_inverse(params)(z)
        ok_prior = self.prior_fn(x) > -1e30
        log_ratio = ldj - max_log_det_j
        jac_ok = _accept_mask(ku, log_ratio)
        evaluated = jnp.logical_and(ok_prior, jac_ok)
        logl, derived = self.like_fn(x)
        ok = jnp.logical_and(
            evaluated,
            jnp.logical_and(jnp.isfinite(logl), logl > loglstar))
        n_evals = jnp.sum(evaluated.astype(jnp.int32))
        return x, logl, derived, ok, n_evals

    # ------------------------------------------------------------- density

    def density(self, params, key, loglstar, num_trials):
        """Batched flow-density sampling (reference ``sampler.py:609-630``):
        z ~ base, x = flow⁻¹(z), keep if inside prior and logl > loglstar."""
        return self._density(params, key, np.float32(loglstar),
                             num_trials=num_trials)

    def _density_impl(self, params, key, loglstar, *, num_trials):
        z = self.model.base_dist.sample(key, num_trials)
        x, _ = self._hot_inverse(params)(z)
        ok_prior = self.prior_fn(x) > -1e30
        logl, derived = self.like_fn(x)
        ok = jnp.logical_and(
            ok_prior, jnp.logical_and(jnp.isfinite(logl), logl > loglstar))
        n_evals = jnp.sum(ok_prior.astype(jnp.int32))
        return x, logl, derived, ok, n_evals

    # ------------------------------------------------------------ ensemble

    def latent_log_prob(self, params, z, loglstar=None, inverse=None):
        """Latent-space ensemble target (reference ``sampler.py:674-687``):
        logl(x) + log|det dx/dz| + logprior(x), or the constrained variant
        (logdet+prior weight subject to logl > loglstar)."""
        if inverse is None:
            inverse = self._hot_inverse(params)
        x, ldj = inverse(z)
        logl, derived = self.like_fn(x)
        lp_prior = self.prior_fn(x)
        if loglstar is not None:
            lp = jnp.where(logl > loglstar, ldj + lp_prior, LOG_NEG)
        else:
            lp = logl + ldj + lp_prior
        return lp, logl, derived

    def stretch(self, params, key, z0, *, mcmc_steps, loglstar=None, a=2.0,
                moves=(('stretch', 1.0),)):
        """Affine-invariant ensemble sampler, the native replacement for
        emcee in the latent space (``sampler.py:689-705``). Red-black
        half-ensemble updates, fully vectorized, one lax.scan over steps.

        ``moves`` is a tuple of (name, weight) with the emcee move zoo the
        reference exposes (``ensemble.py:120-134``): 'stretch' (Goodman &
        Weare), 'de' (differential evolution), 'snooker' (DE-snooker), and
        'kde' (proposal from a diagonal-bandwidth Gaussian KDE of the
        complementary half — the reference delegates to scipy's full-cov
        KDE; diagonal keeps the kernel free of per-step Cholesky
        factorizations). One move is drawn per step by weight, as emcee
        does. All partner selections are gather-free (one-hot matmuls).
        """
        constrained = loglstar is not None
        ll_star = np.float32(loglstar if constrained else LOG_NEG)
        return self._stretch(params, key, z0, ll_star, np.float32(a),
                             mcmc_steps=mcmc_steps, constrained=constrained,
                             moves=tuple(moves))

    def _stretch_impl(self, params, key, z0, loglstar, a, *, mcmc_steps,
                      constrained, moves=(('stretch', 1.0),)):
        ll = loglstar if constrained else None
        num_walkers, dim = z0.shape
        half = num_walkers // 2
        assert num_walkers % 2 == 0, 'stretch move needs an even walker count'

        inverse = self._hot_inverse(params)
        lp0, logl0, derived0 = self.latent_log_prob(params, z0, ll,
                                                    inverse=inverse)

        def pick_rows(k, zs_other, n):
            """Gather-free random row selection via elementwise one-hot
            masked sum (row gathers execute as scalar loops on TPU; a
            one-hot MATMUL would bf16-truncate the selected walkers on
            the MXU — masked-sum on the VPU is bit-exact)."""
            idx = jax.random.randint(k, (n,), 0, zs_other.shape[0])
            kiota = jax.lax.broadcasted_iota(
                jnp.int32, (n, zs_other.shape[0]), 1)
            onehot = (kiota == idx[:, None]).astype(zs_other.dtype)
            return jnp.sum(onehot[:, :, None] * zs_other[None, :, :],
                           axis=1)

        def propose_stretch(k, zs_move, zs_other):
            kz, kc = jax.random.split(k)
            n = zs_move.shape[0]
            # g(ζ) ∝ 1/√ζ on [1/a, a]: ζ = ((a-1)u + 1)² / a
            u = jax.random.uniform(kz, (n,))
            zeta = ((a - 1.0) * u + 1.0) ** 2 / a
            zp = pick_rows(kc, zs_other, n)
            prop = zp + zeta[:, None] * (zs_move - zp)
            return prop, (dim - 1.0) * jnp.log(zeta)

        def propose_de(k, zs_move, zs_other):
            ka, kb, ke = jax.random.split(k, 3)
            n = zs_move.shape[0]
            g0 = 2.38 / jnp.sqrt(2.0 * dim)
            za = pick_rows(ka, zs_other, n)
            zb = pick_rows(kb, zs_other, n)
            noise = 1e-5 * jax.random.normal(ke, zs_move.shape)
            prop = zs_move + g0 * (za - zb) + noise
            return prop, jnp.zeros(n)

        def propose_snooker(k, zs_move, zs_other):
            k1, k2, k3 = jax.random.split(k, 3)
            n = zs_move.shape[0]
            z1 = pick_rows(k1, zs_other, n)
            z2 = pick_rows(k2, zs_other, n)
            z3 = pick_rows(k3, zs_other, n)
            d_vec = zs_move - z1
            norm = jnp.maximum(jnp.linalg.norm(d_vec, axis=1,
                                               keepdims=True), 1e-12)
            d_hat = d_vec / norm
            proj = jnp.sum((z2 - z3) * d_hat, axis=1, keepdims=True)
            prop = zs_move + 1.7 * proj * d_hat
            norm_new = jnp.maximum(
                jnp.linalg.norm(prop - z1, axis=1), 1e-12)
            extra = (dim - 1.0) * (jnp.log(norm_new)
                                   - jnp.log(norm[:, 0]))
            return prop, extra

        def kde_logq(pts, zs_other, h):
            """log of diagonal-bandwidth Gaussian KDE density of zs_other
            evaluated at pts (matmul-based pairwise distances)."""
            m = zs_other.shape[0]
            ph = pts / h
            oh = zs_other / h
            # HIGHEST: the MH correction must evaluate the same density
            # the proposal was drawn from; default bf16 matmul inputs
            # would perturb the pairwise distances
            d2 = (jnp.sum(ph ** 2, 1)[:, None]
                  + jnp.sum(oh ** 2, 1)[None, :]
                  - 2.0 * jnp.dot(ph, oh.T,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32))
            log_kern = -0.5 * jnp.maximum(d2, 0.0)
            return (jax.scipy.special.logsumexp(log_kern, axis=1)
                    - jnp.log(float(m)) - jnp.sum(jnp.log(h))
                    - 0.5 * dim * jnp.log(2.0 * jnp.pi))

        def propose_kde(k, zs_move, zs_other):
            kc, ke = jax.random.split(k)
            n = zs_move.shape[0]
            m = zs_other.shape[0]
            # Scott's rule bandwidth, diagonal
            h = (jnp.std(zs_other, axis=0) + 1e-6) * m ** (-1.0 / (dim + 4))
            center = pick_rows(kc, zs_other, n)
            prop = center + h * jax.random.normal(ke, zs_move.shape)
            extra = kde_logq(zs_move, zs_other, h) \
                - kde_logq(prop, zs_other, h)
            return prop, extra

        _PROPOSERS = {'stretch': propose_stretch, 'de': propose_de,
                      'snooker': propose_snooker, 'kde': propose_kde}
        move_fns = [_PROPOSERS[name.lower()] for name, _ in moves]
        weights = jnp.asarray([w for _, w in moves], jnp.float32)
        log_weights = jnp.log(weights / jnp.sum(weights))

        def half_update(zs_move, zs_other, lp_move, logl_move, der_move, k,
                        move_idx):
            kp, ku = jax.random.split(k)
            if len(move_fns) == 1:
                prop, extra = move_fns[0](kp, zs_move, zs_other)
            else:
                prop, extra = jax.lax.switch(
                    move_idx, move_fns, kp, zs_move, zs_other)
            lp_prop, logl_prop, der_prop = self.latent_log_prob(
                params, prop, ll, inverse=inverse)
            log_ratio = extra + lp_prop - lp_move
            acc = _accept_mask(ku, log_ratio)
            acol = acc[:, None]
            return (jnp.where(acol, prop, zs_move),
                    jnp.where(acc, lp_prop, lp_move),
                    jnp.where(acc, logl_prop, logl_move),
                    jnp.where(acol, der_prop, der_move),
                    acc)

        def step(carry, k):
            z, lp, logl, derived = carry
            k1, k2, km = jax.random.split(k, 3)
            move_idx = jax.random.categorical(km, log_weights)
            z_a, lp_a, ll_a, d_a, acc_a = half_update(
                z[:half], z[half:], lp[:half], logl[:half], derived[:half],
                k1, move_idx)
            z_b, lp_b, ll_b, d_b, acc_b = half_update(
                z[half:], z_a, lp[half:], logl[half:], derived[half:], k2,
                move_idx)
            z = jnp.concatenate([z_a, z_b], axis=0)
            lp = jnp.concatenate([lp_a, lp_b], axis=0)
            logl = jnp.concatenate([ll_a, ll_b], axis=0)
            derived = jnp.concatenate([d_a, d_b], axis=0)
            n_acc = jnp.sum(acc_a.astype(jnp.int32)) + \
                jnp.sum(acc_b.astype(jnp.int32))
            return (z, lp, logl, derived), (z, logl, lp, derived, n_acc)

        keys = jax.random.split(key, mcmc_steps)
        _, (zs, logls, lps, deriveds, n_accs) = jax.lax.scan(
            step, (z0, lp0, logl0, derived0), keys)

        def stack(first, seq):
            return jnp.swapaxes(
                jnp.concatenate([first[None], seq], axis=0), 0, 1)

        # Real-space chains recovered with one batched inverse over the whole
        # trajectory instead of one per step.
        latent = stack(z0, zs)
        flat = latent.reshape(-1, dim)
        xs_flat, _ = inverse(flat)
        samples = xs_flat.reshape(latent.shape)

        total_acc = jnp.sum(n_accs)
        return {
            'samples': samples,
            'latent': latent,
            'loglikes': stack(logl0, logls),
            'log_probs': stack(lp0, lps),
            'derived': stack(derived0, deriveds),
            'ncall': mcmc_steps * num_walkers,
            'accepted': total_acc,
            'rejected': mcmc_steps * num_walkers - total_acc,
        }
