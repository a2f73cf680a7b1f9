"""Rational-quadratic spline (RQS) transform, Durkan et al. 2019.

Total-function JAX re-design of the reference's torch implementation
(``nnest/networks.py:412-556``). Differences forced/enabled by XLA:

- No data-dependent shapes: the reference splits inputs into inside/outside
  tail-bound subsets with boolean indexing (``networks.py:441-454``); here
  every lane computes the spline on clamped inputs and a ``jnp.where``
  selects identity tails outside [-B, B].
- No exceptions: the reference raises ``ValueError`` when the inverse gets an
  empty in-domain subset or out-of-domain values (``networks.py:464-468``),
  which callers catch and treat as a rejected proposal. Here the transform is
  total — outside the tail bound it is the identity with logdet 0, which is
  the intended linear-tail behaviour of the paper. The inverse discriminant
  (asserted non-negative in the reference, ``networks.py:524-525``) is
  clamped at 0 to keep masked-out lanes NaN-free.
- Bin lookup is GATHER-FREE: a one-hot selection built from edge comparisons
  (the reference's ``searchsorted`` eps-bump trick, ``networks.py:417-422``,
  turned into adjacent differences of the comparison mask). This is a hard
  TPU performance requirement, not a style choice: ``take_along_axis``
  lowers to dynamic gathers which execute as scalar loops on TPU — measured
  67x slower (20.5 ms vs 0.31 ms per MCMC scan step at batch 4096x16) when
  the spline inverse sits on a loop-carried dependency chain.

The double-softmax / double-softplus parameterization quirk of the reference
(NSF_CL pre-normalizes W,H,D at ``networks.py:584-586`` and RQS normalizes
again at ``networks.py:477-486``) is preserved by the caller (spline.py) so
training dynamics match.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rqs(inputs,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse: bool = False,
        tail_bound: float = 1.0,
        min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
        min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
        min_derivative: float = DEFAULT_MIN_DERIVATIVE):
    """Apply the unconstrained RQS (linear tails outside [-B, B]).

    Args:
      inputs: (..., ) values to transform.
      unnormalized_widths/heights: (..., K).
      unnormalized_derivatives: (..., K-1) interior derivatives; boundary
        derivatives are pinned to 1 via the softplus-inverse constant, as in
        the reference (``networks.py:436-439``).
      inverse: static python bool.

    Returns:
      (outputs, logabsdet) with the same shape as ``inputs``.
    """
    B = tail_bound
    K = unnormalized_widths.shape[-1]
    if min_bin_width * K > 1.0:
        raise ValueError('Minimal bin width too large for the number of bins')
    if min_bin_height * K > 1.0:
        raise ValueError('Minimal bin height too large for the number of bins')

    inside = (inputs >= -B) & (inputs <= B)
    x = jnp.clip(inputs, -B, B)

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1.0 - min_bin_width * K) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = 2.0 * B * cumwidths - B
    cumwidths = cumwidths.at[..., 0].set(-B)
    cumwidths = cumwidths.at[..., -1].set(B)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    # Boundary derivative = 1: softplus(const) + min_derivative == 1.
    const = math.log(math.exp(1.0 - min_derivative) - 1.0)
    pad_shape = list(unnormalized_derivatives.shape)
    pad_shape[-1] = 1
    boundary = jnp.full(pad_shape, const, unnormalized_derivatives.dtype)
    unnorm_d = jnp.concatenate([boundary, unnormalized_derivatives, boundary],
                               axis=-1)
    derivatives = min_derivative + jax.nn.softplus(unnorm_d)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1.0 - min_bin_height * K) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = 2.0 * B * cumheights - B
    cumheights = cumheights.at[..., 0].set(-B)
    cumheights = cumheights.at[..., -1].set(B)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bins = cumheights if inverse else cumwidths
    # Gather-free one-hot bin selection: bump the last edge by eps (the
    # reference searchsorted trick) so x == B lands in the last bin, then
    # onehot_k = ge_k - ge_{k+1}.
    bins_cmp = bins.at[..., -1].add(1e-6)
    ge = (x[..., None] >= bins_cmp).astype(x.dtype)
    onehot = ge[..., :-1] - ge[..., 1:]

    def take(a):
        return jnp.sum(a * onehot, axis=-1)

    input_cumwidths = take(cumwidths[..., :-1])
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights[..., :-1])
    input_heights = take(heights)
    delta = heights / widths
    input_delta = take(delta)
    input_derivatives = take(derivatives[..., :-1])
    input_derivatives_p1 = take(derivatives[..., 1:])

    d_sum = input_derivatives + input_derivatives_p1 - 2.0 * input_delta

    if inverse:
        y_rel = x - input_cumheights
        a = input_heights * (input_delta - input_derivatives) + y_rel * d_sum
        b = input_heights * input_derivatives - y_rel * d_sum
        c = -input_delta * y_rel
        discriminant = jnp.maximum(b ** 2 - 4.0 * a * c, 0.0)
        denom = -b - jnp.sqrt(discriminant)
        # Guard masked/degenerate lanes against 0/0 (selected away by `inside`
        # or exactly-at-knot inputs where c == 0 and root == 0).
        root = jnp.where(jnp.abs(denom) > 1e-12, 2.0 * c / jnp.where(
            jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
        root = jnp.clip(root, 0.0, 1.0)
        outputs = root * input_bin_widths + input_cumwidths
        theta_1mt = root * (1.0 - root)
        denominator = input_delta + d_sum * theta_1mt
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_p1 * root ** 2
            + 2.0 * input_delta * theta_1mt
            + input_derivatives * (1.0 - root) ** 2)
        logabsdet = -(jnp.log(derivative_numerator) - 2.0 * jnp.log(denominator))
    else:
        theta = (x - input_cumwidths) / input_bin_widths
        theta = jnp.clip(theta, 0.0, 1.0)
        theta_1mt = theta * (1.0 - theta)
        numerator = input_heights * (input_delta * theta ** 2
                                     + input_derivatives * theta_1mt)
        denominator = input_delta + d_sum * theta_1mt
        outputs = input_cumheights + numerator / denominator
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_p1 * theta ** 2
            + 2.0 * input_delta * theta_1mt
            + input_derivatives * (1.0 - theta) ** 2)
        logabsdet = jnp.log(derivative_numerator) - 2.0 * jnp.log(denominator)

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet
