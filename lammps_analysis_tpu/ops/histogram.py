"""Masked histogram primitives for TPU.

The reference bins distances with ``tf.histogram_fixed_width`` after boolean
masking (``calculators/radial_distribution_function.py:617-645``). Boolean
masking produces dynamic shapes, which XLA cannot tile, so the TPU-native
primitives here keep everything statically shaped:

* values carry a ``weights`` mask (0 for padded / out-of-range entries);
* two interchangeable execution strategies:
  - ``scatter``: ``zeros.at[idx].add(w)`` — exact integer counts;
  - ``matmul``: one-hot contraction on the MXU, fp32 accumulation — the
    fast path for wide histograms on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bin_indices(
    values: jnp.ndarray, range_min: float, range_max: float, n_bins: int
) -> jnp.ndarray:
    """Uniform-bin index per value, clipped to ``[0, n_bins - 1]``.

    Matches ``tf.histogram_fixed_width`` binning: values below range go to
    bin 0, above range to the last bin (callers mask those out via weights).
    """
    scaled = (values - range_min) / (range_max - range_min) * n_bins
    return jnp.clip(scaled.astype(jnp.int32), 0, n_bins - 1)


def masked_histogram_scatter(
    idx: jnp.ndarray, weights: jnp.ndarray, n_bins: int
) -> jnp.ndarray:
    """Weighted histogram via XLA scatter-add. Returns float weights sum."""
    flat_idx = idx.reshape(-1)
    flat_w = weights.reshape(-1)
    return jnp.zeros((n_bins,), dtype=flat_w.dtype).at[flat_idx].add(flat_w)


def masked_histogram_matmul(
    idx: jnp.ndarray, weights: jnp.ndarray, n_bins: int
) -> jnp.ndarray:
    """Weighted histogram as a one-hot contraction (MXU-friendly).

    ``onehot[m, b] = (idx[m] == b)``; histogram = ``weights @ onehot``. XLA
    lowers the contraction over the flattened value axis onto the MXU with
    fp32 accumulation, which is the fastest wide-histogram strategy on TPU.
    """
    flat_idx = idx.reshape(-1)
    flat_w = weights.reshape(-1).astype(jnp.float32)
    onehot = jax.nn.one_hot(flat_idx, n_bins, dtype=jnp.float32)
    return flat_w @ onehot


def masked_histogram(
    idx: jnp.ndarray,
    weights: jnp.ndarray,
    n_bins: int,
    strategy: str = "matmul",
) -> jnp.ndarray:
    if strategy == "matmul":
        return masked_histogram_matmul(idx, weights, n_bins)
    return masked_histogram_scatter(idx, weights, n_bins)


@functools.partial(jax.jit, static_argnames=("n_bins", "strategy"))
def histogram_fixed_width(
    values: jnp.ndarray,
    range_min: float,
    range_max: float,
    n_bins: int,
    weights: jnp.ndarray | None = None,
    strategy: str = "matmul",
) -> jnp.ndarray:
    """Drop-in analog of ``tf.histogram_fixed_width`` with optional weights."""
    idx = bin_indices(values, range_min, range_max, n_bins)
    if weights is None:
        weights = jnp.ones_like(values, dtype=jnp.float32)
    return masked_histogram(idx, weights, n_bins, strategy)


def histogram2d_masked(
    x_idx: jnp.ndarray,
    y_idx: jnp.ndarray,
    weights: jnp.ndarray,
    n_x: int,
    n_y: int,
    strategy: str = "matmul",
) -> jnp.ndarray:
    """2-D weighted histogram (used by the spatial distribution function).

    Encodes the 2-D bin as a single flat index ``x * n_y + y`` — one wide
    1-D histogram, same MXU strategy.
    """
    flat = x_idx * n_y + y_idx
    hist = masked_histogram(flat, weights, n_x * n_y, strategy)
    return hist.reshape(n_x, n_y)
