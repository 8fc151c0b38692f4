"""Masked histogram primitives for TPU.

The reference bins distances with ``tf.histogram_fixed_width`` after boolean
masking (``calculators/radial_distribution_function.py:617-645``). Boolean
masking produces dynamic shapes, which XLA cannot tile, so the TPU-native
primitives here keep everything statically shaped: values carry a weight
mask (0 for padded / out-of-range entries) and bins are computed for every
element.

Two execution strategies, selectable per call (benchmarked on hardware by
``bench.py``):

* ``scatter`` — ``zeros.at[idx].add(w)``: one pass over the data, XLA
  lowers to sorted scatter-add. Default.
* ``compare`` — for each chunk of bins, a fused
  ``sum(w * (idx == bin))`` broadcast-compare-reduce. No gather/scatter at
  all, pure VPU streaming; the bin chunking bounds the fused intermediate
  so nothing of shape ``(M, n_bins)`` is ever materialised.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: bins per compare-reduce chunk (bounds the fused (M, chunk) intermediate)
_COMPARE_BIN_CHUNK = 128


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
    """Weighted histogram via XLA scatter-add."""
    flat_idx = idx.reshape(-1)
    flat_w = weights.reshape(-1)
    return jnp.zeros((n_bins,), dtype=flat_w.dtype).at[flat_idx].add(flat_w)


def masked_histogram_compare(
    idx: jnp.ndarray, weights: jnp.ndarray, n_bins: int
) -> jnp.ndarray:
    """Weighted histogram via chunked broadcast-compare-reduce.

    ``counts[b] = sum_m w[m] * (idx[m] == b)`` evaluated one bin-chunk at a
    time; XLA fuses compare + multiply + column-reduce into one VPU loop,
    so peak memory is ``M * chunk`` elements of fused scratch, not
    ``M * n_bins``.
    """
    flat_idx = idx.reshape(-1)
    flat_w = weights.reshape(-1).astype(jnp.float32)
    chunks = []
    for b0 in range(0, n_bins, _COMPARE_BIN_CHUNK):
        width = min(_COMPARE_BIN_CHUNK, n_bins - b0)
        bins = b0 + jnp.arange(width, dtype=flat_idx.dtype)
        eq = flat_idx[:, None] == bins[None, :]
        chunks.append(jnp.sum(flat_w[:, None] * eq, axis=0))
    return jnp.concatenate(chunks)


def masked_histogram(
    idx: jnp.ndarray,
    weights: jnp.ndarray,
    n_bins: int,
    strategy: str = "scatter",
) -> jnp.ndarray:
    if strategy == "compare":
        return masked_histogram_compare(idx, weights, n_bins)
    if strategy in ("scatter", "matmul"):  # "matmul" kept as legacy alias
        return masked_histogram_scatter(idx, weights, n_bins)
    raise ValueError(f"unknown histogram strategy {strategy!r}")


@functools.partial(jax.jit, static_argnames=("n_bins", "strategy"))
def histogram_fixed_width(
    values: jnp.ndarray,
    range_min: float,
    range_max: float,
    n_bins: int,
    weights: jnp.ndarray | None = None,
    strategy: str = "scatter",
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
    strategy: str = "scatter",
) -> jnp.ndarray:
    """2-D weighted histogram (used by the spatial distribution function).

    Encodes the 2-D bin as a single flat index ``x * n_y + y`` — one wide
    1-D histogram, same strategies.
    """
    flat = x_idx * n_y + y_idx
    hist = masked_histogram(flat, weights, n_x * n_y, strategy)
    return hist.reshape(n_x, n_y)
