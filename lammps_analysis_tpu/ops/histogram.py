"""Masked histogram primitives for TPU.

The reference bins distances with ``tf.histogram_fixed_width`` after boolean
masking (``calculators/radial_distribution_function.py:617-645``). Boolean
masking produces dynamic shapes, which XLA cannot tile, so the TPU-native
primitives here keep everything statically shaped: values carry a weight
mask (0 for padded / out-of-range entries) and bins are computed for every
element.

Execution strategies (``"auto"`` picks per backend — scatter on CPU, the
MXU outer-product on TPU; measured comparisons in ``docs/design.md``):

* ``scatter`` — ``zeros.at[idx].add(w)``: one pass, native-fast on CPU,
  pathologically slow to compile on TPU;
* ``compare`` — per bin-chunk fused ``sum(w * (idx == bin))``
  broadcast-compare-reduce; pure VPU streaming, nothing of shape
  ``(M, n_bins)`` materialises;
* ``outer`` — split ``idx = hi*K + lo`` into two narrow one-hots and
  contract them on the MXU; the fast wide-histogram path on TPU.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
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


def _ceil_sqrt(n: int) -> int:
    r = int(np.sqrt(n))
    while r * r < n:
        r += 1
    return r


def masked_histogram_outer(
    idx: jnp.ndarray,
    weights: jnp.ndarray,
    n_bins: int,
    chunk: int = 131072,
    precision=None,
) -> jnp.ndarray:
    """Weighted histogram as an MXU outer-product contraction.

    Split the bin index ``idx = hi * K + lo`` (``K ~ sqrt(n_bins)``) and
    build two *narrow* one-hots; then
    ``hist2d[h, l] = sum_m w_m oh_hi[m, h] oh_lo[m, l] = (w*oh_hi)^T @ oh_lo``
    — one MXU matmul with the pair axis as the contraction. Cost per value
    is ``2 sqrt(B)`` VPU compares + ``2 B`` MXU MACs instead of ``B`` VPU
    compares, an ~sqrt(B)/2 VPU-op reduction for wide histograms. f32
    accumulation is exact for counts below 2^24.
    """
    k = _ceil_sqrt(n_bins)
    n_hi = -(-n_bins // k)
    flat_idx = idx.reshape(-1)
    flat_w = weights.reshape(-1).astype(jnp.float32)
    m = flat_idx.shape[0]
    hi_ids = jnp.arange(n_hi, dtype=flat_idx.dtype)
    lo_ids = jnp.arange(k, dtype=flat_idx.dtype)

    def chunk_hist(start):
        idx_c = jax.lax.dynamic_slice_in_dim(flat_idx, start, chunk)
        w_c = jax.lax.dynamic_slice_in_dim(flat_w, start, chunk)
        hi = idx_c // k
        lo = idx_c - hi * k
        oh_hi = (hi[:, None] == hi_ids[None, :]).astype(jnp.float32) * w_c[:, None]
        oh_lo = (lo[:, None] == lo_ids[None, :]).astype(jnp.float32)
        # default MXU precision rounds the f32 weights folded into
        # oh_hi through bf16 passes (~0.2% per element) — weighted
        # histograms pass precision=HIGHEST; 0/1 counts are bf16-exact
        return jnp.einsum(
            "mh,ml->hl", oh_hi, oh_lo, preferred_element_type=jnp.float32,
            precision=precision,
        )

    if m <= chunk:
        pad = chunk - m
        if pad:
            flat_idx = jnp.pad(flat_idx, (0, pad))
            flat_w = jnp.pad(flat_w, (0, pad))
        hist2d = chunk_hist(0)
    else:
        n_chunks = -(-m // chunk)
        total = n_chunks * chunk
        if total != m:
            flat_idx = jnp.pad(flat_idx, (0, total - m))
            flat_w = jnp.pad(flat_w, (0, total - m))
        starts = jnp.arange(n_chunks) * chunk
        hist2d = jnp.sum(jax.lax.map(chunk_hist, starts), axis=0)
    return hist2d.reshape(-1)[:n_bins]


def default_strategy() -> str:
    """Backend-appropriate default: scatter is native-fast on CPU but has
    pathological compile times on TPU, where the MXU outer-product wins."""
    return "outer" if jax.default_backend() == "tpu" else "scatter"


def masked_histogram(
    idx: jnp.ndarray,
    weights: jnp.ndarray,
    n_bins: int,
    strategy: str = "auto",
    precision=None,
) -> jnp.ndarray:
    if strategy == "auto":
        strategy = default_strategy()
    if strategy == "compare":
        return masked_histogram_compare(idx, weights, n_bins)
    if strategy == "outer":
        return masked_histogram_outer(idx, weights, n_bins, precision=precision)
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
    strategy: str = "auto",
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
    strategy: str = "auto",
) -> jnp.ndarray:
    """2-D weighted histogram (used by the spatial distribution function).

    Encodes the 2-D bin as a single flat index ``x * n_y + y`` — one wide
    1-D histogram, same strategies.
    """
    flat = x_idx * n_y + y_idx
    hist = masked_histogram(flat, weights, n_x * n_y, strategy)
    return hist.reshape(n_x, n_y)
