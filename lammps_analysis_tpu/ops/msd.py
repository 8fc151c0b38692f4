"""Windowed mean-squared-displacement kernels.

TPU formulation of the reference's ensemble MSD loop
(``einstein_diffusion_coefficients.py:168-190`` + the sliding-window ensemble
generator ``data_manager.py:288-341``).

The windowed ensemble sum is computed with a **strided-comb decomposition**
instead of materialising windows: with origins every ``stride = s`` frames
and lags ``tau = j*s + o`` (``o < s``), the whole ``o``-row for one ``j``

    msd_row_j[o] = sum_{k,n,d} (x(k*s + j*s + o) - x(k*s))^2

is one fused broadcast-subtract-square-reduce between the origin comb
``x[0 : K*s : s]`` and the contiguous reshape
``x[j*s : j*s + K*s] -> (K, s, N, D)`` — no gathers, no per-window
``dynamic_slice``, static shapes, and no large-term cancellation (the
difference is taken before squaring, unlike a Gram-style A - 2C + B
split, which loses ~tau/T relative digits in f32). Work and memory
traffic are the inherent ``ceil(window/stride)`` passes over the data;
the previous ``lax.map`` over window origins materialised every window
twice (vmapped ``dynamic_slice`` gather + ``take``), measured ~10x
slower on both CPU and TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _comb_sq_sums(
    x: jnp.ndarray, window: int, stride: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Comb-decomposed ``(msd_sums (window,), n_windows)`` for one series.

    ``x`` is ``(T, N, D)``; origins are every ``stride`` frames, windows
    must fit entirely (``K = (T - window)//stride + 1`` of them).
    """
    total = x.shape[0]
    k_windows = (total - window) // stride + 1 if total >= window else 0
    if k_windows <= 0:
        return jnp.zeros((window,), x.dtype), 0

    m_blocks = -(-window // stride)  # ceil
    needed = (m_blocks - 1) * stride + k_windows * stride
    pad = max(0, needed - total)
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x

    origins = xp[: k_windows * stride : stride]  # (K, N, D)
    rows = []
    for j in range(m_blocks):
        lo = j * stride
        slab = jax.lax.slice_in_dim(xp, lo, lo + k_windows * stride, axis=0)
        slab = slab.reshape(k_windows, stride, *x.shape[1:])
        # fused broadcast-subtract-square-reduce: one pass over the slab
        diff = slab - origins[:, None]
        rows.append(jnp.sum(diff * diff, axis=(0, 2, 3)))  # (stride,)
    full = jnp.concatenate(rows)[:window]
    return full, k_windows


@functools.partial(jax.jit, static_argnames=("window", "stride", "chunk"))
def windowed_msd_sum(
    x: jnp.ndarray,
    tau_values: jnp.ndarray,
    window: int,
    stride: int,
    chunk: int = 32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sum over windows/particles/components of ``(x(t0 + tau) - x(t0))^2``.

    Parameters
    ----------
    x : (T, N, D) unwrapped positions (or dipole moment with N = 1).
    tau_values : (R,) int32 lag indices inside each window.
    window : ensemble window length (``data_range``).
    stride : ``correlation_time``.
    chunk : kept for API compatibility (the comb formulation has no
        window batching knob).

    Returns
    -------
    msd_sum : (R,) — summed (not averaged) squared displacements; the caller
        applies the reference's normalisation.
    n_windows : () int32 — number of windows accumulated.
    """
    del chunk
    full, k_windows = _comb_sq_sums(x, window, stride)
    if k_windows == 0:
        return jnp.zeros(tau_values.shape, x.dtype), jnp.asarray(0)
    return jnp.take(full, tau_values, axis=0), jnp.asarray(int(k_windows))


@functools.partial(jax.jit, static_argnames=("window", "stride", "chunk"))
def windowed_msd_gram_sum(
    x: jnp.ndarray,
    tau_values: jnp.ndarray,
    window: int,
    stride: int,
    chunk: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Distinct (cross-particle) displacement correlation sums.

    For the Einstein *distinct* diffusion coefficients
    (``einstein_distinct_diffusion_coefficients.py:174-236``): accumulates
    ``sum_{a != b} (x_a(tau) - x_a(0)) . (x_b(tau) - x_b(0))`` per lag. The
    cross sum is ``|sum_a d_a|^2 - sum_a |d_a|^2``: the first term is the
    windowed MSD of the atom-summed series ``S(t) = sum_a x_a(t)`` (one
    (T, 1, D) series), the second is the plain windowed MSD — both via the
    comb decomposition, avoiding the O(N^2) pair loop entirely.

    Returns ``(cross_sum (R,), n_windows)``.
    """
    del chunk
    s_series = jnp.sum(x, axis=1, keepdims=True)  # (T, 1, D)
    total_full, k_windows = _comb_sq_sums(s_series, window, stride)
    if k_windows == 0:
        return jnp.zeros(tau_values.shape, x.dtype), jnp.asarray(0)
    self_full, _ = _comb_sq_sums(x, window, stride)
    full = total_full - self_full
    return jnp.take(full, tau_values, axis=0), jnp.asarray(int(k_windows))
