"""Windowed mean-squared-displacement kernels.

TPU formulation of the reference's ensemble MSD loop
(``einstein_diffusion_coefficients.py:168-190`` + the sliding-window ensemble
generator ``data_manager.py:288-341``): instead of a Python generator feeding
one window at a time, all window origins are batched with ``lax.map`` over
dynamic slices — static shapes, jit-compiled once, shardable over the window
axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .correlation import window_starts


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

    Returns
    -------
    msd_sum : (R,) — summed (not averaged) squared displacements; the caller
        applies the reference's normalisation.
    n_windows : () int32 — number of windows accumulated.
    """
    starts = window_starts(x.shape[0], window, stride)
    n_windows = starts.shape[0]
    if int(n_windows) == 0:
        return jnp.zeros(tau_values.shape, x.dtype), jnp.asarray(0)

    def one_window(s):
        seg = jax.lax.dynamic_slice_in_dim(x, s, window, axis=0)  # (W, N, D)
        origin = seg[0]  # (N, D)
        sel = jnp.take(seg, tau_values, axis=0)  # (R, N, D)
        sq = (sel - origin[None]) ** 2
        return jnp.sum(sq, axis=(1, 2))  # (R,)

    sums = jax.lax.map(one_window, starts, batch_size=chunk)
    return jnp.sum(sums, axis=0), jnp.asarray(int(n_windows))


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
    cross sum is computed as ``|sum_a d_a|^2 - sum_a |d_a|^2`` — the first
    term is a plain reduction, avoiding the O(N^2) pair loop entirely.

    Returns ``(cross_sum (R,), n_windows)``.
    """
    starts = window_starts(x.shape[0], window, stride)
    n_windows = starts.shape[0]
    if int(n_windows) == 0:
        return jnp.zeros(tau_values.shape, x.dtype), jnp.asarray(0)

    def one_window(s):
        seg = jax.lax.dynamic_slice_in_dim(x, s, window, axis=0)
        disp = jnp.take(seg, tau_values, axis=0) - seg[0][None]  # (R, N, D)
        total = jnp.sum(disp, axis=1)  # (R, D)
        self_term = jnp.sum(disp * disp, axis=(1, 2))  # (R,)
        return jnp.sum(total * total, axis=-1) - self_term

    sums = jax.lax.map(one_window, starts, batch_size=chunk)
    return jnp.sum(sums, axis=0), jnp.asarray(int(n_windows))
