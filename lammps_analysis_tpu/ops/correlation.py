"""FFT-based correlation kernels.

The reference computes windowed autocorrelations with
``tfp.stats.auto_correlation(..., center=False, normalize=False)`` per
sliding window (e.g. ``green_kubo_self_diffusion_coefficients.py:191-206``)
— an O(T * W) streaming formulation. On TPU the natural formulation is a
batched FFT over HBM-resident blocks: ``acf = irfft(|rfft(x, 2T)|^2)[:T] / T``
reproduces tfp's biased estimator exactly (denominator ``T`` for every lag),
runs on the full window batch at once, and vectorises over particles and
components.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _next_fast_len(n: int) -> int:
    """Next power of two >= n (TPU FFTs prefer power-of-two sizes)."""
    return 1 << (int(n - 1).bit_length())


@functools.partial(jax.jit, static_argnames=("axis",))
def acf_biased(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Biased autocorrelation along ``axis``.

    ``acf[m] = (1/T) * sum_{t=0}^{T-1-m} x[t] * x[t+m]`` — identical to
    ``tfp.stats.auto_correlation(x, center=False, normalize=False)`` used
    throughout the reference Green-Kubo calculators.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    fft_len = _next_fast_len(2 * n)
    f = jnp.fft.rfft(x, n=fft_len, axis=-1)
    acf = jnp.fft.irfft(f * jnp.conj(f), n=fft_len, axis=-1)[..., :n]
    acf = acf / n
    return jnp.moveaxis(acf, -1, axis)


@functools.partial(jax.jit, static_argnames=("axis",))
def cross_correlation_biased(
    x: jnp.ndarray, y: jnp.ndarray, axis: int = -1
) -> jnp.ndarray:
    """Biased cross-correlation ``(1/T) sum_t x[t] y[t+m]`` along ``axis``.

    Used by the distinct diffusion-coefficient calculators (reference jax
    helper ``correlate``, ``utils/calculator_helper_methods.py:110-150``).
    """
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.moveaxis(y, axis, -1)
    n = x.shape[-1]
    fft_len = _next_fast_len(2 * n)
    fx = jnp.fft.rfft(x, n=fft_len, axis=-1)
    fy = jnp.fft.rfft(y, n=fft_len, axis=-1)
    ccf = jnp.fft.irfft(jnp.conj(fx) * fy, n=fft_len, axis=-1)[..., :n]
    ccf = ccf / n
    return jnp.moveaxis(ccf, -1, axis)


def window_starts(total: int, window: int, stride: int) -> jnp.ndarray:
    """Start indices of the sliding ensemble windows.

    Mirrors the reference ensemble loop (``data_manager.py:288-341``):
    windows of length ``window`` every ``stride`` frames, last window must
    fit entirely.
    """
    n = (total - window) // stride + 1 if total >= window else 0
    return jnp.arange(max(n, 0)) * stride


def _auto_chunk(n: int, d: int, window: int) -> int:
    """Windows per ``lax.map`` step that keep FFT intermediates in budget.

    The per-window working set is the zero-padded f32 batch plus its
    complex spectrum: ``N * D * fft_len * ~16`` bytes.  On the
    single-core CPU host, batches past ~0.5 GiB thrash the cache
    (measured 5.2 -> 15+ M window-frame-atoms/s at 10k atoms going from
    chunk 32 to 1, benchmarks/vacf_slab_sweep.py); tiny series (flux,
    N = 1) are insensitive, so the cap keeps them batched.  On TPU the
    batch just has to fit HBM comfortably.
    """
    fft_len = _next_fast_len(2 * window)
    per_window = max(n * d * fft_len * 16, 1)
    budget = 2**29 if jax.default_backend() == "cpu" else 2**32
    return max(1, min(32, budget // per_window))


def windowed_acf_sum(
    x: jnp.ndarray, window: int, stride: int, chunk: int | None = None, tau=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sum of per-window biased ACFs plus per-window particle-mean integral input.

    Parameters
    ----------
    x : (T, N, D) time series (frames, particles, components).
    window, stride : ensemble window length and correlation_time stride.
    chunk : windows processed per scan step (memory knob); ``None``
        (default) sizes it from the working set via ``_auto_chunk``.
    tau : optional (R,) int lag indices — each window is gathered at these
        indices BEFORE the ACF (reference semantics:
        ``green_kubo_ionic_conductivity.py:201`` gathers the ensemble at
        ``tau_values`` and autocorrelates the sub-sampled series).

    Returns
    -------
    acf_sum : (R,) — sum over windows and particles, summed over D, of
        the per-window biased ACF (the reference accumulates exactly this);
        ``R = window`` when ``tau`` is None.
    per_window : (n_windows, R) — per-window particle-MEAN ACF summed
        over D; used for the SEM of the running integral
        (``green_kubo_self_diffusion_coefficients.py:199-206``).
    """
    if chunk is None:
        chunk = _auto_chunk(x.shape[1], x.shape[2], window)
    return _windowed_acf_sum(x, window, stride, chunk, tau)


@functools.partial(
    jax.jit, static_argnames=("window", "stride", "chunk")
)
def _windowed_acf_sum(
    x: jnp.ndarray, window: int, stride: int, chunk: int, tau=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    total = x.shape[0]
    starts = window_starts(total, window, stride)
    n_windows = int(starts.shape[0])
    r = window if tau is None else int(tau.shape[0])
    if n_windows == 0:
        return (
            jnp.zeros((r,), x.dtype),
            jnp.zeros((0, r), x.dtype),
        )

    n_particles = x.shape[1]
    fft_len = _next_fast_len(2 * r)

    def one_window(s):
        seg = jax.lax.dynamic_slice_in_dim(x, s, window, axis=0)  # (W, N, D)
        if tau is not None:
            seg = jnp.take(seg, tau, axis=0)  # (R, N, D)
        seg = jnp.moveaxis(seg, 0, -1)  # (N, D, R)
        # irfft is linear, so sum the power spectra over particles and
        # components FIRST and invert once per window — the per-series
        # irfft (and its (N, D, fft_len) result write) disappears:
        # measured 14.2 -> 28.0 M window-frame-atoms/s at 10k atoms
        # (benchmarks/vacf_slab_sweep.py), identical to the per-series
        # acf_biased sum to ~1e-7 relative.
        f = jnp.fft.rfft(seg, n=fft_len, axis=-1)
        spec = jnp.sum(f.real * f.real + f.imag * f.imag, axis=(0, 1))
        acf_all = jnp.fft.irfft(spec, n=fft_len)[:r] / r  # sum over N, D
        return acf_all, acf_all / n_particles

    sums, means = jax.lax.map(one_window, starts, batch_size=chunk)
    return jnp.sum(sums, axis=0), means
