"""Unit tests for FFT correlation / MSD kernels vs direct numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_analysis_tpu.ops import correlation as C
from lammps_analysis_tpu.ops import msd as M


def direct_biased_acf(x):
    n = x.shape[-1]
    return np.array(
        [np.sum(x[..., : n - m] * x[..., m:], axis=-1) / n for m in range(n)]
    ).T


def test_acf_biased_matches_direct(rng):
    x = rng.normal(size=(5, 37))
    acf = np.asarray(C.acf_biased(jnp.array(x), axis=-1))
    np.testing.assert_allclose(acf, direct_biased_acf(x), atol=1e-12)


def test_acf_multi_axis(rng):
    x = rng.normal(size=(3, 20, 2))
    acf = np.asarray(C.acf_biased(jnp.array(x), axis=1))
    for i in range(3):
        for d in range(2):
            np.testing.assert_allclose(
                acf[i, :, d], direct_biased_acf(x[i, :, d][None])[0], atol=1e-12
            )


def test_cross_correlation(rng):
    x = rng.normal(size=(15,))
    y = rng.normal(size=(15,))
    ccf = np.asarray(C.cross_correlation_biased(jnp.array(x), jnp.array(y)))
    direct = np.array([np.sum(x[: 15 - m] * y[m:]) / 15 for m in range(15)])
    np.testing.assert_allclose(ccf, direct, atol=1e-12)


def test_window_starts():
    starts = np.asarray(C.window_starts(100, 20, 10))
    assert starts.tolist() == [0, 10, 20, 30, 40, 50, 60, 70, 80]
    assert np.asarray(C.window_starts(10, 20, 5)).size == 0


def test_windowed_acf_sum_matches_loop(rng):
    T, N, D, W, S = 40, 3, 2, 16, 4
    x = rng.normal(size=(T, N, D))
    acf_sum, per_window = C.windowed_acf_sum(jnp.array(x), W, S, chunk=2)
    starts = range(0, T - W + 1, S)
    expect = np.zeros(W)
    expect_windows = []
    for s in starts:
        seg = x[s : s + W]  # (W, N, D)
        acf_nd = np.zeros((N, W))
        for p in range(N):
            for d in range(D):
                acf_nd[p] += direct_biased_acf(seg[:, p, d][None])[0]
        expect += acf_nd.sum(axis=0)
        expect_windows.append(acf_nd.mean(axis=0))
    np.testing.assert_allclose(np.asarray(acf_sum), expect, atol=1e-10)
    np.testing.assert_allclose(np.asarray(per_window), expect_windows, atol=1e-10)


def test_windowed_msd_sum_matches_loop(rng):
    T, N, D, W, S = 50, 5, 3, 20, 7
    pos = rng.normal(size=(T, N, D)).cumsum(axis=0)
    tau = jnp.arange(W)
    msum, nw = M.windowed_msd_sum(jnp.array(pos), tau, W, S)
    expect = np.zeros(W)
    count = 0
    for s in range(0, T - W + 1, S):
        seg = pos[s : s + W]
        expect += ((seg - seg[0]) ** 2).sum(axis=(1, 2))
        count += 1
    np.testing.assert_allclose(np.asarray(msum), expect, rtol=1e-10)
    assert int(nw) == count


def test_windowed_msd_tau_subset(rng):
    T, N, D, W = 30, 2, 3, 10
    pos = rng.normal(size=(T, N, D)).cumsum(axis=0)
    tau = jnp.array([0, 3, 7])
    msum, _ = M.windowed_msd_sum(jnp.array(pos), tau, W, 5)
    full, _ = M.windowed_msd_sum(jnp.array(pos), jnp.arange(W), W, 5)
    np.testing.assert_allclose(
        np.asarray(msum), np.asarray(full)[[0, 3, 7]], rtol=1e-12
    )


def test_msd_gram_cross_sum(rng):
    T, N, D, W, S = 24, 4, 3, 8, 4
    pos = rng.normal(size=(T, N, D)).cumsum(axis=0)
    tau = jnp.arange(W)
    cross, nw = M.windowed_msd_gram_sum(jnp.array(pos), tau, W, S)
    expect = np.zeros(W)
    for s in range(0, T - W + 1, S):
        seg = pos[s : s + W]
        disp = seg - seg[0]  # (W, N, D)
        for a in range(N):
            for b in range(N):
                if a != b:
                    expect += np.sum(disp[:, a] * disp[:, b], axis=-1)
    np.testing.assert_allclose(np.asarray(cross), expect, rtol=1e-9)


def test_incremental_line_fits_match_curve_fit(rng):
    """Closed-form prefix fits == scipy curve_fit for every window."""
    from scipy.optimize import curve_fit

    from lammps_analysis_tpu.utils.fitting import (
        _incremental_line_fits,
        fit_einstein_curve,
    )

    x = np.sort(rng.uniform(0, 10, size=40))
    y = 3.2 * x + 1.5 + rng.normal(scale=0.3, size=40)
    slopes, errs, intercepts = _incremental_line_fits(x, y)
    for m in (3, 7, 25, 40):
        popt, pcov = curve_fit(lambda t, a, b: a * t + b, x[:m], y[:m])
        np.testing.assert_allclose(slopes[m], popt[0], rtol=1e-8)
        np.testing.assert_allclose(intercepts[m], popt[1], rtol=1e-8)
        np.testing.assert_allclose(errs[m], np.sqrt(pcov[0, 0]), rtol=1e-6)

    popt, pcov, grads, grad_errs = fit_einstein_curve(x, y, fit_max_index=30)
    assert abs(popt[0] - 3.2) < 0.5  # short noisy window
    assert len(grads) == len(grad_errs) > 0


def test_windowed_msd_comb_edge_strides(rng):
    """Comb decomposition vs direct loop at awkward (T, W, S) combos.

    Covers: stride not dividing the window, stride > window, stride not
    dividing T, the tail-pad path (last comb row reads past T), and the
    single-window case.
    """
    for (T, W, S) in [(100, 20, 7), (50, 50, 10), (100, 8, 32),
                      (101, 30, 13), (64, 16, 1), (40, 40, 40),
                      (33, 8, 3)]:
        pos = rng.normal(size=(T, 4, 3)).cumsum(axis=0)
        tau = jnp.arange(W)
        msum, nw = M.windowed_msd_sum(jnp.array(pos), tau, W, S)
        expect = np.zeros(W)
        count = 0
        for s in range(0, T - W + 1, S):
            seg = pos[s : s + W]
            expect += ((seg - seg[0]) ** 2).sum(axis=(1, 2))
            count += 1
        assert int(nw) == count, (T, W, S)
        np.testing.assert_allclose(np.asarray(msum), expect, rtol=1e-9)


def test_windowed_msd_empty_when_window_exceeds_frames(rng):
    pos = rng.normal(size=(10, 3, 3))
    msum, nw = M.windowed_msd_sum(jnp.array(pos), jnp.arange(20), 20, 4)
    assert int(nw) == 0
    np.testing.assert_array_equal(np.asarray(msum), np.zeros(20))


def test_time_cumsum_matches_numpy(rng):
    from lammps_analysis_tpu.ops.geometry import time_cumsum

    x = rng.normal(size=(37, 6, 3))
    got = np.asarray(jax.jit(time_cumsum)(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.cumsum(x, axis=0), rtol=1e-12)
    x2 = rng.normal(size=(5, 11))
    got2 = np.asarray(time_cumsum(jnp.asarray(x2), axis=1))
    np.testing.assert_allclose(got2, np.cumsum(x2, axis=1), rtol=1e-12)


@pytest.mark.parametrize("chunk", [None, 1, 3, 100])
def test_windowed_acf_sum_chunk_invariance(rng, chunk):
    """The chunk knob (incl. the auto default and a non-dividing chunk:
    7 windows with chunk=3 leaves a remainder batch, chunk=100 exceeds
    the window count) is pure memory staging — results must be
    bit-comparable across every setting."""
    T, N, D, W, S = 40, 3, 2, 16, 4  # -> 7 windows
    x = rng.normal(size=(T, N, D))
    ref_sum, ref_win = C.windowed_acf_sum(jnp.array(x), W, S, chunk=2)
    got_sum, got_win = C.windowed_acf_sum(jnp.array(x), W, S, chunk=chunk)
    np.testing.assert_allclose(np.asarray(got_sum), np.asarray(ref_sum),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got_win), np.asarray(ref_win),
                               rtol=1e-12)


def test_windowed_acf_sum_tau_subset_matches_direct(rng):
    """tau gathers each window BEFORE the ACF (reference gathers the
    ensemble at tau_values then autocorrelates the sub-sampled series)."""
    T, N, D, W, S = 36, 2, 3, 12, 6
    tau = jnp.array([0, 2, 5, 11])
    x = rng.normal(size=(T, N, D))
    acf_sum, per_window = C.windowed_acf_sum(
        jnp.array(x), W, S, chunk=2, tau=tau
    )
    r = int(tau.shape[0])
    expect = np.zeros(r)
    expect_windows = []
    for s in range(0, T - W + 1, S):
        seg = x[s : s + W][np.asarray(tau)]  # (R, N, D)
        acf_nd = np.zeros((N, r))
        for p in range(N):
            for d in range(D):
                acf_nd[p] += direct_biased_acf(seg[:, p, d][None])[0]
        expect += acf_nd.sum(axis=0)
        expect_windows.append(acf_nd.mean(axis=0))
    np.testing.assert_allclose(np.asarray(acf_sum), expect, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(per_window), expect_windows, atol=1e-10
    )
