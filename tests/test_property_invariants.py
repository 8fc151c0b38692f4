"""Hypothesis property tests of the pure streaming/binning/fitting logic.

These lock the invariants the streamed calculators rest on across the
whole parameter space (fixed-seed unit tests elsewhere pin single
configurations):

* window-aligned slab plans enumerate exactly the whole-array window set;
* the three histogram strategies are numerically interchangeable;
* the O(n) incremental line fits match scipy's curve_fit per prefix;
* ``_as_slice`` is equivalence-preserving for ANY index list;
* the FFT ACF matches the O(T^2) direct sum (tfp's biased estimator).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lammps_analysis_tpu.calculators.base import window_aligned_slabs
from lammps_analysis_tpu.file_io.tabular import _as_slice
from lammps_analysis_tpu.ops.correlation import acf_biased, window_starts
from lammps_analysis_tpu.ops.histogram import (
    masked_histogram_compare,
    masked_histogram_outer,
    masked_histogram_scatter,
)
from lammps_analysis_tpu.utils.fitting import _incremental_line_fits

# keep per-example work tiny: examples run single-threaded on one core
_SETTINGS = dict(max_examples=200, deadline=None)


@settings(**_SETTINGS)
@given(
    n_frames=st.integers(0, 400),
    slab=st.integers(1, 400),
    data_range=st.integers(1, 200),
    correlation_time=st.integers(1, 64),
)
def test_window_aligned_slabs_enumerate_every_window_once(
    n_frames, slab, data_range, correlation_time
):
    """Slab-relative window iteration == whole-array window iteration.

    This is THE invariant of every streamed windowed calculator: windows
    are enumerated per slab at slab-relative starts 0, ct, 2ct, ... (as
    ``_window_slabs`` does), so the global multiset of window starts must
    equal {0, ct, ...} ∩ [0, n_frames - data_range], each exactly once.
    """
    slabs = window_aligned_slabs(
        n_frames, slab, data_range, correlation_time
    )
    got = []
    for start, stop in slabs:
        assert 0 <= start < stop <= n_frames
        w = start
        while w + data_range <= stop:
            got.append(w)
            w += correlation_time
    expected = list(
        np.asarray(
            window_starts(n_frames, data_range, correlation_time)
        )
    )
    assert got == expected


@settings(max_examples=80, deadline=None)
@given(
    # bucketed sizes: every (n, n_bins) pair compiles a fresh XLA program,
    # so random sizes would spend the test budget on compiles — the
    # values hit the interesting regimes (single bin, non-multiple of the
    # compare chunk, sqrt-split remainders, n below/above the outer pad)
    n=st.sampled_from([1, 7, 128, 300]),
    n_bins=st.sampled_from([1, 3, 97, 128, 500, 600]),
    seed=st.integers(0, 2**31 - 1),
)
def test_histogram_strategies_agree(n, n_bins, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_bins, size=n).astype(np.int32)
    w = rng.uniform(0, 1, size=n).astype(np.float32)
    ref = np.zeros(n_bins, np.float64)
    np.add.at(ref, idx, w.astype(np.float64))
    import jax

    scatter = np.asarray(masked_histogram_scatter(idx, w, n_bins))
    compare = np.asarray(masked_histogram_compare(idx, w, n_bins))
    outer = np.asarray(
        masked_histogram_outer(
            idx, w, n_bins, precision=jax.lax.Precision.HIGHEST
        )
    )
    np.testing.assert_allclose(scatter, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(compare, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outer, ref, rtol=1e-5, atol=1e-5)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(3, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_incremental_line_fits_match_curve_fit(n, seed):
    from scipy.optimize import curve_fit

    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 10, size=n))
    # strictly increasing x so every prefix >= 3 is well-posed
    x += np.arange(n) * 1e-3
    y = 2.5 * x - 1.0 + rng.normal(0, 0.3, size=n)
    slopes, slope_errs, intercepts = _incremental_line_fits(x, y)
    for m in (3, n // 2, n):
        if m < 3:
            continue
        popt, pcov = curve_fit(
            lambda t, a, b: a * t + b, x[:m], y[:m]
        )
        # atol floor: a by-chance near-zero prefix slope conditions the
        # sufficient-statistics solve at ~1e-7 absolute vs the centered
        # curve_fit solve — physically irrelevant, not a logic bug
        np.testing.assert_allclose(slopes[m], popt[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            intercepts[m], popt[1], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            slope_errs[m], np.sqrt(pcov[0, 0]), rtol=1e-4
        )


@settings(**_SETTINGS)
@given(
    idx=st.lists(st.integers(0, 30), min_size=1, max_size=12),
)
def test_as_slice_equivalent_for_any_index_list(idx):
    arr = np.arange(31 * 4).reshape(4, 31)
    np.testing.assert_array_equal(arr[:, _as_slice(list(idx))], arr[:, idx])


@settings(max_examples=80, deadline=None)
@given(
    t=st.integers(1, 64),
    seed=st.integers(0, 2**31 - 1),
)
def test_acf_biased_matches_direct_sum(t, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=t)
    direct = np.array(
        [np.dot(x[: t - m], x[m:]) / t for m in range(t)]
    )
    got = np.asarray(acf_biased(x))
    np.testing.assert_allclose(got, direct, rtol=1e-8, atol=1e-10)


@settings(**_SETTINGS)
@given(
    n_frames=st.integers(0, 50),
    frame_batch=st.integers(1, 50),
)
def test_batch_plan_slabs_partition_exactly(n_frames, frame_batch):
    from lammps_analysis_tpu.memory.planner import BatchPlan

    plan = BatchPlan(
        frame_batch=frame_batch,
        n_batches=-(-n_frames // frame_batch) if n_frames else 0,
        remainder=n_frames % frame_batch,
        atom_block=128,
        total_frames=n_frames,
    )
    covered = []
    prev_stop = 0
    for start, stop in plan.slabs():
        assert start == prev_stop and stop - start <= frame_batch
        covered.extend(range(start, stop))
        prev_stop = stop
    assert covered == list(range(n_frames))


@settings(max_examples=100, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    center=st.booleans(),
)
def test_wrap_coordinates_congruent_and_in_interval(seed, center):
    """Wrapping must return values congruent to the input modulo the box
    and inside the target interval ([0, L) or [-L/2, L/2)). The centered
    form once post-shifted a [0, L) wrap, yielding non-congruent values."""
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.geometry import wrap_coordinates

    rng = np.random.default_rng(seed)
    box = rng.uniform(2.0, 20.0, size=3)
    pos = rng.uniform(-3, 3, size=(8, 3)) * box
    wrapped = np.asarray(
        wrap_coordinates(jnp.asarray(pos), jnp.asarray(box), center=center)
    )
    lo = -box / 2 if center else np.zeros(3)
    hi = box / 2 if center else box
    assert (wrapped >= lo - 1e-9).all() and (wrapped < hi + 1e-9).all()
    k = (pos - wrapped) / box
    np.testing.assert_allclose(k, np.round(k), atol=1e-6)


@settings(max_examples=150, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(
        ["%.4f", "%.8f", "%.12f", "%.15f", "%.17g", "%g", "%e", "%.10e",
         "repr"]
    ),
    scale=st.sampled_from([1e-8, 1e-3, 1.0, 1e4, 1e12]),
)
def test_native_parser_bit_exact_for_any_rendering(seed, fmt, scale):
    """Every rendered float must parse BIT-IDENTICALLY to python float()
    regardless of the format (the fixed-decimal fast path must either be
    exact or fall back to from_chars — never silently lose ulps)."""
    from lammps_analysis_tpu.file_io.native_parser import (
        available,
        parse_table_block,
    )

    if not available():
        pytest.skip("native parser unavailable")
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=8) * scale
    tokens = [repr(float(v)) if fmt == "repr" else fmt % v for v in vals]
    line = (" ".join(tokens) + "\n").encode()
    out = np.asarray(parse_table_block(line, 1, 0, 1, len(tokens))).ravel()
    for got, tok in zip(out, tokens):
        want = float(tok)
        assert got == want, (tok, got.hex(), float(tok).hex())


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
