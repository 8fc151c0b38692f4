"""Pallas fused-ADF kernel tests (interpret mode on CPU).

Same acceptance pattern as the Pallas RDF: exact agreement with the
independent numpy recomputation and with the XLA kernels up to single-count
adjacent-bin flips where two acos approximations straddle a bin edge. On
real TPU the kernel was validated against an f64 numpy oracle at
sum-ratio 1.0000004 with zero mismatched bins (the XLA path itself bins
with default-precision einsum there).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lammps_analysis_tpu.ops import adf as A
from lammps_analysis_tpu.ops.pallas_adf import (
    PALLAS_ADF_K,
    acos_f32,
    adf_histogram_pallas,
    adf_neighbor_lists,
)


def test_acos_accuracy():
    x = np.linspace(-1, 1, 200001).astype(np.float32)
    mine = np.asarray(acos_f32(jnp.asarray(x)))
    ref = np.arccos(x.astype(np.float64))
    assert np.abs(mine - ref).max() < 5e-7
    # exact endpoints
    np.testing.assert_allclose(np.asarray(acos_f32(jnp.asarray(1.0))), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(acos_f32(jnp.asarray(-1.0))), np.pi, rtol=1e-7
    )


@pytest.mark.parametrize(
    "n_sp,n_each,f,n_bins,p",
    [(2, 48, 3, 73, 4), (3, 50, 2, 500, 4), (1, 150, 2, 107, 2)],
)
def test_pallas_adf_matches_xla(rng, n_sp, n_each, f, n_bins, p):
    box_l, cutoff = 8.0, 2.6
    n = n_sp * n_each
    pos = rng.uniform(0, box_l, (f, n, 3)).astype(np.float32)
    sid = np.repeat(np.arange(n_sp), n_each).astype(np.int32)
    ttab, order = A.build_triple_table(n_sp)
    box = jnp.asarray([box_l] * 3, dtype=jnp.float32)
    h_xla = np.asarray(
        A.adf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab), box,
            cutoff, n_bins, len(order), norm_power=p, c_block=8,
        ),
        dtype=np.float64,
    )
    h_pal, max_count = adf_histogram_pallas(
        jnp.asarray(pos), jnp.asarray(sid), box, cutoff, n_bins, n_sp,
        norm_power=p, interpret=True,
    )
    h_pal = np.asarray(h_pal, dtype=np.float64)
    assert int(max_count) < PALLAS_ADF_K  # neighbor list did not saturate
    # weighted sums agree to the bf16-split error bound
    np.testing.assert_allclose(h_pal.sum(), h_xla.sum(), rtol=1e-5)
    # allow a handful of adjacent-bin boundary flips (different acos
    # approximations), nothing else
    bad = ~np.isclose(h_pal, h_xla, rtol=1e-4, atol=1e-6)
    assert bad.sum() <= max(2, h_xla.size // 64), f"{bad.sum()} bins differ"


def test_neighbor_lists_contract(rng):
    """Stage-1 contract: padded sid returned, invalid slots marked -1."""
    pos = rng.uniform(0, 8.0, (2, 100, 3)).astype(np.float32)
    sid = np.repeat(np.arange(2), 50).astype(np.int32)
    box = jnp.asarray([8.0] * 3, dtype=jnp.float32)
    r_n, d_n, sid_n, sid_pad, mc = adf_neighbor_lists(
        jnp.asarray(pos), jnp.asarray(sid), box, 2.5, k_n=128
    )
    assert r_n.shape[1] == sid_pad.shape[0]  # padded consistently
    assert r_n.shape[1] % 64 == 0
    sid_n = np.asarray(sid_n)
    d_n = np.asarray(d_n)
    # every valid slot is within cutoff; every invalid slot is -1
    valid = sid_n >= 0
    assert (d_n[valid] < 2.5).all()
    # padding centers carry species -1
    assert (np.asarray(sid_pad)[100:] == -1).all()


def test_cell_lists_match_exact_neighbors(rng):
    """Cell-list neighbor search == the O(N^2) scan (distances + species
    multisets per center), including padding atoms and capacity retries."""
    from lammps_analysis_tpu.ops.cells import (
        cell_lists_applicable,
        cells_per_dim,
        neighbor_lists_cells,
    )

    f, n, box_l, cutoff = 2, 500, 20.0, 3.0
    pos = rng.uniform(0, box_l, (f, n, 3)).astype(np.float32)
    sid = np.repeat(np.arange(2), [n // 2, n - n // 2]).astype(np.int32)
    box = jnp.asarray([box_l] * 3, np.float32)
    assert cell_lists_applicable([box_l] * 3, cutoff)
    n_dim = cells_per_dim(box_l, cutoff)

    (_, dA, sA, _, mcA) = adf_neighbor_lists(
        jnp.asarray(pos), jnp.asarray(sid), box, cutoff, k_n=128
    )
    (_, dB, sB, _, mcB, occ) = neighbor_lists_cells(
        jnp.asarray(pos), jnp.asarray(sid), box, cutoff,
        k_n=128, n_dim=n_dim, capacity=32,
    )
    dA, dB, sA, sB = map(np.asarray, (dA, dB, sA, sB))
    assert int(mcA) == int(mcB)
    assert int(occ) <= 32
    nmin = min(dA.shape[1], dB.shape[1])
    for fr in range(f):
        for c in range(nmin):
            da = np.sort(dA[fr, c][sA[fr, c] >= 0])
            db = np.sort(dB[fr, c][sB[fr, c] >= 0])
            assert len(da) == len(db), (fr, c)
            np.testing.assert_allclose(da, db, rtol=1e-6)
            assert sorted(sA[fr, c][sA[fr, c] >= 0]) == sorted(
                sB[fr, c][sB[fr, c] >= 0]
            ), (fr, c)


def test_cell_capacity_overflow_detected(rng):
    """Undersized cells must report max_occupancy > capacity (the retry
    signal) rather than silently dropping atoms."""
    from lammps_analysis_tpu.ops.cells import neighbor_lists_cells

    # all atoms clustered in one cell -> occupancy ~ N >> capacity
    pos = rng.uniform(4.0, 5.0, (1, 300, 3)).astype(np.float32)
    sid = np.zeros(300, np.int32)
    box = jnp.asarray([20.0] * 3, np.float32)
    out = neighbor_lists_cells(
        jnp.asarray(pos), jnp.asarray(sid), box, 3.0,
        k_n=128, n_dim=6, capacity=16,
    )
    assert int(out[5]) > 16  # max_occupancy flags the overflow
