"""Unit tests for RDF/ADF histogram kernels vs O(N^2)/O(N^3) numpy oracles."""

import itertools

import jax.numpy as jnp
import numpy as np

from lammps_analysis_tpu.ops import adf as A
from lammps_analysis_tpu.ops import rdf as R
from lammps_analysis_tpu.ops.histogram import histogram_fixed_width


def test_histogram_fixed_width_matches_numpy(rng):
    vals = rng.uniform(0, 5, size=(1000,))
    for strategy in ("compare", "scatter"):
        h = np.asarray(
            histogram_fixed_width(jnp.array(vals), 0.0, 5.0, 25, strategy=strategy)
        )
        expect, _ = np.histogram(vals, bins=25, range=(0, 5))
        np.testing.assert_array_equal(h, expect)


def _direct_rdf(pos, sid, ptab, box, cutoff, nbins, n_pairs):
    n = pos.shape[1]
    direct = np.zeros((n_pairs, nbins))
    for f in range(pos.shape[0]):
        for i in range(n):
            for j in range(i + 1, n):
                r = pos[f, i] - pos[f, j]
                r -= box * np.round(r / box)
                d = np.linalg.norm(r)
                if d < cutoff:
                    b = min(int(d / cutoff * nbins), nbins - 1)
                    direct[ptab[sid[i], sid[j]], b] += 1
    return direct


def test_rdf_histogram_matches_direct(rng):
    n_a, n_b = 13, 11
    box = np.array([6.0, 6.0, 6.0])
    pos = rng.uniform(0, 6, size=(3, n_a + n_b, 3))
    sid, npad, ptab, n_pairs, order = R.build_species_layout([n_a, n_b], pad_to=8)
    pos_pad = np.zeros((3, npad, 3))
    pos_pad[:, : n_a + n_b] = pos
    cutoff, nbins = 2.9, 50
    for strategy in ("compare", "scatter"):
        h = np.asarray(
            R.rdf_histogram(
                jnp.array(pos_pad), jnp.array(sid), jnp.array(ptab),
                jnp.array(box), cutoff, nbins, n_pairs,
                i_block=8, strategy=strategy,
            )
        )
        direct = _direct_rdf(pos, sid, ptab, box, cutoff, nbins, n_pairs)
        np.testing.assert_array_equal(h, direct)
    assert order == [(0, 0), (0, 1), (1, 1)]


def test_rdf_three_species(rng):
    counts = [5, 9, 6]
    box = np.array([4.0, 4.0, 4.0])
    pos = rng.uniform(0, 4, size=(2, sum(counts), 3))
    sid, npad, ptab, n_pairs, order = R.build_species_layout(counts, pad_to=8)
    pos_pad = np.zeros((2, npad, 3))
    pos_pad[:, : sum(counts)] = pos
    h = np.asarray(
        R.rdf_histogram(
            jnp.array(pos_pad), jnp.array(sid), jnp.array(ptab),
            jnp.array(box), 1.9, 30, n_pairs, i_block=8,
        )
    )
    direct = _direct_rdf(pos, sid, ptab, box, 1.9, 30, n_pairs)
    np.testing.assert_array_equal(h, direct)
    assert n_pairs == 6


def test_ideal_gas_correction_spherical_region():
    edges = np.linspace(0, 2.4, 100)  # cutoff < box/2 -> pure 4 pi r^2
    corr = R.ideal_gas_correction(edges, box_l=5.0)
    np.testing.assert_allclose(corr, 4 * np.pi * edges**2, rtol=1e-12)


def test_ideal_gas_correction_piecewise_continuity():
    box_l = 5.0
    r1 = box_l / 2
    r2 = np.sqrt(2) * box_l / 2
    eps = 1e-9
    c = R.ideal_gas_correction(np.array([r1 - eps, r1 + eps]), box_l)
    assert abs(c[0] - c[1]) / c[0] < 1e-5
    c = R.ideal_gas_correction(np.array([r2 - eps, r2 + eps]), box_l)
    assert abs(c[0] - c[1]) / c[0] < 1e-4


def test_rdf_prefactor_ideal_gas(rng):
    """g(r) of an ideal gas (uniform random points) must be ~1."""
    n = 200
    box = np.array([10.0, 10.0, 10.0])
    frames = 40
    pos = rng.uniform(0, 10, size=(frames, n, 3))
    sid, npad, ptab, n_pairs, order = R.build_species_layout([n], pad_to=8)
    pos_pad = np.zeros((frames, npad, 3))
    pos_pad[:, :n] = pos
    cutoff, nbins = 4.9, 50
    h = np.asarray(
        R.rdf_histogram(
            jnp.array(pos_pad), jnp.array(sid), jnp.array(ptab),
            jnp.array(box), cutoff, nbins, n_pairs, i_block=64,
        )
    )
    edges = np.linspace(0, cutoff, nbins)
    pref = R.rdf_prefactors(order, [n], 1000.0, frames, edges, 10.0)
    g = h * pref
    # skip the first bins (poor statistics at tiny r)
    assert abs(np.mean(g[0, 10:]) - 1.0) < 0.05


def _direct_adf(pos, sid, ttab, box, cutoff, nbins, n_triples, norm_power):
    lo, hi = A.ADF_BIN_RANGE
    n = pos.shape[1]
    out = np.zeros((n_triples, nbins))
    for f in range(pos.shape[0]):
        disp = np.zeros((n, n, 3))
        for i in range(n):
            r = pos[f] - pos[f, i]
            r -= box * np.round(r / box)
            disp[i] = r
        d = np.linalg.norm(disp, axis=-1)
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    if j == i or k == i or j == k:
                        continue
                    if d[i, j] >= cutoff or d[i, k] >= cutoff:
                        continue
                    t = ttab[sid[i], sid[j], sid[k]]
                    if t < 0:
                        continue
                    cos = np.dot(disp[i, j], disp[i, k]) / (d[i, j] * d[i, k])
                    ang = np.arccos(np.clip(cos, -1, 1))
                    b = min(int((ang - lo) / (hi - lo) * nbins), nbins - 1)
                    out[t, b] += 1.0 / (d[i, j] * d[i, k]) ** norm_power
    return out


def test_adf_histogram_matches_direct(rng):
    counts = [7, 5]
    box = np.array([5.0, 5.0, 5.0])
    pos = rng.uniform(0, 5, size=(2, sum(counts), 3))
    sid, npad, _, _, _ = R.build_species_layout(counts, pad_to=8)
    ttab, order = A.build_triple_table(2)
    n_triples = len(order)
    pos_pad = np.zeros((2, npad, 3))
    pos_pad[:, : sum(counts)] = pos
    h = np.asarray(
        A.adf_histogram(
            jnp.array(pos_pad), jnp.array(sid), jnp.array(ttab),
            jnp.array(box), 2.4, 20, n_triples, norm_power=4, c_block=8,
        )
    )
    direct = _direct_adf(pos, sid, ttab, box, 2.4, 20, n_triples, 4)
    np.testing.assert_allclose(h, direct, rtol=1e-5)
    assert order == list(
        itertools.combinations_with_replacement(range(2), 3)
    )


def test_adf_tiled_matches_full(rng):
    counts = [20, 12]
    box = np.array([5.0, 5.0, 5.0])
    sid, npad, _, _, _ = R.build_species_layout(counts, pad_to=8)
    ttab, order = A.build_triple_table(2)
    pos = np.zeros((2, npad, 3))
    pos[:, :32] = rng.uniform(0, 5, size=(2, 32, 3))
    args = (jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box))
    h_full = np.asarray(
        A.adf_histogram(*args, 2.2, 36, len(order), norm_power=4, c_block=8)
    )
    h_tiled = np.asarray(
        A.adf_histogram_tiled(
            *args, 2.2, 36, len(order), norm_power=4, c_block=4, jk_block=16
        )
    )
    np.testing.assert_allclose(h_tiled, h_full, rtol=1e-5)


def test_adf_neighbor_list_matches_full(rng):
    counts = [20, 12]
    box = np.array([5.0, 5.0, 5.0])
    sid, npad, _, _, _ = R.build_species_layout(counts, pad_to=8)
    ttab, order = A.build_triple_table(2)
    pos = np.zeros((2, npad, 3))
    pos[:, :32] = rng.uniform(0, 5, size=(2, 32, 3))
    args = (jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box))
    h_full = np.asarray(
        A.adf_histogram(*args, 2.2, 36, len(order), norm_power=4, c_block=8)
    )
    h_nb, max_count = A.adf_histogram_neighbors(
        *args, 2.2, 36, len(order), norm_power=4, c_block=8,
        max_neighbors=32,
    )
    h_nb = np.asarray(h_nb)
    assert int(max_count) <= 32
    np.testing.assert_allclose(h_nb, h_full, rtol=2e-4, atol=1e-4)


def test_adf_neighbor_saturation_retry(rng):
    """A dense cluster exceeds the density-sized K; the wrapper must
    detect list saturation and retry until the result is exact."""
    from lammps_analysis_tpu.parallel.sharded_ops import sharded_adf_histogram

    counts = [24, 16]
    box = np.array([50.0, 50.0, 50.0])  # avg density tiny -> minimal K
    sid, npad, _, _, _ = R.build_species_layout(counts, pad_to=8)
    ttab, order = A.build_triple_table(2)
    pos = np.zeros((2, npad, 3))
    # all atoms inside a 1.5 Angstrom ball: every center sees all others
    pos[:, :40] = 25.0 + rng.uniform(-0.75, 0.75, size=(2, 40, 3))
    args = (jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box))
    h_full = np.asarray(
        A.adf_histogram(*args, 3.0, 36, len(order), norm_power=4, c_block=8)
    )
    h_nb = np.asarray(
        sharded_adf_histogram(
            *args, cutoff=3.0, n_bins=36, n_triples=len(order),
            norm_power=4, tiled=True,
        )
    )
    np.testing.assert_allclose(h_nb, h_full, rtol=2e-4, atol=1e-4)


def test_ideal_correction_beyond_half_box_monte_carlo(rng):
    """The piecewise sphere-box intersection corrections (reference
    radial_distribution_function.py:719-826) against direct Monte Carlo:
    the shell term at radius r is 4 pi r^2 times the fraction of
    directions that stay inside the min-image cube."""
    from lammps_analysis_tpu.ops.rdf import ideal_gas_correction

    L = 10.0
    rs = np.array([3.0, 4.9, 5.1, 5.5, 6.0, 6.5, 7.0])
    vals = ideal_gas_correction(rs, L)
    u = rng.normal(size=(400_000, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    for r, v in zip(rs, vals):
        inside = np.all(np.abs(r * u) <= L / 2, axis=1).mean()
        mc = 4 * np.pi * r**2 * inside
        # MC noise at 400k samples is ~0.5% where the surviving solid
        # angle is small; 2% still cleanly rejects the uncorrected
        # 4 pi r^2 term (70% too high at r=6.5)
        np.testing.assert_allclose(v, mc, rtol=2e-2,
                                   err_msg=f"correction wrong at r={r}")


def test_rdf_beyond_half_box_cutoff(tmp_path, rng):
    """An RDF with cutoff in (L/2, sqrt(2) L/2) runs end-to-end and stays
    normalised: an ideal gas must give g ~ 1 through the corrected range
    (the uncorrected 4 pi r^2 term would bias it low past L/2)."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        PropertyInfo, SpeciesInfo, TrajectoryChunkData, TrajectoryMetadata,
    )
    from lammps_analysis_tpu.file_io import ScriptInput

    POS = PropertyInfo("Positions", 3)
    n, t, box = 600, 40, 10.0
    sp = [SpeciesInfo("X", n, [POS])]
    meta = TrajectoryMetadata(
        n_configurations=t, species_list=sp, box_l=[box] * 3, sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, t)
    chunk.add_data(rng.uniform(0, box, (t, n, 3)), 0, "X", "Positions")
    exp = latpu.Project(name="hb", storage_path=tmp_path).add_experiment(
        "e", timestep=0.1, units="real",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    cutoff = 6.5  # > L/2 = 5, < sqrt(2) L/2 = 7.07
    res = exp.run.RadialDistributionFunction(
        number_of_configurations=t, cutoff=cutoff, number_of_bins=65,
        plot=False,
    )
    g = np.asarray(res["X_X"]["y"])
    x = np.asarray(res["X_X"]["x"])  # nm
    sel = (x > 0.15) & (x < 0.63)  # away from r=0 noise and the last bin
    assert np.abs(np.mean(g[sel]) - 1.0) < 0.05
    # specifically the corrected region past L/2
    past = (x > 0.52) & (x < 0.63)
    assert np.abs(np.mean(g[past]) - 1.0) < 0.08
