"""Atom-selection tests: slices and per-species dicts restrict calculators."""

import numpy as np
import pytest

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.database import (
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from lammps_analysis_tpu.file_io import ScriptInput

UNWRAPPED = PropertyInfo("Unwrapped_Positions", 3)
POSITIONS = PropertyInfo("Positions", 3)


@pytest.fixture()
def exp(tmp_path, rng):
    n_frames = 200
    sp = [SpeciesInfo("A", 20, [UNWRAPPED, POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    # first 10 atoms diffuse fast, last 10 slow
    fast = np.cumsum(rng.normal(scale=0.2, size=(n_frames, 10, 3)), axis=0)
    slow = np.cumsum(rng.normal(scale=0.02, size=(n_frames, 10, 3)), axis=0)
    pos = np.concatenate([fast, slow], axis=1)
    chunk.add_data(pos, 0, "A", "Unwrapped_Positions")
    chunk.add_data(pos - 10 * np.floor(pos / 10), 0, "A", "Positions")
    project = latpu.Project(name="p", storage_path=tmp_path)
    return project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )


def test_diffusion_atom_selection_slice(exp):
    d_fast = exp.run.EinsteinDiffusionCoefficients(
        data_range=50, correlation_time=25,
        atom_selection=slice(0, 10), plot=False,
    )["A"]["diffusion_coefficient"]
    d_slow = exp.run.EinsteinDiffusionCoefficients(
        data_range=50, correlation_time=25,
        atom_selection=list(range(10, 20)), plot=False,
    )["A"]["diffusion_coefficient"]
    assert d_fast > 20 * d_slow  # (0.2/0.02)^2 = 100x expected
    # expected values for the fast subset: 0.2^2/(2*0.1)
    assert abs(d_fast - 0.2) / 0.2 < 0.2


def test_selection_distinct_cache_entries(exp):
    r1 = exp.run.EinsteinDiffusionCoefficients(
        data_range=40, atom_selection=slice(0, 10), plot=False
    )
    r2 = exp.run.EinsteinDiffusionCoefficients(
        data_range=40, atom_selection=slice(10, 20), plot=False
    )
    assert (
        r1["A"]["diffusion_coefficient"] != r2["A"]["diffusion_coefficient"]
    )
    # identical selection -> cache hit
    r3 = exp.run.EinsteinDiffusionCoefficients(
        data_range=40, atom_selection=slice(0, 10), plot=False
    )
    assert r3["A"]["diffusion_coefficient"] == r1["A"]["diffusion_coefficient"]


def test_rdf_atom_selection_dict(exp):
    res = exp.run.RadialDistributionFunction(
        number_of_configurations=50,
        atom_selection={"A": list(range(10))},
        plot=False,
    )
    g = np.asarray(res["A_A"]["y"])
    assert np.isfinite(g).all()
    full = exp.run.RadialDistributionFunction(
        number_of_configurations=50, plot=False
    )
    assert not np.array_equal(g, np.asarray(full["A_A"]["y"]))


def test_adf_atom_selection(exp):
    """ADF must honor atom_selection (it was silently discarded once)."""
    sel = exp.run.AngularDistributionFunction(
        number_of_configurations=5, cutoff=6.0, number_of_bins=60,
        atom_selection={"A": list(range(10))}, plot=False,
    )
    full = exp.run.AngularDistributionFunction(
        number_of_configurations=5, cutoff=6.0, number_of_bins=60, plot=False,
    )
    g_sel = np.asarray(sel["A_A_A"]["adf"])
    g_full = np.asarray(full["A_A_A"]["adf"])
    assert np.isfinite(g_sel).all() and np.isfinite(g_full).all()
    assert not np.array_equal(g_sel, g_full)
    # identical selection -> cache hit returns identical data
    again = exp.run.AngularDistributionFunction(
        number_of_configurations=5, cutoff=6.0, number_of_bins=60,
        atom_selection={"A": list(range(10))}, plot=False,
    )
    assert np.array_equal(np.asarray(again["A_A_A"]["adf"]), g_sel)


def test_adf_selection_matches_reduced_system(tmp_path, rng):
    """ADF on a selection == ADF on a system containing only those atoms."""
    n_frames, box = 4, 10.0
    pos_all = rng.uniform(0, box, size=(n_frames, 12, 3))
    proj = latpu.Project(name="p2", storage_path=tmp_path)

    sp_full = [SpeciesInfo("A", 12, [POSITIONS])]
    meta_f = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp_full, box_l=[box] * 3,
        sample_rate=1,
    )
    ch_f = TrajectoryChunkData(sp_full, n_frames)
    ch_f.add_data(pos_all, 0, "A", "Positions")
    e_full = proj.add_experiment(
        "full", timestep=0.1, units="si",
        simulation_data=ScriptInput(ch_f, meta_f, "df"),
    )

    sp_red = [SpeciesInfo("A", 6, [POSITIONS])]
    meta_r = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp_red, box_l=[box] * 3,
        sample_rate=1,
    )
    ch_r = TrajectoryChunkData(sp_red, n_frames)
    ch_r.add_data(pos_all[:, :6], 0, "A", "Positions")
    e_red = proj.add_experiment(
        "red", timestep=0.1, units="si",
        simulation_data=ScriptInput(ch_r, meta_r, "dr"),
    )

    kwargs = dict(
        number_of_configurations=n_frames, cutoff=5.0, number_of_bins=40,
        start=0, stop=n_frames - 1, plot=False,
    )
    a_sel = e_full.run.AngularDistributionFunction(
        atom_selection={"A": list(range(6))}, **kwargs
    )
    a_red = e_red.run.AngularDistributionFunction(**kwargs)
    np.testing.assert_allclose(
        np.asarray(a_sel["A_A_A"]["adf"]),
        np.asarray(a_red["A_A_A"]["adf"]),
        rtol=1e-6,
    )


def test_structural_start_stop_asymmetry(exp):
    """start/stop sampling must flow through RDF and ADF (distinct caches)."""
    early = exp.run.RadialDistributionFunction(
        number_of_configurations=20, start=0, stop=80, plot=False
    )
    late = exp.run.RadialDistributionFunction(
        number_of_configurations=20, start=100, stop=199, plot=False
    )
    g_e = np.asarray(early["A_A"]["y"])
    g_l = np.asarray(late["A_A"]["y"])
    assert np.isfinite(g_e).all() and np.isfinite(g_l).all()
    assert not np.array_equal(g_e, g_l)

    a_early = exp.run.AngularDistributionFunction(
        number_of_configurations=4, start=0, stop=80,
        number_of_bins=50, plot=False,
    )
    a_late = exp.run.AngularDistributionFunction(
        number_of_configurations=4, start=100, stop=199,
        number_of_bins=50, plot=False,
    )
    assert not np.array_equal(
        np.asarray(a_early["A_A_A"]["adf"]), np.asarray(a_late["A_A_A"]["adf"])
    )


def test_adf_selection_empty_species(tmp_path, rng):
    """A species selected down to zero atoms must keep its histogram rows
    (regression: the species count was once derived from the selected ids,
    collapsing the (n_triples, n_bins) output shape)."""
    n_frames, box = 3, 8.0
    sp = [SpeciesInfo("A", 12, [POSITIONS]), SpeciesInfo("B", 12, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    for name in ("A", "B"):
        chunk.add_data(rng.uniform(0, box, (n_frames, 12, 3)), 0, name,
                       "Positions")
    exp = latpu.Project(name="z", storage_path=tmp_path).add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    res = exp.run.AngularDistributionFunction(
        number_of_configurations=n_frames, cutoff=4.0, number_of_bins=30,
        atom_selection={"A": list(range(12)), "B": []}, plot=False,
    )
    # all four triple keys exist; B-involving ones are empty
    assert set(res.data_dict) == {"A_A_A", "A_A_B", "A_B_B", "B_B_B"}
    assert np.asarray(res["A_A_A"]["adf"]).sum() > 0
    assert np.asarray(res["B_B_B"]["adf"]).sum() == 0
