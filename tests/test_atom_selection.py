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
