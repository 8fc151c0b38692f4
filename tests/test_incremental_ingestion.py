"""Incremental ingestion: appended data extends transformations and
invalidates cached results (the reference's checkpoint/resume semantics,
SURVEY §5: version bump on new data, offset-resumed transformations).
"""

import numpy as np

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.database import (
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from lammps_analysis_tpu.file_io import ScriptInput

POSITIONS = PropertyInfo("Positions", 3)


def _chunk(pos, sp):
    c = TrajectoryChunkData(sp, pos.shape[0])
    c.add_data(pos, 0, "X", "Positions")
    return c


def test_append_extends_transformations_and_invalidates_cache(tmp_path, rng):
    box = 4.0
    n_atoms = 6
    true_pos = np.cumsum(
        rng.normal(scale=0.3, size=(120, n_atoms, 3)), axis=0
    ) + box / 2
    wrapped = true_pos - box * np.floor(true_pos / box)
    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]

    def meta(n):
        return TrajectoryMetadata(
            n_configurations=n, species_list=sp, box_l=[box] * 3, sample_rate=1
        )

    project = latpu.Project(name="p", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(_chunk(wrapped[:60], sp), meta(60), "part1"),
    )
    v1 = exp.version
    res1 = exp.run.EinsteinDiffusionCoefficients(
        data_range=30, correlation_time=15, plot=False
    )
    assert exp.store.get_cursor("X/Unwrapped_Positions") == 60

    # append the second half as a new source
    exp.add_data(ScriptInput(_chunk(wrapped[60:], sp), meta(60), "part2"))
    assert exp.number_of_configurations == 120
    assert exp.version == v1 + 1

    # same args now recompute (version changed) and the unwrap extends
    res2 = exp.run.EinsteinDiffusionCoefficients(
        data_range=30, correlation_time=15, plot=False
    )
    assert exp.store.get_cursor("X/Unwrapped_Positions") == 120
    assert len(exp.db.list_computations("e")) == 2
    assert (
        res2["X"]["diffusion_coefficient"] != res1["X"]["diffusion_coefficient"]
    )

    # the extended unwrapped trajectory is seam-free: displacement across
    # the append boundary matches the true walk
    got = exp.load_matrix("Unwrapped_Positions", ["X"])["X"]
    d_true = true_pos[70] - true_pos[50]
    d_got = got[70] - got[50]
    np.testing.assert_allclose(d_got, d_true, atol=1e-9)


def test_disjoint_species_append_rejected(tmp_path, rng):
    """Appending a source missing an existing species must raise.

    Regression: a disjoint append used to leave the missing species'
    datasets short while number_of_configurations grew, so later loads
    read resized-but-unwritten zero frames.
    """
    import pytest

    sp_xy = [
        SpeciesInfo("X", 4, [POSITIONS]),
        SpeciesInfo("Y", 4, [POSITIONS]),
    ]
    meta_xy = TrajectoryMetadata(
        n_configurations=10, species_list=sp_xy, box_l=[10.0] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp_xy, 10)
    for name in ("X", "Y"):
        chunk.add_data(rng.uniform(0, 10, (10, 4, 3)), 0, name, "Positions")
    project = latpu.Project(name="pdisj", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta_xy, "both"),
    )

    sp_x = [SpeciesInfo("X", 4, [POSITIONS])]
    meta_x = TrajectoryMetadata(
        n_configurations=10, species_list=sp_x, box_l=[10.0] * 3,
        sample_rate=1,
    )
    chunk_x = TrajectoryChunkData(sp_x, 10)
    chunk_x.add_data(rng.uniform(0, 10, (10, 4, 3)), 0, "X", "Positions")
    with pytest.raises(ValueError, match="same species"):
        exp.add_data(ScriptInput(chunk_x, meta_x, "only_x"))
    # the failed append must not corrupt the frame count
    assert exp.number_of_configurations == 10


def test_list_of_sources_ingests_in_order(tmp_path, rng):
    """``simulation_data=[a, b]`` must ingest both sources sequentially
    (reference: Experiment.add_data list handling) — configurations
    concatenate in list order and the ledger records each source."""
    box = 4.0
    pos = np.cumsum(rng.normal(scale=0.2, size=(40, 6, 3)), axis=0) % box
    sp = [SpeciesInfo("X", 6, [POSITIONS])]

    def meta(n):
        return TrajectoryMetadata(
            n_configurations=n, species_list=sp, box_l=[box] * 3,
            sample_rate=1,
        )

    project = latpu.Project(name="p", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=[
            ScriptInput(_chunk(pos[:25], sp), meta(25), "partA"),
            ScriptInput(_chunk(pos[25:], sp), meta(15), "partB"),
        ],
    )
    assert exp.number_of_configurations == 40
    stored = exp.store.load(["X/Positions"])["X/Positions"]
    np.testing.assert_allclose(stored, pos, rtol=1e-6)
