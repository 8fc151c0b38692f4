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
