"""Error-path tests: clear failures beat silent corruption."""

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
from lammps_analysis_tpu.utils.constants import SpeciesNotFoundError

POSITIONS = PropertyInfo("Positions", 3)


def _experiment(tmp_path, rng, n_atoms=4, n_frames=10):
    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[5.0] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(rng.uniform(0, 5, (n_frames, n_atoms, 3)), 0, "X",
                   "Positions")
    project = latpu.Project(name="p", storage_path=tmp_path)
    return project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )


def test_unknown_reader_suffix(tmp_path, rng):
    exp = _experiment(tmp_path, rng)
    bad = tmp_path / "data.xtc"
    bad.write_text("binary")
    with pytest.raises(ValueError, match="Cannot infer a reader"):
        exp.add_data(str(bad))


def test_bad_ingest_type(tmp_path, rng):
    exp = _experiment(tmp_path, rng)
    with pytest.raises(TypeError, match="Cannot ingest"):
        exp.add_data(12345)


def test_inconsistent_species_on_append(tmp_path, rng):
    exp = _experiment(tmp_path, rng, n_atoms=4)
    sp = [SpeciesInfo("X", 7, [POSITIONS])]  # particle count changed
    meta = TrajectoryMetadata(
        n_configurations=5, species_list=sp, box_l=[5.0] * 3, sample_rate=1
    )
    chunk = TrajectoryChunkData(sp, 5)
    chunk.add_data(rng.uniform(0, 5, (5, 7, 3)), 0, "X", "Positions")
    with pytest.raises(ValueError, match="particle count changed"):
        exp.add_data(ScriptInput(chunk, meta, "other"))


def test_unknown_entity(tmp_path, rng):
    exp = _experiment(tmp_path, rng)
    with pytest.raises(SpeciesNotFoundError):
        exp.entity("Unobtainium")


def test_missing_underivable_property(tmp_path, rng):
    exp = _experiment(tmp_path, rng)
    with pytest.raises(ValueError, match="no transformation produces it"):
        # GK diffusion needs Velocities; only Positions are stored and no
        # registered transformation produces "Velocities"
        exp.run.GreenKuboDiffusionCoefficients(data_range=5, plot=False)


def test_truncated_dump_file(tmp_path):
    path = tmp_path / "broken.lammpstraj"
    with open(path, "w") as f:
        f.write("ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n4\n")
        f.write("ITEM: BOX BOUNDS pp pp pp\n0 5\n0 5\n0 5\n")
        f.write("ITEM: ATOMS id element x y z\n")
        f.write("1 Na 1.0 1.0 1.0\n2 Na 2.0 2.0 2.0\n")  # 2 of 4 rows
    from lammps_analysis_tpu.file_io import LAMMPSDumpFile

    with pytest.raises(ValueError, match="not a whole number"):
        LAMMPSDumpFile(path).metadata


def test_data_range_exceeds_trajectory(tmp_path, rng):
    exp = _experiment(tmp_path, rng, n_frames=10)
    sp = exp  # noqa: F841
    with pytest.raises(ValueError, match="exceeds"):
        exp.run.EinsteinDiffusionCoefficients(data_range=50, plot=False)
