"""Tests: SDF calculator, time series, trajectory visualizer, report."""

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

POSITIONS = PropertyInfo("Positions", 3)
PE = PropertyInfo("Potential_Energy", 1)


@pytest.fixture()
def sdf_experiment(tmp_path, rng):
    """Central atom at origin + partners clustered along +z in a shell."""
    n_frames, box = 12, 20.0
    n_b = 40
    center = np.full((n_frames, 1, 3), box / 2)
    theta = rng.uniform(0, 0.3, size=(n_frames, n_b))  # near +z pole
    phi = rng.uniform(-np.pi, np.pi, size=(n_frames, n_b))
    r = rng.uniform(4.0, 4.5, size=(n_frames, n_b))
    partners = center + np.stack(
        [
            r * np.sin(theta) * np.cos(phi),
            r * np.sin(theta) * np.sin(phi),
            r * np.cos(theta),
        ],
        axis=-1,
    )
    sp = [
        SpeciesInfo("A", 1, [POSITIONS, PE]),
        SpeciesInfo("B", n_b, [POSITIONS, PE]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(center, 0, "A", "Positions")
    chunk.add_data(partners, 0, "B", "Positions")
    chunk.add_data(rng.normal(size=(n_frames, 1, 1)), 0, "A", "Potential_Energy")
    chunk.add_data(rng.normal(size=(n_frames, n_b, 1)), 0, "B", "Potential_Energy")
    project = latpu.Project(name="proj", storage_path=tmp_path)
    return project.add_experiment(
        "sdf", timestep=0.1, temperature=300.0, units="real",
        simulation_data=ScriptInput(chunk, meta, "sdf_data"),
    )


def test_sdf_finds_polar_cluster(sdf_experiment):
    res = sdf_experiment.run.SpatialDistributionFunction(
        species=["A", "B"], r_min=4.0, r_max=4.5, n_bins=20,
        start=0, stop=11, number_of_configurations=12, plot=True,
    )
    sdf = np.asarray(res["System"]["sdf"])
    assert sdf.shape == (20, 20)
    total = sdf.sum()
    assert total > 0
    # counts concentrate at small theta (first rows)
    assert sdf[:3].sum() / total > 0.8
    assert (sdf_experiment.path / "figures"
            / "SpatialDistributionFunction.png").exists()


def test_time_series_energies(sdf_experiment):
    out = sdf_experiment.time_series.Energies(window=3)
    assert set(out["series"]) == {"A", "B"}
    assert (sdf_experiment.path / "figures" / "timeseries_Potential_Energy.png").exists()
    with pytest.raises(AttributeError):
        sdf_experiment.time_series.DoesNotExist


def test_trajectory_visualizer(sdf_experiment):
    path = sdf_experiment.run_visualization(species=["A", "B"])
    assert path.exists()


def test_report():
    report = latpu.Report()
    text = repr(report)
    assert "jax" in text and "numpy" in text


def test_html_plot_artifact(tmp_path, rng):
    """The default plot path writes a self-contained interactive HTML grid
    next to the PNG (reference parity: bokeh HTML per analysis)."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        PropertyInfo, SpeciesInfo, TrajectoryChunkData, TrajectoryMetadata,
    )
    from lammps_analysis_tpu.file_io import ScriptInput

    POS = PropertyInfo("Positions", 3)
    sp = [SpeciesInfo("A", 16, [POS])]
    meta = TrajectoryMetadata(
        n_configurations=10, species_list=sp, box_l=[8.0] * 3, sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, 10)
    chunk.add_data(rng.uniform(0, 8, (10, 16, 3)), 0, "A", "Positions")
    exp = latpu.Project(name="hp", storage_path=tmp_path).add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    exp.run.RadialDistributionFunction(
        number_of_configurations=5, number_of_bins=40, plot=True
    )
    html_path = exp.path / "figures" / "RadialDistributionFunction.html"
    assert html_path.exists()
    text = html_path.read_text()
    # self-contained: no external scripts/styles; has data + interaction
    assert "src=" not in text and "href=" not in text
    assert "data-series" in text and "mousemove" in text
    assert "A_A" in text
    assert "prefers-color-scheme: dark" in text  # selected dark mode
    assert "<table>" in text  # accessible table view
    assert (exp.path / "figures" / "RadialDistributionFunction.png").exists()


def test_3d_html_viewers(tmp_path, rng):
    """run_visualization and SDF write interactive 3-D HTML companions."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        PropertyInfo, SpeciesInfo, TrajectoryChunkData, TrajectoryMetadata,
    )
    from lammps_analysis_tpu.file_io import ScriptInput

    POS = PropertyInfo("Positions", 3)
    sp = [SpeciesInfo("Na", 8, [POS]), SpeciesInfo("Cl", 8, [POS])]
    meta = TrajectoryMetadata(
        n_configurations=12, species_list=sp, box_l=[9.0] * 3, sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, 12)
    for name in ("Na", "Cl"):
        chunk.add_data(rng.uniform(0, 9, (12, 8, 3)), 0, name, "Positions")
    exp = latpu.Project(name="v3", storage_path=tmp_path).add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    exp.run_visualization()
    traj = exp.path / "figures" / "trajectory.html"
    assert traj.exists()
    text = traj.read_text()
    assert "VIZ_DATA" in text and "pointerdown" in text and "Na" in text
    assert "src=" not in text  # self-contained

    # reference signature parity: unwrapped=True renders the unwrapped
    # coordinates (auto-derivable here via the transformation)
    exp.run.CoordinateUnwrapper()
    exp.run_visualization(unwrapped=True)

    exp.run.SpatialDistributionFunction(
        species=["Na", "Cl"], start=0, stop=11, number_of_configurations=6,
        r_min=1.0, r_max=4.0, n_bins=24, plot=True,
    )
    sdf3d = exp.path / "figures" / "SpatialDistributionFunction3D.html"
    assert sdf3d.exists()
    assert '"values"' in sdf3d.read_text()
