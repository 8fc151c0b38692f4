"""Functional water-study workflow, the reference's second functional test.

Models ``/root/reference/CI/functional_tests/test_water_study.py:97-144``
(GROMACS water via chemfiles there; synthetic rigid water here): ingest ->
molecule mapping with a SMILES reference -> molecular diffusion + RDF ->
atomistic ADF with the H-O-H angle asserted against the built geometry
(the reference asserts ~109.5 deg for SPC/E water; the synthetic geometry
here is 104.5 deg).

Regression value: the store carries ONLY Unwrapped_Positions (exercises
the Positions auto-wrap cascade in the structural calculators and the
unwrapped fallback in group detection), and the 1.7 A detection cutoff
puts the intramolecular H-H pair inside the bond graph (triangle), which
the monomorphism validation must accept.
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

UNW = PropertyInfo("Unwrapped_Positions", 3)


def test_water_study_workflow(tmp_path, rng):
    n_mol, t, box = 12, 60, 16.0
    grid = np.array(
        [[2.5 + 4.0 * (i % 3), 2.5 + 4.0 * ((i // 3) % 3), 2.5 + 4.0 * (i // 9)]
         for i in range(n_mol)]
    )
    o = grid[None] + np.cumsum(
        0.02 * rng.standard_normal((t, n_mol, 3)), axis=0
    )
    h1 = o + np.array([0.96, 0.0, 0.0]) + 0.005 * rng.standard_normal(
        (t, n_mol, 3)
    )
    h2 = o + np.array([-0.24, 0.93, 0.0]) + 0.005 * rng.standard_normal(
        (t, n_mol, 3)
    )
    angle_built = np.degrees(np.arccos(
        np.dot([0.96, 0.0, 0.0], [-0.24, 0.93, 0.0])
        / (0.96 * np.hypot(0.24, 0.93))
    ))
    sp = [SpeciesInfo("O", n_mol, [UNW]), SpeciesInfo("H", 2 * n_mol, [UNW])]
    meta = TrajectoryMetadata(
        n_configurations=t, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, t)
    chunk.add_data(o, 0, "O", "Unwrapped_Positions")
    chunk.add_data(
        np.concatenate([h1, h2], axis=1), 0, "H", "Unwrapped_Positions"
    )
    project = latpu.Project(name="water_study", storage_path=tmp_path)
    exp = project.add_experiment(
        "w", timestep=0.002, temperature=300.0, units="metal",
        simulation_data=ScriptInput(chunk, meta, "w0"),
    )

    water = latpu.Molecule(
        name="water", smiles="[H]O[H]", amount=n_mol, cutoff=1.7
    )
    exp.run.MolecularMap(molecules=[water])
    assert exp.molecules["water"]["n_particles"] == n_mol

    d = exp.run.EinsteinDiffusionCoefficients(
        molecules=True, data_range=30, correlation_time=15, plot=False
    )
    assert np.isfinite(d["water"]["diffusion_coefficient"])

    rdf = exp.run.RadialDistributionFunction(
        molecules=True, number_of_configurations=5, plot=False
    )
    assert sorted(rdf.data_dict.keys()) == ["water_water"]

    # atomistic ADF: the H-O-H peak must sit at the built geometry's angle
    # (reference asserts ~109.5 for SPC/E water, test_water_study.py:134-139)
    adf = exp.run.AngularDistributionFunction(
        number_of_configurations=3, cutoff=1.2, number_of_bins=90,
        plot=False,
    )
    peak = adf["O_H_H"]["max_peak"]
    assert abs(peak - angle_built) < 4.0, (peak, angle_built)
