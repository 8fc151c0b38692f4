"""Tests: RDF post-processing calculators + ADF on synthetic systems."""

import numpy as np
import pytest

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.database import (
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from lammps_analysis_tpu.database.results_db import Computation
from lammps_analysis_tpu.file_io import ScriptInput
from lammps_analysis_tpu.utils.units import boltzmann_constant

POSITIONS = PropertyInfo("Positions", 3)


def _synthetic_rdf(n_bins=200, cutoff_nm=0.5, peak_r=0.25, peak_w=0.02,
                   peak_h=2.0):
    """g(r): 0 below contact, gaussian peak on a g=1 background."""
    r = np.linspace(0, cutoff_nm, n_bins)
    g = np.where(r > 0.15, 1.0, 0.0) + peak_h * np.exp(
        -((r - peak_r) ** 2) / (2 * peak_w**2)
    )
    return Computation(
        "RadialDistributionFunction",
        {"number_of_bins": n_bins, "cutoff": cutoff_nm * 10,
         "number_of_configurations": 100},
        {"X_X": {"x": r.tolist(), "y": g.tolist()}},
        "synthetic",
    )


@pytest.fixture()
def experiment(tmp_path, rng):
    sp = [SpeciesInfo("X", 100, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=5, species_list=sp, box_l=[20.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, 5)
    chunk.add_data(rng.uniform(0, 20, (5, 100, 3)), 0, "X", "Positions")
    project = latpu.Project(name="proj", storage_path=tmp_path)
    return project.add_experiment(
        "e", timestep=0.1, temperature=300.0, units="real",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )


def test_coordination_numbers(experiment):
    rdf = _synthetic_rdf()
    res = experiment.run.CoordinationNumbers(
        rdf_data=rdf, number_of_shells=1, plot=False
    )
    data = res["X_X"]
    cn = np.asarray(data["cn"])
    # CN(r) must match the direct integral 4 pi rho int g r^2 dr on the
    # calculator's grid (x[1:] then another [1:] inside cumtrapz)
    radii = np.asarray(rdf["X_X"]["x"])[1:]
    g = np.asarray(rdf["X_X"]["y"])[1:]
    volume_nm3 = experiment.volume * experiment.units.volume / 1e-27
    rho = 100 / volume_nm3
    from scipy.integrate import cumulative_trapezoid

    direct = 4 * np.pi * rho * cumulative_trapezoid(
        radii[1:] ** 2 * g[1:], x=radii[1:]
    )
    np.testing.assert_allclose(cn, direct, rtol=1e-10)
    assert "CN_1" in data and data["CN_1"] > 0


def test_potential_of_mean_force(experiment):
    rdf = _synthetic_rdf()
    res = experiment.run.PotentialOfMeanForce(rdf_data=rdf, plot=False)
    data = res["X_X"]
    g = np.asarray(rdf["X_X"]["y"])[1:]
    pomf = np.asarray(data["pomf"])
    expected = -boltzmann_constant * 300.0 * np.log(g[g > 0]) * 6.242e8
    np.testing.assert_allclose(pomf[g > 0], expected, rtol=1e-8)
    assert "POMF_1" in data


def test_kirkwood_buff_integral(experiment):
    rdf = _synthetic_rdf(peak_h=0.0)  # pure step to g = 1
    res = experiment.run.KirkwoodBuffIntegral(rdf_data=rdf, plot=False)
    kb = np.asarray(res["X_X"]["kb_integral"])
    # for g = 1 beyond contact the integral converges to a constant
    assert abs(kb[-1] - kb[-20]) < 1e-3


def test_structure_factor_ideal_gas(experiment):
    """g(r) == 1 everywhere -> S(q) == 1 for all q."""
    n_bins = 200
    r = np.linspace(0, 0.5, n_bins)
    rdf = Computation(
        "RadialDistributionFunction",
        {"number_of_bins": n_bins, "cutoff": 5.0,
         "number_of_configurations": 100},
        {"X_X": {"x": r.tolist(), "y": np.ones(n_bins).tolist()}},
        "synthetic",
    )
    # need a species with known form factors
    experiment.set_mass("X", 22.99)
    species = experiment.species
    from lammps_analysis_tpu.database import SpeciesInfo as SI

    experiment.species = {
        "Na": SI("Na", 100, species["X"].properties, 22.99, 0.0)
    }
    rdf.data_dict = {"Na_Na": rdf.data_dict["X_X"]}
    res = experiment.run.StructureFactor(rdf_data=rdf, plot=False)
    s_total = np.asarray(res["System"]["S"])
    np.testing.assert_allclose(s_total, 1.0, atol=1e-10)
    s_partial = np.asarray(res["Na_Na"]["S"])
    np.testing.assert_allclose(s_partial, 1.0, atol=1e-10)


def test_adf_tetrahedral_angle(tmp_path, rng):
    """Rigid trimers with a 104.5 degree angle -> ADF peak there."""
    angle = np.deg2rad(104.5)
    bond = 0.9
    n_mol, box = 12, 20.0
    frames = 3
    pos = np.zeros((frames, n_mol * 3, 3))
    for f in range(frames):
        for m in range(n_mol):
            center = rng.uniform(3, box - 3, size=3)
            # random orientation
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            ref = rng.normal(size=3)
            ref -= ref.dot(axis) * axis
            ref /= np.linalg.norm(ref)
            v1 = bond * (np.cos(angle / 2) * axis + np.sin(angle / 2) * ref)
            v2 = bond * (np.cos(angle / 2) * axis - np.sin(angle / 2) * ref)
            pos[f, 3 * m] = center
            pos[f, 3 * m + 1] = center + v1
            pos[f, 3 * m + 2] = center + v2
    # species: O at vertex (every third atom), H at ends
    o_idx = np.arange(0, n_mol * 3, 3)
    h_idx = np.sort(np.concatenate([o_idx + 1, o_idx + 2]))
    sp = [
        SpeciesInfo("O", n_mol, [POSITIONS]),
        SpeciesInfo("H", 2 * n_mol, [POSITIONS]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=frames, species_list=sp, box_l=[box] * 3, sample_rate=1
    )
    chunk = TrajectoryChunkData(sp, frames)
    chunk.add_data(pos[:, o_idx], 0, "O", "Positions")
    chunk.add_data(pos[:, h_idx], 0, "H", "Positions")
    project = latpu.Project(name="proj", storage_path=tmp_path)
    exp = project.add_experiment(
        "water", timestep=0.1, units="real",
        simulation_data=ScriptInput(chunk, meta, "adf_data"),
    )
    res = exp.run.AngularDistributionFunction(
        number_of_configurations=frames, start=0, stop=frames - 1,
        cutoff=1.2, number_of_bins=180, plot=False,
    )
    # key O_H_H: central O with two H neighbours at 104.5 degrees
    data = res["O_H_H"]
    assert abs(data["max_peak"] - 104.5) < 2.0


def test_structure_factor_rejects_unknown_method(experiment):
    """The reference's method= arg: only Faber-Ziman exists; anything else
    must raise instead of being silently ignored."""
    n_bins = 50
    r = np.linspace(0, 0.5, n_bins)
    rdf = Computation(
        "RadialDistributionFunction",
        {"number_of_bins": n_bins, "cutoff": 5.0,
         "number_of_configurations": 10},
        {"X_X": {"x": r.tolist(), "y": np.ones(n_bins).tolist()}},
        "synthetic",
    )
    with pytest.raises(ValueError, match="Faber-Ziman"):
        experiment.run.StructureFactor(
            rdf_data=rdf, method="Ashcroft-Langreth", plot=False
        )
