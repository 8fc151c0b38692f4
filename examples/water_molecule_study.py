"""Example: molecule mapping and molecular analysis (water-like system).

Mirrors the reference's GROMACS water functional workflow
(``CI/functional_tests/test_water_study.py``): detect molecules from
bond-cutoff connectivity, build COM trajectories, then run atomistic and
molecular analyses — ADF (H-O-H angle), molecular RDF, molecular
diffusion. Uses synthetic rigid waters on a random walk so it runs
anywhere.

Run:  PYTHONPATH=. python examples/water_molecule_study.py
"""

import pathlib
import tempfile

import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.database import (
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from lammps_analysis_tpu.file_io import ScriptInput

POS = PropertyInfo("Positions", 3)


def build_water_box(rng, n_side=3, n_frames=120, box=16.0, step_std=0.04):
    bond, angle = 0.96, np.deg2rad(104.5)
    n_mol = n_side**3
    # lattice placement with jitter: molecules never overlap
    grid = (np.stack(
        np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3) + 0.5) * (box / n_side)
    centers = np.cumsum(
        rng.normal(scale=step_std, size=(n_frames, n_mol, 3)), axis=0
    ) + grid[None] + rng.uniform(-0.5, 0.5, size=(1, n_mol, 3))
    # random fixed orientation per molecule
    h1_list, h2_list = [], []
    for m in range(n_mol):
        axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
        ref = rng.normal(size=3); ref -= ref.dot(axis) * axis
        ref /= np.linalg.norm(ref)
        v1 = bond * (np.cos(angle / 2) * axis + np.sin(angle / 2) * ref)
        v2 = bond * (np.cos(angle / 2) * axis - np.sin(angle / 2) * ref)
        h1_list.append(centers[:, m] + v1)
        h2_list.append(centers[:, m] + v2)
    o_pos = centers
    h_pos = np.concatenate(
        [np.stack(h1_list, axis=1), np.stack(h2_list, axis=1)], axis=1
    )
    return o_pos, h_pos, box


def main():
    rng = np.random.default_rng(4)
    o_pos, h_pos, box = build_water_box(rng)
    n_frames, n_mol = o_pos.shape[:2]

    species = [
        SpeciesInfo("H", h_pos.shape[1], [POS]),
        SpeciesInfo("O", n_mol, [POS]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=species, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(species, n_frames)
    chunk.add_data(h_pos - box * np.floor(h_pos / box), 0, "H", "Positions")
    chunk.add_data(o_pos - box * np.floor(o_pos / box), 0, "O", "Positions")

    workdir = pathlib.Path(tempfile.mkdtemp(prefix="water_example_"))
    project = latpu.Project(name="water_study", storage_path=workdir)
    exp = project.add_experiment(
        "water_300K", timestep=0.5, temperature=300.0, units="real",
        simulation_data=ScriptInput(chunk, meta, "water_data"),
    )

    # atomistic ADF: the H-O-H angle should peak at ~104.5 degrees.
    # NOTE (reference parity): triple keys only exist for non-decreasing
    # species indices, so the center species (O) must come first in the
    # species list for the O_H_H key to be emitted.
    adf = exp.run.AngularDistributionFunction(
        number_of_configurations=10, start=0, stop=n_frames - 1,
        cutoff=1.2, number_of_bins=180, species=["O", "H"], plot=True,
    )
    print("O-H-H max peak:", adf["O_H_H"]["max_peak"], "deg (expect ~104.5)")

    # molecule mapping via SMILES
    exp.run.MolecularMap(
        molecules=[
            latpu.Molecule(name="water", smiles="[H]O[H]", amount=n_mol,
                           cutoff=1.1)
        ]
    )
    print("molecules:", {k: v["n_particles"] for k, v in exp.molecules.items()})

    # molecular RDF + diffusion on the COM trajectories
    rdf = exp.run.RadialDistributionFunction(
        molecules=True, number_of_configurations=60, plot=True
    )
    print("molecular RDF pairs:", list(rdf.keys()))

    diff = exp.run.EinsteinDiffusionCoefficients(
        molecules=True, data_range=40, correlation_time=10, plot=True
    )
    print("D_water =", diff["water"]["diffusion_coefficient"], "m^2/s")
    print("figures:", sorted(p.name for p in (exp.path / "figures").iterdir()))


if __name__ == "__main__":
    main()
