"""Example: full molten-salt analysis workflow (synthetic trajectory).

Mirrors the reference's molten-NaCl functional workflow
(``CI/functional_tests/test_molten_salts.py``): ingest a LAMMPS dump,
compute RDF -> coordination numbers -> potential of mean force, and
Einstein + Green-Kubo diffusion with automatic dependency resolution.
Generates a small synthetic trajectory so the example runs anywhere;
substitute your own dump file path for real data.

Run:  python examples/molten_nacl_analysis.py
"""

import pathlib
import tempfile

import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import lammps_analysis_tpu as latpu


def write_synthetic_dump(path, n_frames=200, n_each=108, box=17.0, dt=100):
    """Random-walk NaCl-like trajectory in LAMMPS dump format."""
    rng = np.random.default_rng(1)
    n = 2 * n_each
    steps = rng.normal(scale=0.12, size=(n_frames, n, 3))
    pos = np.cumsum(steps, axis=0) + rng.uniform(0, box, size=(1, n, 3))
    wrapped = pos - box * np.floor(pos / box)
    vel = steps / (dt * 0.002)  # consistent finite-difference velocities
    species = ["Na"] * n_each + ["Cl"] * n_each
    with open(path, "w") as f:
        for t in range(n_frames):
            f.write(f"ITEM: TIMESTEP\n{t * dt}\nITEM: NUMBER OF ATOMS\n{n}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n" + f"0.0 {box}\n" * 3)
            f.write("ITEM: ATOMS id element x y z vx vy vz\n")
            for i in range(n):
                f.write(
                    f"{i + 1} {species[i]} "
                    f"{wrapped[t, i, 0]:.6f} {wrapped[t, i, 1]:.6f} "
                    f"{wrapped[t, i, 2]:.6f} "
                    f"{vel[t, i, 0]:.6f} {vel[t, i, 1]:.6f} "
                    f"{vel[t, i, 2]:.6f}\n"
                )


def main():
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="nacl_example_"))
    dump = workdir / "NaCl.lammpstraj"
    write_synthetic_dump(dump)

    project = latpu.Project(name="NaCl_study", storage_path=workdir)
    exp = project.add_experiment(
        "nacl_1400K",
        timestep=0.002,
        temperature=1400.0,
        units="metal",
        simulation_data=str(dump),
    )
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)

    # project-level runs return {experiment_name: Computation}
    rdf = project.run.RadialDistributionFunction(
        number_of_configurations=150, plot=True
    )["nacl_1400K"]
    print("RDF pairs:", list(rdf.keys()))

    cn = exp.run.CoordinationNumbers(rdf_data=rdf, plot=True)
    print("Na-Cl first-shell CN:", cn["Na_Cl"].get("CN_1"))

    pomf = exp.run.PotentialOfMeanForce(rdf_data=rdf, plot=False)
    print("Na-Cl POMF_1:", pomf["Na_Cl"].get("POMF_1"), "eV")

    diff = exp.run.EinsteinDiffusionCoefficients(
        data_range=80, correlation_time=10, plot=True
    )  # auto-runs CoordinateUnwrapper
    for sp in ("Na", "Cl"):
        print(f"D_{sp} = {diff[sp]['diffusion_coefficient']:.3e} m^2/s")

    sigma = exp.run.GreenKuboIonicConductivity(
        data_range=100, correlation_time=50, plot=True
    )  # auto-runs the IonicCurrent transformation from stored velocities
    print("sigma =", sigma["System"]["ionic_conductivity"][0], "S/m")

    print("\nFigures written under:", exp.path / "figures")
    print("Cached computations:", [c["name"] for c in exp.db.list_computations(exp.name)])


if __name__ == "__main__":
    main()
