"""End-to-end streamed benchmark: full Project stack on a large trajectory.

Approximates the BASELINE.json north star (10k atoms, long trajectory:
RDF + Green-Kubo analysis) at a size that fits this machine. Synthetic
data is written straight into the trajectory store (ingestion throughput is
benchmarked separately — the reference's parsing is not the comparison
here), then the RDF and GK-diffusion calculators stream it through the
prefetch pipeline to the accelerator.

Run: python benchmarks/end_to_end.py [n_atoms] [n_frames]
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

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
VEL = PropertyInfo("Velocities", 3)


def build_experiment(workdir, n_atoms, n_frames, box=40.0, chunk_frames=2000):
    rng = np.random.default_rng(0)
    half = n_atoms // 2
    species = [
        SpeciesInfo("Na", half, [POS, VEL]),
        SpeciesInfo("Cl", n_atoms - half, [POS, VEL]),
    ]
    project = latpu.Project(name="bench", storage_path=workdir)
    exp = project.add_experiment(
        "big", timestep=0.002, temperature=1400.0, units="metal"
    )

    ingest_s = 0.0  # store-write time only (data generation is not the
    # framework's work — the real ingest path is the native text parser)
    done = 0
    while done < n_frames:
        n = min(chunk_frames, n_frames - done)
        meta = TrajectoryMetadata(
            n_configurations=n, species_list=species, box_l=[box] * 3,
            sample_rate=100, temperature=1400.0,
        )
        chunk = TrajectoryChunkData(species, n)
        for sp in species:
            chunk.add_data(
                rng.uniform(0, box, (n, sp.n_particles, 3)), 0, sp.name,
                "Positions",
            )
            chunk.add_data(
                rng.normal(size=(n, sp.n_particles, 3)), 0, sp.name,
                "Velocities",
            )
        t0 = time.perf_counter()
        exp.add_data(
            ScriptInput(chunk, meta, f"chunk{done}"),
        )
        ingest_s += time.perf_counter() - t0
        done += n
    return exp, ingest_s


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    only = sys.argv[3] if len(sys.argv) > 3 else "all"
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="e2e_bench_"))
    try:
        exp, ingest_s = build_experiment(workdir, n_atoms, n_frames)
        results = {"n_atoms": n_atoms, "n_frames": n_frames,
                   "store_write_s": round(ingest_s, 2)}

        if only in ("all", "rdf"):
            t0 = time.perf_counter()
            exp.run.RadialDistributionFunction(
                number_of_configurations=500, number_of_bins=300, plot=False
            )
            rdf_s = time.perf_counter() - t0
            results["rdf_s"] = round(rdf_s, 2)
            results["rdf_pairs_per_s"] = round(
                500 * n_atoms * (n_atoms - 1) / 2 / rdf_s
            )

        if only in ("all", "gk"):
            t0 = time.perf_counter()
            exp.run.GreenKuboDiffusionCoefficients(
                data_range=512, correlation_time=256, plot=False
            )
            gk_s = time.perf_counter() - t0
            n_windows = (n_frames - 512) // 256 + 1
            results["gk_s"] = round(gk_s, 2)
            results["gk_corr_frames_per_s"] = round(
                n_windows * 512 * n_atoms / gk_s
            )

        if only == "all":
            t0 = time.perf_counter()
            exp.run.EinsteinDiffusionCoefficients(
                data_range=512, correlation_time=256, plot=False
            )
            results["einstein_s"] = round(time.perf_counter() - t0, 2)

        print(json.dumps(results))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
