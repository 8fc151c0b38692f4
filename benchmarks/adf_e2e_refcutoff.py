"""E2E calculator-path ADF at the REFERENCE'S default cutoff (6.0 A).

The kernel-level wide-cutoff work (statistical K bound, adaptive fold
lane-chunking) lands here: full public-boundary run — store loads,
prefetch, AdfBatchRunner, route-aware call height — at the cutoff the
reference ships as its ADF default
(mdsuite/calculators/angular_distribution_function.py:71-120).

Run on TPU (idle host): python benchmarks/adf_e2e_refcutoff.py
Writes benchmarks/adf_e2e_refcutoff.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_ATOMS = 10240
N_FRAMES = 64
CUTOFF = 6.0


def main():
    import jax
    import jax.numpy as jnp

    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database.contracts import (
        SpeciesInfo,
        TrajectoryChunkData,
        TrajectoryMetadata,
    )
    from lammps_analysis_tpu.database.properties import PropertyInfo
    from lammps_analysis_tpu.file_io import ScriptInput

    out = {
        "n_atoms": N_ATOMS,
        "n_frames": N_FRAMES,
        "cutoff": CUTOFF,
        "backend": jax.default_backend(),
    }
    a = jnp.ones((512, 512))
    np.asarray(a @ a)
    t0 = time.perf_counter()
    np.asarray((a + 1.0) @ a)
    out["probe_s"] = round(time.perf_counter() - t0, 2)

    rng = np.random.default_rng(7)
    box = 40.0
    half = N_ATOMS // 2
    pi = PropertyInfo("Positions", 3)
    sps = [
        SpeciesInfo("Na", half, [pi], mass=22.99, charge=1.0),
        SpeciesInfo("Cl", N_ATOMS - half, [pi], mass=35.45, charge=-1.0),
    ]
    meta = TrajectoryMetadata(
        n_configurations=N_FRAMES, species_list=sps, box_l=[box] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sps, N_FRAMES)
    pos = rng.uniform(0, box, (N_FRAMES, N_ATOMS, 3)).astype(np.float32)
    chunk.add_data(pos[:, :half].astype(np.float64), 0, "Na", "Positions")
    chunk.add_data(pos[:, half:].astype(np.float64), 0, "Cl", "Positions")

    with tempfile.TemporaryDirectory() as tmp:
        project = latpu.Project(name="refcut", storage_path=tmp)
        exp = project.add_experiment(
            "e1", timestep=0.002, temperature=1400.0, units="metal",
            simulation_data=ScriptInput(chunk, meta, "mem"),
        )

        def run_adf():
            return exp.run.AngularDistributionFunction(
                number_of_configurations=N_FRAMES, cutoff=CUTOFF,
                number_of_bins=500, plot=False, force=True,
            )

        run_adf()  # compile + warm
        t0 = time.perf_counter()
        res = run_adf()
        dt = time.perf_counter() - t0
        out["e2e_s"] = round(dt, 2)
        out["e2e_ms_per_frame"] = round(dt / N_FRAMES * 1000, 2)
        out["max_peak_Na_Na_Na"] = res.data_dict["Na_Na_Na"]["max_peak"]

    path = REPO / "benchmarks" / "adf_e2e_refcutoff.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
