"""E2E calculator-path A/B of the ADF frames-per-call default.

Validates that ``adf_frames_per_call`` (route-aware call height on the
TPU tiled pipeline) pays through the FULL calculator stack — store
loads, prefetch, AdfBatchRunner — not just in the kernel microbench
(which measured 21.7 -> 9.1 ms/frame going f=2 -> f=16 at 10240 atoms).

Both arms run the identical public-boundary call
(``exp.run.AngularDistributionFunction``); arm "f1" monkeypatches the
helper to return 1 (the old planner-collapse behaviour), arm "fpc" uses
the shipped default. Each arm runs twice (force=True) and times the
second, compile-cached run. Histogram SHAPES must agree (magnitudes
scale with batch count under the reference's per-batch density
normalisation, angular_distribution_function.py:421-429).

Run on TPU: python benchmarks/adf_e2e_fpc_ab.py
Writes benchmarks/adf_e2e_fpc_ab.json.
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
N_FRAMES = 96
CUTOFF = 3.6


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401 — force backend init before timing

    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database.contracts import (
        SpeciesInfo,
        TrajectoryChunkData,
        TrajectoryMetadata,
    )
    from lammps_analysis_tpu.database.properties import PropertyInfo
    from lammps_analysis_tpu.file_io import ScriptInput
    from lammps_analysis_tpu.parallel import sharded_ops as so

    out = {
        "n_atoms": N_ATOMS,
        "n_frames": N_FRAMES,
        "cutoff": CUTOFF,
        "backend": jax.default_backend(),
    }

    # health probe — numbers from a wedged/degraded tunnel are garbage
    a = jnp.ones((512, 512))
    np.asarray(a @ a)
    t0 = time.perf_counter()
    np.asarray((a + 1.0) @ a)
    out["probe_s"] = round(time.perf_counter() - t0, 2)

    rng = np.random.default_rng(7)
    box = 40.0 * (N_ATOMS / 10240.0) ** (1 / 3)
    half = N_ATOMS // 2
    pi = PropertyInfo("Positions", 3)
    sps = [
        SpeciesInfo("Na", half, [pi], mass=22.99, charge=1.0),
        SpeciesInfo("Cl", N_ATOMS - half, [pi], mass=35.45, charge=-1.0),
    ]
    meta = TrajectoryMetadata(
        n_configurations=N_FRAMES,
        species_list=sps,
        box_l=[box] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sps, N_FRAMES)
    pos = rng.uniform(0, box, (N_FRAMES, N_ATOMS, 3)).astype(np.float32)
    chunk.add_data(pos[:, :half].astype(np.float64), 0, "Na", "Positions")
    chunk.add_data(pos[:, half:].astype(np.float64), 0, "Cl", "Positions")

    with tempfile.TemporaryDirectory() as tmp:
        project = latpu.Project(name="fpc_ab", storage_path=tmp)
        exp = project.add_experiment(
            "e1",
            timestep=0.002,
            temperature=1400.0,
            units="metal",
            simulation_data=ScriptInput(chunk, meta, "mem"),
        )

        def run_adf():
            return exp.run.AngularDistributionFunction(
                number_of_configurations=N_FRAMES,
                cutoff=CUTOFF,
                number_of_bins=500,
                plot=False,
                force=True,
            )

        real_fpc = so.adf_frames_per_call
        hists = {}
        for arm, fn in (
            ("f1", lambda *a, **k: 1),
            ("fpc", real_fpc),
        ):
            so.adf_frames_per_call = fn
            run_adf()  # compile + warm
            t0 = time.perf_counter()
            res = run_adf()
            dt = time.perf_counter() - t0
            out[f"{arm}_s"] = round(dt, 2)
            out[f"{arm}_ms_per_frame"] = round(dt / N_FRAMES * 1000, 2)
            h = np.array(res.data_dict["Na_Na_Na"]["adf"])
            hists[arm] = h / max(h.sum(), 1e-30)
        so.adf_frames_per_call = real_fpc
        out["fpc_frames"] = int(
            real_fpc(
                N_ATOMS,
                np.array([box] * 3, np.float32),
                CUTOFF,
                exp.planner.budget_bytes,
            )
        )

    out["shape_maxabs"] = float(np.abs(hists["f1"] - hists["fpc"]).max())
    out["speedup"] = round(out["f1_s"] / out["fpc_s"], 2)
    path = REPO / "benchmarks" / "adf_e2e_fpc_ab.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
