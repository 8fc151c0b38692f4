"""300k-frame host-stage end-to-end: 3x the recorded 100k artifact.

Strengthens the 1M-frame linear-scaling extrapolation with a 3x-longer
REAL run of every host-routed stage (ingest -> GK ionic -> fused-unwrap
Einstein -> GK self-diffusion) on a store that EXCEEDS the page cache —
so repeat reads hit the disk, unlike the cache-hot 100k numbers. The
device stages (RDF/ADF) are frame-count independent (sampled configs)
and are excluded; this script is safe to run while the TPU tunnel is
down (run it CPU-pinned: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu).

Writes benchmarks/end_to_end_300k_host.json; resumable per stage.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
OUT = REPO / "benchmarks" / "end_to_end_300k_host.json"

import lammps_analysis_tpu as latpu  # noqa: E402
from lammps_analysis_tpu.database import (  # noqa: E402
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from lammps_analysis_tpu.file_io import ScriptInput  # noqa: E402

POS = PropertyInfo("Positions", 3)
VEL = PropertyInfo("Velocities", 3)


def flush(results):
    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    chunk_frames, box, dt = 2000, 40.0, 0.002
    rng = np.random.default_rng(0)
    half = n_atoms // 2
    species = [
        SpeciesInfo("Na", half, [POS, VEL]),
        SpeciesInfo("Cl", n_atoms - half, [POS, VEL]),
    ]
    resume = os.environ.get("E2E300_DIR")
    results = json.loads(OUT.read_text()) if OUT.exists() and resume else {}
    results.update({"n_atoms": n_atoms, "n_frames": n_frames})
    if resume:
        workdir = pathlib.Path(resume)
        project = latpu.Project(name="long300", storage_path=workdir)
        exp = project.experiments["big"]
    else:
        workdir = pathlib.Path(tempfile.mkdtemp(prefix="e2e300_"))
        print("workdir:", workdir, flush=True)
        project = latpu.Project(name="long300", storage_path=workdir)
        exp = project.add_experiment(
            "big", timestep=dt, temperature=1400.0, units="metal"
        )
        ingest_s = 0.0
        done = 0
        last = rng.uniform(0, box, (n_atoms, 3))
        while done < n_frames:
            n = min(chunk_frames, n_frames - done)
            meta = TrajectoryMetadata(
                n_configurations=n, species_list=species, box_l=[box] * 3,
                sample_rate=100, temperature=1400.0,
            )
            chunk = TrajectoryChunkData(species, n)
            steps = 0.05 * rng.standard_normal(
                (n, n_atoms, 3), dtype=np.float32
            )
            walk = last[None].astype(np.float32) + np.cumsum(steps, axis=0)
            last = walk[-1].astype(np.float64)
            vel = 3.0 * rng.standard_normal((n, n_atoms, 3), dtype=np.float32)
            chunk.add_data((walk[:, :half] % box), 0, "Na", "Positions")
            chunk.add_data((walk[:, half:] % box), 0, "Cl", "Positions")
            chunk.add_data(vel[:, :half], 0, "Na", "Velocities")
            chunk.add_data(vel[:, half:], 0, "Cl", "Velocities")
            t0 = time.perf_counter()
            exp.add_data(ScriptInput(chunk, meta, f"chunk{done}"))
            ingest_s += time.perf_counter() - t0
            done += n
            if done % 50000 == 0:
                print(f"ingested {done}/{n_frames}", flush=True)
        gb = exp.store.path.stat().st_size / 2**30
        results["ingest_s"] = round(ingest_s, 1)
        results["ingest_mb_per_s"] = round(gb * 1024 / ingest_s, 1)
        results["store_gb"] = round(gb, 1)
        results["workdir"] = str(workdir)
        flush(results)
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)

    w, stride = 512, 256
    n_windows = (n_frames - w) // stride + 1
    if "gk_ionic_s" not in results:
        t0 = time.perf_counter()
        exp.run.GreenKuboIonicConductivity(
            data_range=w, correlation_time=stride, plot=False
        )
        results["gk_ionic_s"] = round(time.perf_counter() - t0, 1)
        flush(results)

    if "einstein_fused_s" not in results:
        from lammps_analysis_tpu.utils.config import config

        config.fuse_streaming = True
        try:
            t0 = time.perf_counter()
            exp.run.EinsteinDiffusionCoefficients(
                data_range=w, correlation_time=stride, plot=False
            )
            fused_s = time.perf_counter() - t0
        finally:
            config.fuse_streaming = False
        results["einstein_fused_s"] = round(fused_s, 1)
        results["msd_window_frame_atoms_per_s"] = round(
            n_windows * w * n_atoms / fused_s
        )
        flush(results)

    if "gk_diffusion_s" not in results:
        t0 = time.perf_counter()
        exp.run.GreenKuboDiffusionCoefficients(
            data_range=w, correlation_time=stride, plot=False
        )
        gk_s = time.perf_counter() - t0
        results["gk_diffusion_s"] = round(gk_s, 1)
        results["vacf_window_frame_atoms_per_s"] = round(
            n_windows * w * n_atoms / gk_s
        )
        flush(results)

    # linearity vs the recorded 100k artifact (cache-hot there; this run's
    # store exceeds the page cache, so repeat reads are disk-bound)
    ref_path = REPO / "benchmarks" / "end_to_end_100k.json"
    if ref_path.exists():
        ref = json.loads(ref_path.read_text())
        scale = n_frames / ref["n_frames"]
        results["vs_100k_linear_expectation"] = {
            k: {
                "expected_s": round(ref[k] * scale, 1),
                "measured_s": results[k],
                "ratio": round(results[k] / (ref[k] * scale), 2),
            }
            for k in ("gk_ionic_s", "gk_diffusion_s")
            if k in ref and k in results
        }
        if "einstein_fused_s" in ref and "einstein_fused_s" in results:
            results["vs_100k_linear_expectation"]["einstein_fused_s"] = {
                "expected_s": round(ref["einstein_fused_s"] * scale, 1),
                "measured_s": results["einstein_fused_s"],
                "ratio": round(
                    results["einstein_fused_s"]
                    / (ref["einstein_fused_s"] * scale), 2
                ),
            }
        results["note"] = (
            "host-routed stages only (device stages sample a fixed config "
            "count and are frame-count independent); store exceeds the "
            "page cache so reads are disk-bound, unlike the 100k artifact"
        )
        flush(results)


if __name__ == "__main__":
    main()
