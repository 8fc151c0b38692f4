"""1,000,000-frame host-stage end-to-end: the north-star frame count, real.

BASELINE.md's end-to-end row is "10k atoms x 1M frames". At 10k atoms the
f32 store is ~230 GB — beyond this image's disk — so the prior artifacts
anchored the atom axis (10240 atoms at 100k/300k frames) and projected the
frame axis. This run REALIZES the frame axis: the full million frames at
4096 atoms (98 GB f32 store — larger than this VM's 125 GB RAM once the
page cache is shared, so repeat reads stay disk-bound like the 300k
artifact). Everything that scales with FRAMES is exercised for real: 500
ingest chunks with append cursors, ~3900 ACF/MSD windows, the slab
streaming plans, the fused in-flight unwrap carry chain across ~200 slabs,
sqlite result persistence, and the XLA-CPU compile-cache discipline
(same-shaped moderate slabs — see docs/design.md on scan-length compile
growth).

Host-routed stages only (ingest -> GK ionic -> fused-unwrap Einstein ->
GK self-diffusion): the device stages (RDF/ADF) sample a fixed config
count and are frame-count independent. Safe to run while the TPU tunnel
is down; run it CPU-pinned:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/end_to_end_1m_host.py

Writes benchmarks/end_to_end_1m_host.json; resumable per stage via
E2E1M_DIR=<workdir>. Reference hot loop being replaced:
mdsuite/file_io/tabular_text_files.py:122-220 feeding
calculators/green_kubo_*.py batch loops.
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
OUT = REPO / "benchmarks" / "end_to_end_1m_host.json"

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
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    chunk_frames, dt = 2000, 0.002
    # constant density: the 10240-atom reference geometry scaled down
    box = 40.0 * (n_atoms / 10240.0) ** (1.0 / 3.0)
    rng = np.random.default_rng(0)
    half = n_atoms // 2
    species = [
        SpeciesInfo("Na", half, [POS, VEL]),
        SpeciesInfo("Cl", n_atoms - half, [POS, VEL]),
    ]
    resume = os.environ.get("E2E1M_DIR")
    results = json.loads(OUT.read_text()) if OUT.exists() and resume else {}
    results.update({"n_atoms": n_atoms, "n_frames": n_frames})
    if resume:
        workdir = pathlib.Path(resume)
        project = latpu.Project(name="long1m", storage_path=workdir)
        exp = project.experiments["big"]
        done = exp.number_of_configurations
    else:
        workdir = pathlib.Path(tempfile.mkdtemp(prefix="e2e1m_"))
        print("workdir:", workdir, flush=True)
        project = latpu.Project(name="long1m", storage_path=workdir)
        exp = project.add_experiment(
            "big", timestep=dt, temperature=1400.0, units="metal"
        )
        done = 0
    if done < n_frames:
        # (Re)generate the deterministic random walk. On a mid-ingest
        # resume (a killed run — ledger and cursors land after each full
        # chunk, so the store holds exactly `done` frames), replay the
        # already-ingested chunks' draws IN ORDER without storing them:
        # the stream position and the walk head come out identical.
        ingest_s = 0.0
        seg_start = done
        pre_gb = (
            exp.store.path.stat().st_size / 2**30
            if exp.store.path.exists()
            else 0.0
        )
        replay_done = 0
        last = rng.uniform(0, box, (n_atoms, 3))
        while replay_done < done:
            n = min(chunk_frames, done - replay_done)
            steps = 0.05 * rng.standard_normal(
                (n, n_atoms, 3), dtype=np.float32
            )
            walk = last[None].astype(np.float32) + np.cumsum(steps, axis=0)
            last = walk[-1].astype(np.float64)
            rng.standard_normal((n, n_atoms, 3), dtype=np.float32)  # vel
            replay_done += n
        if done:
            print(f"resumed mid-ingest at {done}/{n_frames}", flush=True)
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
            if done % 100000 == 0:
                print(f"ingested {done}/{n_frames}", flush=True)
        gb = exp.store.path.stat().st_size / 2**30
        seg_gb = gb - pre_gb
        rate = seg_gb * 1024 / ingest_s
        results["ingest_mb_per_s"] = round(rate, 1)
        if seg_start:
            # the timed segment covers frames [seg_start, n_frames); the
            # full-run figure extrapolates the measured rate over the
            # whole store and is flagged as such
            results["ingest_segment_s"] = round(ingest_s, 1)
            results["ingest_segment_frames"] = n_frames - seg_start
            results["ingest_s"] = round(gb * 1024 / rate, 1)
            results["ingest_s_estimated_from_segment"] = True
        else:
            results["ingest_s"] = round(ingest_s, 1)
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

    # per-data-volume comparison vs the 300k x 10240 disk-bound artifact:
    # equal rates mean the stack is linear in frames with no per-frame
    # regression at 3.3x the frame count and 2.5x the window count
    ref_path = REPO / "benchmarks" / "end_to_end_300k_host.json"
    if ref_path.exists() and results.get("store_gb", 0) > 0:
        ref = json.loads(ref_path.read_text())
        scale = results["store_gb"] / ref["store_gb"]
        results["vs_300k_per_data_volume"] = {
            k: {
                "expected_s_at_300k_rate": round(ref[k] * scale, 1),
                "measured_s": results[k],
                "ratio": round(results[k] / (ref[k] * scale), 2),
            }
            for k in (
                "ingest_s", "gk_ionic_s", "einstein_fused_s",
                "gk_diffusion_s",
            )
            if k in ref and k in results
        }
        results["note"] = (
            "REAL 1M-frame run of every frame-scaling host stage (no "
            "extrapolation); 98 GB store on a 125 GB-RAM VM, so repeat "
            "reads are disk-bound; device stages (RDF/ADF) sample a fixed "
            "config count and are frame-count independent (see the 100k "
            "artifact). Single-core host: a TPU-local multi-core host "
            "scales these bandwidth-bound stages with its disk + cores."
        )
        flush(results)


if __name__ == "__main__":
    main()
