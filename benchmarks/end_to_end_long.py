"""Long-trajectory end-to-end benchmark: the BASELINE.md north star.

10k atoms x >=100k frames through the FULL stack — ingest to the HDF5
store, RDF (sampled, TPU), ionic-current GK conductivity, coordinate
unwrap, Einstein + GK self-diffusion — with wall-clock compared against
the reference's TF math measured on the same machine
(``tf_reference_baseline.py`` rates; linear extrapolation to this
workload, which favors TF by ignoring its memory pressure and its
pure-Python batching loops).

Writes ``benchmarks/end_to_end_100k.json`` incrementally after each stage
so a crash preserves completed measurements.

Run: python benchmarks/end_to_end_long.py [n_atoms] [n_frames]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

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
OUT = pathlib.Path(__file__).parent / "end_to_end_100k.json"


def flush(results):
    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    chunk_frames = 2000
    box, dt = 40.0, 0.002
    rng = np.random.default_rng(0)
    half = n_atoms // 2
    species = [
        SpeciesInfo("Na", half, [POS, VEL]),
        SpeciesInfo("Cl", n_atoms - half, [POS, VEL]),
    ]
    # E2E_RESUME_DIR: reopen a prior run's project and fill in only the
    # stages whose results are not yet in end_to_end_100k.json (a crashed
    # run leaves a valid store; cursors resume partial transformations).
    resume = os.environ.get("E2E_RESUME_DIR")
    if resume:
        workdir = pathlib.Path(resume)
        project = latpu.Project(name="long", storage_path=workdir)
        exp = project.experiments["big"]
        exp.set_charge("Na", 1.0)
        exp.set_charge("Cl", -1.0)
        results = json.loads(OUT.read_text()) if OUT.exists() else {}
        results.update({"n_atoms": n_atoms, "n_frames": n_frames})
        run_stages(exp, results, n_atoms, n_frames)
        return
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="e2e_long_"))
    project = latpu.Project(name="long", storage_path=workdir)
    exp = project.add_experiment(
        "big", timestep=dt, temperature=1400.0, units="metal"
    )

    results = {"n_atoms": n_atoms, "n_frames": n_frames}
    # E2E_KEEP_TPU_STAGES=1: refresh only the HOST stages (ingest +
    # transport stack) in a CPU-forced process, carrying the recorded
    # TPU-stage numbers (RDF/ADF) from the prior artifact — those code
    # paths are unchanged and rerunning them would contend for the shared
    # drifting chip.
    if os.environ.get("E2E_KEEP_TPU_STAGES") and OUT.exists():
        prior = json.loads(OUT.read_text())
        for k in (
            "rdf_warmup_compile_s", "rdf_s", "rdf_pairs", "rdf_pairs_per_s",
            "adf_warmup_compile_s", "adf_s", "adf_frames",
            "adf_ms_per_frame", "adf_note",
        ):
            if k in prior:
                results[k] = prior[k]
        results["tpu_stages_note"] = (
            "rdf/adf numbers carried from the prior artifact; this run "
            "re-measured the host stages (ingest + transport stack)"
        )

    # ------------------------------------------------------------- ingest
    ingest_s = 0.0
    done = 0
    # random-walk positions (diffusive) + white-noise velocities
    last = rng.uniform(0, box, (n_atoms, 3))
    while done < n_frames:
        n = min(chunk_frames, n_frames - done)
        meta = TrajectoryMetadata(
            n_configurations=n, species_list=species, box_l=[box] * 3,
            sample_rate=100, temperature=1400.0,
        )
        chunk = TrajectoryChunkData(species, n)
        # f32 generation: halves the single-core synthesis cost; the
        # store is f64 either way (h5py upcasts on write)
        steps = 0.05 * rng.standard_normal((n, n_atoms, 3), dtype=np.float32)
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
        if done % 20000 == 0:
            print(f"ingested {done}/{n_frames}", flush=True)
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)
    gb = exp.store.path.stat().st_size / 2**30
    results["ingest_s"] = round(ingest_s, 1)
    results["ingest_mb_per_s"] = round(gb * 1024 / ingest_s, 1)
    results["store_gb"] = round(gb, 1)
    flush(results)
    run_stages(exp, results, n_atoms, n_frames)


def run_stages(exp, results, n_atoms, n_frames):
    """Analysis stages; each is skipped if its key is already recorded."""
    # ---------------------------------------------------------------- RDF
    n_conf = int(os.environ.get("E2E_RDF_CONF", 500))
    n_bins = 500
    if "rdf_s" not in results:
        # warmup pass: the first Pallas program of a novel shape compiles
        # on the remote axon server (measured 4-17 MINUTES cold vs ~1 s
        # cached); a small run with the same chunk shape separates that
        # one-time cost from the steady-state stage time
        t0 = time.perf_counter()
        exp.run.RadialDistributionFunction(
            number_of_configurations=16, number_of_bins=n_bins, plot=False
        )
        results["rdf_warmup_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        exp.run.RadialDistributionFunction(
            number_of_configurations=n_conf, number_of_bins=n_bins,
            plot=False,
        )
        rdf_s = time.perf_counter() - t0
        results["rdf_s"] = round(rdf_s, 1)
        results["rdf_pairs"] = n_conf * n_atoms * (n_atoms - 1) // 2
        results["rdf_pairs_per_s"] = round(results["rdf_pairs"] / rdf_s)
        flush(results)

    # ---------------------------------------------------------------- ADF
    if "adf_s" not in results:
        # warmup compiles the per-shape Pallas programs (see RDF note)
        t0 = time.perf_counter()
        exp.run.AngularDistributionFunction(
            number_of_configurations=4, cutoff=3.6,
            number_of_bins=n_bins, plot=False,
        )
        results["adf_warmup_compile_s"] = round(time.perf_counter() - t0, 1)
        n_adf = max(8, n_conf // 5)
        t0 = time.perf_counter()
        exp.run.AngularDistributionFunction(
            number_of_configurations=n_adf, cutoff=3.6,
            number_of_bins=n_bins, plot=False,
        )
        adf_s = time.perf_counter() - t0
        results["adf_s"] = round(adf_s, 1)
        results["adf_frames"] = n_adf
        results["adf_ms_per_frame"] = round(adf_s / n_adf * 1000, 1)
        flush(results)

    # ------------------------------------------- GK ionic conductivity
    w, stride = 512, 256
    if "gk_ionic_s" not in results:
        t0 = time.perf_counter()
        exp.run.GreenKuboIonicConductivity(
            data_range=w, correlation_time=stride, plot=False
        )
        results["gk_ionic_s"] = round(time.perf_counter() - t0, 1)
        flush(results)

    # --------------------------------------------------- Einstein diffusion
    if "unwrap_s" not in results:
        t0 = time.perf_counter()
        exp.run.CoordinateUnwrapper()
        results["unwrap_s"] = round(time.perf_counter() - t0, 1)
        flush(results)

    n_windows = (n_frames - w) // stride + 1
    if "einstein_s" not in results:
        t0 = time.perf_counter()
        exp.run.EinsteinDiffusionCoefficients(
            data_range=w, correlation_time=stride, plot=False
        )
        einstein_s = time.perf_counter() - t0
        results["einstein_s"] = round(einstein_s, 1)
        results["msd_window_frame_atoms_per_s"] = round(
            n_windows * w * n_atoms / einstein_s
        )
        flush(results)

    # --------------------------------------- fused unwrap+Einstein (opt-in)
    if "einstein_fused_s" not in results and "einstein_s" in results:
        # same args as the materialised run; drop the cached computation
        # and the materialised tensors so fusion engages for real
        from lammps_analysis_tpu.utils.config import config

        exp.db.delete_computations(
            exp.name, "EinsteinDiffusionCoefficients"
        )
        for sp in exp.species:
            exp.store.drop(f"{sp}/Unwrapped_Positions")
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
        results["einstein_fused_note"] = (
            "config.fuse_streaming: unwraps in-flight — replaces the "
            "unwrap_s + einstein_s sequence (no Unwrapped_Positions "
            "write/read)"
        )
        results["einstein_fused_speedup_vs_sequence"] = round(
            (results["unwrap_s"] + results["einstein_s"]) / fused_s, 2
        )
        flush(results)

    # ------------------------------------------------- GK self-diffusion
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

    # ------------------------------------------ TF-equivalent wall-clock
    tf_path = pathlib.Path(__file__).parent / "tf_baseline.json"
    if tf_path.exists():
        tf = json.loads(tf_path.read_text())
        comp = {}
        # any framework must stream the same bytes off the same disk: the
        # TF-equivalent for bandwidth-bound calculators is floored by the
        # measured store throughput (kernel-only extrapolation would
        # credit TF with infinitely fast I/O)
        disk_mbps = results["ingest_mb_per_s"]
        traj_mb = n_frames * n_atoms * 3 * 8 / 2**20
        io_floor_s = traj_mb / max(disk_mbps, 1e-9)
        comp["same_disk_io_floor_s"] = round(io_floor_s, 1)
        if "value" in tf:
            comp["rdf_tf_kernel_s"] = round(
                results["rdf_pairs"] / tf["value"], 1
            )
            comp["rdf_speedup_vs_tf"] = round(
                comp["rdf_tf_kernel_s"] / results["rdf_s"], 1
            )
        if "msd_window_frame_atoms_per_s" in tf:
            kern = n_windows * w * n_atoms / tf["msd_window_frame_atoms_per_s"]
            comp["einstein_tf_equiv_s"] = round(max(kern, io_floor_s), 1)
            comp["einstein_speedup_vs_tf"] = round(
                comp["einstein_tf_equiv_s"] / results["einstein_s"], 2
            )
        if "vacf_window_frame_atoms_per_s" in tf:
            kern = n_windows * w * n_atoms / tf["vacf_window_frame_atoms_per_s"]
            comp["gk_tf_equiv_s"] = round(max(kern, io_floor_s), 1)
            comp["gk_speedup_vs_tf"] = round(
                comp["gk_tf_equiv_s"] / results["gk_diffusion_s"], 2
            )
        comp["note"] = (
            "TF times = this machine's measured reference-equivalent TF "
            "kernel rates (tf_reference_baseline.py) extrapolated to this "
            "workload, floored by the shared disk I/O time for the "
            "bandwidth-bound calculators; kernel-only extrapolation still "
            "favors TF by ignoring its python batching loops."
        )
        results["vs_tf_reference"] = comp
    results["extrapolation_to_1m_frames"] = (
        "ingest, unwrap, Einstein and GK scale linearly in frames (streamed "
        "slabs); RDF samples a fixed number of configurations and is "
        "frame-count independent beyond sampling I/O."
    )
    flush(results)


if __name__ == "__main__":
    main()
