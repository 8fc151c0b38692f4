"""A/B: flux-transformation host numpy kernel vs the jitted XLA path.

The host-routed flux stages (IonicCurrent et al.) are O(bytes) reductions;
the jitted path pays a host->jax buffer copy plus XLA-CPU's strided
axis-1 reduce, while the numpy kernel streams the slab once through BLAS
batched matmuls. Both arms run in ONE process against the SAME store
(page-cache state shared; the B arm forces the jit path by nulling
``transform_batch_host``), full stage timing including HDF5 slab reads.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python benchmarks/flux_host_kernel_ab.py [n_atoms] [n_frames]
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
from lammps_analysis_tpu.transformations import IonicCurrent

VEL = PropertyInfo("Velocities", 3)


def build(workdir, n_atoms, n_frames, chunk_frames=2000):
    rng = np.random.default_rng(0)
    half = n_atoms // 2
    species = [
        SpeciesInfo("Na", half, [VEL]),
        SpeciesInfo("Cl", n_atoms - half, [VEL]),
    ]
    project = latpu.Project(name="fluxab", storage_path=workdir)
    exp = project.add_experiment("e", timestep=0.002, temperature=1400.0)
    done = 0
    while done < n_frames:
        n = min(chunk_frames, n_frames - done)
        meta = TrajectoryMetadata(
            n_configurations=n, species_list=species, box_l=[40.0] * 3,
        )
        chunk = TrajectoryChunkData(species, n)
        for sp in species:
            chunk.add_data(
                rng.normal(size=(n, sp.n_particles, 3)).astype(np.float32),
                0, sp.name, "Velocities",
            )
        exp.add_data(ScriptInput(chunk, meta, f"chunk{done}"))
        done += n
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)
    return exp


def run_stage(exp, force_jit: bool) -> float:
    out_path = "Observables/Ionic_Current"
    if exp.store.check_existence(out_path):
        exp.store.drop(out_path)
    trafo = IonicCurrent()
    if force_jit:
        trafo.transform_batch_host = None
    t0 = time.perf_counter()
    trafo.run_transformation(exp)
    return time.perf_counter() - t0


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="flux_ab_"))
    try:
        exp = build(workdir, n_atoms, n_frames)
        gb = n_atoms * n_frames * 3 * 4 / 2**30
        # interleave arms to cancel cache/thermal drift: jit, host, jit, host
        jit_s = [run_stage(exp, force_jit=True)]
        host_s = [run_stage(exp, force_jit=False)]
        jit_s.append(run_stage(exp, force_jit=True))
        host_s.append(run_stage(exp, force_jit=False))
        result = {
            "n_atoms": n_atoms,
            "n_frames": n_frames,
            "velocities_gb": round(gb, 2),
            "jit_stage_s": [round(s, 2) for s in jit_s],
            "host_stage_s": [round(s, 2) for s in host_s],
            "jit_gb_per_s": round(gb / min(jit_s), 2),
            "host_gb_per_s": round(gb / min(host_s), 2),
            "speedup": round(min(jit_s) / min(host_s), 2),
        }
        print(json.dumps(result, indent=2))
        out = pathlib.Path(__file__).parent / "flux_host_kernel_ab.json"
        out.write_text(json.dumps(result, indent=2))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()


