"""Perf rows for the last unmeasured calculators (VERDICT r4 missing #2):
the distinct-diffusion family and the spatial distribution function.

Both are implemented and correctness-tested; this commits one measured
throughput row each at the asked shapes — 10240 atoms x 2 species — via
the FULL calculator path (store -> stream -> kernel -> Computation), the
same e2e discipline as the other README rows.

Placement note: all three are O(1)-flops/byte streamed stages on this
machine's measured slow tunnel — ``utils/devices.py``'s policy routes
their slabs to the host CPU (``bandwidth_bound_device``), so the honest
production measurement is a ``JAX_PLATFORMS=cpu`` process (an init-stall
on a degraded tunnel would otherwise contaminate the number; CLAUDE.md
round-2 third-pass learnings). The script forces the CPU platform before
building any arrays. The SDF's inner pair block is MXU-friendly
(histogram2d_masked "outer" path) but at the default 5-configuration
workload the stream dominates — host is the measured-policy choice there
too.

VM noise discipline: single shared core, 2-4x wall noise — each row
reports wall AND process time; working sets are >= 120 MB.

Reference context: the reference marks both experimental
(``einstein_distinct_diffusion_coefficients.py:108``,
``spatial_distribution_function.py:72``) and disables the SDF in its
hub (``experiment/run.py:240-242``); its distinct family's jax.vmap Gram
map is O(Na*Nb) per window vs this build's bilinear O(N) identity
(``calculators/distinct_diffusion_coefficients.py`` docstring).

Writes ``benchmarks/distinct_sdf_perf.json``.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N_ATOMS = 10240
N_FRAMES = 1024
DATA_RANGE = 64
CORR_TIME = 32
SDF_CONFS = 16


def build_experiment(tmp):
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        SpeciesInfo,
        TrajectoryChunkData,
        TrajectoryMetadata,
    )
    from lammps_analysis_tpu.database.properties import PropertyInfo
    from lammps_analysis_tpu.file_io import ScriptInput

    rng = np.random.default_rng(11)
    half = N_ATOMS // 2
    box = 40.0
    POS = PropertyInfo("Positions", 3)
    UNW = PropertyInfo("Unwrapped_Positions", 3)
    VEL = PropertyInfo("Velocities", 3)
    sp = [
        SpeciesInfo("Na", half, [POS, UNW, VEL]),
        SpeciesInfo("Cl", N_ATOMS - half, [POS, UNW, VEL]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=N_FRAMES, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, N_FRAMES)
    for name, lo, hi in (("Na", 0, half), ("Cl", half, N_ATOMS)):
        n_sp = hi - lo
        vel = rng.normal(scale=0.3, size=(N_FRAMES, n_sp, 3)).astype(
            np.float32
        )
        unw = np.cumsum(vel * 0.05, axis=0, dtype=np.float32)
        pos = np.mod(unw, box)
        chunk.add_data(pos, 0, name, "Positions")
        chunk.add_data(unw, 0, name, "Unwrapped_Positions")
        chunk.add_data(vel, 0, name, "Velocities")
    project = latpu.Project(name="perf", storage_path=tmp)
    return project.add_experiment(
        "e", timestep=0.05, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )


def timed(fn):
    t0, p0 = time.perf_counter(), time.process_time()
    out = fn()
    return out, time.perf_counter() - t0, time.process_time() - p0


def main():
    import tempfile

    from lammps_analysis_tpu.ops.correlation import window_starts

    out = {
        "workload": {
            "n_atoms": N_ATOMS, "n_species": 2, "n_frames": N_FRAMES,
            "data_range": DATA_RANGE, "correlation_time": CORR_TIME,
            "sdf_configurations": SDF_CONFS,
        },
        "placement": (
            "host CPU per utils/devices.py bandwidth-bound policy "
            "(slow accelerator link); JAX_PLATFORMS=cpu process"
        ),
        "backend": jax.default_backend(),
    }
    n_windows = len(
        np.asarray(window_starts(N_FRAMES, DATA_RANGE, CORR_TIME))
    )
    wfa = n_windows * DATA_RANGE * N_ATOMS  # window-frame-atoms of work

    with tempfile.TemporaryDirectory() as tmp:
        exp, ing_wall, _ = timed(lambda: build_experiment(tmp))
        out["ingest_s"] = round(ing_wall, 1)

        _, wall, proc = timed(lambda: exp.run.EinsteinDistinctDiffusionCoefficients(
            data_range=DATA_RANGE, correlation_time=CORR_TIME, plot=False,
        ))
        out["einstein_distinct"] = {
            "wall_s": round(wall, 2), "process_s": round(proc, 2),
            "n_windows": n_windows,
            "window_frame_atoms_per_s": round(wfa / wall),
            "window_frame_atoms_per_s_pt": round(wfa / max(proc, 1e-9)),
        }

        _, wall, proc = timed(lambda: exp.run.GreenKuboDistinctDiffusionCoefficients(
            data_range=DATA_RANGE, correlation_time=CORR_TIME, plot=False,
        ))
        out["green_kubo_distinct"] = {
            "wall_s": round(wall, 2), "process_s": round(proc, 2),
            "n_windows": n_windows,
            "window_frame_atoms_per_s": round(wfa / wall),
            "window_frame_atoms_per_s_pt": round(wfa / max(proc, 1e-9)),
        }

        _, wall, proc = timed(lambda: exp.run.SpatialDistributionFunction(
            number_of_configurations=SDF_CONFS, start=1, stop=N_FRAMES - 1,
            r_min=1.5, r_max=2.5, plot=False,
        ))
        # frames actually processed = unique linspace points
        n_proc = len(np.unique(np.linspace(1, N_FRAMES - 1, SDF_CONFS,
                                           dtype=int)))
        pairs_per_frame = (N_ATOMS // 2) ** 2
        out["sdf"] = {
            "wall_s": round(wall, 2), "process_s": round(proc, 2),
            "frames": n_proc,
            "ms_per_frame": round(wall / n_proc * 1e3, 1),
            "ms_per_frame_pt": round(proc / n_proc * 1e3, 1),
            "mpairs_per_s": round(n_proc * pairs_per_frame / wall / 1e6, 1),
        }

    (HERE / "distinct_sdf_perf.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
