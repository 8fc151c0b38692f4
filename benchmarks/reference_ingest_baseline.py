"""Measure the reference's INGESTION pattern on this machine.

The reference reads tabular dumps one line at a time into a per-config
numpy STRING array, id-sorts it, then slices per species/property and
converts (``mdsuite/file_io/tabular_text_files.py:160-220`` — the
``np.stack([list(file.readline().split()) ...])`` hot loop). This
benchmark reproduces that access pattern functionally (no code copied)
on a synthetic LAMMPS dump and reports MB/s, giving the measured
denominator for end-to-end ingest comparisons (our native C++ parser
path measures 170-260 MB/s on the same machine).

Run (CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python benchmarks/reference_ingest_baseline.py
Writes benchmarks/reference_ingest_baseline.json.
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


def write_dump(path, n_frames=150, n_atoms=5000, box=30.0):
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, box, size=(n_frames, n_atoms, 3))
    with open(path, "w") as f:
        for t in range(n_frames):
            f.write(
                f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{n_atoms}\n"
            )
            f.write("ITEM: BOX BOUNDS pp pp pp\n0 30\n0 30\n0 30\n")
            f.write("ITEM: ATOMS id element x y z\n")
            for i in range(n_atoms):
                f.write(
                    f"{i + 1} {'Na' if i % 2 else 'Cl'} "
                    f"{pos[t, i, 0]:.6f} {pos[t, i, 1]:.6f} "
                    f"{pos[t, i, 2]:.6f}\n"
                )
    return path


def reference_pattern_ingest(path, n_frames, n_atoms):
    """The reference's per-config loop, functionally: readline/split into
    a string ndarray, id-sort, per-species slice + float conversion."""
    na_rows = [i for i in range(n_atoms) if i % 2]
    cl_rows = [i for i in range(n_atoms) if not i % 2]
    out = []
    with open(path, "r") as f:
        for _ in range(n_frames):
            for _ in range(9):  # per-config header
                f.readline()
            traj = np.stack(
                [list(f.readline().split()) for _ in range(n_atoms)]
            )
            order = np.argsort(traj[:, 0].astype(int))
            traj = traj[order]
            for rows in (na_rows, cl_rows):
                out.append(traj[rows, 2:5].astype(np.float64))
    return out


def main():
    n_frames, n_atoms = 400, 5000
    out = {"n_frames": n_frames, "n_atoms": n_atoms}
    with tempfile.TemporaryDirectory() as tmp:
        path = write_dump(
            pathlib.Path(tmp) / "synth.lammpstraj", n_frames, n_atoms
        )
        n_bytes = path.stat().st_size
        reference_pattern_ingest(path, 2, n_atoms)  # warm the page cache
        t0 = time.perf_counter()
        data = reference_pattern_ingest(path, n_frames, n_atoms)
        dt = time.perf_counter() - t0
        assert len(data) == 2 * n_frames
        out["file_mb"] = round(n_bytes / 2**20, 2)
        out["reference_pattern_s"] = round(dt, 2)
        out["reference_pattern_mb_per_s"] = round(n_bytes / 2**20 / dt, 2)

        # same file through OUR production reader (native parser if the
        # toolchain is present, vectorised pandas otherwise)
        from lammps_analysis_tpu.file_io.lammps_dump import LAMMPSDumpFile

        reader = LAMMPSDumpFile(path)
        t0 = time.perf_counter()
        n = 0
        for chunk in reader.get_configurations_generator():
            n += chunk.chunk_size
        dt2 = time.perf_counter() - t0
        assert n == n_frames, n
        out["ours_s"] = round(dt2, 3)
        out["ours_mb_per_s"] = round(n_bytes / 2**20 / dt2, 1)
        out["ingest_speedup"] = round(dt / dt2, 1)

    p = REPO / "benchmarks" / "reference_ingest_baseline.json"
    p.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
