"""One-session TPU re-baseline: every headline number from ONE chip state.

The shared chip drifts +-35% across hours, so numbers from different
sessions aren't comparable. This runs a health probe first (recorded in
the JSON — discard the run if probe_s is far from ~0.1 s steady), then
every headline measurement back-to-back with same-shape warmups.

Run: python benchmarks/rebaseline.py
Writes benchmarks/rebaseline.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    out = {"measured": time.strftime("%Y-%m-%d %H:%M")}

    # chip health probe (after backend init)
    a = jnp.ones((512, 512))
    np.asarray(a @ a)
    t0 = time.perf_counter()
    np.asarray((a + 1.0) @ a)
    out["probe_s"] = round(time.perf_counter() - t0, 2)
    out["backend"] = f"{jax.default_backend()}"

    import bench

    out["rdf_pairs_per_s"] = round(
        bench.measure_rdf_pairs_per_s(**bench.WORKLOAD)
    )
    out["adf_firstshell_ms_per_frame"] = round(
        bench.measure_adf_ms_per_frame(), 1
    )
    out["adf_wide_ms_per_frame"] = round(
        bench.measure_adf_ms_per_frame(cutoff=5.5), 1
    )
    # reference-default ADF cutoff (6.0): statistical K bound + the
    # adaptive fold-chunk gate land here (104.6 -> 61.4 on 2026-08-18)
    out["adf_refcutoff_ms_per_frame_f8"] = round(
        bench.measure_adf_ms_per_frame(n_frames=8, cutoff=6.0), 1
    )
    out["rdf_65536_gpairs_per_s"] = round(
        bench.measure_rdf_pairs_per_s(
            n_atoms=65536, n_frames=8, n_bins=500, repeats=2,
            consistency_check=False,
        ) / 1e9,
        2,
    )
    out["adf_65536_ms_per_frame"] = round(
        bench.measure_adf_ms_per_frame(n_atoms=65536, n_frames=1), 1
    )

    # frames-per-call A/B: the sort+window stage carries ~2.5 ms/frame of
    # per-call cost at n_frames=2 — taller batches should amortise it.
    # Same-session ratios are the only trustworthy comparison on this chip.
    for f in (8, 16):
        out[f"adf_ms_per_frame_f{f}"] = round(
            bench.measure_adf_ms_per_frame(n_frames=f), 1
        )

    # serpentine brick sort A/B (interpret-validated; windows shrink
    # ~1.5x at 10k / ~3.6x at 65k in chunk counts — route production to
    # it if these ratios confirm on hardware)
    import os

    os.environ["LATPU_ADF_SORT"] = "brick"
    try:
        out["adf_firstshell_ms_per_frame_brick"] = round(
            bench.measure_adf_ms_per_frame(), 1
        )
        out["adf_65536_ms_per_frame_brick"] = round(
            bench.measure_adf_ms_per_frame(n_atoms=65536, n_frames=1), 1
        )
    finally:
        os.environ.pop("LATPU_ADF_SORT", None)

    # production call heights (what the calculator actually runs since
    # adf_frames_per_call): 10240 at f=16, 65536 at the helper's choice
    from lammps_analysis_tpu.parallel.sharded_ops import adf_frames_per_call

    f65 = adf_frames_per_call(
        65536, np.array([40.0 * (65536 / 10240) ** (1 / 3)] * 3, np.float32),
        3.6, 8 << 30,
    )
    out["adf_65536_production_f"] = int(f65)
    out["adf_65536_ms_per_frame_production"] = round(
        bench.measure_adf_ms_per_frame(n_atoms=65536, n_frames=int(f65)), 1
    )

    path = pathlib.Path(__file__).parent / "rebaseline.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
