"""One-session TPU re-baseline: every headline number from ONE chip state.

The shared chip drifts +-35% across hours, so numbers from different
sessions aren't comparable. This runs a health probe first (recorded in
the JSON — discard the run if probe_s is far from ~0.1 s steady), then
every headline measurement back-to-back with same-shape warmups.

Resilience (the tunnel flaps: three multi-hour outages this round):

* a quick 512x512 probe runs BETWEEN stages and is recorded per stage
  (``probe_before_<key>``) — a stage whose preceding probe is slow is
  individually discardable;
* the JSON is rewritten after EVERY stage, so a mid-run wedge still
  leaves all completed numbers on disk;
* if an inter-stage probe exceeds ``ABORT_PROBE_S`` the run stops and
  marks itself ``aborted`` — a half-healthy session beats garbage tails.

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

#: inter-stage probe above this means the chip/tunnel degraded mid-run:
#: stop (healthy steady state is ~0.1 s; CLAUDE.md discipline says do
#: not benchmark above ~20 s)
ABORT_PROBE_S = 20.0


def main():
    import jax
    import jax.numpy as jnp

    out = {"measured": time.strftime("%Y-%m-%d %H:%M")}
    path = pathlib.Path(__file__).parent / "rebaseline.json"

    def flush():
        path.write_text(json.dumps(out, indent=2))

    a = jnp.ones((512, 512))
    np.asarray(a @ a)  # backend init + first compile

    def probe_s():
        t0 = time.perf_counter()
        np.asarray((a + 1.0) @ a)
        return round(time.perf_counter() - t0, 2)

    out["probe_s"] = probe_s()
    out["backend"] = f"{jax.default_backend()}"
    flush()

    import os

    import bench
    from lammps_analysis_tpu.parallel.sharded_ops import adf_frames_per_call

    f65 = adf_frames_per_call(
        65536, np.array([40.0 * (65536 / 10240) ** (1 / 3)] * 3, np.float32),
        3.6, 8 << 30,
    )
    out["adf_65536_production_f"] = int(f65)

    def brick_env(fn):
        def run():
            os.environ["LATPU_ADF_SORT"] = "brick"
            try:
                return fn()
            finally:
                os.environ.pop("LATPU_ADF_SORT", None)

        return run

    def firstshell(n_frames, suffix="", **kw):
        """Key and workload built from the SAME ``n_frames`` — the key
        carries the call height (``bench.adf_firstshell_key``; one key =
        one workload, tests/test_bench_keys.py)."""
        return (
            bench.adf_firstshell_key(n_frames, suffix),
            lambda: round(
                bench.measure_adf_ms_per_frame(n_frames=n_frames, **kw), 1
            ),
        )

    stages = [
        ("rdf_pairs_per_s",
         lambda: round(bench.measure_rdf_pairs_per_s(**bench.WORKLOAD))),
        firstshell(2),
        ("adf_wide_ms_per_frame",
         lambda: round(bench.measure_adf_ms_per_frame(cutoff=5.5), 1)),
        # reference-default ADF cutoff (6.0): statistical K bound + the
        # adaptive fold-chunk gate land here (104.6 -> 61.4 on 2026-08-18)
        ("adf_refcutoff_ms_per_frame_f8",
         lambda: round(bench.measure_adf_ms_per_frame(n_frames=8,
                                                      cutoff=6.0), 1)),
        ("rdf_65536_gpairs_per_s",
         lambda: round(bench.measure_rdf_pairs_per_s(
             n_atoms=65536, n_frames=8, n_bins=500, repeats=2,
             consistency_check=False) / 1e9, 2)),
        ("adf_65536_ms_per_frame",
         lambda: round(bench.measure_adf_ms_per_frame(n_atoms=65536,
                                                      n_frames=1), 1)),
        # frames-per-call A/B: the sort+window stage carries ~2.5 ms/frame
        # of per-call cost at n_frames=2 — taller batches amortise it.
        # Same-session ratios are the only trustworthy comparison here.
        # f16 is the production call height — the SAME workload as
        # BENCH extras' ADF_FIRSTSHELL_KEY row.
        firstshell(8),
        firstshell(bench.ADF_FIRSTSHELL_F),
        # serpentine brick sort A/B (production default >= 16384 atoms)
        (bench.adf_firstshell_key(2, "_brick"),
         brick_env(lambda: round(bench.measure_adf_ms_per_frame(), 1))),
        ("adf_65536_ms_per_frame_brick",
         brick_env(lambda: round(bench.measure_adf_ms_per_frame(
             n_atoms=65536, n_frames=1), 1))),
        # production call heights (what the calculator actually runs
        # since adf_frames_per_call)
        ("adf_65536_ms_per_frame_production",
         lambda: round(bench.measure_adf_ms_per_frame(
             n_atoms=65536, n_frames=int(f65)), 1)),
    ]

    for key, fn in stages:
        p = probe_s()
        out[f"probe_before_{key}"] = p
        if p > ABORT_PROBE_S:
            out["aborted"] = (
                f"inter-stage probe {p} s > {ABORT_PROBE_S} s before "
                f"{key}; chip degraded mid-run, later stages skipped"
            )
            flush()
            break
        out[key] = fn()
        flush()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
