"""Queued ADF A/Bs: ternary stage-2 cost + 65k-atom call height.

One chip session, health-probed:

1. **n_species 2 vs 3** at 10240 atoms — the stage-2 one-hot space grows
   with the triple count (4 -> 10 triples at 500 bins: compare rows
   ~128 -> ~208 per element), quantifying what the per-species-pair
   accumulator lever (COVERAGE.md round-3 queue) could recover before
   committing to the kernel surgery.
2. **65536 atoms at 2 vs 8 frames/call** — `adf_frames_per_call` models
   ~11 frames fitting the linear footprint at 65k; the rebaseline's
   93.6 ms/frame (brick) was measured at f=2 where the per-call
   sort+window cost is unamortised.

Run on TPU (idle host!): python benchmarks/adf_followup_ab.py
Writes benchmarks/adf_followup_ab.json.
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

    import bench

    out = {"backend": jax.default_backend()}
    a = jnp.ones((512, 512))
    np.asarray(a @ a)
    t0 = time.perf_counter()
    np.asarray((a + 1.0) @ a)
    out["probe_s"] = round(time.perf_counter() - t0, 2)

    for n_sp in (2, 3):
        ms = bench.measure_adf_ms_per_frame(
            n_atoms=10240, n_frames=16, n_species=n_sp
        )
        out[f"adf_10240_f16_s{n_sp}_ms_per_frame"] = round(ms, 2)
        print(f"species={n_sp}: {ms:.2f} ms/frame", flush=True)
    out["ternary_overhead"] = round(
        out["adf_10240_f16_s3_ms_per_frame"]
        / out["adf_10240_f16_s2_ms_per_frame"],
        2,
    )

    for f in (2, 8):
        ms = bench.measure_adf_ms_per_frame(n_atoms=65536, n_frames=f)
        out[f"adf_65536_f{f}_ms_per_frame"] = round(ms, 2)
        print(f"65k f={f}: {ms:.2f} ms/frame", flush=True)
    out["fpc_65k_speedup"] = round(
        out["adf_65536_f2_ms_per_frame"] / out["adf_65536_f8_ms_per_frame"],
        2,
    )

    # triangle lane-chunking A/B at wide cutoffs (K > 128, pack == 1):
    # same-session, env-gated; the chunked kernel skips lane chunks past
    # the ~K/2.6-occupied valid prefix
    import os

    for cutoff, tag in ((6.0, "ref_default"), (5.5, "wide")):
        for flag, arm in (("0", "full"), ("1", "chunked")):
            os.environ["LATPU_ADF_FOLD_CHUNK"] = flag
            try:
                ms = bench.measure_adf_ms_per_frame(
                    n_atoms=10240, n_frames=8, cutoff=cutoff
                )
            finally:
                os.environ.pop("LATPU_ADF_FOLD_CHUNK", None)
            out[f"adf_10240_f8_c{cutoff}_{arm}_ms_per_frame"] = round(ms, 2)
            print(f"cutoff={cutoff} {arm}: {ms:.2f} ms/frame", flush=True)
        out[f"fold_chunk_speedup_{tag}"] = round(
            out[f"adf_10240_f8_c{cutoff}_full_ms_per_frame"]
            / out[f"adf_10240_f8_c{cutoff}_chunked_ms_per_frame"],
            2,
        )

    path = REPO / "benchmarks" / "adf_followup_ab.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
