"""Compose the end-to-end wall-clock comparison vs the reference stack.

BASELINE.md's north star is ">=10x TF baseline wall-clock" for the full
10k-atom long-trajectory workflow. Running the reference itself at this
scale is infeasible on this machine (its measured ingest pattern alone
needs ~46 minutes for the 22.9 GB workload), so the comparison composes
MEASURED rates — every number in the output carries its source artifact:

- ours: stage wall-clocks from the REAL 100k-frame run
  (end_to_end_100k.json: ingest -> GK ionic -> fused-unwrap Einstein ->
  GK diffusion -> RDF).
- reference-equivalent: the reference's line-loop ingest pattern
  measured on this machine (reference_ingest_baseline.json), its TF RDF
  kernel rate measured on this machine (tf_baseline_10k.json), and the
  disk-I/O-floored TF-equivalent times for the bandwidth-bound stages
  already recorded in the 100k artifact's vs_tf_reference section.

Conservative by construction: the reference would read a TEXT dump
(~2.3x the store's f32 bytes — we charge it only the store bytes), its
Python batching loops around the TF kernels are ignored (kernel-only
rates), and ADF is excluded from both totals (the reference crashes at
this size upstream).

Run: python benchmarks/e2e_vs_reference_summary.py
Writes benchmarks/e2e_vs_reference_summary.json.
"""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
B = REPO / "benchmarks"


def main():
    e2e = json.loads((B / "end_to_end_100k.json").read_text())
    ingest_ref = json.loads((B / "reference_ingest_baseline.json").read_text())
    vs = e2e["vs_tf_reference"]

    store_mb = e2e["store_gb"] * 1024
    ref_ingest_s = store_mb / ingest_ref["reference_pattern_mb_per_s"]

    ours = {
        "ingest_s": e2e["ingest_s"],
        "gk_ionic_s": e2e["gk_ionic_s"],
        "einstein_fused_s": e2e["einstein_fused_s"],
        "gk_diffusion_s": e2e["gk_diffusion_s"],
        "rdf_s": e2e["rdf_s"],
    }
    ref = {
        "ingest_s": round(ref_ingest_s, 1),
        # GK ionic runs on the 3-component system current — cheap compute;
        # charge the reference only the shared disk-read floor (maximally
        # favorable to it)
        "gk_ionic_s": vs["same_disk_io_floor_s"],
        "einstein_s": vs["einstein_tf_equiv_s"],
        "gk_diffusion_s": vs["gk_tf_equiv_s"],
        "rdf_s": vs["rdf_tf_kernel_s"],
    }
    out = {
        "workload": {
            "n_atoms": e2e["n_atoms"],
            "n_frames": e2e["n_frames"],
            "store_gb": e2e["store_gb"],
        },
        "ours_stages_s": ours,
        "ours_total_s": round(sum(ours.values()), 1),
        "reference_equivalent_stages_s": ref,
        "reference_equivalent_total_s": round(sum(ref.values()), 1),
        "sources": {
            "ours": "end_to_end_100k.json (real run)",
            "reference_ingest": (
                "reference_ingest_baseline.json — the reference's"
                " readline/split/np.stack(str) loop measured at"
                f" {ingest_ref['reference_pattern_mb_per_s']} MB/s on this"
                " machine, charged only the f32 store bytes (its text"
                " input would be ~2.3x larger)"
            ),
            "reference_kernels": (
                "end_to_end_100k.json vs_tf_reference — measured TF kernel"
                " rates (tf_reference_baseline.py), disk-I/O-floored for"
                " the bandwidth-bound stages; Python batching loops"
                " ignored (favors the reference)"
            ),
            "excluded": (
                "ADF excluded from both totals (the reference crashes at"
                " 10k atoms upstream; ours: 3.5 s for 100 configs)"
            ),
        },
    }
    out["e2e_speedup"] = round(
        out["reference_equivalent_total_s"] / out["ours_total_s"], 1
    )
    p = B / "e2e_vs_reference_summary.json"
    p.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
