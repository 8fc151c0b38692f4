"""Empirical ceiling for the ADF per-species-pair accumulator lever.

VERDICT r2 #5 queued "per-species-pair accumulators (~1.4x at >= 3
species)". The roofline model (benchmarks/roofline.md) prices the lever
lower: it shrinks the one-hot id space from n_triples*n_bins to
n_pairs*n_bins, nothing else — at S=2 that is 2000 -> 1500 ids
(one-hot rows 128 -> 112, <= 1.06x on the kernel), at S=3 it is
5000 -> 3000 (rows 208 -> 160, ~1.25x model), and the variant
additionally requires pack == 1 (with packed centers the center species
varies per lane, so no per-row accumulator slab can be selected) plus
per-row dynamic accumulator addressing (the fifth-pass lesson: pl.when
around loop-carried accumulation was SLOWER than no skip).

This experiment measures the lever's CEILING without building the risky
variant: the CURRENT kernel at S=3 is timed with its natural 500-bin id
space (total 5000) against a 300-bin id space (total 3000) — exactly the
id-total the accumulator variant would produce at 500 bins. The speedup
of the smaller id space bounds what the accumulator redesign could win
(it pays the same one-hot row count while KEEPING 500 bins); everything
else in the kernel is identical. One process, interleaved repeats,
same-run ratio only.
"""

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
OUT = REPO / "benchmarks" / "adf_pairacc_bound.json"


def main():
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.adf import build_triple_table
    from lammps_analysis_tpu.parallel.sharded_ops import AdfBatchRunner

    assert jax.default_backend() == "tpu", "run on the chip"
    n_atoms, box, cutoff, f = 10240, 40.0, 3.6, 8
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, box, size=(f, n_atoms, 3)).astype(np.float32)
    sid = np.zeros(n_atoms, np.int32)
    sid[n_atoms // 3: 2 * n_atoms // 3] = 1
    sid[2 * n_atoms // 3:] = 2
    ttab, order = build_triple_table(3)
    box_j = jnp.asarray(np.array([box] * 3, np.float32))

    def run_once(n_bins):
        runner = AdfBatchRunner(
            n_atoms=n_atoms, species_id=jnp.asarray(sid),
            triple_table=jnp.asarray(ttab), box=box_j, cutoff=cutoff,
            n_bins=n_bins, n_triples=len(order), norm_power=4, c_block=8,
            normalize_per_batch=None,
        )
        while True:
            runner.feed(jnp.asarray(pos))
            h = runner.finalize()
            if h is not None:  # None = saturation escalate-and-retry
                return np.asarray(h)

    def time_arm(n_bins, reps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            h = run_once(n_bins)
            ts.append(time.perf_counter() - t0)
        return min(ts) / f * 1e3, float(h.sum())

    # warmup/compile both shapes
    run_once(500)
    run_once(300)
    out = {"n_atoms": n_atoms, "cutoff": cutoff, "f": f, "species": 3}
    # interleaved arms, best-of to dodge drift
    a_ms, a_sum = [], None
    b_ms, b_sum = [], None
    for _ in range(3):
        ms, a_sum = time_arm(500, 2)
        a_ms.append(ms)
        ms, b_sum = time_arm(300, 2)
        b_ms.append(ms)
    out["ms_per_frame_bins500_total5000_ids"] = round(min(a_ms), 2)
    out["ms_per_frame_bins300_total3000_ids"] = round(min(b_ms), 2)
    out["ceiling_speedup_for_pairacc_at_S3"] = round(
        min(a_ms) / min(b_ms), 3
    )
    out["hist_sums"] = [a_sum, b_sum]
    out["note"] = (
        "bins300 reproduces the id-total the per-species-pair accumulator "
        "variant would give at 500 bins/S=3; its speedup is the lever's "
        "ceiling (the variant adds per-row accumulator addressing on top)"
    )
    OUT.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
