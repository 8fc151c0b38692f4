"""A/B the Morton-sorted chunk-skip extract vs the unsorted kernel (TPU).

Times stage 1 alone (extract) and the full tiled-ADF pipeline at 10240
atoms for a first-shell and a wide cutoff, matching the kernel-sweep
geometry. Writes ``benchmarks/adf_sorted_bench.json``.

Run: python benchmarks/adf_sorted_bench.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _time(fn, fetch, repeats=3):
    fetch(fn())  # compile + execute + fetch
    import jax

    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops import adf as A
    from lammps_analysis_tpu.ops.pallas_adf import (
        _neighbor_extract_pallas,
        extract_e_for,
        sorted_neighbor_extract,
        window_chunk_bound,
    )
    from lammps_analysis_tpu.parallel.sharded_ops import (
        _AdfPlan,
        _adf_pipeline,
    )

    n_atoms, n_frames = 10240, 2
    rng = np.random.default_rng(2)
    box = 40.0
    half = n_atoms // 2
    sid = np.concatenate(
        [np.zeros(half, np.int32), np.ones(n_atoms - half, np.int32)]
    )
    pos = jnp.asarray(
        rng.uniform(0, box, size=(n_frames, n_atoms, 3)).astype(np.float32)
    )
    sid_j = jnp.asarray(sid)
    ttab, _ = A.build_triple_table(2)
    ttab_j = jnp.asarray(ttab)
    box_np = np.array([box] * 3, np.float32)
    box_j = jnp.asarray(box_np)
    results = {"backend": jax.default_backend(), "n_atoms": n_atoms}

    for label, cutoff in (("firstshell_3.6", 3.6), ("wide_5.5", 5.5)):
        r = {}
        t_u = _time(
            lambda: _neighbor_extract_pallas(
                pos, sid_j, box_j, cutoff, k_n=128
            ),
            lambda o: np.asarray(o[6]),
        )
        e_fix = extract_e_for(n_atoms, box_np, cutoff)
        wb = window_chunk_bound(n_atoms, box_np, cutoff)
        t_s = _time(
            lambda: sorted_neighbor_extract(
                pos, sid_j, box_j, cutoff, k_n=128, e_fixed=e_fix,
                w_chunks=wb,
            ),
            lambda o: np.asarray(o[5]),
        )
        r["extract_e"] = e_fix
        r["w_chunks"] = wb
        r["extract_unsorted_ms_per_frame"] = round(t_u / n_frames * 1e3, 2)
        r["extract_sorted_ms_per_frame"] = round(t_s / n_frames * 1e3, 2)
        r["extract_speedup"] = round(t_u / t_s, 2)

        for use_sorted in (False, True):
            plan = _AdfPlan(n_atoms, box_np, cutoff, use_pallas=True)
            plan.use_sorted = use_sorted
            assert plan.use_pallas_run
            pipe = _adf_pipeline(plan, 2, cutoff, 500, 4)
            t_p = _time(
                lambda: pipe(pos, sid_j, ttab_j, box_j),
                lambda o: np.asarray(o[0]),
            )
            key = "pipeline_sorted" if use_sorted else "pipeline_unsorted"
            r[f"{key}_ms_per_frame"] = round(t_p / n_frames * 1e3, 2)
            r[f"{key}_pack"] = plan.pack
        r["pipeline_speedup"] = round(
            r["pipeline_unsorted_ms_per_frame"]
            / r["pipeline_sorted_ms_per_frame"], 2,
        )
        results[label] = r
        print(label, json.dumps(r))

    out_path = pathlib.Path(__file__).parent / "adf_sorted_bench.json"
    out_path.write_text(json.dumps(results, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
