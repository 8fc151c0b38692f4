"""A/B the lean extract sweep (no idx/d accumulation) vs the full one.

The lean variant drops the ``idx`` output and the per-extraction ``d``
accumulation from the stage-1 sweep's inner loop (d is recomputed once
per block from the picked components) and one of the six VMEM scratch
rows. One PROCESS per arm (in-process env-flag A/Bs of kernel variants
alias to one compiled executable — CLAUDE.md round-2 ninth-pass), each
arm cold-verified by a counts/d checksum the wrapper cross-compares.

Run: python benchmarks/adf_lean_ab.py           (wrapper, writes JSON)
     python benchmarks/adf_lean_ab.py arm <lean|full> <10k|65k>
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

CASES = {
    "10k": dict(n_atoms=10240, box=40.0, cutoff=3.6, frames=16),
    "65k": dict(n_atoms=65536, box=80.0, cutoff=3.6, frames=6),
}


def run_arm(lean: bool, case: str) -> dict:
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.pallas_adf import (
        _brick_sort,
        _chunk_arcs,
        _chunk_window,
        _extract_tc_windowed,
        _neighbor_extract_pallas,
        _spatial_sort,
    )
    from lammps_analysis_tpu.parallel.sharded_ops import _AdfPlan

    cfg = CASES[case]
    n, box, cutoff, f = (
        cfg["n_atoms"], cfg["box"], cfg["cutoff"], cfg["frames"],
    )
    plan = _AdfPlan(n, np.array([box] * 3), cutoff, use_pallas=True)
    rng = np.random.default_rng(0)
    half = n // 2
    sid = np.concatenate(
        [np.zeros(half, np.int32), np.ones(n - half, np.int32)]
    )
    pos = jnp.asarray(
        rng.uniform(0, box, size=(f, n, 3)).astype(np.float32)
    )
    sid_j = jnp.asarray(sid)
    box_j = jnp.asarray(np.array([box] * 3, np.float32))

    # production stage-1 parameters (sort + windows prebuilt so the
    # timed section is the sweep kernel alone — the lean change's blast
    # radius)
    if plan.sort == "brick":
        pos_s, sid_s = _brick_sort(pos, sid_j, box_j, cutoff)
        win, _tot = _chunk_arcs(
            pos_s, sid_s, box_j, cutoff,
            _extract_tc_windowed(n, plan.w_chunks), plan.n_arcs,
        )
    else:
        pos_s, sid_s = _spatial_sort(pos, sid_j, box_j)
        win = _chunk_window(
            pos_s, sid_s, box_j, cutoff,
            _extract_tc_windowed(n, plan.w_chunks),
        )
    tc = _extract_tc_windowed(n, plan.w_chunks)
    jax.block_until_ready((pos_s, sid_s, win))

    def sweep():
        return _neighbor_extract_pallas(
            pos_s, sid_s, box_j, cutoff, k_n=plan.k_n, tc=tc,
            window=win, e_fixed=plan.extract_e, w_chunks=plan.w_chunks,
            lean=lean,
        )

    out = sweep()  # compile + execute
    np.asarray(out[6])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = sweep()
    jax.block_until_ready(out[1:])
    elapsed = (time.perf_counter() - t0) / reps
    _, rx, ry, rz, d_n, sid_n, cnt = out
    return {
        "arm": "lean" if lean else "full",
        "case": case,
        "backend": jax.default_backend(),
        "sort": plan.sort,
        "k_n": plan.k_n,
        "tc": tc,
        "e_fixed": plan.extract_e,
        "w_chunks": plan.w_chunks,
        "sweep_ms_per_frame": round(elapsed / f * 1e3, 3),
        # cross-arm checksums: identical selection -> identical counts /
        # sid sums; d agrees to float association only
        "cnt_sum": int(np.asarray(jnp.sum(cnt))),
        "sid_sum": int(np.asarray(jnp.sum(sid_n))),
        "d_sum": float(np.asarray(jnp.sum(d_n, dtype=jnp.float64)
                                  if jax.config.x64_enabled
                                  else jnp.sum(d_n))),
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "arm":
        print(json.dumps(run_arm(sys.argv[2] == "lean", sys.argv[3])))
        return
    results = {}
    for case in CASES:
        for arm in ("full", "lean"):
            r = subprocess.run(
                [sys.executable, __file__, "arm", arm, case],
                capture_output=True, text=True, timeout=1800,
            )
            line = r.stdout.strip().splitlines()[-1]
            results[f"{case}_{arm}"] = json.loads(line)
            print(f"{case} {arm}:", line)
        a, b = results[f"{case}_full"], results[f"{case}_lean"]
        assert a["cnt_sum"] == b["cnt_sum"], (a, b)
        assert a["sid_sum"] == b["sid_sum"], (a, b)
        results[f"{case}_speedup"] = round(
            a["sweep_ms_per_frame"] / b["sweep_ms_per_frame"], 3
        )
        print(case, "speedup:", results[f"{case}_speedup"])
    out_path = pathlib.Path(__file__).parent / "adf_lean_ab.json"
    out_path.write_text(json.dumps(results, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
