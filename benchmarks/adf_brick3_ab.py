"""Honest A/B of the brick vs brick3 ADF ordering: ONE PROCESS PER ARM.

The candidate-floor sim (``candidate_floor_sim.py``) predicts the
3-level brick3 sort cuts stage-1 candidates only at WIDE cutoffs
(65k/5.5: covered 19.5 vs 22.2 at the production tc=64 — ~1.14x; more
at smaller tc), so this measures wall-clock at the wide/reference
cutoffs where it could pay. Per the in-process aliasing lesson
(``adf_fold_chunk_ab.py``), each arm runs in a fresh subprocess with
``LATPU_ADF_SORT`` pinned, prints its plan's realised sort (cold
verification that the flag took effect), and saves its histogram; the
parent asserts the arms agree.

Run on TPU (idle host, healthy tunnel): python benchmarks/adf_brick3_ab.py
Writes benchmarks/adf_brick3_ab.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]

ARM_SRC = r"""
import sys, time, numpy as np
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from lammps_analysis_tpu.parallel.sharded_ops import _AdfPlan, _adf_pipeline
from lammps_analysis_tpu.ops.adf import build_triple_table

n, f, box, cutoff, n_bins = {n}, {f}, {box}, {cutoff}, 500
rng = np.random.default_rng(2)
sid = jnp.asarray(np.r_[np.zeros(n//2, np.int32), np.ones(n - n//2, np.int32)])
pos = jnp.asarray(rng.uniform(0, box, (f, n, 3)).astype(np.float32))
box_np = np.array([box]*3, np.float32)
ttab, _ = build_triple_table(2)
plan = _AdfPlan(n, box_np, cutoff, use_pallas=True)
print("PLAN_SORT", plan.sort, plan.n_arcs, plan.w_chunks, plan.extract_e,
      flush=True)
pipe = _adf_pipeline(plan, 2, cutoff, n_bins, 4)
run = lambda: pipe(pos, sid, jnp.asarray(ttab), jnp.asarray(box_np))
h, mc, occ = run()
assert int(occ) == 0, "window overflow: bound too small for this arm"
h = np.asarray(h)
t0 = time.perf_counter()
o = None
for _ in range(3):
    o = run()[0]
jax.block_until_ready(o); np.asarray(o)
ms = (time.perf_counter() - t0) / 3 / f * 1000
np.save({out!r}, h)
print("MS_PER_FRAME", round(ms, 2))
"""


PROBE_SRC = (
    "import time,numpy as np,jax,jax.numpy as jnp;"
    "a=jnp.ones((512,512));np.asarray(a@a);t0=time.perf_counter();"
    "np.asarray((a+1.0)@a);print('PROBE',round(time.perf_counter()-t0,2))"
)


def _probe_s() -> float:
    """Chip-state probe in a throwaway subprocess (never killed early)."""
    r = subprocess.run(
        [sys.executable, "-c", PROBE_SRC], capture_output=True, text=True,
        timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("PROBE"):
            return float(line.split()[1])
    return float("inf")


def main():
    out = {}
    path = REPO / "benchmarks" / "adf_brick3_ab.json"
    for n, box, f, cutoff in (
        (65536, 74.3, 6, 5.5),
        (65536, 74.3, 6, 6.0),
        (131072, 93.6, 4, 6.0),
    ):
        key = f"n{n}_c{cutoff}"
        # arms of one geometry must share chip state to be comparable:
        # record the probe before the pair, abort the pair if degraded
        p = _probe_s()
        out[f"{key}_probe_s"] = p
        if p > 20.0:
            out[f"{key}_skipped"] = f"probe {p} s > 20 s; chip degraded"
            path.write_text(json.dumps(out, indent=2))
            print(f"{key}: SKIPPED (probe {p} s)", flush=True)
            continue
        hists = {}
        for arm in ("brick", "brick3"):
            npy = f"/tmp/adf_brick3_ab_{arm}_{key}.npy"
            env = dict(os.environ, LATPU_ADF_SORT=arm)
            r = subprocess.run(
                [sys.executable, "-c",
                 ARM_SRC.format(repo=str(REPO), n=n, f=f, box=box,
                                cutoff=cutoff, out=npy)],
                capture_output=True, text=True, timeout=2400, env=env,
            )
            ms = sort_seen = None
            for line in r.stdout.splitlines():
                if line.startswith("MS_PER_FRAME"):
                    ms = float(line.split()[1])
                if line.startswith("PLAN_SORT"):
                    sort_seen = line.split()[1]
            if sort_seen != arm:
                out[f"{key}_{arm}_error"] = (
                    f"plan sort={sort_seen}: " + r.stderr[-300:]
                )
                print(f"{key} {arm}: flag did not take effect!", flush=True)
                continue
            if ms is None:
                out[f"{key}_{arm}_error"] = r.stderr[-400:]
                print(f"{key} {arm}: FAILED", flush=True)
                continue
            out[f"{key}_{arm}_ms_per_frame"] = ms
            hists[arm] = np.load(npy)
            print(f"{key} {arm}: {ms} ms/frame", flush=True)
        if len(hists) == 2:
            err = float(np.abs(hists["brick"] - hists["brick3"]).max())
            rel = err / max(float(np.abs(hists["brick"]).max()), 1e-30)
            out[f"{key}_hist_max_rel_diff"] = rel
            out[f"{key}_speedup_brick3"] = round(
                out[f"{key}_brick_ms_per_frame"]
                / out[f"{key}_brick3_ms_per_frame"],
                3,
            )
        path.write_text(json.dumps(out, indent=2))
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
