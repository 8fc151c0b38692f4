"""Honest A/B of the K>128 fold lane-chunking: ONE PROCESS PER ARM.

The first attempt ran both arms in one process behind the
LATPU_ADF_FOLD_CHUNK env flag and measured them identical — because the
second arm silently reused the first arm's compiled executable (the
chunked kernel of that revision could not even compile: cold runs
crashed with a Mosaic layout error the in-process A/B never surfaced).
Pallas kernel variants A/B'd behind a trace-time flag MUST run in fresh
processes, and each arm's distinguishing behavior must be verified cold.

Each arm runs `bench.measure_adf_ms_per_frame` in a subprocess with the
flag pinned, saves its histogram, and the parent asserts the arms'
histograms agree (allclose — the chunked accumulation order differs).

Run on TPU (idle host): python benchmarks/adf_fold_chunk_ab.py
Writes benchmarks/adf_fold_chunk_ab.json.
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

n, f, cutoff, n_bins = 10240, 8, {cutoff}, 500
rng = np.random.default_rng(2)
box = 40.0
sid = jnp.asarray(np.r_[np.zeros(n//2, np.int32), np.ones(n - n//2, np.int32)])
pos = jnp.asarray(rng.uniform(0, box, (f, n, 3)).astype(np.float32))
box_np = np.array([box]*3, np.float32)
ttab, _ = build_triple_table(2)
plan = _AdfPlan(n, box_np, cutoff, use_pallas=True)
pipe = _adf_pipeline(plan, 2, cutoff, n_bins, 4)
run = lambda: pipe(pos, sid, jnp.asarray(ttab), jnp.asarray(box_np))[0]
h = np.asarray(run())
t0 = time.perf_counter()
o = None
for _ in range(3):
    o = run()
jax.block_until_ready(o); np.asarray(o)
ms = (time.perf_counter() - t0) / 3 / f * 1000
np.save({out!r}, h)
print("MS_PER_FRAME", round(ms, 2))
"""


def main():
    out = {}
    for cutoff in (6.0, 5.5):
        hists = {}
        for flag, arm in (("0", "full"), ("1", "chunked")):
            npy = f"/tmp/adf_fold_ab_{arm}_{cutoff}.npy"
            env = dict(os.environ, LATPU_ADF_FOLD_CHUNK=flag)
            r = subprocess.run(
                [sys.executable, "-c",
                 ARM_SRC.format(repo=str(REPO), cutoff=cutoff, out=npy)],
                capture_output=True, text=True, timeout=900, env=env,
            )
            ms = None
            for line in r.stdout.splitlines():
                if line.startswith("MS_PER_FRAME"):
                    ms = float(line.split()[1])
            if ms is None:
                out[f"c{cutoff}_{arm}_error"] = r.stderr[-400:]
                print(f"cutoff={cutoff} {arm}: FAILED", flush=True)
                continue
            out[f"c{cutoff}_{arm}_ms_per_frame"] = ms
            hists[arm] = np.load(npy)
            print(f"cutoff={cutoff} {arm}: {ms} ms/frame", flush=True)
        if len(hists) == 2:
            err = float(np.abs(hists["full"] - hists["chunked"]).max())
            rel = err / max(float(np.abs(hists["full"]).max()), 1e-30)
            out[f"c{cutoff}_hist_max_rel_diff"] = rel
            out[f"c{cutoff}_speedup"] = round(
                out[f"c{cutoff}_full_ms_per_frame"]
                / out[f"c{cutoff}_chunked_ms_per_frame"],
                3,
            )
    path = REPO / "benchmarks" / "adf_fold_chunk_ab.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
