"""Honest A/B of the extract depth model: ONE PROCESS PER ARM.

Arms pin ``LATPU_ADF_EXTRACT_E`` to the OLD uniform-spread depths
(e=4 brick / the old ≤16-capped z values) vs the concentration model
(`extract_e_for`, benchmarks/extract_e_model.py — depth ~2.8x the mean
nonzero per-chunk count). The op-count model predicts the exact-cleanup
sweep dominates the old arms (share 0.88-0.96 at 65k) and the new
depths win 2.2x / 3.6x (65k cutoff 3.6 / 5.5) and 1.5x (10k / 5.5) on
stage 1; this script measures the full pipeline per arm in fresh
processes and checks histogram agreement (the extraction SET is
depth-independent, but slot ORDER shifts with depth, so stage-2
float-summation order can differ by association — allclose, not
bit-equal).

Run on TPU (idle host): python benchmarks/adf_extract_e_ab.py
Writes benchmarks/adf_extract_e_ab.json.
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

n, f, cutoff, n_bins = {n}, {f}, {cutoff}, 500
rng = np.random.default_rng(2)
box = {box}
sid = jnp.asarray(np.r_[np.zeros(n//2, np.int32), np.ones(n - n//2, np.int32)])
pos = jnp.asarray(rng.uniform(0, box, (f, n, 3)).astype(np.float32))
box_np = np.array([box]*3, np.float32)
ttab, _ = build_triple_table(2)
plan = _AdfPlan(n, box_np, cutoff, use_pallas=True)
print("PLAN", plan.sort, "e =", plan.extract_e, "K =", plan.k_n, flush=True)
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
    from lammps_analysis_tpu.ops.pallas_adf import extract_e_for

    out = {}
    # (n, box, cutoff, frames, old depth): old = what the uniform-spread
    # estimate chose (artifact-recorded: 4 at 65k/3.6, 6 at 65k/5.5 and
    # 10k/3.6, 8 at 10k/5.5)
    cases = [
        (65536, 74.3, 3.6, 4, 4),
        (65536, 74.3, 5.5, 2, 6),
        (10240, 40.0, 5.5, 8, 8),
        (10240, 40.0, 3.6, 8, 6),
    ]
    for n, box, cutoff, f, e_old in cases:
        sort = "brick" if n >= 16384 else "z"
        e_new = extract_e_for(n, [box] * 3, cutoff, sort=sort)
        key = f"n{n}_c{cutoff}"
        hists = {}
        for e, arm in ((e_old, "old"), (e_new, "model")):
            npy = f"/tmp/adf_extract_e_{arm}_{key}.npy"
            env = dict(os.environ, LATPU_ADF_EXTRACT_E=str(e))
            r = subprocess.run(
                [sys.executable, "-c",
                 ARM_SRC.format(repo=str(REPO), n=n, f=f, cutoff=cutoff,
                                box=box, out=npy)],
                capture_output=True, text=True, timeout=2400, env=env,
            )
            ms = None
            for line in r.stdout.splitlines():
                if line.startswith("MS_PER_FRAME"):
                    ms = float(line.split()[1])
                if line.startswith("PLAN"):
                    out[f"{key}_{arm}_plan"] = line
            if ms is None:
                out[f"{key}_{arm}_error"] = r.stderr[-400:]
                print(f"{key} {arm} (e={e}): FAILED", flush=True)
                continue
            out[f"{key}_{arm}_e"] = e
            out[f"{key}_{arm}_ms_per_frame"] = ms
            hists[arm] = np.load(npy)
            print(f"{key} {arm} (e={e}): {ms} ms/frame", flush=True)
        if len(hists) == 2:
            err = float(np.abs(hists["old"] - hists["model"]).max())
            rel = err / max(float(np.abs(hists["old"]).max()), 1e-30)
            out[f"{key}_hist_max_rel_diff"] = rel
            out[f"{key}_speedup"] = round(
                out[f"{key}_old_ms_per_frame"]
                / out[f"{key}_model_ms_per_frame"],
                3,
            )
    path = REPO / "benchmarks" / "adf_extract_e_ab.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
