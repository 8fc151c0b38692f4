"""Interleaved A/B: classic lean ADF window extract vs the jrow variant
(VERDICT r5 ask #2 — redesign the stage-1 extract, the declared pipeline
bound).

The r4 e-curves proved the extract is e-independent-cost-bound: per-chunk
geometry, the 4 value-scratch stores, and the windowed loads carry ~90%
of the 34.7 ms (of 66.9) stage at 65k. The jrow variant attacks the
store row directly: the four (tc, 128) per-center value stores per chunk
become four (1, 128) raw-j-value stores (a ~tc x traffic cut), with the
cleanup sweep picking j values through the same one-hot and recomputing
displacement + minimum image on (tc, 1) vectors — bit-identical outputs
(tests/test_pallas_adf.py::test_extract_jrow_bit_identical).

Measurement design:

  * arms differ by the ``jrow`` STATIC argument — different jit cache
    entries by construction, so the env-flag aliasing trap (round-2
    ninth pass) does not apply; both arms verified equal on-device
    before any timing,
  * standalone extract timed with a DEVICE-SIDE scalar fetch (the 84 MB
    stage-1 tensors would measure the tunnel, not the kernel — r4
    discipline, adf_stage1_bounds.py),
  * interleaved segments (A B A B ...) at the two production shapes the
    verdict names: 65536@f1 (extract 34.7 ms of the 66 ms production
    pipeline) and 10240@f16 (the headline ADF row),
  * full-pipeline A/B at the same shapes via plan.jrow (flows as a
    static argument — in-process safe for the same reason).

Ship bar: >= 1.15x stage-1 at 65k (pipeline >= 1.1x) -> flip
``_JROW_DEFAULT`` and rebaseline; else commit the refutation.

Run on a healthy chip: ``python benchmarks/adf_jrow_ab.py``
Writes ``benchmarks/adf_jrow_ab.json``.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

CUTOFF = 3.6
N_BINS = 500
REPS = 5
SHAPES = ((65536, 1), (10240, 16))


def probe():
    import subprocess

    code = (
        "import time,numpy as np,jax,jax.numpy as jnp;"
        "a=jnp.ones((512,512));np.asarray(a@a);"
        "t=time.perf_counter();np.asarray((a+1.0)@a);"
        "print('P',round(time.perf_counter()-t,2))"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=420)
    for line in p.stdout.splitlines():
        if line.startswith("P "):
            return float(line.split()[1])
    return -1.0


def measure_shape(n_atoms, f):
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops import pallas_adf as _pk
    from lammps_analysis_tpu.ops.adf import build_triple_table
    from lammps_analysis_tpu.parallel.sharded_ops import (
        _AdfPlan,
        _adf_pipeline,
    )

    box = 40.0 * (n_atoms / 10240.0) ** (1.0 / 3.0)
    box_np = np.array([box] * 3, np.float32)
    box_j = jnp.asarray(box_np)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(
        rng.uniform(0, box, (f, n_atoms, 3)).astype(np.float32)
    )
    sid = jnp.asarray(
        np.repeat(np.arange(2), -(-n_atoms // 2))[:n_atoms].astype(np.int32)
    )
    plan = _AdfPlan(n_atoms, box_np, CUTOFF, use_pallas=True)
    assert plan.use_sorted and plan.use_pallas_run
    sort = plan.sort
    n_arcs = plan.n_arcs if sort in ("brick", "brick3") else 1
    out = {
        "n_atoms": n_atoms, "f": f, "sort": sort,
        "extract_e": plan.extract_e, "w_chunks": plan.w_chunks,
        "k_n": plan.k_n,
    }

    def s1(jrow):
        def fn(p, s):
            r = _pk.sorted_neighbor_extract(
                p, s, box_j, CUTOFF, k_n=plan.k_n, e_fixed=plan.extract_e,
                w_chunks=plan.w_chunks, sort=sort, n_arcs=n_arcs, jrow=jrow,
            )
            return jnp.sum(r[3]) + jnp.sum(r[5])
        return jax.jit(fn)

    s1_classic, s1_jrow = s1(False), s1(True)

    # on-device equality of the scalar checksums (full bit-identity is
    # pinned by the interpret-mode test; here the cheap on-chip check)
    a = float(np.asarray(s1_classic(pos, sid)))
    b = float(np.asarray(s1_jrow(pos, sid)))
    out["checksum_equal"] = bool(a == b)
    out["checksums"] = [a, b]

    def segment(fn, reps=3):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(pos, sid)
        jax.block_until_ready(o)
        np.asarray(o)
        return (time.perf_counter() - t0) / reps / f * 1e3

    # warm + drain both arms before any timed window
    segment(s1_classic, 1)
    segment(s1_jrow, 1)
    t_c, t_j = [], []
    for _ in range(REPS):
        t_c.append(segment(s1_classic))
        t_j.append(segment(s1_jrow))
    out["stage1_classic_ms_per_frame"] = round(float(np.median(t_c)), 3)
    out["stage1_jrow_ms_per_frame"] = round(float(np.median(t_j)), 3)
    out["stage1_speedup_x"] = round(
        np.median(t_c) / np.median(t_j), 3
    )
    out["segments_classic"] = [round(t, 3) for t in t_c]
    out["segments_jrow"] = [round(t, 3) for t in t_j]

    # ---- full pipeline A/B (plan.jrow flows as a static arg)
    ttab, _ = build_triple_table(2)
    ttab_j = jnp.asarray(ttab)

    def pipe(jrow):
        import copy

        p2 = copy.copy(plan)
        p2.jrow = jrow
        f_pipe = _adf_pipeline(p2, 2, CUTOFF, N_BINS, 4)

        def fn(p, s):
            return f_pipe(p, s, ttab_j, box_j)[0]
        return fn

    pipe_c, pipe_j = pipe(False), pipe(True)

    def pseg(fn, reps=3):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(pos, sid)
        jax.block_until_ready(o)
        np.asarray(o)
        return (time.perf_counter() - t0) / reps / f * 1e3

    h_c = np.asarray(pipe_c(pos, sid))
    h_j = np.asarray(pipe_j(pos, sid))
    out["pipeline_hist_identical"] = bool(np.array_equal(h_c, h_j))
    pseg(pipe_j, 1)  # drain
    tp_c, tp_j = [], []
    for _ in range(3):
        tp_c.append(pseg(pipe_c))
        tp_j.append(pseg(pipe_j))
    out["pipeline_classic_ms_per_frame"] = round(float(np.median(tp_c)), 3)
    out["pipeline_jrow_ms_per_frame"] = round(float(np.median(tp_j)), 3)
    out["pipeline_speedup_x"] = round(np.median(tp_c) / np.median(tp_j), 3)
    return out


def main():
    out = {"probe_s_before": probe()}
    if out["probe_s_before"] < 0 or out["probe_s_before"] > 20:
        out["aborted"] = "chip unhealthy"
        print(json.dumps(out))
        return
    for n_atoms, f in SHAPES:
        out[f"{n_atoms}"] = measure_shape(n_atoms, f)
        print(json.dumps(out[f"{n_atoms}"]), flush=True)
    out["probe_s_after"] = probe()
    (HERE / "adf_jrow_ab.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
