"""Bound the ADF stage-1 levers by measurement BEFORE building any.

VERDICT r3 weak #3 / next #2: stage 1 (sort + window extract) is the
declared ADF pipeline bound (4.07 of 8.99 ms/frame at 10k, 47.7 of 78.8
at 65k; extraction efficiency 0.23) and no lever has been bounded since.
This script measures, at the production shapes and parameters:

  1. the stage-1 DECOMPOSITION — sort alone, window/arc computation
     alone, Pallas extract alone, full wrapper — which bounds lever (a)
     "persistent/shared sort order across frames": its ceiling is the
     sort share (the extract and the per-frame window must run anyway);
  2. the e_fixed CURVE around the production extraction depth — which
     bounds lever (b) "count-adaptive depth": per-block adaptivity
     cannot beat the best global depth by more than the local spread;
  3. the frames-per-call HEIGHT curve — lever (c) "batch sort+extract
     across frames" (static-arg sweep; kernel source unchanged, so
     in-process sweeping is safe — the aliasing trap applies to source
     variants only).

Run on a healthy chip (serially, never next to another TPU process):

    python benchmarks/adf_stage1_bounds.py

Writes benchmarks/adf_stage1_bounds.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

import os

CUTOFF = 3.6
N_BINS = 500
REPEATS = 3
TINY = os.environ.get("ADF_S1_TINY") == "1"  # CPU interpret smoke test


def _timed(fn, fetch, repeats=REPEATS):
    """Steady-state ms per invocation: compile+warm once, then chained
    dispatches with one block + one forced fetch (tunnel discipline)."""
    import jax

    fetch(fn())  # compile + execute + fetch
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = fn()
    jax.block_until_ready(out)
    fetch(out)
    return (time.perf_counter() - t0) / repeats * 1e3


def measure_shape(n_atoms: int, f: int, e_override=None, label=""):
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops import pallas_adf as _pk
    from lammps_analysis_tpu.parallel.sharded_ops import _AdfPlan

    box = 40.0 * (n_atoms / 10240.0) ** (1.0 / 3.0)
    box_np = np.array([box] * 3, np.float32)
    box_j = jnp.asarray(box_np)
    rng = np.random.default_rng(5)
    # consecutive-frame-correlated positions (MD-like): matters only for
    # any future shared-sort A/B; harmless for the bounds here
    base = rng.uniform(0, box, (n_atoms, 3)).astype(np.float32)
    steps = 0.02 * rng.standard_normal((f, n_atoms, 3)).astype(np.float32)
    pos_np = (base[None] + np.cumsum(steps, axis=0)) % box
    pos = jnp.asarray(pos_np)
    sid = jnp.asarray(
        np.repeat(np.arange(2), -(-n_atoms // 2))[:n_atoms].astype(np.int32)
    )

    plan = _AdfPlan(n_atoms, box_np, CUTOFF, use_pallas=True)
    if TINY:
        plan.use_sorted = True
        plan.sort = "z"
        plan.extract_e = 4
        plan.w_chunks = None
        plan._normalise()
    if e_override is not None:
        plan.extract_e = e_override
    assert plan.use_sorted and plan.use_pallas_run
    sort = plan.sort
    n_arcs = plan.n_arcs if sort in ("brick", "brick3") else 1
    out = {
        "label": label or f"{n_atoms}@f{f}",
        "n_atoms": n_atoms, "f": f, "sort": sort, "k_n": plan.k_n,
        "extract_e": plan.extract_e,
        "w_chunks": getattr(plan, "w_chunks", None),
        "pack": plan.pack,
    }

    # ---- full stage-1 wrapper (the pipeline's stage 1, exactly).
    # Outputs reduce to ONE scalar ON DEVICE: stage-1 tensors are
    # (F, Npad, K) — fetching them would push ~84 MB through the ~30
    # MB/s tunnel and bury the 4 ms compute (the first run of this
    # script measured exactly that). The pipeline keeps them on-device,
    # so the honest standalone timing must too; summing one output
    # cannot drop kernel work (one fused pallas kernel emits all).
    def _s1_sum(p, s):
        r = _pk.sorted_neighbor_extract(
            p, s, box_j, CUTOFF, k_n=plan.k_n, e_fixed=plan.extract_e,
            w_chunks=getattr(plan, "w_chunks", None), sort=sort,
            n_arcs=n_arcs, interpret=TINY,
        )
        return jnp.sum(r[3]) + jnp.sum(r[5])  # d + counts

    full_j = jax.jit(_s1_sum)
    out["stage1_full_ms_per_frame"] = round(
        _timed(lambda: full_j(pos, sid), np.asarray) / f, 3
    )

    # ---- decomposition: sort alone (device-side scalar, as above)
    if sort == "brick":
        sort_fn = jax.jit(
            lambda p, s: _pk._brick_sort(p, s, box_j, CUTOFF)
        )
    elif sort == "brick3":
        sort_fn = jax.jit(
            lambda p, s: _pk._brick3_sort(p, s, box_j, CUTOFF)
        )
    else:
        sort_fn = jax.jit(lambda p, s: _pk._spatial_sort(p, s, box_j))
    sort_sum = jax.jit(
        lambda p, s: (lambda r: jnp.sum(r[0]) + jnp.sum(r[1]))(
            sort_fn(p, s)
        )
    )
    out["sort_ms_per_frame"] = round(
        _timed(lambda: sort_sum(pos, sid), np.asarray) / f, 3
    )

    # ---- window/arc computation alone (on presorted inputs)
    pos_s, sid_s = jax.block_until_ready(sort_fn(pos, sid))
    n_pad = -(-n_atoms // 128) * 128
    pwc = getattr(plan, 'w_chunks', None)
    wc = min(pwc, n_pad // 128) if pwc else None
    tc = (
        _pk._extract_tc_windowed(n_pad, wc)
        if wc is not None else _pk._extract_tc(n_pad)
    )
    if sort in ("brick", "brick3"):
        win_fn = jax.jit(
            lambda p, s: _pk._chunk_arcs(
                p, s, box_j, CUTOFF, tc, max(n_arcs, 1)
            )[0]
        )
    else:
        win_fn = jax.jit(
            lambda p, s: _pk._chunk_window(p, s, box_j, CUTOFF, tc)
        )
    win_sum = jax.jit(lambda p, s: jnp.sum(win_fn(p, s)))
    out["window_ms_per_frame"] = round(
        _timed(lambda: win_sum(pos_s, sid_s), np.asarray) / f, 3
    )

    # ---- Pallas extract alone (presorted + precomputed window)
    win = jax.block_until_ready(win_fn(pos_s, sid_s))

    def _ex_sum(p, s, w):
        r = _pk._neighbor_extract_pallas(
            p, s, box_j, CUTOFF, k_n=plan.k_n, tc=tc, window=w,
            e_fixed=plan.extract_e, w_chunks=wc, lean=True,
            interpret=TINY,
        )
        return jnp.sum(r[4]) + jnp.sum(r[6])  # d + counts

    extract_j = jax.jit(_ex_sum)
    out["extract_ms_per_frame"] = round(
        _timed(lambda: extract_j(pos_s, sid_s, win), np.asarray) / f, 3
    )
    out["decomposition_sum_ms"] = round(
        out["sort_ms_per_frame"] + out["window_ms_per_frame"]
        + out["extract_ms_per_frame"], 3
    )
    return out


def measure_pipeline(n_atoms: int, f: int):
    """Whole-pipeline ms/frame (stage 1 + angle stage) — the lever
    denominators, measured in the same session."""
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.adf import build_triple_table
    from lammps_analysis_tpu.parallel.sharded_ops import (
        _AdfPlan,
        _adf_pipeline,
    )

    box = 40.0 * (n_atoms / 10240.0) ** (1.0 / 3.0)
    box_np = np.array([box] * 3, np.float32)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(
        rng.uniform(0, box, (f, n_atoms, 3)).astype(np.float32)
    )
    sid = jnp.asarray(
        np.repeat(np.arange(2), -(-n_atoms // 2))[:n_atoms].astype(np.int32)
    )
    ttab, _ = build_triple_table(2)
    ttab_j = jnp.asarray(ttab)
    plan = _AdfPlan(n_atoms, box_np, CUTOFF, use_pallas=True)
    pipe = _adf_pipeline(plan, 2, CUTOFF, N_BINS, 4)
    return round(
        _timed(
            lambda: pipe(pos, sid, ttab_j, jnp.asarray(box_np))[0],
            np.asarray,
        ) / f, 3
    )


def probe() -> float:
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


def main():
    out = {"cutoff": CUTOFF, "probe_s_before": probe()}

    for n_atoms, f in ((10240, 16), (65536, 8)):
        key = f"{n_atoms}"
        out[key] = measure_shape(n_atoms, f)
        out[key]["pipeline_ms_per_frame"] = measure_pipeline(n_atoms, f)
        # lever (a) ceiling: all sort time removed, everything else kept
        s1 = out[key]
        pipe_ms = s1["pipeline_ms_per_frame"]
        out[key]["lever_shared_sort_ceiling_x"] = round(
            pipe_ms / max(pipe_ms - s1["sort_ms_per_frame"], 1e-9), 3
        )

    # lever (b): e-curve at 10k (production e +- 2)
    base_e = out["10240"]["extract_e"]
    curve = {}
    for e in sorted({max(base_e - 2, 1), base_e, base_e + 2}):
        r = measure_shape(10240, 16, e_override=e, label=f"e{e}")
        curve[f"e{e}"] = r["stage1_full_ms_per_frame"]
    out["e_curve_10240_stage1_ms"] = curve
    spread = max(curve.values()) / max(min(curve.values()), 1e-9)
    out["lever_adaptive_e_note"] = (
        f"local spread {spread:.3f}x around production e={base_e}; "
        "per-block adaptivity is bounded by this spread"
    )
    out["lever_adaptive_e_spread_x"] = round(spread, 3)

    # lever (c): frames-per-call height at 10k
    heights = {}
    for f in (8, 16, 32):
        r = measure_shape(10240, f, label=f"f{f}")
        heights[f"f{f}"] = r["stage1_full_ms_per_frame"]
    out["f_height_10240_stage1_ms"] = heights

    out["probe_s_after"] = probe()
    (HERE / "adf_stage1_bounds.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
