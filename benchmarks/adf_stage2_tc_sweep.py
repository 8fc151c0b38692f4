"""Sweep the ADF angle stage's centers-per-grid-step (tc).

The RDF kernel's r4 tile lesson (8 -> 32 rows = 1.2x from amortised
per-tile/program fixed costs) applied to stage 2: at 10k atoms/f16 the
_TC=8 default runs ~20k grid programs per call. ``tc`` is a real
parameter of ``adf_pairs_histogram_pallas`` (different traced programs,
so an in-process sweep is safe — no source variants).

Run: python benchmarks/adf_stage2_tc_sweep.py
Writes benchmarks/adf_stage2_tc_sweep.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))


def main():
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops import pallas_adf as _pk
    from lammps_analysis_tpu.parallel.sharded_ops import _AdfPlan

    n_atoms, f, cutoff, n_bins = 10240, 16, 3.6, 500
    box = 40.0
    box_j = jnp.asarray(np.array([box] * 3, np.float32))
    rng = np.random.default_rng(5)
    pos = jnp.asarray(
        rng.uniform(0, box, (f, n_atoms, 3)).astype(np.float32)
    )
    sid = jnp.asarray(np.repeat(np.arange(2), n_atoms // 2).astype(np.int32))
    plan = _AdfPlan(n_atoms, np.array([box] * 3, np.float32), cutoff,
                    use_pallas=True)

    # stage-1 once (untimed): production sorted extract
    s1 = jax.jit(lambda p, s: _pk.sorted_neighbor_extract(
        p, s, box_j, cutoff, k_n=plan.k_n, e_fixed=plan.extract_e,
        w_chunks=plan.w_chunks, sort=plan.sort, n_arcs=1,
    ))
    rxn, ryn, rzn, d_nn, s_nn, cnts, sid_s, ovf = jax.block_until_ready(
        s1(pos, sid)
    )
    assert int(np.asarray(ovf)) == 0

    out = {"n_atoms": n_atoms, "f": f, "pack": plan.pack, "k_n": plan.k_n}
    ref_sum = None
    for tc in (None, 16, 32, 64, 128):
        tc_static = tc  # closure-captured Python int: static under jit

        def stage2(rx, ry, rz, d, sn, ss, c):
            return _pk.adf_stage2_auto(
                (rx, ry, rz), d, sn, ss, n_bins, 2,
                norm_power=4, pack=plan.pack, counts=c,
                per_frame_sid=True, fold=True,
                fold_chunk=getattr(plan, "fold_chunk", None), tc=tc_static,
            )

        s2 = jax.jit(stage2)

        def fn():
            return s2(rxn, ryn, rzn, d_nn, s_nn, sid_s, cnts)

        h = np.asarray(fn())  # compile + execute + fetch
        if ref_sum is None:
            ref_sum = h.sum()
        else:
            assert abs(h.sum() - ref_sum) / max(ref_sum, 1e-9) < 1e-6, (
                tc, h.sum(), ref_sum)
        t0 = time.perf_counter()
        o = None
        for _ in range(3):
            o = fn()
        jax.block_until_ready(o)
        np.asarray(o)
        ms = (time.perf_counter() - t0) / 3 / f * 1e3
        key = f"tc{tc or 8}_stage2_ms_per_frame"
        out[key] = round(ms, 3)
        print(key, out[key], flush=True)
    (HERE / "adf_stage2_tc_sweep.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
