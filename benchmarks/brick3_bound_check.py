"""Verify brick3_window_bound covers observed per-block window maxima.

The windowed extract clamps any block whose arc cover exceeds the
static ``w_chunks`` bound and reports overflow (the caller then retries
un-windowed — correct but slow), so the bound must sit above the real
per-block maxima on typical geometries while staying far below the full
chunk count (else the scratch savings vanish). This drives the REAL
cover path (``_brick3_sort`` + ``_chunk_arcs`` at the production tc and
n_arcs=12) over uniform boxes at several sizes/cutoffs and records
``cov_max`` vs the bound. Cheap (bbox predicate only — no O(N^2)
distances); run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/brick3_bound_check.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.pallas_adf import (
        _brick3_sort,
        _chunk_arcs,
        _extract_tc_windowed,
        brick3_window_bound,
    )

    rng = np.random.default_rng(7)
    rows = []
    n_arcs = 12
    print(f"{'n':>6} {'box':>6} {'rc':>4} {'tc':>4} | "
          f"{'cov_mean':>8} {'cov_max':>7} {'bound':>6} {'chunks':>6}")
    for n, box_l, cutoff in [
        (10240, 40.0, 3.6),
        (10240, 40.0, 5.5),
        (65536, 74.3, 3.6),
        (65536, 74.3, 5.5),
        (65536, 74.3, 6.0),
        (131072, 93.6, 5.5),
        (131072, 93.6, 6.0),
    ]:
        pos = rng.uniform(0, box_l, (2, n, 3)).astype(np.float32)
        sid = np.zeros(n, np.int32)
        box = jnp.asarray([box_l] * 3, jnp.float32)
        bound = brick3_window_bound(n, [box_l] * 3, cutoff, n_arcs=n_arcs)
        tc = _extract_tc_windowed(n, bound)
        pos_s, sid_s = _brick3_sort(
            jnp.asarray(pos), jnp.asarray(sid), box, cutoff
        )
        arcs, tot = _chunk_arcs(
            pos_s, sid_s, box, float(cutoff), tc, n_arcs
        )
        cov_mean = float(jnp.mean(tot))
        cov_max = int(jnp.max(tot))
        n_chunks = n // 128
        ok = cov_max <= bound
        rows.append(dict(n=n, box=box_l, cutoff=cutoff, tc=tc,
                         n_arcs=n_arcs, cov_mean=cov_mean,
                         cov_max=cov_max, bound=bound,
                         n_chunks=n_chunks, ok=ok))
        print(f"{n:>6} {box_l:>6} {cutoff:>4} {tc:>4} | "
              f"{cov_mean:>8.1f} {cov_max:>7} {bound:>6} {n_chunks:>6}"
              f"{'' if ok else '  OVERFLOW'}")
    out = pathlib.Path(__file__).parent / "brick3_bound_check.json"
    out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out}")
    if not all(r["ok"] for r in rows):
        raise SystemExit("bound exceeded on a uniform box — recalibrate")


if __name__ == "__main__":
    main()
