"""Chunk-window cost: z-sort single arc vs serpentine brick multi-arc.

Drives the PRODUCTION functions (`_spatial_sort` / `_brick_sort`,
`_chunk_window` / `_chunk_arcs`) on uniform boxes and prints per-block
processed-chunk counts — the stage-1 sweep cost model that motivated the
brick extract. Run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/brick_window_sim.py

Design history (each step measured with the exact bbox predicate):
plain (z-slab, y) lexsort left slab-SEAM blocks with full-y bboxes
spanning ~4 slabs (max covered 105/512 chunks at 65k); serpentine y
(odd slabs descend) makes seam neighbors adjacent, and split sub-block
bboxes + 6 covering arcs bring 65k/3.6 to mean ~11, max ~21 vs the
z-sort's 50.7 — the measured basis of `brick_window_bound`.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.pallas_adf import (
        _brick_sort,
        _chunk_arcs,
        _chunk_window,
        _round_up,
        _spatial_sort,
        brick_window_bound,
    )

    rng = np.random.default_rng(0)
    print(f"{'n':>6} {'cutoff':>6} {'tc':>4} | {'z mean':>7} {'z max':>6} "
          f"| {'brick mean':>10} {'brick max':>9} {'bound':>6} | chunks")
    for n, box_l, cutoff in [
        (4096, 16.0, 2.2),
        (10240, 40.0, 3.6),
        (10240, 40.0, 5.5),
        (65536, 74.3, 3.6),
        (65536, 74.3, 5.5),
    ]:
        pos = rng.uniform(0, box_l, (2, n, 3)).astype(np.float32)
        sid = np.zeros(n, np.int32)
        box = jnp.asarray([box_l] * 3, jnp.float32)
        n_chunks = _round_up(n, 128) // 128
        zs, zsid = _spatial_sort(jnp.asarray(pos), jnp.asarray(sid), box)
        bs, bsid = _brick_sort(jnp.asarray(pos), jnp.asarray(sid), box,
                               cutoff)
        bound = brick_window_bound(n, [box_l] * 3, cutoff)
        for tc in (32, 128):
            wz = np.asarray(_chunk_window(zs, zsid, box, cutoff, tc))[:, 1]
            _, tb = _chunk_arcs(bs, bsid, box, cutoff, tc, 6)
            tb = np.asarray(tb)
            print(f"{n:>6} {cutoff:>6} {tc:>4} | {wz.mean():>7.1f} "
                  f"{wz.max():>6} | {tb.mean():>10.1f} {tb.max():>9} "
                  f"{bound:>6} | {n_chunks}")


if __name__ == "__main__":
    main()
