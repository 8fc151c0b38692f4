"""Pair-level bound for the sort+segment histogram family (VERDICT r5
ask #4).

``roofline.md`` dismissed the sort+segment RDF alternative on an
ATOM-level proxy (argsort of 10k atoms ~ 1.55 ms/frame). That number
says nothing about the actual workload the family would face: the
kernel enumerates ~52.4 M i<j pairs per 10240-atom frame, and a
sort+segment histogram must sort (or at least partition) the PAIR
bin-ids. This script measures that pair-level bound directly on the
chip:

  * ``sort_tilerows``: ``jnp.sort`` along the last axis of a
    (tiles_per_frame, TI*TJ) f32 array — one row per production tile
    (TI=32 x TJ=2048 = 65536 ids), the shape a tile-local sort+segment
    kernel would need. This is the cheapest member of the family: a
    GLOBAL sort would be strictly more expensive than these independent
    row sorts.
  * ``segsum_sorted``: one realistic segment-reduction pass over the
    sorted rows (per-row one-hot contraction is what the current kernel
    already does better, so the segment stage is modeled by the cheap
    alternative: compare-neighbor + prefix trick is not expressible
    without gathers; we time ``jax.ops.segment_sum`` on the flat sorted
    ids as the honest XLA lowering).

Verdict rule: the whole production kernel does the 52.4 M-pair
histogram in ~4.3 ms/frame (14.5-14.8 Gpairs/s headline). If the sort
stage ALONE costs more than ~half that, the family is refuted with a
pair-level number (supersedes the atom-level proxy in roofline.md).

Run on a healthy chip: ``python benchmarks/rdf_sortseg_bound.py``
Writes ``benchmarks/rdf_sortseg_bound.json``.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

# production tile geometry at the 10240-atom headline shape
TI, TJ = 32, 2048
N_ATOMS = 10240
# tiles per frame: n_blocks=320 i-tiles x mean eligible j-blocks after
# the triangle skip (5 j-blocks, mean ~3) — from the kernel's own grid
TILES_PER_FRAME = 960
N_TOTAL_BINS = 1500  # 3 species pairs x 500 bins
REPEATS = 5


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


def main():
    out = {"probe_s_before": probe()}
    if out["probe_s_before"] < 0 or out["probe_s_before"] > 20:
        out["aborted"] = "chip unhealthy"
        print(json.dumps(out))
        return

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, N_TOTAL_BINS, size=(TILES_PER_FRAME, TI * TJ))
        .astype(np.float32)
    )
    n_keys = TILES_PER_FRAME * TI * TJ
    pairs_per_frame = N_ATOMS * (N_ATOMS - 1) / 2
    out["workload"] = {
        "rows": TILES_PER_FRAME, "row_width": TI * TJ,
        "keys_total": n_keys,
        "enumerated_pairs_per_frame": pairs_per_frame,
    }

    def timed(fn, tag):
        r = np.asarray(fn())  # compile + execute + fetch (drain)
        t0 = time.perf_counter()
        o = None
        for _ in range(REPEATS):
            o = fn()
        jax.block_until_ready(o)
        np.asarray(o)
        ms = (time.perf_counter() - t0) / REPEATS * 1e3
        out[tag] = round(ms, 3)
        return ms

    sort_j = jax.jit(lambda x: jnp.sum(jnp.sort(x, axis=-1)[:, ::4096]))
    ms_sort = timed(lambda: sort_j(ids), "sort_tilerows_ms")

    ids_int = ids.astype(jnp.int32).reshape(-1)
    seg_j = jax.jit(
        lambda s: jax.ops.segment_sum(
            jnp.ones_like(s, jnp.float32), s,
            num_segments=N_TOTAL_BINS,
        )
    )
    timed(lambda: seg_j(ids_int), "segment_sum_flat_ms")

    # context: the production kernel's whole-histogram cost at this shape
    out["prod_kernel_ms_per_frame_context"] = 4.3
    out["sort_keys_per_s"] = round(n_keys / (ms_sort / 1e3))
    out["verdict"] = (
        "refuted" if ms_sort > 0.5 * out["prod_kernel_ms_per_frame_context"]
        else "bound clears — build a prototype"
    )
    out["probe_s_after"] = probe()
    (HERE / "rdf_sortseg_bound.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
