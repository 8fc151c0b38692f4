"""Op-count model of the windowed extract: sweep-1 depth vs exact cleanup.

Drives the PRODUCTION plan functions (`_brick_sort`/`_spatial_sort`,
`_chunk_arcs`/`_chunk_window`) on uniform boxes, computes the exact
per-(row, chunk) in-cutoff counts a block's sweep sees, and prices the
two phases of `_neighbor_extract_pallas`:

- sweep 1: per covered chunk, distance build (~1.4 take_min-equivalents)
  plus ``e`` bounded extractions;
- exact cleanup: the block's max-row leftover ``sum(max(0, c - e))``
  iterations, each a take_min over the FULL ``w_chunks``-wide scratch
  (~0.6 take_min-equivalents per chunk width — no distance build, one
  wide reduction instead of many narrow ones).

Findings (2026-08-19, uniform density — the model behind
:func:`lammps_analysis_tpu.ops.pallas_adf.extract_e_for`):

- with the old uniform-spread depth estimate the CLEANUP dominated the
  65k extract (share 0.88-0.96; mean max-row leftover 23 trips/block at
  e=4, 69 at cutoff 5.5) — the sorts concentrate a center's neighbors
  into few chunks, so per-chunk counts run ~3x the window mean;
- the cost-optimal depth tracked ~2.8x the mean NONZERO per-chunk
  count across 10240-131072 atoms and cutoffs 3.6-5.5:
  best e = 8 / 14 (10240, z, 3.6 / 5.5), 16 / 24 (65536, brick),
  14 (131072, brick, 3.6); modeled total-cost win vs the old depths:
  2.2x (65k/3.6), 3.6x (65k/5.5), 1.5x (10k/5.5).

Run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/extract_e_model.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _min_image(d, box):
    return d - box * np.round(d / box)


def block_chunk_counts(n, box_l, cutoff, sort, rng):
    """Exact per-(block row, covered chunk) in-cutoff counts at the
    production plan's tc / window choices."""
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.pallas_adf import (
        _brick_sort,
        _chunk_arcs,
        _chunk_window,
        _extract_tc_windowed,
        _round_up,
        _spatial_sort,
        brick_window_bound,
        window_chunk_bound,
    )

    pos = rng.uniform(0, box_l, (1, n, 3)).astype(np.float32)
    sid = np.zeros(n, np.int32)
    box = jnp.asarray([box_l] * 3, jnp.float32)
    n_pad = _round_up(n, 128)
    n_chunks = n_pad // 128
    if sort == "brick":
        w_chunks = brick_window_bound(n, [box_l] * 3, cutoff, n_arcs=6)
    else:
        w_chunks = window_chunk_bound(n, [box_l] * 3, cutoff)
    tc = _extract_tc_windowed(n_pad, w_chunks)
    if sort == "brick":
        ps, ss = _brick_sort(jnp.asarray(pos), jnp.asarray(sid), box, cutoff)
        arcs, _ = _chunk_arcs(ps, ss, box, cutoff, tc, 6)
        arcs = np.asarray(arcs).reshape(-1, 6, 2)
    else:
        ps, ss = _spatial_sort(jnp.asarray(pos), jnp.asarray(sid), box)
        win = np.asarray(_chunk_window(ps, ss, box, cutoff, tc))
        arcs = win.reshape(-1, 1, 2)
    ps = np.asarray(ps)[0]
    counts, covered_n = [], []
    for b in range(n_pad // tc):
        covered = []
        for s, c in arcs[b]:
            covered += [(s + t) % n_chunks for t in range(c)]
        covered_n.append(len(covered))
        if not covered:
            counts.append(np.zeros((tc, 0), int))
            continue
        jat = np.concatenate([ps[ch * 128:(ch + 1) * 128] for ch in covered])
        dd = _min_image(
            ps[b * tc:(b + 1) * tc][:, None, :] - jat[None, :, :], box_l
        )
        dist = np.sqrt((dd * dd).sum(-1))
        jids = np.concatenate(
            [np.arange(ch * 128, (ch + 1) * 128) for ch in covered]
        )
        iids = np.arange(b * tc, (b + 1) * tc)
        valid = (dist < cutoff) & (jids[None, :] != iids[:, None])
        counts.append(valid.reshape(tc, len(covered), 128).sum(-1))
    return counts, np.array(covered_n), tc, w_chunks


def main():
    from lammps_analysis_tpu.ops.pallas_adf import extract_e_for

    rng = np.random.default_rng(0)
    for n, box_l, cutoff, sort in [
        (10240, 40.0, 3.6, "z"),
        (10240, 40.0, 5.5, "z"),
        (65536, 74.3, 3.6, "brick"),
        (65536, 74.3, 5.5, "brick"),
        (131072, 93.6, 3.6, "brick"),
    ]:
        counts, cov, tc, sw = block_chunk_counts(n, box_l, cutoff, sort, rng)
        nz = np.concatenate([c.ravel() for c in counts])
        nz = nz[nz > 0]
        e_model = extract_e_for(n, [box_l] * 3, cutoff, sort=sort)
        print(
            f"n={n} cutoff={cutoff} {sort} tc={tc} sw={sw} "
            f"cov_mean={cov.mean():.1f} | nz per-chunk mean {nz.mean():.1f} "
            f"p90 {np.percentile(nz, 90):.0f} max {nz.max()} "
            f"| extract_e_for -> {e_model}"
        )
        best = None
        for e in range(2, 49, 1):
            s1 = cl = 0.0
            for c, cv in zip(counts, cov):
                if c.shape[1] == 0:
                    continue
                s1 += cv * (1.4 + e)
                cl += np.maximum(0, c - e).sum(1).max() * sw * 0.6
            if best is None or s1 + cl < best[1]:
                best = (e, s1 + cl)
            if e == e_model:
                model_cost = s1 + cl
        print(
            f"  cost-optimal e={best[0]} ({best[1]:.0f}); model depth "
            f"costs {model_cost:.0f} ({model_cost / best[1]:.2f}x optimal)"
        )


if __name__ == "__main__":
    main()
