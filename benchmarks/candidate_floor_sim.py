"""Stage-1 candidate floor: how low can chunk-granularity sweeps go?

The 65k ADF frontier is the window sweep's candidate count: per center
block, covered chunks x 128 j-atoms vs ~220 ideal cell-list candidates
(COVERAGE.md stage-split). Every per-center cost scales with the
block's COVERED chunk count, so this sim separates, per ordering and
block height ``tc``:

- ``covered``: what the production bbox-arc predicate achieves
  (`_chunk_arcs` split=2, <= n_arcs arcs) — today's sweep cost;
- ``occupied``: chunks holding >= 1 TRUE in-cutoff neighbor of any
  center in the block — the floor ANY chunk-granularity scheme can
  reach for that ordering (arcs/bitmaps/lists cannot beat it without
  sub-chunk (lane-level) addressing, which Mosaic's 128-aligned static
  lane slicing rules out);
- ``ideal``: mean true neighbors per center / 128 — the no-granularity
  bound (what a perfect per-center neighbor list would process).

Orderings: the production z sort and serpentine brick (z-slab, y), plus
a prototype 3-level "brick3" (z-slab, serpentine y-cell, serpentine x)
that orders atoms within each (slab, y-cell) by x so a center's
neighbors form short x-runs inside <= 9 cells.

Run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/candidate_floor_sim.py
"""

from __future__ import annotations

import functools
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def brick3_sort(pos, box_l, cutoff):
    """(z-slab, serpentine y-cell, serpentine x) order, numpy, 1 frame."""
    n_slabs = max(1, int(box_l // cutoff))
    slab_w = box_l / n_slabs
    z = np.clip(pos[:, 2], 0.0, box_l * (1 - 1e-7))
    slab = np.minimum(np.floor(z / slab_w), n_slabs - 1)
    n_cells = max(1, int(box_l // cutoff))
    cell_w = box_l / n_cells
    y = np.clip(pos[:, 1], 0.0, box_l * (1 - 1e-7))
    ycell = np.minimum(np.floor(y / cell_w), n_cells - 1)
    # serpentine y-cell within slabs, serpentine x within (slab, ycell)
    ycell_eff = np.where(slab % 2 == 1, n_cells - 1 - ycell, ycell)
    x = pos[:, 0]
    rank = slab * n_cells + ycell_eff
    x_eff = np.where(rank % 2 == 1, box_l - x, x)
    order = np.lexsort((x_eff, ycell_eff, slab))
    return order


def main():
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.pallas_adf import (
        _brick_sort,
        _chunk_arcs,
        _round_up,
        _spatial_sort,
    )

    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnames=("tc",))
    def occupied_and_true(pos_s, box, cutoff, tc):
        """Mean occupied chunks per tc-block + mean true neighbors/center."""
        n = pos_s.shape[0]
        n_chunks = n // 128
        n_blocks = n // tc

        def per_block(b):
            c = jax.lax.dynamic_slice(pos_s, (b * tc, 0), (tc, 3))
            d = c[:, None, :] - pos_s[None, :, :]
            d = d - box * jnp.round(d / box)
            r2 = jnp.sum(d * d, axis=-1)
            hit = r2 <= cutoff * cutoff  # includes self: occupies own chunk
            occ = jnp.any(hit.reshape(tc, n_chunks, 128), axis=(0, 2))
            return jnp.sum(occ), jnp.sum(hit) - tc  # exclude self-pairs

        occ, nbr = jax.lax.map(per_block, jnp.arange(n_blocks),
                               batch_size=8)
        return occ.astype(jnp.float32), nbr.astype(jnp.float32)

    results = []
    print(f"{'n':>6} {'rc':>4} {'sort':>6} {'tc':>4} {'arcs':>4} | "
          f"{'covered':>8} {'max':>4} {'occupied':>8} {'ideal':>6} | "
          f"{'cand/ctr':>8} {'floor':>6} {'gran x':>6}")
    for n, box_l, cutoff in [
        (10240, 40.0, 3.6),
        (65536, 74.3, 3.6),
        (65536, 74.3, 5.5),
        (131072, 93.6, 3.6),
    ]:
        pos = rng.uniform(0, box_l, (1, n, 3)).astype(np.float32)
        sid = np.zeros(n, np.int32)
        box = jnp.asarray([box_l] * 3, jnp.float32)
        n_pad = _round_up(n, 128)
        if n_pad != n:  # keep the sim exact: pad-free sizes only
            raise SystemExit("use 128-multiple atom counts")

        orders = {}
        bs, bsid = _brick_sort(jnp.asarray(pos), jnp.asarray(sid), box,
                               cutoff)
        orders["brick"] = (bs, bsid)
        zs, zsid = _spatial_sort(jnp.asarray(pos), jnp.asarray(sid), box)
        orders["z"] = (zs, zsid)
        o3 = brick3_sort(pos[0], box_l, cutoff)
        orders["brick3"] = (jnp.asarray(pos[:, o3]), jnp.asarray(sid[None, o3]))

        ideal_row = None
        for name, (ps, psid) in orders.items():
            for tc in (16, 32, 64, 128):
                occ, nbr = occupied_and_true(ps[0], box, float(cutoff), tc)
                occ_m = float(jnp.mean(occ))
                ideal = float(jnp.mean(nbr)) / 128.0  # chunks-equivalent
                for n_arcs in ((6,) if name != "brick3" else (6, 12, 16)):
                    arcs, tot = _chunk_arcs(ps, psid, box, float(cutoff),
                                            tc, n_arcs, split=2)
                    cov_m = float(jnp.mean(tot))
                    cov_x = int(jnp.max(tot))
                    row = dict(n=n, cutoff=cutoff, sort=name, tc=tc,
                               n_arcs=n_arcs, covered=cov_m, cov_max=cov_x,
                               occupied=occ_m, ideal_chunks=ideal)
                    results.append(row)
                    print(f"{n:>6} {cutoff:>4} {name:>6} {tc:>4} "
                          f"{n_arcs:>4} | {cov_m:>8.1f} {cov_x:>4} "
                          f"{occ_m:>8.1f} {ideal:>6.2f} | "
                          f"{cov_m * 128:>8.0f} {occ_m * 128:>6.0f} "
                          f"{cov_m / max(occ_m, 1e-9):>6.2f}")
                ideal_row = ideal
        print(f"       ideal candidates/center ~ {ideal_row * 128:.0f}")

    import json
    out = pathlib.Path(__file__).parent / "candidate_floor_sim.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
