"""Pallas TPU kernel: fused minimum-image distances + histogram.

The XLA path (``ops.rdf.rdf_histogram``) materialises per-tile one-hot
matrices in HBM between the compare and the matmul, making wide-histogram
binning HBM-bandwidth-bound. This kernel keeps the whole tile pipeline in
VMEM: displacement -> minimum image -> distance -> combined (pair, bin)
index -> per-row hardware-shaped one-hot split -> MXU contraction into a
resident histogram scratch (rowwise — zero relayout stores; the r4
scratch-flatten variant is superseded, see the tile body). One grid pass
over ``_TI``-row i-tiles; frames and j-tiles sweep inside.

Design notes
------------
* species-pair index without a table gather: for species ids ``a <= b`` of
  ``S`` species the combinations-with-replacement index is
  ``a*S - a*(a-1)/2 + (b-a)`` — elementwise VPU arithmetic (same ordering
  as ``ops.rdf.build_species_layout``);
* the flat (pair, bin) id splits **asymmetrically** to match the hardware:
  ``lo`` spans exactly 128 lanes, ``hi = ceil(total_bins/128)`` sublanes,
  so the per-row contraction ``oh_hi (HI, TJ) x oh_lo (128, TJ) -> (HI,
  128)`` costs ~``HI*128`` MACs per pair (vs ``128*128`` for a naive
  square split) and the output IS the final histogram layout;
* all tensors are built by broadcasting rows (1, TJ) against id columns
  (HI, 1) — no reshapes or transposes, which Mosaic cannot relayout;
  i-side reads use column-layout (N, 1) operands, j-side reads row-layout
  (1, N), both prepared on the host;
* one-hots are bf16 (0/1 exact) with f32 MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# i-rows per grid step. Taller tiles amortise the per-tile j-row loads
# and loop/index overhead: 8 -> 16 measured 1.11-1.12x, 16 -> 32 a
# further 1.07-1.08x (benchmarks/rdf_gap_bounds.json ti16/ti32 arms).
# The old flat variant's 32-row scoped-VMEM ceiling (its
# (hi_pad + k, TI*TJ) bf16 one-hot pair) no longer binds under the
# rowwise tile body; the r5 sweep (benchmarks/rdf_rowwise_ti_ab.json,
# interleaved) measured 32 -> 128 a further 1.055-1.063x at 10k/65k.
# Numerical note: tile partitioning changes accumulation ORDER only —
# bit-identical histograms wherever per-bin counts stay integer-exact
# in f32 (< 2^24, e.g. the pinned 10240@f4 md5 workload); at 65k@f8
# some bins exceed 2^24 and any tiling choice (incl. the XLA path)
# rounds at ~1e-7 relative there.
_TI = 128
_TJ_MAX = 2048  # j-tile lanes


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _j_block_for(n: int) -> int:
    """j-tile width. Above 1024 atoms, split j so the triangle skip has
    at least two blocks to work with (the half point keeps padding at the
    single-block level); below that the tiles are too small to win."""
    if n <= 1024:
        return _round_up(n, 128)
    return min(_TJ_MAX, _round_up(n, 256) // 2)


def padded_atom_count(n: int) -> int:
    """The atom count the kernel actually pads to — callers sizing VMEM
    (frames per call) must use THIS, not the raw count: the lane-padded
    column operands scale with the padded value.

    The pad must divide into 128-lane windows (the folded i-side reads)
    and ``_TI``-row tiles; 128 is a multiple of ``_TI``, and
    ``_j_block_for`` always returns a multiple of 128, so the j-block is
    the only other constraint."""
    return _round_up(n, max(_j_block_for(n), 128))


@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "n_species", "interpret", "k_lo"),
)
def rdf_histogram_pallas(
    positions: jnp.ndarray,  # (F, N, 3) float32, species-concatenated
    species_id: jnp.ndarray,  # (N,) int32, -1 padding
    cutoff,
    n_bins: int,
    n_species: int,
    box,
    n_valid_frames=None,
    interpret: bool = False,
    k_lo: int | None = None,
) -> jnp.ndarray:
    """Per-species-pair distance histograms; returns (n_pairs, n_bins) f32.

    ``n_valid_frames`` (traced) lets callers pad the frame axis to a fixed
    block size — only frames ``< n_valid_frames`` are processed, so one
    compiled program serves every batch size of a given system.

    ``k_lo`` overrides the lo-axis width of the (hi, lo) one-hot split
    (sweep knob): VPU compare-row cost per pair is ``hi_pad + k_lo`` —
    minimised near ``k_lo = sqrt(total)`` — but the MXU contraction cost
    scales with ``hi_pad`` alone if the systolic array pads the lo axis
    to 128 lanes, so the best trade is measured, not derived.
    """
    f, n, _ = positions.shape
    if n_valid_frames is None:
        n_valid_frames = f
    n_pairs = n_species * (n_species + 1) // 2
    n_total_bins = n_pairs * n_bins

    # near-square split minimises the dominant VPU one-hot build cost
    # (HI + LO compare rows per pair); both axes pad to hardware tiles.
    # 16-multiple rounding: the v5e sweep (benchmarks/rdf_split_sweep.json,
    # 2 species x 500 bins) measured k=48 fastest (9.99 Gpairs/s) vs the
    # old 32-multiple rounding's k=64 (9.9) — and sharp falloffs BOTH
    # ways (k=32: 8.1, k=96: 8.4), so the near-sqrt point is right but
    # the quantisation matters; histograms are bit-identical across k.
    k = (
        min(128, _round_up(int(np.ceil(np.sqrt(n_total_bins))), 16))
        if k_lo is None
        else min(128, _round_up(k_lo, 8))
    )
    n_hi = -(-n_total_bins // k)
    hi_pad = _round_up(n_hi, 8)
    k_pad = _round_up(k, 128)

    j_block = _j_block_for(n)
    n_pad = padded_atom_count(n)
    if n_pad != n:
        positions = jnp.pad(positions, ((0, 0), (0, n_pad - n), (0, 0)))
        species_id = jnp.pad(species_id, (0, n_pad - n), constant_values=-1)
    n_blocks = n_pad // _TI
    n_j_blocks = n_pad // j_block

    # row layout only (current libtpu lane-pads (M, 1) column arrays 128x
    # in both HBM and scoped-VMEM accounting — the old flat i-side columns
    # capped the kernel at ~4 frames per call at 10k atoms). The i-side
    # (TI, 1) vectors are reconstructed in-kernel by a one-hot MXU
    # transpose of a 128-aligned row window.
    px = positions[..., 0]  # (F, N)
    py = positions[..., 1]
    pz = positions[..., 2]
    sid_row = species_id.astype(jnp.float32)[None, :]  # (1, N)
    # 128-lane-folded copies for the i-side window reads: dynamic SUBLANE
    # indices need no alignment proof (dynamic lane offsets derived from
    # a division are rejected: "dynamic load with unaligned indices")
    n_win = n_pad // 128
    pxf = px.reshape(f * n_win, 128)
    pyf = py.reshape(f * n_win, 128)
    pzf = pz.reshape(f * n_win, 128)
    sidf = sid_row.reshape(n_win, 128)

    # box / cutoff are runtime parameters (no recompile when they change)
    box_arr = jnp.asarray(box, dtype=jnp.float32).reshape(3)
    cutoff_f = jnp.asarray(cutoff, dtype=jnp.float32).reshape(())
    n_valid = jnp.asarray(n_valid_frames, dtype=jnp.float32).reshape(())
    params = jnp.stack(
        [box_arr[0], box_arr[1], box_arr[2],
         1.0 / box_arr[0], 1.0 / box_arr[1], 1.0 / box_arr[2],
         cutoff_f, n_bins / cutoff_f, n_valid]
    )[None, :]  # (1, 9)

    def kernel(
        px_ref, py_ref, pz_ref,
        pxf_ref, pyf_ref, pzf_ref,
        sid_row_ref, sidf_ref, params_ref, out_ref, acc_ref,
    ):
        i = pl.program_id(0)
        # scalar runtime parameters from SMEM
        bx = params_ref[0, 0]
        by = params_ref[0, 1]
        bz = params_ref[0, 2]
        ibx = params_ref[0, 3]
        iby = params_ref[0, 4]
        ibz = params_ref[0, 5]
        cutoff_v = params_ref[0, 6]
        inv_bin = params_ref[0, 7]
        n_valid_i = params_ref[0, 8].astype(jnp.int32)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        i0 = pl.multiple_of(i * _TI, _TI)
        # one-hot transpose selector: the TI i-atoms live in one row of
        # the 128-lane-folded arrays; sel @ window^T yields (TI, 1)
        # column vectors (exact at HIGHEST: the single nonzero product
        # is value * 1.0)
        iwin = i // (128 // _TI)
        off = i0 - iwin * 128
        sel = jnp.where(
            (off + jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0))
            == jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1),
            1.0, 0.0,
        )  # (TI, 128)

        def pick(window):  # (1, 128) -> (TI, 1)
            return jax.lax.dot_general(
                sel, window,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        sid_i = pick(sidf_ref[pl.ds(iwin, 1), :])  # (TI, 1)
        hi_ids = jax.lax.broadcasted_iota(
            jnp.int32, (hi_pad, 1), 0
        ).astype(jnp.float32)
        lo_ids = jax.lax.broadcasted_iota(
            jnp.int32, (k, 1), 0
        ).astype(jnp.float32)  # (LO, 1); LO == k

        # triangle skip: every j-block strictly below this i-tile fails the
        # j > i mask for ALL its elements — start the sweep at the block
        # containing the tile's first row (exact; ~2x fewer tiles at
        # N >> TJ)
        j_min = i0 // j_block
        nj_eff = n_j_blocks - j_min

        def tile_body(step, _):
            fi = step // nj_eff
            j_blk = j_min + step % nj_eff
            j0 = pl.multiple_of(j_blk * j_block, j_block)

            xj = px_ref[fi, pl.ds(j0, j_block)][None, :]  # (1, TJ)
            yj = py_ref[fi, pl.ds(j0, j_block)][None, :]
            zj = pz_ref[fi, pl.ds(j0, j_block)][None, :]
            sb = sid_row_ref[0, pl.ds(j0, j_block)][None, :]
            j_ids = j_blk * j_block + jax.lax.broadcasted_iota(
                jnp.int32, (1, j_block), 1
            )
            rwin = fi * (n_pad // 128) + iwin
            xi = pick(pxf_ref[pl.ds(rwin, 1), :])  # (TI, 1)
            yi = pick(pyf_ref[pl.ds(rwin, 1), :])
            zi = pick(pzf_ref[pl.ds(rwin, 1), :])

            # vectorized (TI, TJ) tile
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - bx * jnp.round(dx * ibx)
            dy = dy - by * jnp.round(dy * iby)
            dz = dz - bz * jnp.round(dz * ibz)
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # (TI, TJ)

            sa = sid_i  # (TI, 1)
            lo_s = jnp.minimum(sa, sb)
            hi_s = jnp.maximum(sa, sb)
            pair_id = (
                lo_s * n_species
                - lo_s * (lo_s - 1.0) * 0.5
                + (hi_s - lo_s)
            )
            bin_f = jnp.minimum(jnp.floor(d * inv_bin), n_bins - 1.0)
            combined = pair_id * n_bins + bin_f  # (TI, TJ) f32 ids

            i_ids = i * _TI + jax.lax.broadcasted_iota(
                jnp.int32, (_TI, 1), 0
            )
            mask = (
                (j_ids > i_ids)
                & (sa >= 0)
                & (sb >= 0)
                & (d < cutoff_v)
            )

            # rowwise contraction — NO relayout at all (r5; supersedes
            # the r4 combflat scratch-flatten, whose stores carried ~30%
            # of the kernel once TI=32 amortised the one-hot;
            # benchmarks/rdf_rowwise_ab.json: 1.04-1.06x at all three
            # production shapes, interleaved, bit-identical). Each row's
            # (1, TJ) ids one-hot against the id columns and contract on
            # the MXU; the TI partial products stay in registers with
            # ONE acc RMW per tile (per-row RMWs would round-trip VMEM —
            # the fifth-pass trap). Masked pairs park at hi == hi_pad:
            # out of the hi one-hot's [0, hi_pad) rows, so they match no
            # row and contribute zero (their real lo row does match, but
            # the hi column is all-zero — invariant required by any
            # future reorder of the split).
            hi_id = jnp.floor(combined * (1.0 / k))
            lo_id = combined - hi_id * k
            hi_id = jnp.where(mask, hi_id, float(hi_pad))
            tile_acc = None
            for r in range(_TI):
                oh_hi = jnp.where(
                    hi_id[r : r + 1, :] == hi_ids, 1.0, 0.0
                ).astype(jnp.bfloat16)  # (HI, TJ)
                oh_lo = jnp.where(
                    lo_id[r : r + 1, :] == lo_ids, 1.0, 0.0
                ).astype(jnp.bfloat16)  # (LO, TJ)
                p = jax.lax.dot_general(
                    oh_hi, oh_lo,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                tile_acc = p if tile_acc is None else tile_acc + p
            acc_ref[:, 0:k] += tile_acc
            return 0

        # dynamic trip count: padded frames beyond n_valid never execute
        jax.lax.fori_loop(0, n_valid_i * nj_eff, tile_body, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_ref[...]

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (hi_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hi_pad, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hi_pad, k_pad), jnp.float32),
        ],
        interpret=interpret,
    )(px, py, pz, pxf, pyf, pzf, sid_row, sidf, params)

    flat = out[:, :k].reshape(-1)[:n_total_bins]
    return flat.reshape(n_pairs, n_bins)
