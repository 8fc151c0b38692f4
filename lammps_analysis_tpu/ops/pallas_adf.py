"""Pallas TPU kernel: fused neighbor-pair angles + weighted histogram.

The XLA neighbor-list ADF (``ops.adf.adf_histogram_neighbors``) materialises
the (F, C, K, K) angle / weight / bin tensors in HBM between ops and runs
the histogram as chunked HBM-resident one-hot contractions — the whole
triplet stage is HBM-bandwidth-bound (the reference calls triplet
enumeration its hardest memory problem, ``utils/neighbour_list.py:112-177``).
This kernel keeps the per-center K x K tile pipeline entirely in VMEM:

    gram -> cos -> acos -> bin -> (triple, bin) id -> one-hot -> MXU

Stage 1 (XLA, reused): per-center top-K neighbor selection — O(N^2) work
that is already MXU/VPU-friendly and produces compact (F, N, K) tensors.

Stage 2 (this kernel): grid over blocks of centers; per center the K x K
ordered-neighbor-pair tile is processed in 32-row chunks. Design notes:

* **acos on the VPU**: Mosaic registers no ``acos``/``atan2`` lowering, so
  the kernel carries a musl-style f32 arccos (odd polynomial of the asin
  rational on [0, 0.5] + sqrt identities) — ~1 ulp, matching XLA's acos to
  f32 rounding, so bin assignment agrees except for angles within ~1e-7
  rad of a bin edge.
* **Weighted one-hot with bf16 MXU**: the histogram needs per-element f32
  weights ``1/(|r_j||r_k|)^p``; an f32 MXU contraction would cost ~4x
  bf16. The weight is split ``w = bf16(w) + bf16(w - f32(bf16(w)))`` and
  folded into TWO bf16 one-hot matmuls — exact products (8+1 mantissa bits
  each), f32 accumulation, ~2^-18 relative error on the recombined sum.
* **Dual layouts, no relayouts** (same trick as ``pallas_rdf``): the
  j-side reads (CR, 1) column slices and the k-side (1, K) row slices of
  the same neighbor tensors; rows of the (CR, K) tile flatten into a
  (1, CR*K) scratch via 128-aligned lane stores.
* The (triple, bin) id splits asymmetrically: ``lo`` spans exactly the 128
  output lanes, ``hi = ceil(n_triples * n_bins / 128)`` sublanes — the
  accumulator IS the final histogram layout.

Reference semantics preserved: ordered neighbor pairs (j != k), triple key
kept only for non-decreasing species indices, weight ``1/(d_j d_k)^p``
(``calculators/angular_distribution_function.py:365-429``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .adf import ADF_BIN_RANGE
from .geometry import minimum_image

#: neighbor-list width the kernel is built for (one full lane register)
PALLAS_ADF_K = 128
_TC = 8  # centers per grid step
_CR = 32  # j-rows per inner chunk


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ------------------------------------------------------------------ acos
# musl asinf rational R(z) = z (pS0 + z (pS1 + z pS2)) / (1 + z qS1)
_PS0 = 1.6666586697e-01
_PS1 = -4.2743422091e-02
_PS2 = -8.6563630030e-03
_QS1 = -7.0662963390e-01
_PIO2 = 1.5707963267948966
_PI = 3.141592653589793


def acos_f32(x):
    """f32 arccos from VPU-only ops (mul/add/sqrt/select) — ~1 ulp.

    musl acosf algorithm: for |x| <= 0.5, acos(x) = pi/2 - asin(x) with
    asin(x) = x + x R(x^2); for x > 0.5, acos(x) = 2 asin(s) with
    s = sqrt((1-x)/2); for x < -0.5, acos(x) = pi - 2 asin(s) with
    s = sqrt((1+x)/2).
    """
    ax = jnp.abs(x)
    small = ax <= 0.5
    z = jnp.where(small, x * x, 0.5 * (1.0 - ax))
    r = z * (_PS0 + z * (_PS1 + z * _PS2)) / (1.0 + z * _QS1)
    s = jnp.where(small, x, jnp.sqrt(z))  # signed x in the small branch
    asin_v = s + s * r  # asin(x) (small) or asin(sqrt(z)) (big, positive)
    big_pos = 2.0 * asin_v
    return jnp.where(
        small,
        _PIO2 - asin_v,
        jnp.where(x > 0.0, big_pos, _PI - big_pos),
    )


# --------------------------------------------------- stage 1: neighbor lists
@functools.partial(jax.jit, static_argnames=("k_n", "c_block"))
def adf_neighbor_lists(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff,
    k_n: int = PALLAS_ADF_K,
    c_block: int = 64,
):
    """Per-center top-K in-cutoff neighbor tensors.

    Same selection as ``adf_histogram_neighbors`` (``ops/adf.py:230-252``).
    Returns ``(r_n (F,Np,K,3), d_n (F,Np,K), sid_n (F,Np,K; -1 invalid),
    sid_pad (Np,), max_count)`` where ``Np`` is the atom count padded to the
    center-block multiple — consumers MUST use the returned padded center
    species, not the original array.
    """
    f, n_pad, _ = positions.shape
    n_blocks = -(-n_pad // c_block)
    n_tiled = n_blocks * c_block
    if n_tiled != n_pad:
        positions = jnp.pad(positions, ((0, 0), (0, n_tiled - n_pad), (0, 0)))
        species_id = jnp.pad(
            species_id, (0, n_tiled - n_pad), constant_values=-1
        )
        n_pad = n_tiled
    dtype = positions.dtype
    sid = species_id
    atom_ids = jnp.arange(n_pad, dtype=jnp.int32)
    big = jnp.asarray(1e30, dtype)
    k_n = min(k_n, n_pad)

    def center_block(c0):
        pos_c = jax.lax.dynamic_slice_in_dim(positions, c0, c_block, axis=1)
        sid_c = jax.lax.dynamic_slice_in_dim(sid, c0, c_block, axis=0)
        c_ids = c0 + jnp.arange(c_block, dtype=jnp.int32)
        r = positions[:, None, :, :] - pos_c[:, :, None, :]
        if box is not None:
            r = minimum_image(r, box.astype(dtype))
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))
        invalid = (
            (atom_ids[None, None, :] == c_ids[None, :, None])
            | (sid[None, None, :] < 0)
            | (sid_c[None, :, None] < 0)
            | (d >= cutoff)
        )
        d_masked = jnp.where(invalid, big, d)
        neg_d, idx = jax.lax.top_k(-d_masked, k_n)
        d_n = -neg_d
        valid = d_n < cutoff
        r_n = jnp.take_along_axis(r, idx[..., None], axis=2)
        sid_n = jnp.where(valid, sid[idx], -1)
        return r_n, d_n, sid_n, jnp.max(jnp.sum(valid, axis=2))

    starts = jnp.arange(n_blocks, dtype=jnp.int32) * c_block
    r_n, d_n, sid_n, max_counts = jax.lax.map(center_block, starts)
    # lax.map stacks over blocks: (B, F, c_block, K, ...) -> (F, N, K, ...)
    r_n = jnp.moveaxis(r_n, 0, 1).reshape(f, n_pad, k_n, 3)
    d_n = jnp.moveaxis(d_n, 0, 1).reshape(f, n_pad, k_n)
    sid_n = jnp.moveaxis(sid_n, 0, 1).reshape(f, n_pad, k_n)
    return r_n, d_n, sid_n, sid, jnp.max(max_counts)


# ------------------------------------------------------ stage 2: the kernel
@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "n_species", "norm_power", "interpret"),
)
def adf_pairs_histogram_pallas(
    r_n: jnp.ndarray,  # (F, N, K, 3) neighbor displacements
    d_n: jnp.ndarray,  # (F, N, K) neighbor distances
    sid_n: jnp.ndarray,  # (F, N, K) neighbor species, -1 invalid
    sid_c: jnp.ndarray,  # (N,) center species, -1 padding
    n_bins: int,
    n_species: int,
    norm_power: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ordered-pair angle histogram from neighbor lists.

    Returns (n_triples, n_bins) f32 weighted counts (not density
    normalised), identical semantics to the angle stage of
    ``adf_histogram_neighbors``.
    """
    f, n, k = r_n.shape[:3]
    assert k % 128 == 0 and k >= 128, (
        f"neighbor-list width must be a positive multiple of 128, got {k}"
    )
    assert sid_c.shape[0] == n, (
        f"center species length {sid_c.shape[0]} != padded atom count {n} — "
        "pass the padded sid returned by adf_neighbor_lists"
    )
    n_triples = n_species * (n_species + 1) * (n_species + 2) // 6
    n_total_bins = n_triples * n_bins
    k_lo = 128
    n_hi = -(-n_total_bins // k_lo)
    hi_pad = _round_up(n_hi, 8)

    rows = f * n
    rows_pad = _round_up(rows, _TC)
    lo_r, hi_r = ADF_BIN_RANGE
    inv_bw = n_bins / (hi_r - lo_r)

    # row layouts (k-side) and column layouts (j-side)
    def row_col(x):  # (F, N, K) -> (rows_pad, K), (rows_pad * K, 1)
        flat = x.reshape(rows, k)
        if rows_pad != rows:
            flat = jnp.pad(flat, ((0, rows_pad - rows), (0, 0)))
        return flat, flat.reshape(rows_pad * k, 1)

    xr, xc = row_col(r_n[..., 0].astype(jnp.float32))
    yr, yc = row_col(r_n[..., 1].astype(jnp.float32))
    zr, zc = row_col(r_n[..., 2].astype(jnp.float32))
    dr, dc = row_col(d_n.astype(jnp.float32))
    sr, sc = row_col(sid_n.astype(jnp.float32))
    sid_center = jnp.tile(sid_c.astype(jnp.float32), (f,))
    if rows_pad != rows:
        sid_center = jnp.pad(
            sid_center, (0, rows_pad - rows), constant_values=-1.0
        )
    sid_center = sid_center[:, None]  # (rows_pad, 1)

    n_chunks = k // _CR
    n_blocks = rows_pad // _TC
    s_f = float(n_species)

    def kernel(
        xr_ref, yr_ref, zr_ref, dr_ref, sr_ref,
        xc_ref, yc_ref, zc_ref, dc_ref, sc_ref,
        sidc_ref, out_ref, acc_ref,
        hi_buf, lo_buf, wh_buf, wl_buf,
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # stacked one-hot rows: rows [0, hi_pad) select the high weight
        # half, rows [hi_pad, 2 hi_pad) the low half -> ONE matmul for both
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * hi_pad, 1), 0)
        hi_ids2 = (rows2 % hi_pad).astype(jnp.float32)
        row_is_high = rows2 < hi_pad
        lo_ids = jax.lax.broadcasted_iota(
            jnp.int32, (k_lo, 1), 0
        ).astype(jnp.float32)
        k_slot = jax.lax.broadcasted_iota(
            jnp.int32, (1, k), 1
        )

        def chunk_body(step, _):
            c = step // n_chunks
            ch = step % n_chunks
            # k-side: the center's full neighbor row
            row = pl.ds(c, 1)
            xk = xr_ref[row, :]  # (1, K)
            yk = yr_ref[row, :]
            zk = zr_ref[row, :]
            dk = dr_ref[row, :]
            sk = sr_ref[row, :]
            # center species as an SMEM scalar — a (1,1) VMEM read would
            # need a sublane+lane broadcast, which Mosaic cannot lower
            sa = sidc_ref[c, 0]
            # j-side: CR of the center's neighbor slots, column layout
            col = pl.ds(c * k + ch * _CR, _CR)
            xj = xc_ref[col, :]  # (CR, 1)
            yj = yc_ref[col, :]
            zj = zc_ref[col, :]
            dj = dc_ref[col, :]
            sj = sc_ref[col, :]

            g = xj * xk + yj * yk + zj * zk  # (CR, K)
            denom = dj * dk
            safe = denom > 0.0
            inv_den = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
            cos = jnp.clip(g * inv_den, -1.0, 1.0)
            ang = acos_f32(cos)
            bin_f = jnp.minimum(
                jnp.floor(ang * inv_bw), float(n_bins - 1)
            )

            # ordered-triple combinations-with-replacement index
            # (same closed form as ops/adf.py:381-395)
            b_id = sj
            c_id = sk
            saf = s_f - sa
            block_a = (
                s_f * (s_f + 1.0) * (s_f + 2.0)
                - saf * (saf + 1.0) * (saf + 2.0)
            ) / 6.0
            bb = b_id - sa
            t_id = (
                block_a + bb * (s_f - sa) - bb * (bb - 1.0) * 0.5
                + (c_id - b_id)
            )
            ordered = (sa <= b_id) & (b_id <= c_id)

            j_slot = ch * _CR + jax.lax.broadcasted_iota(
                jnp.int32, (_CR, 1), 0
            )
            mask = (
                ordered
                & (sa >= 0.0)
                & (sj >= 0.0)
                & (sk >= 0.0)
                & (j_slot != k_slot)
                & safe
            )

            # weight = inv_den^p, integer power by squaring (static p)
            result = jnp.ones_like(inv_den)
            base = inv_den
            e = norm_power
            while e > 0:
                if e & 1:
                    result = result * base
                e >>= 1
                if e:
                    base = base * base
            w = jnp.where(mask, result, 0.0)

            combined = jnp.where(mask, t_id, 0.0) * float(n_bins) + bin_f
            hi_id = jnp.floor(combined * (1.0 / k_lo))
            lo_id = combined - hi_id * k_lo
            hi_id = jnp.where(mask, hi_id, float(hi_pad))

            # weight halves, both exactly bf16-representable but kept in
            # f32 scratch: Mosaic cannot relayout an f32-compare mask onto
            # bf16 select operands, so the selects run in f32 and the
            # results convert (losslessly) to bf16 for the MXU.
            wh = w.astype(jnp.bfloat16).astype(jnp.float32)
            wl = w - wh

            for r in range(_CR):
                lanes = pl.ds(r * k, k)
                hi_buf[0:1, lanes] = hi_id[r : r + 1, :]
                lo_buf[0:1, lanes] = lo_id[r : r + 1, :]
                wh_buf[0:1, lanes] = wh[r : r + 1, :]
                wl_buf[0:1, lanes] = wl[r : r + 1, :]

            oh_lo = jnp.where(lo_buf[...] == lo_ids, 1.0, 0.0).astype(
                jnp.bfloat16
            )  # (128, CR*K)
            hi_flat = hi_buf[...]
            sel_w = jnp.where(row_is_high, wh_buf[...], wl_buf[...])
            oh_hi = jnp.where(hi_flat == hi_ids2, sel_w, 0.0).astype(
                jnp.bfloat16
            )  # (2 HI, CR*K); both weight halves are bf16-representable
            out2 = jax.lax.dot_general(
                oh_hi, oh_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2 HI, 128)
            acc_ref[...] += out2[0:hi_pad, :] + out2[hi_pad : 2 * hi_pad, :]
            return 0

        jax.lax.fori_loop(0, _TC * n_chunks, chunk_body, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_ref[...]

    row_spec = pl.BlockSpec(
        (_TC, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    col_spec = pl.BlockSpec(
        (_TC * k, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    sidc_spec = pl.BlockSpec(
        (_TC, 1), lambda i: (i, 0), memory_space=pltpu.SMEM
    )

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[row_spec] * 5 + [col_spec] * 5 + [sidc_spec],
        out_specs=pl.BlockSpec(
            (hi_pad, k_lo), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hi_pad, k_lo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hi_pad, k_lo), jnp.float32),
            pltpu.VMEM((1, _CR * k), jnp.float32),
            pltpu.VMEM((1, _CR * k), jnp.float32),
            pltpu.VMEM((1, _CR * k), jnp.float32),
            pltpu.VMEM((1, _CR * k), jnp.float32),
        ],
        interpret=interpret,
    )(xr, yr, zr, dr, sr, xc, yc, zc, dc, sc, sid_center)

    flat = out.reshape(-1)[:n_total_bins]
    return flat.reshape(n_triples, n_bins)


def auto_neighbor_lists(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff,
    k_n: int = PALLAS_ADF_K,
):
    """Neighbor lists via cell lists when applicable, O(N^2) otherwise.

    Cell lists (``ops.cells``) replace the top_k-over-all-N bottleneck
    (83 of 119 ms/frame at 10k atoms) with a top_k over the 27-cell
    candidate set; cell-capacity overflow retries with doubled capacity
    (exact for any geometry). Returns the ``adf_neighbor_lists`` tuple.
    """
    from .cells import cell_lists_applicable, neighbor_lists_cells

    n = positions.shape[1]
    box_np = None if box is None else np.asarray(box)
    # TPU gathers make cell lists slower below ~32k atoms (measured);
    # the O(N^2) masked top_k wins at benchmark scales.
    use_cells = (
        box_np is not None
        and n >= 32768
        and cell_lists_applicable(box_np, float(cutoff))
    )
    if not use_cells:
        return adf_neighbor_lists(positions, species_id, box, cutoff, k_n=k_n)

    n_dim = int(np.min(box_np) // float(cutoff))
    mean_occ = n / n_dim**3
    capacity = max(8, _round_up(int(np.ceil(1.75 * mean_occ)), 8))
    while True:
        if 27 * capacity < k_n:
            capacity = _round_up(-(-k_n // 27), 8)
            continue
        r_n, d_n, sid_n, sid_pad, max_count, max_occ = neighbor_lists_cells(
            positions, species_id, box, cutoff,
            k_n=k_n, n_dim=n_dim, capacity=capacity,
        )
        if int(max_occ) <= capacity:
            return r_n, d_n, sid_n, sid_pad, max_count
        capacity *= 2


def adf_histogram_pallas(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff,
    n_bins: int,
    n_species: int,
    norm_power: int = 4,
    k_n: int = PALLAS_ADF_K,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full fused-ADF pipeline: neighbor lists -> Pallas angle histogram.

    Returns ``(hist (n_triples, n_bins), max_count)`` — same contract as
    ``adf_histogram_neighbors`` (``max_count == k_n`` means the fixed
    neighbor list may have saturated; results then under-count and callers
    must retry with a larger multiple-of-128 ``k_n``).
    """
    r_n, d_n, sid_n, sid_pad, max_count = auto_neighbor_lists(
        positions, species_id, box, cutoff, k_n=k_n
    )
    hist = adf_pairs_histogram_pallas(
        r_n, d_n, sid_n, sid_pad, n_bins, n_species,
        norm_power=norm_power, interpret=interpret,
    )
    return hist, max_count
