"""Pallas TPU kernel: fused neighbor-pair angles + weighted histogram.

The XLA neighbor-list ADF (``ops.adf.adf_histogram_neighbors``) materialises
the (F, C, K, K) angle / weight / bin tensors in HBM between ops and runs
the histogram as chunked HBM-resident one-hot contractions — the whole
triplet stage is HBM-bandwidth-bound (the reference calls triplet
enumeration its hardest memory problem, ``utils/neighbour_list.py:112-177``).
This kernel keeps the per-center K x K tile pipeline entirely in VMEM:

    gram -> cos -> acos -> bin -> (triple, bin) id -> one-hot -> MXU

Stage 1 (``_neighbor_extract_pallas``): order-free set compaction — the
histogram is order-invariant, so no top_k at all. Per center block
(8-128 rows) the chunk sweep computes minimum-image distances for
128-lane chunks in registers, masks in-cutoff lanes, and extracts up to
``e_fixed`` entries per chunk through one-hot slot writes that ALSO
accumulate the selected lane's (r, d, sid) values (where-selects — the
unique-j keys guarantee a single matching lane). Leftovers are swept by
one dynamically-bounded full-scratch pass. The production route z-sorts
each frame first (``sorted_neighbor_extract``): a per-block circular
chunk WINDOW then bounds the sweep to the ~2*cutoff slab, the scratches
shrink to the window bound (which is what lifts the atom cap to
1048576 verified atoms),
and center STRIPES of the sorted order shard over a mesh axis
(``sorted_neighbor_extract_stripe``). The kernel emits the finished
neighbor tensors; there is no XLA gather or post-processing (sorted
windowed extract ~9-11 ms/frame vs 117 for lax.top_k at 10240 atoms,
which also needed ~20 ms of gathers).

Stage 2 (``adf_pairs_histogram_pallas``): grid over blocks of centers;
per center the K x K ordered-neighbor-pair tile is processed in 32-row
chunks. Design notes:

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
* **No column operands**: current libtpu lane-pads (M, 1) f32 arrays
  128x in HBM (4 GB each at 65k atoms — OOM); the j-side (CR, 1)
  vectors are reconstructed in-kernel by a one-hot MXU transpose of the
  resident (1, K) row (exact at HIGHEST: one nonzero product, x * 1.0).
  Rows of the (CR, K) tile flatten into a (1, CR*K) scratch via
  128-aligned lane stores.
* **Center packing**: at first-shell cutoffs p in {2, 4} centers share
  each 128-lane row as p sub-lists (per-lane center species, same-half
  mask) — K x K tile work drops ~p-fold. Chosen statically from density
  (a data-dependent choice costs a blocking host sync per call);
  overflow reports as saturation for the caller's retry.
* The (triple, bin) id splits asymmetrically: ``lo`` spans up to 128
  output lanes, ``hi = ceil(n_triples * n_bins / lo)`` sublanes — the
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
_CR = 32  # j-rows per inner chunk (pack == 1 angle path)
_RS = 8  # row-slice height of the dense-packed angle path
_FRS = 64  # offset-rows per tile of the folded angle path


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


# ----------------------------------------- stage 1 (Pallas): index extraction
#: keys are the neighbor's own j index (exact f32 integers — every atom
#: count this kernel accepts is far below 2^24) or _EMPTY for out-of-cutoff
#: lanes; extraction is order-free set compaction (the angle histogram is
#: order-invariant), so no distance sorting is needed at all.
#: default for the jrow extract variant (j-value rows instead of
#: per-center value scratches — see ``_neighbor_extract_pallas``); a
#: module constant so the A/B harness can flip arms per process and the
#: production default is set in exactly one place once measured.
_JROW_DEFAULT = False

_JCAP = 16384  #: max padded atom count routed to this kernel (VMEM keys row)
#: cap for the WINDOW-relative-scratch variant: the scratches scale with
#: the window bound (not N), so only the (1, N) j-rows grow with N
#: (4 rows x n_pad x 4 B = 8.4 MB of scoped VMEM at this cap).
#: Measured on v5e at the serpentine-brick sort: 131072 atoms 194.6
#: ms/frame vs 1032.6 via cells (2026-08-18); the r5 handoff measurement
#: (benchmarks/large_n_scaling.json::adf_beyond_cap) showed the old
#: 262144 cap was never a real limit — windowed 450.4 ms/frame at
#: 393216 and 583.2 at 524288 vs the cells route's 12217 at 393216
#: (27x), then the r5 close-out extended the verified envelope to
#: 913.0 at 786432 and 1572.5 at 1048576 (j-rows 16.8 MB of scoped
#: VMEM at 1M; near-linear in N because the per-center window is
#: density-bound) — so the cap sits at the largest VERIFIED-on-hardware
#: size; cells only engage above it (they remain the only route whose
#: VMEM footprint is N-independent).
_JCAP_WINDOWED = 1048576
_EMPTY = 3.0e7  # key for non-neighbor lanes
_TAKEN = 6.0e7  # key for already-extracted lanes


@functools.partial(
    jax.jit,
    static_argnames=("k_n", "interpret", "tc", "e_fixed", "w_chunks",
                     "lean", "jrow"),
)
def _neighbor_extract_pallas(
    positions: jnp.ndarray,  # (F, N, 3) float32
    species_id: jnp.ndarray,  # (N,) int32, -1 padding; or (F, N) per-frame
    box,  # (3,) or None -> open boundaries
    cutoff,
    k_n: int = PALLAS_ADF_K,
    interpret: bool = False,
    tc: int | None = None,
    window: jnp.ndarray | None = None,  # (F * n_blocks, 2) int32
    e_fixed: int = 4,
    w_chunks: int | None = None,
    centers: tuple | None = None,  # (pos_c (F,Nc,3), sid_c, i_offset)
    lean: bool = False,
    jrow: bool = False,
):
    """Per-center in-cutoff neighbor indices, no ``top_k``, no HBM gathers.

    Replaces the ``lax.top_k`` stage (118 ms/frame at 10k atoms — the ADF
    pipeline bottleneck): for a block of 8 centers the kernel computes
    minimum-image distances to ALL atoms on the VPU, then compacts the
    in-cutoff lanes into ``k_n`` output slots entirely in VMEM. Slot ORDER
    is arbitrary (unlike top_k's nearest-first) — the angle histogram is
    order-invariant, so only the SET matters, and the set is exactly every
    atom with ``d < cutoff`` whenever the in-cutoff count is <= ``k_n``
    (same contract as ``adf_neighbor_lists``; saturation is detected by
    the caller counting valid slots).

    Compaction sweeps 128-lane chunks of the masked key row (``e_fixed``
    scalar-free extractions per chunk; leftovers swept by one
    dynamically-bounded full-scratch pass). The displacement / distance /
    species rows are kept in VMEM scratch and each extraction ALSO
    accumulates the selected lane's values through the same one-hot — so
    the kernel emits the finished neighbor tensors directly, with no XLA
    gather pass (measured 20.6 ms/frame of gather + elementwise post at
    10k atoms).

    Returns ``(idx, rx, ry, rz, d, sid, counts)`` — the first six
    ``(F, Npad, k_n)`` (idx/sid int32, -1 for empty slots; r/d zeroed on
    empty slots), counts ``(F, Npad)`` f32 per-center valid-slot counts.

    ``window`` (optional, from :func:`_chunk_window` over z-sorted
    frames): per-(frame, center-block) (start, count) circular j-chunk
    window in SMEM — the chunk sweep runs only that window, with CONSECUTIVE
    addresses (one wrap subtract), so skipped chunks cost nothing and
    the loop still pipelines. Two rejected designs, measured slower
    than no skip at all: per-chunk ``pl.when`` (accumulators forced out
    of registers into the output refs — per-chunk VMEM round trips), and
    a front-packed scattered chunk-id list (every chunk's loads waited
    on its SMEM index load).

    ``e_fixed`` (static): per-chunk extraction depth of sweep 1. The
    window CONCENTRATES the in-cutoff lanes into few chunks (expected
    neighbors per processed chunk ~ count / window-size), so windowed
    callers must scale it (:func:`extract_e_for`) or the full-width
    cleanup sweep explodes — measured 37 vs 23 ms/frame unsorted at a
    5.5 cutoff with e_fixed=4 (~5 in-cutoff lanes per chunk, ~18
    cleanup iterations x 8 MB of VMEM reads per block).

    ``w_chunks`` (static, window callers only): upper bound on any
    block's window count. The six value/key scratches shrink from
    (tc, Npad) to (tc, w_chunks * 128) — window chunks store at
    WINDOW-RELATIVE lanes — which frees scoped VMEM for much taller
    center blocks (tc up to 128: fewer blocks, fewer per-block fixed
    costs, smaller cleanup reads). Windows larger than the bound are
    CLAMPED in-kernel (never out-of-bounds); callers must detect the
    overflow outside (``sorted_neighbor_extract`` returns the flag) and
    retry un-windowed — a clamped run under-counts.

    ``lean`` (static): skip the ``idx`` output and the per-extraction
    ``d`` accumulation — every production caller discards ``idx``, and
    ``d`` is recomputed once per block as ``sqrt(rx^2 + ry^2 + rz^2)``
    on the finished accumulators (the same f32 values the in-kernel
    distance used, so the cutoff SELECTION — made in-kernel — is
    unchanged; the emitted ``d`` may differ from the in-kernel value by
    float non-associativity only, i.e. ~1 ulp). Cuts the extraction
    inner loop from 5 picked values / 6 slot accumulators to 4 / 4 and
    drops one of the six VMEM scratch rows. Returns ``idx=None``.

    ``jrow`` (static, requires ``lean``): replace the four per-center
    (tc, 128) value-scratch stores per chunk (dx/dy/dz/sid) with four
    (1, 128) stores of the RAW j-side values; the cleanup sweep picks
    the selected lane's j values through the same one-hot mask and
    recomputes displacement + minimum image on (tc, 1) vectors. Same
    formula on the same f32 inputs in the same order -> bit-identical
    outputs (pinned by ``tests/test_pallas_adf.py``). **Measured and
    REFUTED as a perf lever** (r5, ``benchmarks/adf_jrow_ab.json``):
    0.985-0.987x stage-1 at 10k/65k interleaved — the per-chunk value
    stores the r4 attribution charged ~a third of the extract to are
    in fact fully overlapped by Mosaic's scheduling; cutting their
    traffic ~tc x buys nothing. Kept (default off) as the executable
    form of that refutation.
    """
    f, n, _ = positions.shape
    assert lean or not jrow, "jrow requires lean mode (production path)"
    n_pad = _round_up(n, 128)
    cap = _JCAP_WINDOWED if (window is not None and w_chunks) else _JCAP
    assert n_pad <= cap, (
        f"this route handles at most {cap} atoms, got {n_pad}; "
        "use cell lists / top_k above that"
    )
    per_frame_sid = species_id.ndim == 2
    if n_pad != n:
        positions = jnp.pad(positions, ((0, 0), (0, n_pad - n), (0, 0)))
        species_id = jnp.pad(
            species_id,
            ((0, 0), (0, n_pad - n)) if per_frame_sid else (0, n_pad - n),
            constant_values=-1,
        )
    # center stripe (tensor-parallel sharding): centers may be a
    # contiguous slice of the (sorted) atom order; i_offset keeps the
    # self-pair exclusion on GLOBAL ids. Default: all atoms are centers.
    if centers is None:
        pos_c, sid_c, i_offset = positions, species_id, 0
        per_frame_csid = per_frame_sid
    else:
        pos_c, sid_c, i_offset = centers
        per_frame_csid = sid_c.ndim == 2
    nc = pos_c.shape[1]
    nc_pad = _round_up(nc, 128)
    if nc_pad != nc:
        pos_c = jnp.pad(pos_c, ((0, 0), (0, nc_pad - nc), (0, 0)))
        sid_c = jnp.pad(
            sid_c,
            ((0, 0), (0, nc_pad - nc)) if per_frame_csid
            else (0, nc_pad - nc),
            constant_values=-1,
        )
    # centers per block: the chunk sweep's per-chunk overhead amortises
    # over the block's rows (measured 41.8 -> 15.8 ms/frame going 8 -> 32
    # at 10k atoms); the full-width mask build is insensitive (~10 ms).
    # The 6 full-width (tc, n_pad) f32 scratches must fit scoped VMEM
    # (16 MB), so tc steps down for very wide systems — correctness is
    # tc-independent (each center block is self-contained).
    if tc is None:
        tc = 32 if n_pad <= 16384 else (16 if n_pad <= 32768 else 8)
    tc = min(tc, nc_pad)
    assert nc_pad % tc == 0
    n_blocks = nc_pad // tc

    # row layout (j-side): (F, 1, N) so the (1, 1, N) block's trailing dims
    # equal the array dims (Mosaic block-shape divisibility rule)
    px = positions[..., 0].astype(jnp.float32)
    py = positions[..., 1].astype(jnp.float32)
    pz = positions[..., 2].astype(jnp.float32)
    pxc = pos_c[..., 0].astype(jnp.float32).reshape(f * nc_pad, 1)
    pyc = pos_c[..., 1].astype(jnp.float32).reshape(f * nc_pad, 1)
    pzc = pos_c[..., 2].astype(jnp.float32).reshape(f * nc_pad, 1)
    px, py, pz = px[:, None, :], py[:, None, :], pz[:, None, :]
    sid_f = species_id.astype(jnp.float32)
    if per_frame_sid:
        sid_row = sid_f[:, None, :]  # (F, 1, N)
    else:
        sid_row = sid_f[None, None, :]  # (1, 1, N)
    csid_f = sid_c.astype(jnp.float32)
    if per_frame_csid:
        sid_col = csid_f.reshape(f * nc_pad, 1)
    else:
        sid_col = csid_f[:, None]

    if box is None:
        box_arr = jnp.zeros(3, jnp.float32)
        use_mic = jnp.float32(0.0)
    else:
        box_arr = jnp.asarray(box, jnp.float32).reshape(3)
        use_mic = jnp.float32(1.0)
    cutoff_f = jnp.asarray(cutoff, jnp.float32).reshape(())
    inv_box = jnp.where(box_arr > 0, 1.0 / jnp.where(box_arr > 0, box_arr, 1.0), 0.0)
    params = jnp.stack(
        [box_arr[0], box_arr[1], box_arr[2],
         inv_box[0], inv_box[1], inv_box[2],
         cutoff_f, use_mic,
         jnp.asarray(i_offset, jnp.float32).reshape(())]
    )[None, :]  # (1, 9) SMEM

    has_window = window is not None
    # arcs per block: 1 for the classic z-sort window; the brick sort
    # covers its flags with a few (start, count) arcs per block
    n_arcs = (window.shape[-1] // 2) if has_window else 0
    # scratch width in chunks: window-relative when bounded
    n_chunks_all = n_pad // 128
    sw = w_chunks if (has_window and w_chunks) else n_chunks_all
    sw = min(sw, n_chunks_all)

    def kernel(
        px_ref, py_ref, pz_ref, pxc_ref, pyc_ref, pzc_ref,
        sid_row_ref, sid_col_ref, params_ref, *rest,
    ):
        if has_window:
            win_ref, *rest = rest
        if jrow:
            out_idx_ref = ds_ref = None
            dxs_ref = dys_ref = dzs_ref = sids_ref = None
            (out_rx_ref, out_ry_ref, out_rz_ref,
             out_d_ref, out_sid_ref, out_cnt_ref,
             keys_ref, jv_ref) = rest
        elif lean:
            out_idx_ref = ds_ref = None
            (out_rx_ref, out_ry_ref, out_rz_ref,
             out_d_ref, out_sid_ref, out_cnt_ref,
             keys_ref, dxs_ref, dys_ref, dzs_ref, sids_ref) = rest
        else:
            (out_idx_ref, out_rx_ref, out_ry_ref, out_rz_ref,
             out_d_ref, out_sid_ref, out_cnt_ref,
             keys_ref, dxs_ref, dys_ref, dzs_ref, ds_ref,
             sids_ref) = rest
        ib = pl.program_id(1)
        bx = params_ref[0, 0]
        by = params_ref[0, 1]
        bz = params_ref[0, 2]
        ibx = params_ref[0, 3]
        iby = params_ref[0, 4]
        ibz = params_ref[0, 5]
        cutoff_v = params_ref[0, 6]
        mic = params_ref[0, 7]
        i_off = params_ref[0, 8]

        xi = pxc_ref[...]  # (TC, 1)
        yi = pyc_ref[...]
        zi = pzc_ref[...]
        si = sid_col_ref[...]

        i_ids = i_off + (ib * tc + jax.lax.broadcasted_iota(
            jnp.int32, (tc, 1), 0
        )).astype(jnp.float32)

        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, k_n), 1
        ).astype(jnp.float32)
        idx0 = jnp.full((tc, k_n), -1.0, jnp.float32)
        sid0 = jnp.full((tc, k_n), -1.0, jnp.float32)
        zk = jnp.zeros((tc, k_n), jnp.float32)
        slot0 = jnp.zeros((tc, 1), jnp.float32)

        def take_min(carry, keys_w, vals_w):
            """Extract each row's smallest live key into its next slot,
            accumulating the extracted lane's values via masked sums
            (exactly one matching lane — keys are the unique j ids)."""
            if lean:
                rxa, rya, rza, sa, slot = carry
            else:
                idx_acc, rxa, rya, rza, da, sa, slot = carry
            cur = jnp.min(keys_w, axis=1, keepdims=True)  # (TC, 1)
            m_sel = keys_w == cur
            keys_w = jnp.where(m_sel, _TAKEN, keys_w)
            ok = (cur < _EMPTY) & (slot < float(k_n))  # (TC, 1) bool
            okf = jnp.where(ok, 1.0, 0.0)
            # one-hot slot SELECT (not a 0/1 multiply): on an exhausted
            # row cur == _EMPTY matches EVERY empty lane, so pick() may
            # sum value-scratch lanes that were never written (NaN in
            # interpret mode, arbitrary VMEM on hardware) — 0 * NaN from
            # a mask multiply would poison the whole row's accumulators;
            # the where() below never evaluates the arithmetic on them
            ohb = (slot_iota == slot) & ok  # (TC, K) bool

            def pick(vw):
                return jnp.sum(
                    jnp.where(m_sel, vw, 0.0), axis=1, keepdims=True
                )  # (TC, 1)

            def put(acc, val):  # (TC, 1) val broadcast onto the slot
                return acc + jnp.where(ohb, val, 0.0)

            if lean:
                vx, vy, vz, vs = vals_w
            else:
                vx, vy, vz, vd, vs = vals_w
                idx_acc = put(idx_acc, cur + 1.0)
                da = put(da, pick(vd))
            rxa = put(rxa, pick(vx))
            rya = put(rya, pick(vy))
            rza = put(rza, pick(vz))
            sa = put(sa, pick(vs) + 1.0)
            slot = slot + okf
            if lean:
                return (rxa, rya, rza, sa, slot), keys_w
            return (idx_acc, rxa, rya, rza, da, sa, slot), keys_w

        # Sweep 1 — scalar-free, build fused in: each 128-lane chunk
        # computes its minimum-image displacements / distances / masks in
        # registers, writes them to the full-width scratch (for the
        # cleanup pass), and immediately extracts up to E entries
        # (covers per-row-per-chunk counts <= E, i.e. almost all lanes at
        # liquid densities); key leftovers are written back. A dynamic
        # per-chunk trip would be exact in one pass but each
        # vector->scalar reduce stalls the pipelines (measured as slow as
        # the full-width-sweep variant it replaced). Fusing the build
        # keeps only (TC, 128) temporaries live — full-width (TC, N)
        # register arrays overflowed the 16 MB scoped-VMEM limit.

        def chunk_work(c, s, carry):
            c0 = pl.multiple_of(c * 128, 128)  # j-load lanes (absolute)
            s0 = pl.multiple_of(s * 128, 128)  # scratch lanes (slot)
            lanes = pl.ds(c0, 128)
            slanes = pl.ds(s0, 128)
            xjc = px_ref[0, 0:1, lanes]  # (1, 128)
            yjc = py_ref[0, 0:1, lanes]
            zjc = pz_ref[0, 0:1, lanes]
            sjc = sid_row_ref[0, 0:1, lanes]
            dxc = xi - xjc  # (TC, 128)
            dyc = yi - yjc
            dzc = zi - zjc
            dxc = dxc - mic * bx * jnp.round(dxc * ibx)
            dyc = dyc - mic * by * jnp.round(dyc * iby)
            dzc = dzc - mic * bz * jnp.round(dzc * ibz)
            dc = jnp.sqrt(dxc * dxc + dyc * dyc + dzc * dzc)
            jc = (c0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1
            )).astype(jnp.float32)
            validc = (
                (dc < cutoff_v)
                & (jc != i_ids)
                & (sjc >= 0.0)
                & (si >= 0.0)
            )
            sidc = sjc + 0.0 * i_ids  # (TC, 128) broadcast copy
            chunk = jnp.where(validc, jc + 0.0 * i_ids, _EMPTY)
            if jrow:
                # store only the RAW j-side rows — (1, 128) each, tc x
                # cheaper than the per-center value scratches; cleanup
                # recomputes displacement from the picked j values
                jv_ref[0:1, slanes] = xjc
                jv_ref[1:2, slanes] = yjc
                jv_ref[2:3, slanes] = zjc
                jv_ref[3:4, slanes] = sjc
                vals = (dxc, dyc, dzc, sidc)
            elif lean:
                dxs_ref[:, slanes] = dxc
                dys_ref[:, slanes] = dyc
                dzs_ref[:, slanes] = dzc
                sids_ref[:, slanes] = sidc
                vals = (dxc, dyc, dzc, sidc)
            else:
                dxs_ref[:, slanes] = dxc
                dys_ref[:, slanes] = dyc
                dzs_ref[:, slanes] = dzc
                sids_ref[:, slanes] = sidc
                ds_ref[:, slanes] = dc
                vals = (dxc, dyc, dzc, dc, sidc)
            for _ in range(e_fixed):
                carry, chunk = take_min(carry, chunk, vals)
            keys_ref[:, slanes] = chunk
            return carry

        if lean:
            init = (zk, zk, zk, sid0, slot0)
        else:
            init = (idx0, zk, zk, zk, zk, sid0, slot0)
        n_chunks_k = n_pad // 128
        if has_window:
            # dynamic (start, count) circular window(s): addresses stay
            # consecutive per arc (one wrap subtract off the loop
            # counter), so the sweep pipelines; out-of-window chunks cost
            # nothing. Window chunks store at WINDOW-RELATIVE scratch
            # lanes — arc a's chunks land after the previous arcs'
            # cumulative count; the tail stays at the _EMPTY fill below,
            # so the cleanup sweep never selects it (stale value scratch
            # is harmless — empty keys pick no lane). Counts beyond the
            # static bound are clamped; the CALLER must detect that
            # overflow and retry un-windowed.
            keys_ref[...] = jnp.full((tc, sw * 128), _EMPTY, jnp.float32)
            carry = init
            w_off = jnp.asarray(0, jnp.int32)
            for a in range(n_arcs):  # static unroll (n_arcs is tiny)
                a_start = win_ref[0, 0, 2 * a]
                a_cnt = jnp.clip(win_ref[0, 0, 2 * a + 1], 0, sw - w_off)

                def chunk_body(t, carry, a_start=a_start, w_off=w_off):
                    cw = a_start + t
                    cw = jnp.where(cw >= n_chunks_k, cw - n_chunks_k, cw)
                    return chunk_work(cw, w_off + t, carry)

                carry = jax.lax.fori_loop(0, a_cnt, chunk_body, carry)
                w_off = w_off + a_cnt
        else:

            def chunk_body_all(c, carry):
                return chunk_work(c, c, carry)

            carry = jax.lax.fori_loop(0, n_chunks_k, chunk_body_all, init)

        # Sweep 2 — exact cleanup: one scalar per BLOCK. Rows denser than
        # E per chunk keep their leftovers in keys_ref; the trip count is
        # the largest per-row leftover (~0 in practice).
        left = jnp.max(
            jnp.sum(jnp.where(keys_ref[...] < _EMPTY, 1.0, 0.0), axis=1)
        ).astype(jnp.int32)

        def cleanup(_, carry):
            if jrow:
                # pick the selected lane's RAW j values through the same
                # one-hot, then recompute displacement + minimum image on
                # (tc, 1) vectors — identical formula on identical f32
                # inputs in identical order as the sweep-1 register path,
                # so the emitted values are bit-identical. Exhausted rows
                # (cur == _EMPTY matches every empty lane) may sum stale
                # jv lanes into garbage — the where(ohb, ...) SELECT
                # never lets it reach the accumulators (sixth-pass rule:
                # select, never multiply, around unwritten scratch).
                rxa, rya, rza, sa, slot = carry
                keys_w = keys_ref[...]
                cur = jnp.min(keys_w, axis=1, keepdims=True)
                m_sel = keys_w == cur
                keys_ref[...] = jnp.where(m_sel, _TAKEN, keys_w)
                ok = (cur < _EMPTY) & (slot < float(k_n))
                ohb = (slot_iota == slot) & ok

                def pickj(r):
                    return jnp.sum(
                        jnp.where(m_sel, jv_ref[r : r + 1, :], 0.0),
                        axis=1, keepdims=True,
                    )  # (TC, 1)

                dxv = xi - pickj(0)
                dyv = yi - pickj(1)
                dzv = zi - pickj(2)
                dxv = dxv - mic * bx * jnp.round(dxv * ibx)
                dyv = dyv - mic * by * jnp.round(dyv * iby)
                dzv = dzv - mic * bz * jnp.round(dzv * ibz)
                rxa = rxa + jnp.where(ohb, dxv, 0.0)
                rya = rya + jnp.where(ohb, dyv, 0.0)
                rza = rza + jnp.where(ohb, dzv, 0.0)
                sa = sa + jnp.where(ohb, pickj(3) + 1.0, 0.0)
                slot = slot + jnp.where(ok, 1.0, 0.0)
                return (rxa, rya, rza, sa, slot)
            if lean:
                vals = (
                    dxs_ref[...], dys_ref[...], dzs_ref[...],
                    sids_ref[...],
                )
            else:
                vals = (
                    dxs_ref[...], dys_ref[...], dzs_ref[...],
                    ds_ref[...], sids_ref[...],
                )
            carry, keys_w = take_min(carry, keys_ref[...], vals)
            keys_ref[...] = keys_w
            return carry

        carry = jax.lax.fori_loop(0, left, cleanup, carry)
        if lean:
            rxa, rya, rza, sa, slot = carry
            # d recomputed once per block from the picked components —
            # same f32 values the in-kernel distance used (empty slots
            # hold zeros, so d stays 0 there)
            da = jnp.sqrt(rxa * rxa + rya * rya + rza * rza)
        else:
            idx, rxa, rya, rza, da, sa, slot = carry
            out_idx_ref[...] = idx
        out_rx_ref[...] = rxa
        out_ry_ref[...] = rya
        out_rz_ref[...] = rza
        out_d_ref[...] = da
        out_sid_ref[...] = sa
        out_cnt_ref[...] = slot

    grid = (f, n_blocks)
    row_spec = pl.BlockSpec(
        (1, 1, n_pad), lambda fi, ib: (fi, 0, 0), memory_space=pltpu.VMEM
    )
    col_spec = pl.BlockSpec(
        (tc, 1),
        lambda fi, ib: (fi * n_blocks + ib, 0),
        memory_space=pltpu.VMEM,
    )
    if per_frame_sid:
        sid_row_spec = row_spec
    else:
        sid_row_spec = pl.BlockSpec(
            (1, 1, n_pad), lambda fi, ib: (0, 0, 0), memory_space=pltpu.VMEM
        )
    if per_frame_csid:
        sid_col_spec = col_spec
    else:
        sid_col_spec = pl.BlockSpec(
            (tc, 1), lambda fi, ib: (ib, 0), memory_space=pltpu.VMEM
        )
    k_spec = pl.BlockSpec(
        (tc, k_n),
        lambda fi, ib: (fi * n_blocks + ib, 0),
        memory_space=pltpu.VMEM,
    )
    cnt_spec = pl.BlockSpec(
        (tc, 1),
        lambda fi, ib: (fi * n_blocks + ib, 0),
        memory_space=pltpu.VMEM,
    )
    k_shape = jax.ShapeDtypeStruct((f * nc_pad, k_n), jnp.float32)
    in_specs = (
        [row_spec] * 3 + [col_spec] * 3
        + [sid_row_spec, sid_col_spec]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    inputs = [px, py, pz, pxc, pyc, pzc, sid_row, sid_col, params]
    if has_window:
        # 3-D with a singleton middle axis: Mosaic requires the block's
        # last two dims to divide (8, 128) or equal the array dims — the
        # (1, 1, 2 * n_arcs) block matches the trailing (1, 2 * n_arcs)
        in_specs.append(pl.BlockSpec(
            (1, 1, 2 * n_arcs),
            lambda fi, ib: (fi * n_blocks + ib, 0, 0),
            memory_space=pltpu.SMEM,
        ))
        inputs.append(
            window.astype(jnp.int32).reshape(f * n_blocks, 1, 2 * n_arcs)
        )
    n_out = 5 if lean else 6
    if jrow:
        # keys stay per-center; the four value rows collapse into one
        # (8, W) j-value scratch (rows 0-3 used; 8 = sublane tile)
        scratch_shapes = [
            pltpu.VMEM((tc, sw * 128), jnp.float32),
            pltpu.VMEM((8, sw * 128), jnp.float32),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((tc, sw * 128), jnp.float32)
        ] * (5 if lean else 6)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[k_spec] * n_out + [cnt_spec],
        out_shape=[k_shape] * n_out
        + [jax.ShapeDtypeStruct((f * nc_pad, 1), jnp.float32)],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*inputs)
    if lean:
        rx, ry, rz, d_n, sid_n, cnt = outs
        idx_out = None
    else:
        idx, rx, ry, rz, d_n, sid_n, cnt = outs
        idx_out = idx.reshape(f, nc_pad, k_n).astype(jnp.int32)
    return (
        idx_out,
        rx.reshape(f, nc_pad, k_n),
        ry.reshape(f, nc_pad, k_n),
        rz.reshape(f, nc_pad, k_n),
        d_n.reshape(f, nc_pad, k_n),
        sid_n.reshape(f, nc_pad, k_n).astype(jnp.int32),
        cnt.reshape(f, nc_pad),
    )


@jax.jit
def _spatial_sort(positions, species_id, box):
    """Per-frame sort along z (slab decomposition); invalid atoms last.

    The angle histogram is center-permutation-invariant, so each frame
    may be reordered independently — one argsort + gather per frame in
    XLA. A single-axis sort (vs Morton order) makes each center block's
    in-cutoff j-chunks a CONTIGUOUS (circularly, under PBC) window of
    the sorted order: the extract kernel can take a per-block (start,
    count) window with consecutive chunk addresses, which pipelines,
    where a scattered per-chunk index list measured SLOWER than no skip
    at all (each chunk's loads waited on an SMEM index load).

    Returns ``(pos_sorted (F, N, 3), sid_sorted (F, N))``.
    """
    f, n, _ = positions.shape
    key = positions[..., 2]
    if species_id.ndim == 1:
        sid2 = jnp.broadcast_to(species_id, (f, n))
    else:
        sid2 = species_id
    key = jnp.where(sid2 >= 0, key, jnp.asarray(jnp.inf, key.dtype))
    order = jnp.argsort(key, axis=1)
    pos_s = jnp.take_along_axis(positions, order[..., None], axis=1)
    sid_s = jnp.take_along_axis(sid2, order, axis=1)
    return pos_s, sid_s


@jax.jit
def _brick_sort(positions, species_id, box, cutoff):
    """Per-frame (z-slab, y) sort — the multi-arc window's ordering.

    Atoms sort by ``(floor(z / slab_width), y)`` with ``slab_width =
    box_z / floor(box_z / cutoff) >= cutoff``: a center's in-cutoff atoms
    then lie in <= 3 consecutive slabs, INSIDE each of which they occupy a
    contiguous y-window — so the bbox process flags form <= 3 tight arcs
    instead of one long z-arc that sweeps the slab's full x-y extent.
    Simulated on uniform 65536 atoms / cutoff 3.6: 50.7 chunks per block
    (single z-arc) -> 25.6 (<= 4 covering arcs), 13.9 ideal
    (``benchmarks/brick_window_sim.py``). At 10240 atoms the 128-atom
    chunk granularity floors the window (15.5 -> 11.3) — the z sort stays
    the default there. Invalid atoms sort last.

    Returns ``(pos_sorted (F, N, 3), sid_sorted (F, N))``.
    """
    f, n, _ = positions.shape
    box_arr = jnp.asarray(box, positions.dtype).reshape(3)
    n_slabs = jnp.maximum(
        jnp.floor(box_arr[2] / jnp.asarray(cutoff, positions.dtype)), 1.0
    )
    slab_w = box_arr[2] / n_slabs
    z = jnp.clip(positions[..., 2], 0.0, box_arr[2] * (1 - 1e-7))
    slab = jnp.minimum(jnp.floor(z / slab_w), n_slabs - 1.0)
    # serpentine y inside slabs (odd slabs descend): a center block that
    # straddles a slab seam then holds y-NEIGHBORING atoms from both
    # slabs instead of the two y-extremes — without this, seam blocks get
    # full-y bboxes and ~4-slab chunk windows (measured max covered
    # 106 vs ~30 of 512 at 65536 atoms)
    y = positions[..., 1]
    odd = jnp.mod(slab, 2.0) >= 1.0
    y_eff = jnp.where(odd, box_arr[1] - y, y)
    # slab-major key; y spans [0, box_y) so 2*box_y separates slabs
    key = slab * (2.0 * box_arr[1]) + y_eff
    if species_id.ndim == 1:
        sid2 = jnp.broadcast_to(species_id, (f, n))
    else:
        sid2 = species_id
    key = jnp.where(sid2 >= 0, key, jnp.asarray(jnp.inf, key.dtype))
    order = jnp.argsort(key, axis=1)
    pos_s = jnp.take_along_axis(positions, order[..., None], axis=1)
    sid_s = jnp.take_along_axis(sid2, order, axis=1)
    return pos_s, sid_s


@jax.jit
def _brick3_sort(positions, species_id, box, cutoff):
    """Per-frame (z-slab, serpentine y-cell, serpentine x) sort.

    Refines :func:`_brick_sort` one level: inside each (z-slab, y-cell)
    brick atoms order by x, so a center's neighbors form SHORT x-runs
    inside <= 9 cells instead of full-y slab windows. Candidate-floor
    sim (``benchmarks/candidate_floor_sim.py``): at 65536 atoms the
    cover LOSES at the first-shell cutoff (11.9 vs brick's 10.8 at
    tc=16 — x-sorting fragments coverage into more arcs without
    shrinking it) and WINS at wide cutoffs (5.5: 14.7 vs 20.9, 1.42x)
    where each cell holds several 128-atom chunks. Gate on geometry —
    see ``_AdfPlan`` in ``parallel.sharded_ops``. Invalid atoms last.

    The composite sort key is ``(slab * n_cells + ycell) * 2 * box_x +
    x`` in f32: cell ranks stay exactly ordered (small integers times a
    gap larger than any x), and an f32-rounding swap of two nearby-x
    atoms inside one cell is harmless — the extract's bbox predicate is
    computed on the sorted positions themselves, so ANY order is
    correct; order only shapes the cover.

    Returns ``(pos_sorted (F, N, 3), sid_sorted (F, N))``.
    """
    f, n, _ = positions.shape
    box_arr = jnp.asarray(box, positions.dtype).reshape(3)
    co = jnp.asarray(cutoff, positions.dtype)
    n_slabs = jnp.maximum(jnp.floor(box_arr[2] / co), 1.0)
    slab_w = box_arr[2] / n_slabs
    z = jnp.clip(positions[..., 2], 0.0, box_arr[2] * (1 - 1e-7))
    slab = jnp.minimum(jnp.floor(z / slab_w), n_slabs - 1.0)
    n_cells = jnp.maximum(jnp.floor(box_arr[1] / co), 1.0)
    cell_w = box_arr[1] / n_cells
    y = jnp.clip(positions[..., 1], 0.0, box_arr[1] * (1 - 1e-7))
    ycell = jnp.minimum(jnp.floor(y / cell_w), n_cells - 1.0)
    # serpentine y-cells inside slabs and serpentine x inside cells:
    # consecutive cells in the traversal are spatial neighbors, so a
    # center block straddling a cell seam holds atoms from ADJACENT
    # cells (same reasoning as the brick sort's serpentine y)
    odd_slab = jnp.mod(slab, 2.0) >= 1.0
    ycell_eff = jnp.where(odd_slab, n_cells - 1.0 - ycell, ycell)
    rank = slab * n_cells + ycell_eff
    x = positions[..., 0]
    odd_rank = jnp.mod(rank, 2.0) >= 1.0
    x_eff = jnp.where(odd_rank, box_arr[0] - x, x)
    key = rank * (2.0 * box_arr[0]) + x_eff
    if species_id.ndim == 1:
        sid2 = jnp.broadcast_to(species_id, (f, n))
    else:
        sid2 = species_id
    key = jnp.where(sid2 >= 0, key, jnp.asarray(jnp.inf, key.dtype))
    order = jnp.argsort(key, axis=1)
    pos_s = jnp.take_along_axis(positions, order[..., None], axis=1)
    sid_s = jnp.take_along_axis(sid2, order, axis=1)
    return pos_s, sid_s


@functools.partial(jax.jit, static_argnames=("tc", "n_arcs", "split"))
def _chunk_arcs(pos_s, sid_s, box, cutoff, tc, n_arcs, pos_c=None,
                sid_c=None, split: int = 2):
    """Per-(frame, block) cover of the process flags by <= n_arcs arcs.

    The chunks NOT worth processing are the maximal circular zero-runs of
    the bbox flag row; keeping only the ``n_arcs`` LONGEST gaps open and
    sweeping everything else yields the minimal <= n_arcs-arc cover —
    always a superset of the flagged chunks, never lossy, degrading
    smoothly to the full range when the row is gap-poor.

    ``split`` refines the block bboxes (see :func:`_chunk_skip_bitmap`).

    Returns ``(arcs (rows, 2 * n_arcs) int32, total (rows,) int32)``:
    per-row [(start, count), ...] with unused arcs as (0, 0), and the
    total covered chunk count (the caller's scratch-overflow check).
    """
    flags = _chunk_skip_bitmap(
        pos_s, sid_s, box, cutoff, tc, pos_c=pos_c, sid_c=sid_c,
        split=split,
    )
    return _arcs_from_flags(flags, n_arcs)


@functools.partial(jax.jit, static_argnames=("n_arcs",))
def _arcs_from_flags(flags, n_arcs: int):
    """Cover each flag row by <= n_arcs circular arcs (see _chunk_arcs)."""
    r, c = flags.shape
    if n_arcs > c:  # tiny systems: fewer chunks than requested arcs
        arcs, total = _arcs_from_flags(flags, c)
        pad = jnp.zeros((r, 2 * (n_arcs - c)), arcs.dtype)
        return jnp.concatenate([arcs, pad], axis=1), total
    on = flags == 1
    any_on = jnp.any(on, axis=1)
    all_on = jnp.all(on, axis=1)

    # circular distance from each position to the NEXT set flag: doubled
    # row + reverse cumulative-min of "index of next 1"
    cat = jnp.concatenate([on, on], axis=1)  # (r, 2c)
    iota2 = jnp.arange(2 * c, dtype=jnp.int32)[None, :]
    next_one = jnp.where(cat, iota2, 2 * c)
    next_one = jnp.flip(
        jax.lax.cummin(jnp.flip(next_one, axis=1), axis=1), axis=1
    )[:, :c]  # (r, c) position (in doubled coords) of next set flag >= p

    # maximal zero-run starts (circular) and their lengths
    prev_on = jnp.roll(on, 1, axis=1)
    gap_start = (~on) & prev_on
    gap_len = jnp.where(
        gap_start, next_one - jnp.arange(c, dtype=jnp.int32)[None, :], 0
    )
    # all-zero rows have no gap_start; all-one rows have no gaps — both
    # handled by the selects below
    top_len, top_pos = jax.lax.top_k(gap_len, n_arcs)  # (r, n_arcs)
    kept = top_len > 0  # a zero-length entry is not a gap

    # arcs = complement of the kept gaps, in circular position order:
    # arc i runs from gap i's END to the NEXT kept gap's start
    big = jnp.asarray(2 * c, jnp.int32)
    pos_sorted = jnp.sort(jnp.where(kept, top_pos, big), axis=1)
    len_by_pos = jnp.take_along_axis(
        gap_len, jnp.minimum(pos_sorted, c - 1), axis=1
    )
    k_gaps = jnp.sum(kept, axis=1)  # (r,)
    idx = jnp.arange(n_arcs, dtype=jnp.int32)[None, :]
    valid = idx < k_gaps[:, None]
    nxt = jnp.where(
        idx + 1 < k_gaps[:, None], idx + 1, jnp.zeros_like(idx)
    )
    start = jnp.where(
        valid, (pos_sorted + len_by_pos) % c, 0
    ).astype(jnp.int32)
    next_gap_start = jnp.take_along_axis(pos_sorted, nxt, axis=1)
    count = jnp.where(
        valid, (next_gap_start - start) % c, 0
    ).astype(jnp.int32)
    # k_gaps == 0: either nothing to process (count 0) or everything
    first = idx == 0
    count = jnp.where(
        (k_gaps[:, None] == 0) & first & all_on[:, None], c, count
    )
    count = jnp.where(~any_on[:, None], 0, count)
    arcs = jnp.stack([start, count], axis=2).reshape(r, 2 * n_arcs)
    return arcs, jnp.sum(count, axis=1)


@functools.partial(jax.jit, static_argnames=("tc", "split"))
def _chunk_skip_bitmap(pos_s, sid_s, box, cutoff, tc, pos_c=None,
                       sid_c=None, split: int = 1):
    """Per-(frame, center-block) chunk process flags from bbox distances.

    ``split`` refines each block into that many consecutive sub-blocks
    and ORs their flags: under the brick (z-slab, y) sort a block that
    straddles a slab seam has a full-y bbox spanning ~4 slabs of chunks;
    its two halves are each y-contiguous inside one slab, so the union
    is ~4x tighter (measured max covered 105 -> ~30 of 512 chunks at
    65536 atoms).

    ``pos_s``/``sid_s`` must already be padded to a 128 multiple and
    spatially sorted (:func:`_spatial_sort`). Conservative: a chunk is
    skipped only if the minimum-image gap between the center block's and
    the chunk's bounding boxes exceeds the cutoff, so no in-cutoff pair
    is ever lost; blocks that straddle the periodic seam get whole-box
    bboxes and simply skip nothing. Empty blocks/chunks skip everything
    (their inverted inf bboxes give huge gaps).

    ``pos_c``/``sid_c`` (optional): center STRIPE arrays — a contiguous
    slice of the sorted order (tensor-parallel center sharding). Blocks
    then tile the stripe while chunks still tile the full atom set.

    Returns ``(F * n_blocks, n_chunks) int32`` (1 = process).
    """
    f, n_pad, _ = pos_s.shape
    if pos_c is None:
        pos_c, sid_c = pos_s, sid_s
    nc_pad = pos_c.shape[1]
    n_blocks = nc_pad // tc
    n_chunks = n_pad // 128
    big = jnp.asarray(3e9, pos_s.dtype)

    def bboxes(rows, p_arr, s_arr):
        nn = p_arr.shape[1]
        p = p_arr.reshape(f, nn // rows, rows, 3)
        v = (s_arr >= 0)[..., None].reshape(f, nn // rows, rows, 1)
        lo = jnp.min(jnp.where(v, p, big), axis=2)
        hi = jnp.max(jnp.where(v, p, -big), axis=2)
        return (lo + hi) * 0.5, (hi - lo) * 0.5  # center, half-extent

    rows_c = tc // split if tc % split == 0 and tc // split >= 1 else tc
    cb, hb = bboxes(rows_c, pos_c, sid_c)  # (F, n_blocks * split, 3)
    cc, hc = bboxes(128, pos_s, sid_s)  # (F, n_chunks, 3)
    dd = cb[:, :, None, :] - cc[:, None, :, :]
    if box is not None:
        box_arr = jnp.asarray(box, pos_s.dtype).reshape(3)
        dd = dd - box_arr * jnp.round(dd / box_arr)
    gap = jnp.maximum(
        jnp.abs(dd) - hb[:, :, None, :] - hc[:, None, :, :], 0.0
    )
    process = jnp.sum(gap * gap, axis=-1) <= jnp.asarray(
        cutoff, pos_s.dtype) ** 2 * (1.0 + 1e-5)
    if rows_c != tc:
        process = jnp.any(
            process.reshape(f, n_blocks, tc // rows_c, n_chunks), axis=2
        )
    return process.astype(jnp.int32).reshape(f * n_blocks, n_chunks)


@functools.partial(jax.jit, static_argnames=("tc",))
def _chunk_window(pos_s, sid_s, box, cutoff, tc, pos_c=None, sid_c=None):
    """Per-(frame, block) circular chunk window covering all process flags.

    With z-sorted atoms the bbox process flags form (at most) one
    circular arc per block: valid chunks are consecutive z-slabs, so the
    1-D gap to the block's z-interval is quasi-convex in chunk index
    (modulo the periodic seam). The arc is found as the unique 0->1 run
    start; if the flags are NOT a single arc (empty-chunk holes,
    degenerate geometry), the window falls back to the full range —
    conservative, never lossy.

    Returns ``(F * n_blocks, 2) int32``: (start chunk, chunk count).
    """
    flags = _chunk_skip_bitmap(
        pos_s, sid_s, box, cutoff, tc, pos_c=pos_c, sid_c=sid_c
    )
    r, c = flags.shape
    prev = jnp.roll(flags, 1, axis=1)
    run_start = (flags == 1) & (prev == 0)
    start = jnp.argmax(run_start, axis=1).astype(jnp.int32)
    cnt = jnp.sum(flags, axis=1).astype(jnp.int32)
    ar = jnp.arange(c, dtype=jnp.int32)[None, :]
    arc = ((ar - start[:, None]) % c) < cnt[:, None]
    ok = jnp.all((flags == 0) | arc, axis=1)
    start = jnp.where(ok, start, 0)
    cnt = jnp.where(ok, cnt, c)
    return jnp.stack([start, cnt], axis=1)


def _extract_tc(n_pad: int) -> int:
    return 32 if n_pad <= 16384 else (16 if n_pad <= 32768 else 8)


def _extract_tc_windowed(n_pad: int, w_chunks: int) -> int:
    """Center-block height for the window-relative-scratch extract.

    The six (tc, w_chunks * 128) f32 scratches must fit a ~10 MB scoped
    budget; the narrow window lets tc grow far beyond the full-width
    limit (fewer blocks -> fewer per-block fixed costs)."""
    budget = 10 * 1024 * 1024
    tcw = 128
    while tcw > 8 and 6 * tcw * w_chunks * 128 * 4 > budget:
        tcw //= 2
    return min(tcw, n_pad)


def window_chunk_bound(n_atoms: int, box, cutoff) -> int:
    """Static per-block window-size bound for the z-slab extract.

    1.5x the uniform-density estimate (block + chunk z-extents + the
    2*cutoff slab) plus slack chunks; blocks in z-sparse regions can
    exceed it — the kernel clamps and the caller retries un-windowed.
    Needs STATIC (host) box/cutoff values.
    """
    n_pad = _round_up(n_atoms, 128)
    n_chunks = n_pad // 128
    lz = float(np.asarray(box, np.float64).reshape(3)[2])
    frac = min(1.0, 2.1 * float(cutoff) / max(lz, 1e-30))
    return int(min(n_chunks, np.ceil(1.5 * frac * n_chunks) + 3))


def brick_window_bound(n_atoms: int, box, cutoff, n_arcs: int = 6) -> int:
    """Static per-block total-window bound for the serpentine brick sort.

    A center's in-cutoff atoms span <= 3 consecutive z-slabs; inside each
    the y-window is ~2.1 * cutoff / box_y of the slab's chunks, plus the
    block's own extent (up to a chunk) and one boundary chunk. 1.8x that
    estimate plus per-arc slack, calibrated on uniform boxes (measured
    per-block maxima: 21 of 512 chunks at 65536 atoms / cutoff 3.6, 34 at
    5.5, 18 of 80 at 10240 — all within this bound). Sparse geometries
    can exceed it — the kernel clamps and the caller retries un-windowed.
    Needs STATIC (host) box/cutoff values.
    """
    n_pad = _round_up(n_atoms, 128)
    n_chunks = n_pad // 128
    box_np = np.asarray(box, np.float64).reshape(3)
    n_slabs = max(1, int(box_np[2] // float(cutoff)))
    slab_chunks = n_chunks / n_slabs
    y_frac = min(1.0, 2.1 * float(cutoff) / max(box_np[1], 1e-30))
    per_slab = y_frac * slab_chunks + 2.0
    return int(min(n_chunks, np.ceil(1.8 * 3.0 * per_slab) + n_arcs + 2))


def brick3_window_bound(n_atoms: int, box, cutoff, n_arcs: int = 12) -> int:
    """Static per-block total-window bound for the 3-level brick3 sort.

    A center's in-cutoff atoms span <= 3 slabs x <= 3 y-cells; inside
    each (slab, y-cell) the x-window covers ``(2.1 * cutoff + one
    chunk's x-extent) / box_x`` of the cell's chunks plus ~1.5 boundary
    chunks (cells hold few chunks, so boundaries dominate). 1.75x the
    9-cell estimate plus per-arc slack. Verified against the
    candidate-floor sim's per-block maxima
    (``benchmarks/brick3_bound_check.py``). Sparse geometries can
    exceed it — the kernel clamps and the caller retries un-windowed.
    Needs STATIC (host) box/cutoff values.
    """
    n_pad = _round_up(n_atoms, 128)
    n_chunks = n_pad // 128
    box_np = np.asarray(box, np.float64).reshape(3)
    rc = float(cutoff)
    n_slabs = max(1, int(box_np[2] // rc))
    n_cells = max(1, int(box_np[1] // rc))
    cell_chunks = n_chunks / (n_slabs * n_cells)
    x_frac = min(1.0, 2.1 * rc / max(box_np[0], 1e-30))
    per_cell = x_frac * cell_chunks + 1.5
    return int(min(n_chunks, np.ceil(1.75 * 9.0 * per_cell) + n_arcs + 2))


def extract_e_for(n_atoms: int, box, cutoff, sort: str = "z") -> int:
    """Static sweep-1 extraction depth for the windowed sorted extract.

    The spatial sorts CONCENTRATE a center's neighbors into few chunks
    (the same-slab / adjacent-y ones), so the depth must cover the
    DENSEST chunk's typical count, not the window mean: every leftover
    lane costs one exact-cleanup ``take_min`` over the FULL scratch
    width (``w_chunks`` chunks wide), and with the old uniform-spread
    estimate the cleanup dominated the extract (op-count model share
    0.5-0.96 across 10k-131k atoms; see
    ``benchmarks/extract_e_model.py``). The op-count SIMULATION said the
    cost-optimal depth tracks ``~2.8x the mean nonzero per-chunk count``;
    interleaved HARDWARE curves (r4, healthy chip) put the optimum at
    ``~1.8x`` instead — 10k/3.6: e5 optimal (4.53 ms/frame) vs the old
    e8 (4.65-4.49), 65k brick: e9 (34.74) vs the old e15 (37.2, 1.07x),
    wide 10k/5.5: flat within noise across e10-e17. The mean-nonzero
    estimate below (geometry of the sort's chunk extents, x1.25
    edge-bias factor) matched the simulated distributions within ~25%.
    Overshooting is cheap (sweep-1 cost is linear in ``e``);
    undershooting pays ``w_chunks``-wide sweeps — the x1.8 point keeps
    ~2 extractions of margin over the densest-chunk mean.

    Needs STATIC (host) box/cutoff values — callers with traced values
    keep the default. ``sort`` must match the caller's spatial order
    ("z" or "brick") — the two concentrate differently.
    """
    box_np = np.asarray(box, np.float64).reshape(3)
    volume = float(np.prod(box_np))
    rc = float(cutoff)
    expected = n_atoms / max(volume, 1e-30) * (
        4.0 / 3.0 * np.pi * rc**3
    )
    n_pad = _round_up(max(n_atoms, 1), 128)
    n_chunks = max(n_pad // 128, 1)
    if sort == "brick":
        # a center's nonzero chunks: ~3 slabs (outer two partial —
        # effective 2.2), each contributing the y-window's chunk span
        n_slabs = max(1, int(box_np[2] // max(rc, 1e-30)))
        chunks_per_slab = n_chunks / n_slabs
        y_chunk = box_np[1] * 128.0 * n_slabs / n_pad
        n_nz = 2.2 * (2.0 * rc + y_chunk) / max(box_np[1], 1e-30) \
            * chunks_per_slab
    elif sort == "brick3":
        # ~2.2 slabs x ~2.2 y-cells, each cell contributing the
        # x-window's chunk span (chunks inside a cell are x-runs)
        n_slabs = max(1, int(box_np[2] // max(rc, 1e-30)))
        n_cells = max(1, int(box_np[1] // max(rc, 1e-30)))
        cell_chunks = n_chunks / (n_slabs * n_cells)
        x_chunk = box_np[0] / max(cell_chunks, 1.0)
        n_nz = 2.2 * 2.2 * (2.0 * rc + x_chunk) / max(box_np[0], 1e-30) \
            * cell_chunks
    else:
        # z-sort: chunks overlapping the 2*cutoff z-window
        n_nz = 2.0 * rc / max(box_np[2], 1e-30) * n_chunks + 1.0
    mean_nz = 1.25 * expected / max(min(n_nz, n_chunks), 1.0)
    return int(np.clip(np.ceil(1.8 * mean_nz), 4, 48))


@functools.partial(
    jax.jit,
    static_argnames=("k_n", "interpret", "e_fixed", "w_chunks", "sort",
                     "n_arcs", "tc", "jrow"),
)
def sorted_neighbor_extract(
    positions: jnp.ndarray,  # (F, N, 3)
    species_id: jnp.ndarray,  # (N,) or (F, N)
    box,  # (3,) — required (the z-slab window needs an extent)
    cutoff,
    k_n: int = PALLAS_ADF_K,
    interpret: bool = False,
    e_fixed: int = 4,
    w_chunks: int | None = None,
    sort: str = "z",
    n_arcs: int = 1,
    tc: int | None = None,
    jrow: bool = _JROW_DEFAULT,
):
    """Spatially sorted extract: z-sort + per-block circular chunk window.

    A growing fraction of the O(N^2) distance sweep is skipped as N
    grows (the ~2*cutoff z-slab window shrinks relative to the box).
    Returns ``(rx, ry, rz, d, sid, counts, sid_sorted, overflow)`` with
    the same per-tensor contracts as :func:`_neighbor_extract_pallas` —
    neighbor sets are identical to the unsorted kernel's up to center
    order, and ``sid_sorted (F, Npad)`` is the matching per-frame center
    species.

    ``w_chunks`` (static, from :func:`window_chunk_bound` /
    :func:`brick_window_bound`): enables the window-relative scratch
    layout (much taller center blocks). ``overflow`` (int32 scalar) is 1
    when some block's window exceeded the bound — that run UNDER-COUNTS
    (windows were clamped) and the caller must retry without
    ``w_chunks`` or via the unsorted kernel; with ``w_chunks=None``
    overflow is always 0.

    ``sort="brick"`` orders atoms by (z-slab, y) and covers each block's
    flags with up to ``n_arcs`` (start, count) arcs — the per-block
    sweep shrinks ~2x at 65k atoms vs the single z-arc
    (``benchmarks/brick_window_sim.py``); identical neighbor sets.
    ``sort="brick3"`` adds a third (serpentine x inside y-cells) level —
    wide-cutoff geometries only (see :func:`_brick3_sort`).
    """
    f, n, _ = positions.shape
    n_pad = _round_up(n, 128)
    if n_pad != n:
        positions = jnp.pad(positions, ((0, 0), (0, n_pad - n), (0, 0)))
        species_id = jnp.pad(
            species_id,
            ((0, 0), (0, n_pad - n)) if species_id.ndim == 2
            else (0, n_pad - n),
            constant_values=-1,
        )
    brick = sort in ("brick", "brick3")
    if sort == "brick3":
        pos_s, sid_s = _brick3_sort(
            positions.astype(jnp.float32), species_id, box, cutoff
        )
    elif sort == "brick":
        pos_s, sid_s = _brick_sort(
            positions.astype(jnp.float32), species_id, box, cutoff
        )
    else:
        pos_s, sid_s = _spatial_sort(
            positions.astype(jnp.float32), species_id, box
        )
    if tc is None:
        if w_chunks is not None:
            w_chunks = min(w_chunks, n_pad // 128)
            tc = _extract_tc_windowed(n_pad, w_chunks)
        else:
            tc = _extract_tc(n_pad)
    elif w_chunks is not None:
        w_chunks = min(w_chunks, n_pad // 128)
    if brick:
        win, total = _chunk_arcs(
            pos_s, sid_s, box, cutoff, tc, max(n_arcs, 1)
        )
        covered = jnp.max(total)
    else:
        win = _chunk_window(pos_s, sid_s, box, cutoff, tc)
        covered = jnp.max(win[:, 1])
    if w_chunks is not None:
        overflow = (covered > w_chunks).astype(jnp.int32)
    else:
        overflow = jnp.asarray(0, jnp.int32)
    _, rx, ry, rz, d_n, sid_n, cnt = _neighbor_extract_pallas(
        pos_s, sid_s, box, cutoff, k_n=k_n, interpret=interpret,
        tc=tc, window=win, e_fixed=e_fixed, w_chunks=w_chunks, lean=True,
        jrow=jrow,
    )
    return rx, ry, rz, d_n, sid_n, cnt, sid_s, overflow


@functools.partial(
    jax.jit,
    static_argnames=("k_n", "interpret", "e_fixed", "w_chunks", "n_shards",
                     "sort", "n_arcs", "jrow"),
)
def sorted_neighbor_extract_stripe(
    positions: jnp.ndarray,  # (F, N, 3) — the FULL atom set
    species_id: jnp.ndarray,  # (N,) or (F, N)
    box,
    cutoff,
    rank,  # traced shard index in [0, n_shards)
    n_shards: int,
    k_n: int = PALLAS_ADF_K,
    interpret: bool = False,
    e_fixed: int = 4,
    w_chunks: int | None = None,
    sort: str = "z",
    n_arcs: int = 1,
    jrow: bool = _JROW_DEFAULT,
):
    """Center-STRIPE sorted extract for tensor-parallel ADF.

    Every shard sorts the full per-frame atom set (deterministic, so all
    shards agree on the order; the sort is ~1.5 ms/frame at 10k atoms)
    and extracts neighbors only for its contiguous stripe of the sorted
    centers — stripe ``rank`` of ``n_shards`` — against ALL j-atoms. The
    union of stripes covers every center exactly once, so per-shard
    angle histograms just psum. Returns
    ``(rx, ry, rz, d, sid, counts, sid_centers, overflow)`` shaped over
    the ``N/n_shards`` local centers.
    """
    f, n, _ = positions.shape
    n_pad = _round_up(n, 128)
    assert n_pad % n_shards == 0 and (n_pad // n_shards) % 128 == 0, (
        "stripe width must stay 128-aligned: pad the atom count to "
        f"128 * n_shards (got {n_pad} over {n_shards})"
    )
    if n_pad != n:
        positions = jnp.pad(positions, ((0, 0), (0, n_pad - n), (0, 0)))
        species_id = jnp.pad(
            species_id,
            ((0, 0), (0, n_pad - n)) if species_id.ndim == 2
            else (0, n_pad - n),
            constant_values=-1,
        )
    brick = sort in ("brick", "brick3")
    if sort == "brick3":
        pos_s, sid_s = _brick3_sort(
            positions.astype(jnp.float32), species_id, box, cutoff
        )
    elif sort == "brick":
        pos_s, sid_s = _brick_sort(
            positions.astype(jnp.float32), species_id, box, cutoff
        )
    else:
        pos_s, sid_s = _spatial_sort(
            positions.astype(jnp.float32), species_id, box
        )
    n_local = n_pad // n_shards
    lo = jnp.asarray(rank, jnp.int32) * n_local
    pos_c = jax.lax.dynamic_slice_in_dim(pos_s, lo, n_local, axis=1)
    sid_c = jax.lax.dynamic_slice_in_dim(sid_s, lo, n_local, axis=1)
    if w_chunks is not None:
        w_chunks = min(w_chunks, n_pad // 128)
        tc = min(_extract_tc_windowed(n_pad, w_chunks), n_local)
    else:
        tc = min(_extract_tc(n_pad), n_local)
    if brick:
        win, total = _chunk_arcs(
            pos_s, sid_s, box, cutoff, tc, max(n_arcs, 1),
            pos_c=pos_c, sid_c=sid_c,
        )
        covered = jnp.max(total)
    else:
        win = _chunk_window(
            pos_s, sid_s, box, cutoff, tc, pos_c=pos_c, sid_c=sid_c
        )
        covered = jnp.max(win[:, 1])
    if w_chunks is not None:
        overflow = (covered > w_chunks).astype(jnp.int32)
    else:
        overflow = jnp.asarray(0, jnp.int32)
    _, rx, ry, rz, d_n, sid_n, cnt = _neighbor_extract_pallas(
        pos_s, sid_s, box, cutoff, k_n=k_n, interpret=interpret,
        tc=tc, window=win, e_fixed=e_fixed, w_chunks=w_chunks, lean=True,
        centers=(pos_c, sid_c, lo), jrow=jrow,
    )
    return rx, ry, rz, d_n, sid_n, cnt, sid_c, overflow


@functools.partial(jax.jit, static_argnames=("k_n", "interpret"))
def neighbor_indices_pallas(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    box,
    cutoff,
    k_n: int = PALLAS_ADF_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-center in-cutoff neighbor indices (see the extract kernel).

    Returns ``idx (F, Npad, k_n) int32`` with ``-1`` for empty slots.
    """
    return _neighbor_extract_pallas(
        positions, species_id, box, cutoff, k_n=k_n, interpret=interpret
    )[0]


def _pad_sid(species_id, n_pad):
    n = species_id.shape[0]
    if n_pad != n:
        species_id = jnp.pad(
            species_id, (0, n_pad - n), constant_values=-1
        )
    return species_id


@functools.partial(jax.jit, static_argnames=("k_n", "interpret"))
def pallas_neighbor_lists(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff,
    k_n: int = PALLAS_ADF_K,
    interpret: bool = False,
):
    """Stage-1 neighbor tensors via the Pallas extract kernel.

    Same return contract as :func:`adf_neighbor_lists`:
    ``(r_n, d_n, sid_n, sid_pad, max_count)`` with the atom axis padded to
    a 128 multiple. All tensors come straight out of the kernel — no XLA
    gather / post-processing pass.
    """
    _, rx, ry, rz, d_n, sid_n, cnt = _neighbor_extract_pallas(
        positions, species_id, box, cutoff, k_n=k_n, interpret=interpret,
        lean=True,
    )
    r_n = jnp.stack([rx, ry, rz], axis=-1)
    return (
        r_n, d_n, sid_n, _pad_sid(species_id, rx.shape[1]),
        jnp.max(cnt).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("k_n", "interpret"))
def pallas_neighbor_components(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff,
    k_n: int = PALLAS_ADF_K,
    interpret: bool = False,
):
    """Stage-1 neighbor tensors in SoA (per-component) form.

    Like :func:`pallas_neighbor_lists` but returns
    ``((rx, ry, rz), d_n, sid_n, sid_pad, max_count)`` with each
    component ``(F, Np, K)`` — exactly the layout the Pallas angle stage
    consumes, with no relayouts anywhere.
    """
    _, rx, ry, rz, d_n, sid_n, cnt = _neighbor_extract_pallas(
        positions, species_id, box, cutoff, k_n=k_n, interpret=interpret,
        lean=True,
    )
    return (
        (rx, ry, rz), d_n, sid_n, _pad_sid(species_id, rx.shape[1]),
        jnp.max(cnt).astype(jnp.int32),
    )


# ------------------------------------------------------ stage 2: the kernel
@functools.partial(
    jax.jit,
    static_argnames=(
        "n_bins", "n_species", "norm_power", "pack", "fold", "fold_chunk",
        "interpret", "tc",
    ),
)
def adf_pairs_histogram_pallas(
    r_n: jnp.ndarray,  # (F, N, K, 3) neighbor displacements
    d_n: jnp.ndarray,  # (F, N, K) neighbor distances
    sid_n: jnp.ndarray,  # (F, N, K) neighbor species, -1 invalid
    sid_c: jnp.ndarray,  # (N,) center species, -1 padding
    n_bins: int,
    n_species: int,
    norm_power: int = 4,
    pack: int = 1,
    counts: jnp.ndarray | None = None,
    fold: bool = False,
    fold_chunk: bool | None = None,
    interpret: bool = False,
    tc: int | None = None,
) -> jnp.ndarray:
    """Fused ordered-pair angle histogram from neighbor lists.

    Returns (n_triples, n_bins) f32 weighted counts (not density
    normalised), identical semantics to the angle stage of
    ``adf_histogram_neighbors``.

    ``pack`` packs that many centers' neighbor sub-lists side by side in
    each 128-lane row (callers slice each center's list to ``k//pack``
    slots and reshape — valid only when no center has more neighbors than
    that). The K x K tile then carries ``pack`` independent sub-blocks, so
    the per-element VPU cost drops ~``pack``x at low neighbor counts.
    With ``pack > 1`` pass ``sid_c`` as the packed per-lane center-species
    ROW array ``(n_rows_per_frame, K)`` instead of ``(N,)``.

    ``counts`` (optional, ``(F, n_rows, pack)`` int32 valid-slot counts
    per sub-list, as emitted by the extract kernel) lets the kernel SKIP
    j-chunks that lie entirely beyond a sub-list's contiguous valid
    prefix — an SMEM scalar predicate per chunk, no vector->scalar
    stalls. At first-shell occupancies this halves the tile work.

    ``fold`` enumerates each UNORDERED pair once instead of both ordered
    pairs — the element count (the VPU bottleneck) halves. Row ``d`` of a
    tile pairs lane ``l`` with its sub-list's lane ``(l - d) mod sub``
    (two strided ``pltpu.roll``s + a wrap select build the j-operands; no
    MXU transpose picks), ``d = 1 .. sub/2`` with the self-diagonal gone
    by construction. Identical semantics: an unordered pair contributes
    its ordered pair exactly once when the neighbor species differ (keyed
    by ``(min, max)``) and twice when equal — folded in as a 2x weight.
    """
    if isinstance(r_n, (tuple, list)):
        rx, ry, rz = r_n  # SoA components (F, N, K) — no relayout needed
    else:
        rx, ry, rz = r_n[..., 0], r_n[..., 1], r_n[..., 2]
    f, n, k = rx.shape[:3]
    assert k % 128 == 0 and k >= 128, (
        f"neighbor-list width must be a positive multiple of 128, got {k}"
    )
    if pack == 1 and sid_c.ndim == 1:
        assert sid_c.shape[0] == n, (
            f"center species length {sid_c.shape[0]} != padded atom count "
            f"{n} — pass the padded sid returned by adf_neighbor_lists"
        )
        sid_c = jnp.broadcast_to(
            sid_c.astype(jnp.float32)[:, None], (n, k)
        )
    per_frame_centers = sid_c.ndim == 3
    if per_frame_centers:
        # per-frame center species (sorted-extract path): (F, n, 1)
        # broadcasts across lanes, (F, n, K) is the packed per-lane form
        assert sid_c.shape[:2] == (f, n) and sid_c.shape[2] in (1, k), (
            f"per-frame center species must be ({f}, {n}, 1|{k}), "
            f"got {sid_c.shape}"
        )
    else:
        assert sid_c.shape == (n, k), (
            f"packed center species must be {(n, k)}, got {sid_c.shape}"
        )
    assert k % pack == 0
    n_triples = n_species * (n_species + 1) * (n_species + 2) // 6
    n_total_bins = n_triples * n_bins
    # near-balanced (hi, lo) id split: the one-hot build costs
    # (k_lo + 2*hi_pad) compare-rows per element, minimised at
    # k_lo ~ sqrt(2 * total) (the hi side is duplicated for the two
    # bf16 weight halves)
    k_lo = min(128, _round_up(int(np.ceil(np.sqrt(2.0 * n_total_bins))), 32))
    n_hi = -(-n_total_bins // k_lo)
    hi_pad = _round_up(n_hi, 8)
    k_pad = _round_up(k_lo, 128)

    rows = f * n
    # centers per grid step: taller blocks amortise per-program fixed
    # costs over more centers (the r4 tile lesson from the RDF kernel);
    # per-program VMEM is only 6 x (tc, K) f32 input blocks
    tc = _TC if tc is None else int(tc)
    rows_pad = _round_up(rows, tc)
    lo_r, hi_r = ADF_BIN_RANGE
    inv_bw = n_bins / (hi_r - lo_r)

    # row layout only. The j-side (CR, 1) operands are reconstructed
    # IN-KERNEL by a one-hot MXU transpose of the row — the previous
    # host-side flat (rows*K, 1) column arrays are 128x lane-padded in
    # HBM by current libtpu (4 GB each at 65k atoms x 2 frames: OOM).
    def row_of(x):  # (F, N, K) -> (rows_pad, K)
        flat = x.reshape(rows, k)
        if rows_pad != rows:
            flat = jnp.pad(flat, ((0, rows_pad - rows), (0, 0)))
        return flat

    xr = row_of(rx.astype(jnp.float32))
    yr = row_of(ry.astype(jnp.float32))
    zr = row_of(rz.astype(jnp.float32))
    dr = row_of(d_n.astype(jnp.float32))
    sr = row_of(sid_n.astype(jnp.float32))
    if per_frame_centers:
        sid_center = jnp.broadcast_to(
            sid_c.astype(jnp.float32), (f, n, k)
        ).reshape(rows, k)
    else:
        sid_center = jnp.tile(sid_c.astype(jnp.float32), (f, 1))
    if rows_pad != rows:
        sid_center = jnp.pad(
            sid_center, ((0, rows_pad - rows), (0, 0)), constant_values=-1.0
        )  # (rows_pad, K) per-lane center species
    if counts is None:
        cnts = jnp.full((rows_pad, pack), k // pack, jnp.int32)
    else:
        cnts = counts.astype(jnp.int32).reshape(rows, pack)
        if rows_pad != rows:
            cnts = jnp.pad(cnts, ((0, rows_pad - rows), (0, 0)))

    n_chunks = k // _CR
    n_blocks = rows_pad // tc
    s_f = float(n_species)
    sub = k // pack
    # Dense-packed path (pack > 1): in the generic chunk layout only the
    # same-sub-list lane pairs survive the mask, so (pack-1)/pack of every
    # chunk's element work is waste. Instead each row-slice pairs slot
    # ``local`` of EVERY sub-list against that sub-list's own lanes: the
    # j-operands become (RS, K) block matrices (per-sub-list one-hot picks
    # masked to their own lane blocks) and every lane is a useful
    # same-center pair. 8-row slices skip past the valid prefix.
    dense = pack > 1 and not fold
    if dense:
        assert sub % _RS == 0
    n_slices = sub // _RS
    # Folded path: offsets d = 1 .. sub/2, _FRS offsets per tile (taller
    # tiles amortise per-iteration row loads and feed the one-hot MXU
    # contraction bigger operands; measured 47 -> 31 ms/frame at
    # pack == 1, 10240 atoms going 8 -> 32)
    n_off = sub // 2
    frs = min(_FRS, n_off)
    if fold:
        assert n_off % frs == 0
    n_fslices = n_off // frs
    buf_rows = frs if fold else (_RS if dense else _CR)
    # Lane-chunking gate: callers with a density model (the plan) pass
    # fold_chunk — it only pays when the TYPICAL row leaves whole chunks
    # past its count (see _AdfPlan._normalise). Default on at K > 128
    # for hint-less callers; LATPU_ADF_FOLD_CHUNK is the A/B kill-switch
    # (read at trace time — fresh pipelines pick up changes, cached jits
    # do not; A/B kernel variants one process per arm).
    import os

    env_fc = os.environ.get("LATPU_ADF_FOLD_CHUNK")
    if env_fc is not None:
        fold_chunk = env_fc != "0"
    elif fold_chunk is None:
        fold_chunk = True
    fold_chunked = fold and pack == 1 and k > 128 and fold_chunk

    def kernel(
        xr_ref, yr_ref, zr_ref, dr_ref, sr_ref,
        sidc_ref, cnts_ref, out_ref, acc_ref,
        comb_buf, w_buf, *roll_scr,
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # stacked one-hot rows: rows [0, hi_pad) select the high weight
        # half, rows [hi_pad, 2 hi_pad) the low half -> ONE matmul for
        # both. Compares stay f32 — the v5e VPU has no bf16 vector
        # compare ("Target does not support this comparison").
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
            # skip chunks entirely beyond the center's valid prefix
            # (valid slots are contiguous; counts from SMEM)

            @pl.when(ch * _CR < cnts_ref[c, 0])
            def _process():
                _chunk_work(c, ch)
            return 0

        def _chunk_work(c, ch):
            # k-side: the center's full neighbor row
            row = pl.ds(c, 1)
            xk = xr_ref[row, :]  # (1, K)
            yk = yr_ref[row, :]
            zk = zr_ref[row, :]
            dk = dr_ref[row, :]
            sk = sr_ref[row, :]
            sa = sidc_ref[row, :]  # (1, K) per-lane center species
            # j-side: CR of the center's neighbor slots as (CR, 1)
            # sublane vectors — one-hot MXU transpose of the row (a
            # one-hot x f32 dot at HIGHEST is exact: the only nonzero
            # term is value * 1.0)
            sel = jnp.where(
                (ch * _CR + jax.lax.broadcasted_iota(
                    jnp.int32, (_CR, 1), 0
                )) == jax.lax.broadcasted_iota(jnp.int32, (1, k), 1),
                1.0, 0.0,
            )  # (CR, K)

            def pick(row_vals):
                return jax.lax.dot_general(
                    sel, row_vals,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (CR, 1)

            j_slot = ch * _CR + jax.lax.broadcasted_iota(
                jnp.int32, (_CR, 1), 0
            )
            _tile(
                sa, xk, yk, zk, dk, sk,
                pick(xk), pick(yk), pick(zk), pick(dk), pick(sk), j_slot,
            )

        def dense_body(step, _):
            c = step // n_slices
            sl = step % n_slices
            # rows at/past every sub-list's valid prefix do nothing
            mx = cnts_ref[c, 0]
            for q in range(1, pack):
                mx = jnp.maximum(mx, cnts_ref[c, q])

            @pl.when(sl * _RS < mx)
            def _process():
                _dense_work(c, sl)
            return 0

        def _dense_work(c, sl):
            row = pl.ds(c, 1)
            xk = xr_ref[row, :]  # (1, K)
            yk = yr_ref[row, :]
            zk = zr_ref[row, :]
            dk = dr_ref[row, :]
            sk = sr_ref[row, :]
            sa = sidc_ref[row, :]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
            local = sl * _RS + jax.lax.broadcasted_iota(
                jnp.int32, (_RS, 1), 0
            )  # (RS, 1) local slot per row
            # j-operands as (RS, K) block matrices: lane k pairs slot
            # ``local`` of ITS OWN sub-list. Built by per-sub-list one-hot
            # MXU picks (exact at HIGHEST) masked to that sub-list's lane
            # block — the blocks are disjoint, so the sum places each
            # sub-list's value exactly once.
            xj = jnp.zeros((_RS, k), jnp.float32)
            yj = jnp.zeros((_RS, k), jnp.float32)
            zj = jnp.zeros((_RS, k), jnp.float32)
            dj = jnp.zeros((_RS, k), jnp.float32)
            sj = jnp.zeros((_RS, k), jnp.float32)
            for q in range(pack):
                sel = jnp.where(lane == q * sub + local, 1.0, 0.0)  # (RS,K)
                qm = jnp.where(
                    (lane >= q * sub) & (lane < (q + 1) * sub), 1.0, 0.0
                )  # (1, K)

                def pick(row_vals, sel=sel):
                    return jax.lax.dot_general(
                        sel, row_vals,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (RS, 1)

                xj = xj + pick(xk) * qm
                yj = yj + pick(yk) * qm
                zj = zj + pick(zk) * qm
                dj = dj + pick(dk) * qm
                sj = sj + pick(sk) * qm
            j_slot = (lane // sub) * sub + local  # (RS, K)
            _tile(sa, xk, yk, zk, dk, sk, xj, yj, zj, dj, sj, j_slot)

        def fold_body(step, _):
            c = step // n_fslices
            sl = step % n_fslices
            mx = cnts_ref[c, 0]
            for q in range(1, pack):
                mx = jnp.maximum(mx, cnts_ref[c, q])
            d0 = sl * frs + 1
            # prefix-contiguous sub-lists leave offsets in [cnt, sub-cnt]
            # with no valid pair: keep slices holding a direct-pair offset
            # (d < cnt) or a wrapped-pair offset (d > sub - cnt)
            @pl.when((d0 < mx) | (d0 + frs - 1 > sub - mx))
            def _process():
                _fold_work(c, sl, mx)
            return 0

        def _fold_work(c, sl, mx):
            row = pl.ds(c, 1)
            xk = xr_ref[row, :]  # (1, K)
            yk = yr_ref[row, :]
            zk = zr_ref[row, :]
            dk = dr_ref[row, :]
            sk = sr_ref[row, :]
            sa = sidc_ref[row, :]
            d0 = sl * frs + 1
            d_row = d0 + jax.lax.broadcasted_iota(
                jnp.int32, (frs, 1), 0
            )  # (frs, 1) pair offset per row
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
            l_loc = lane - (lane // sub) * sub
            # j-operands: row d pairs lane l with ITS sub-list's lane
            # (l_loc - d) mod sub. A full-row roll by d lands in the same
            # sub-list except for the first d lanes, which wrap into the
            # previous block — those take the roll by d + (k - sub)
            # instead (same block, offset d, modulo sub). Strided rolls
            # give every row its own offset in one op.
            wrap = l_loc < d_row  # (RS, K)

            def rot(v):
                vb = jnp.broadcast_to(v, (frs, k))
                a = pltpu.roll(vb, d0, axis=1, stride=1, stride_axis=0)
                if sub == k:
                    return a
                b = pltpu.roll(
                    vb, d0 + (k - sub), axis=1, stride=1, stride_axis=0
                )
                return jnp.where(wrap, b, a)

            if fold_chunked:
                # triangle lane-chunking: valid slots are a contiguous
                # prefix of the row, so every 128-lane chunk starting at
                # or past the count holds only masked pairs (each valid
                # pair's i-lane l is < count; rolled j-operands may point
                # past it but those elements are species-masked anyway).
                # At mid-occupancy rows (reference-default cutoffs put
                # ~c = K/2.6 valid slots in the 2x-margin row) this skips
                # the majority of the dense stage-2 element work exactly.
                # Rolls stay full-width (they cross chunk boundaries);
                # the rolled values round-trip through a VMEM scratch so
                # each chunk's operands are ALIGNED LOADS — value-level
                # lane slices carry an offset layout Mosaic cannot
                # broadcast ("Invalid input layout" on (1, 128) slices).
                roll_buf = roll_scr[0]
                roll_buf[0:frs, :] = rot(xk)
                roll_buf[frs : 2 * frs, :] = rot(yk)
                roll_buf[2 * frs : 3 * frs, :] = rot(zk)
                roll_buf[3 * frs : 4 * frs, :] = rot(dk)
                roll_buf[4 * frs : 5 * frs, :] = rot(sk)
                # the (1, K) row values also stage through the scratch:
                # their ref rows are DYNAMIC (the center id), and Mosaic
                # rejects dynamic-sublane loads with partial lane slices
                # ("dynamic load with unaligned indices") — a static
                # scratch row makes every chunk load fully static
                base = 5 * frs
                roll_buf[base : base + 1, :] = xk
                roll_buf[base + 1 : base + 2, :] = yk
                roll_buf[base + 2 : base + 3, :] = zk
                roll_buf[base + 3 : base + 4, :] = dk
                roll_buf[base + 4 : base + 5, :] = sk
                roll_buf[base + 5 : base + 6, :] = sa
                for ch in range(k // 128):
                    lo_l = ch * 128

                    @pl.when(lo_l < mx)
                    def _chunk(lo_l=lo_l):
                        ds_ = pl.ds(lo_l, 128)
                        lane_c = lo_l + jax.lax.broadcasted_iota(
                            jnp.int32, (1, 128), 1
                        )
                        l_loc_c = lane_c - (lane_c // sub) * sub
                        _tile(
                            roll_buf[base + 5 : base + 6, ds_],
                            roll_buf[base : base + 1, ds_],
                            roll_buf[base + 1 : base + 2, ds_],
                            roll_buf[base + 2 : base + 3, ds_],
                            roll_buf[base + 3 : base + 4, ds_],
                            roll_buf[base + 4 : base + 5, ds_],
                            roll_buf[0:frs, ds_],
                            roll_buf[frs : 2 * frs, ds_],
                            roll_buf[2 * frs : 3 * frs, ds_],
                            roll_buf[3 * frs : 4 * frs, ds_],
                            roll_buf[4 * frs : 5 * frs, ds_],
                            None,
                            fold_dedup=(d_row, l_loc_c),
                        )
            else:
                _tile(
                    sa, xk, yk, zk, dk, sk,
                    rot(xk), rot(yk), rot(zk), rot(dk), rot(sk),
                    None, fold_dedup=(d_row, l_loc),
                )

        def _tile(
            sa, xk, yk, zk, dk, sk, xj, yj, zj, dj, sj, j_slot,
            fold_dedup=None,
        ):
            """Angle/bin/one-hot/MXU accumulation over one operand tile.

            j-operands are (rows, 1) columns on the pack == 1 path and
            (rows, K) block matrices on the dense-packed path; every op
            below broadcasts over either layout.
            """
            g = xj * xk + yj * yk + zj * zk  # (rows, K)
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
            if fold_dedup is None:
                b_id = sj
                c_id = sk
                ordered = (sa <= b_id) & (b_id <= c_id)
                pair_ok = j_slot != k_slot
            else:
                # folded: key the unordered pair by (min, max); self-pairs
                # are gone by construction (d >= 1), but offset sub/2
                # enumerates each pair at both of its lanes — keep one
                d_row, l_loc = fold_dedup
                b_id = jnp.minimum(sj, sk)
                c_id = jnp.maximum(sj, sk)
                ordered = sa <= b_id
                pair_ok = (d_row != sub // 2) | (l_loc >= sub // 2)
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

            mask = (
                ordered
                & (sa >= 0.0)
                & (sj >= 0.0)
                & (sk >= 0.0)
                & pair_ok
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
            if fold_dedup is None:
                w = jnp.where(mask, result, 0.0)
            else:
                # an unordered same-species pair stands for both of its
                # ordered pairs (2x is exact in f32 and keeps both bf16
                # halves representable); a mixed pair for exactly one
                w = jnp.where(
                    mask, jnp.where(sj == sk, result + result, result), 0.0
                )

            combined = jnp.where(mask, t_id, 0.0) * float(n_bins) + bin_f
            # masked elements park at id hi_pad * k_lo: hi lands exactly
            # on the out-of-range hi_pad row (zero one-hot column), so no
            # separate mask select is needed after the flatten
            comb_m = jnp.where(mask, combined, float(hi_pad) * k_lo)

            # flatten through VMEM scratch with TWO stores per row (was
            # four): hi/lo split and the bf16 weight halves are derived
            # in the flat layout, where they cost k/(rows*k) as much.
            # Chunked fold tiles are 128 lanes wide — the flatten packs
            # them into a 128-aligned PREFIX of the buffer and the
            # one-hot/MXU stages read only that slice.
            lw = xk.shape[-1]
            for r in range(buf_rows):
                lanes = pl.ds(r * lw, lw)
                comb_buf[0:1, lanes] = comb_m[r : r + 1, :]
                w_buf[0:1, lanes] = w[r : r + 1, :]

            comb_flat = comb_buf[0:1, 0 : buf_rows * lw]  # (1, rows*lw)
            hi_flat = jnp.floor(comb_flat * (1.0 / k_lo))
            lo_flat = comb_flat - hi_flat * k_lo
            # weight halves, both exactly bf16-representable but kept in
            # f32: Mosaic cannot relayout an f32-compare mask onto bf16
            # select operands, so the selects run in f32 and the results
            # convert (losslessly) to bf16 for the MXU.
            w_flat = w_buf[0:1, 0 : buf_rows * lw]
            wh = w_flat.astype(jnp.bfloat16).astype(jnp.float32)
            wl = w_flat - wh

            oh_lo = jnp.where(lo_flat == lo_ids, 1.0, 0.0).astype(
                jnp.bfloat16
            )  # (LO, CR*K)
            sel_w = jnp.where(row_is_high, wh, wl)
            oh_hi = jnp.where(hi_flat == hi_ids2, sel_w, 0.0).astype(
                jnp.bfloat16
            )  # (2 HI, CR*K); both weight halves are bf16-representable
            out2 = jax.lax.dot_general(
                oh_hi, oh_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2 HI, LO)
            acc_ref[:, 0:k_lo] += (
                out2[0:hi_pad, :] + out2[hi_pad : 2 * hi_pad, :]
            )

        if fold:
            jax.lax.fori_loop(0, tc * n_fslices, fold_body, 0)
        elif dense:
            jax.lax.fori_loop(0, tc * n_slices, dense_body, 0)
        else:
            jax.lax.fori_loop(0, tc * n_chunks, chunk_body, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_ref[...]

    row_spec = pl.BlockSpec(
        (tc, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    cnts_spec = pl.BlockSpec(
        (tc, pack), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[row_spec] * 6 + [cnts_spec],
        out_specs=pl.BlockSpec(
            (hi_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hi_pad, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hi_pad, k_pad), jnp.float32),
            pltpu.VMEM((1, buf_rows * k), jnp.float32),
            pltpu.VMEM((1, buf_rows * k), jnp.float32),
        ]
        + (
            # rolled j-operand + row-value relayout staging for the
            # lane-chunked fold (5*frs rolled rows + 6 (1, K) row values)
            [pltpu.VMEM((5 * frs + 8, k), jnp.float32)]
            if fold_chunked
            else []
        ),
        interpret=interpret,
    )(xr, yr, zr, dr, sr, sid_center, cnts)

    flat = out[:, :k_lo].reshape(-1)[:n_total_bins]
    return flat.reshape(n_triples, n_bins)


def auto_neighbor_lists(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff,
    k_n: int = PALLAS_ADF_K,
    interpret: bool = False,
):
    """Neighbor lists via the best stage-1 for the backend and size.

    TPU (or interpret mode) with <= ``_JCAP`` atoms: the Pallas
    min-extraction index kernel (:func:`neighbor_indices_pallas`). Very
    large N with >= 3 cells per box edge: cell lists (``ops.cells``).
    Otherwise the O(N^2) masked ``top_k``. Returns the
    ``adf_neighbor_lists`` tuple.
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
        if (interpret or jax.default_backend() == "tpu") and (
            _round_up(n, 128) <= _JCAP
        ):
            return pallas_neighbor_lists(
                positions, species_id, box, cutoff, k_n=k_n,
                interpret=interpret,
            )
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


def adf_stage2_auto(
    r_n,
    d_n: jnp.ndarray,
    sid_n: jnp.ndarray,
    sid_pad: jnp.ndarray,
    n_bins: int,
    n_species: int,
    *,
    norm_power: int = 4,
    pack: int = 1,
    counts: jnp.ndarray | None = None,
    per_frame_sid: bool = False,
    fold: bool = True,
    fold_chunk: bool | None = None,
    interpret: bool = False,
    tc: int | None = None,
) -> jnp.ndarray:
    """Angle stage with the center-packing plumbing shared by callers.

    Handles the sub-list repack for ``pack > 1`` (first ``K/pack``
    neighbor slots of ``pack`` consecutive centers share a row), the
    per-lane center-species forms — static ``(Npad,)`` or per-frame
    ``(F, Npad)`` from the sorted extract (sorting permutes atoms per
    frame) — and the counts reshape for the chunk/row-slice skips.
    """
    k = (r_n[0] if isinstance(r_n, (tuple, list)) else r_n).shape[2]
    f, n_pad = d_n.shape[0], d_n.shape[1]
    if pack > 1 and n_pad % pack == 0:
        sub, rows = k // pack, n_pad // pack

        def repack(x):
            return x[:, :, :sub].reshape(f, rows, k)

        if isinstance(r_n, (tuple, list)):
            r_n = tuple(repack(c) for c in r_n)
        else:
            r_n = r_n[:, :, :sub].reshape(f, rows, k, 3)
        d_n = repack(d_n)
        sid_n = repack(sid_n)
        if per_frame_sid:
            sid_arg = jnp.repeat(
                sid_pad.reshape(f, rows, pack).astype(jnp.float32),
                sub, axis=2,
            )
        else:
            sid_arg = jnp.repeat(
                sid_pad.reshape(rows, pack).astype(jnp.float32),
                sub, axis=1,
            )
        if counts is not None:
            counts = jnp.minimum(counts, sub).reshape(f, rows, pack)
        eff_pack = pack
    else:
        sid_arg = (
            sid_pad.astype(jnp.float32)[..., None]
            if per_frame_sid else sid_pad
        )
        if counts is not None and counts.ndim == 2:
            counts = counts[..., None]
        eff_pack = 1
    return adf_pairs_histogram_pallas(
        r_n, d_n, sid_n, sid_arg, n_bins, n_species,
        norm_power=norm_power, pack=eff_pack, counts=counts, fold=fold,
        fold_chunk=fold_chunk, interpret=interpret, tc=tc,
    )


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

    When the DENSITY-expected neighbor count fits in ``k_n // p`` slots
    the angle stage runs center-PACKED (p centers per 128-lane row, p in
    {4, 2}) — the K x K tile work drops ~p-fold at first-shell cutoffs.
    The decision is static (a data-dependent one would cost a blocking
    device->host sync per call); if the realised counts overflow the
    packed sub-lists, the returned ``max_count`` is clamped to ``k_n`` so
    existing callers' saturation-retry logic re-runs with a larger K.
    """
    n = positions.shape[1]
    use_components = (
        interpret or jax.default_backend() == "tpu"
    ) and _round_up(n, 128) <= _JCAP
    per_frame_sid = False
    if use_components and box is not None and n >= 4096:
        # z-sorted extract: the circular chunk window skips j-chunks
        # outside the ~2*cutoff slab (box/cutoff must be concrete here).
        # No w_chunks here: the one-shot entry has no overflow-retry
        # loop, so it keeps the always-correct full-width scratch.
        e_fix = extract_e_for(n, np.asarray(box), float(cutoff))
        rx, ry, rz, d_n, sid_n, cnt, sid_s, _ = sorted_neighbor_extract(
            positions, species_id, box, cutoff, k_n=k_n,
            interpret=interpret, e_fixed=e_fix,
        )
        r_n = (rx, ry, rz)
        sid_pad = sid_s  # (F, Npad): sorting permutes atoms per frame
        per_frame_sid = True
        max_count = jnp.max(cnt).astype(jnp.int32)
        counts = cnt  # (F, n_pad) — enables the angle stage's chunk skip
        k = rx.shape[2]
        n_pad = rx.shape[1]
    elif use_components:
        _, rx, ry, rz, d_n, sid_n, cnt = _neighbor_extract_pallas(
            positions, species_id, box, cutoff, k_n=k_n,
            interpret=interpret, lean=True,
        )
        r_n = (rx, ry, rz)
        sid_pad = _pad_sid(species_id, rx.shape[1])
        max_count = jnp.max(cnt).astype(jnp.int32)
        counts = cnt
        k = rx.shape[2]
        n_pad = rx.shape[1]
    else:
        r_n, d_n, sid_n, sid_pad, max_count = auto_neighbor_lists(
            positions, species_id, box, cutoff, k_n=k_n, interpret=interpret
        )
        counts = None
        k = r_n.shape[2]
        n_pad = r_n.shape[1]
    pack = 1
    if box is not None:
        volume = float(np.prod(np.asarray(box)))
        rho = positions.shape[1] / max(volume, 1e-30)
        expected = rho * 4.0 / 3.0 * np.pi * float(cutoff) ** 3
        for p in (4, 2):
            if (
                int(np.ceil(1.5 * expected)) + 8 <= k // p
                and n_pad % p == 0
            ):
                pack = p
                break
    if pack > 1:
        # overflowed sub-lists are invisible to the packed stage — report
        # them as saturation so callers retry
        max_count = jnp.where(max_count > k // pack, k_n, max_count)
    hist = adf_stage2_auto(
        r_n, d_n, sid_n, sid_pad, n_bins, n_species,
        norm_power=norm_power, pack=pack, counts=counts,
        per_frame_sid=per_frame_sid, fold=True, interpret=interpret,
    )
    return hist, max_count
