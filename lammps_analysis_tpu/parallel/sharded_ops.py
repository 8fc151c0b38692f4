"""Multi-device wrappers around the analysis kernels.

Frame batches shard over the ``data`` mesh axis with ``shard_map``; each
device computes a partial histogram / correlation sum over its frame shard
and the partials merge with ``psum`` over ICI. This is the TPU-native
replacement for the reference's sequential batch loops (SURVEY §2.7) —
identical numerics, device-parallel execution.
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import adf as adf_ops
from ..ops import msd as msd_ops
from ..ops import rdf as rdf_ops
from .mesh import get_default_mesh


def _n_mesh_devices(mesh) -> int:
    return int(mesh.devices.size)


# VMEM budget for the Pallas RDF kernel's lane-padded column operands;
# module-level so tests can exercise the XLA fallback at small N
PALLAS_RDF_VMEM_BUDGET = 60 * 2**20

# Largest atom count (after kernel padding) hardware-verified through the
# fused Pallas kernel at one frame per call: flat 20.6-20.9 Gpairs/s at
# 393216 / 524288 / 786432 / 1048576 on v5e
# (benchmarks/large_n_scaling.json::rdf_large_n). A single frame's
# VMEM-resident rows are only n*4*8 bytes (33.5 MB at this cap, of the
# 128 MB device VMEM; the kernel's scoped scratch is N-independent), so
# the binding constraint is verification, not the budget model below.
PALLAS_RDF_SINGLE_FRAME_N_MAX = 1048576


def pallas_rdf_frames_per_call(n_padded: int) -> int:
    """Frames per fused-kernel call for a system padded to ``n_padded``.

    0 means even one frame is beyond the verified envelope — the caller
    must use the HBM-tiled XLA kernel. The many-frame sizing keeps 16x
    headroom over the raw (F, N) row bytes for histogram scratch and
    working tiles (32 frames at 10k atoms); below its floor, a
    single-frame call is still safe up to the hardware-verified cap
    (the 16x model is sized for many-frame batching, not a bound on one
    frame: at 393k one frame's rows are 12.6 MB resident while the model
    charges 75 MB — routing to the XLA fallback there crashed the TPU
    worker, found measuring large-N scaling in r5)."""
    f_max = min(128, int(PALLAS_RDF_VMEM_BUDGET // (3 * n_padded * 4 * 16)))
    if f_max < 1 and n_padded <= PALLAS_RDF_SINGLE_FRAME_N_MAX:
        return 1
    return f_max


def _rdf_backend_kernel(
    pair_table, box, cutoff, n_bins, n_pairs, i_block, use_pallas
):
    """Pick the fused Pallas kernel on TPU, the XLA kernel elsewhere."""
    if use_pallas:
        from ..ops.pallas_rdf import padded_atom_count, rdf_histogram_pallas

        n_species = int(pair_table.shape[0])
        box_tuple = tuple(float(b) for b in np.asarray(box))

        def kernel(pos, sid, _ptab, _box):
            # frames per call sized from the VMEM-resident (F, N) row
            # arrays (the old flat column operands were 128x lane-padded
            # and capped calls at ~4 frames; they are gone — the kernel
            # transposes i-side reads on the MXU). Every chunk is padded
            # to exactly f_max frames with a dynamic valid-frame bound,
            # so ONE compiled program serves all batch sizes of a system.
            import jax.numpy as jnp

            # size frames per call from the count the kernel PADS to —
            # sizing from the raw count underestimates VMEM (a 216-atom
            # system pads to 256; compile-time scoped-vmem OOM otherwise)
            n = padded_atom_count(pos.shape[1])
            f = pos.shape[0]
            f_max = pallas_rdf_frames_per_call(n)
            if f_max < 1:
                # beyond the verified single-frame envelope (padded
                # N > PALLAS_RDF_SINGLE_FRAME_N_MAX): use the HBM-tiled XLA kernel
                return rdf_ops.rdf_histogram(
                    pos, sid, _ptab, _box, cutoff=cutoff, n_bins=n_bins,
                    n_pairs=n_pairs, i_block=i_block,
                )
            total = None
            for s in range(0, f, f_max):
                chunk = pos[s : s + f_max]
                n_valid = chunk.shape[0]
                if n_valid < f_max:
                    chunk = jnp.pad(
                        chunk, ((0, f_max - n_valid), (0, 0), (0, 0))
                    )
                h = rdf_histogram_pallas(
                    chunk, sid, cutoff, n_bins, n_species, box_tuple,
                    n_valid_frames=n_valid,
                )
                total = h if total is None else total + h
            return total

        return kernel

    def kernel(pos, sid, ptab, box_):
        return rdf_ops.rdf_histogram(
            pos, sid, ptab, box_,
            cutoff=cutoff, n_bins=n_bins, n_pairs=n_pairs, i_block=i_block,
        )

    return kernel


def rdf_use_pallas() -> bool:
    """Fused Pallas kernel is the default on real TPU hardware."""
    import jax

    return jax.default_backend() == "tpu"


def rdf_use_native() -> bool:
    """Native AVX host kernel is the default on a CPU-only backend.

    ~14x the jitted XLA-CPU route at the headline workload (1.1 G vs
    76.5 M pairs/s on one core); semantics match up to f32 rounding at
    bin edges. ``config.native_cpu_kernels = False`` restores XLA.
    """
    import jax

    from ..ops import native_rdf
    from ..utils.config import config

    return (
        config.native_cpu_kernels
        and jax.default_backend() == "cpu"
        and native_rdf.available()
    )


def adf_use_native() -> bool:
    """Native host ADF kernel is the default on a CPU-only backend.

    ~18x the jitted XLA-CPU neighbor route at the headline workload
    (10240 atoms, first-shell cutoff: 0.2 s vs 3.66 s/frame on one core);
    semantics match up to f32 rounding / summation order.
    ``config.native_cpu_kernels = False`` restores XLA.
    """
    import jax

    from ..ops import native_adf
    from ..utils.config import config

    return (
        config.native_cpu_kernels
        and jax.default_backend() == "cpu"
        and native_adf.available()
    )


def sharded_rdf_histogram(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    pair_table: jnp.ndarray,
    box: jnp.ndarray,
    cutoff: float,
    n_bins: int,
    n_pairs: int,
    i_block: int = 128,
    mesh=None,
    use_pallas: bool | None = None,
    use_native: bool | None = None,
) -> jnp.ndarray:
    """RDF histogram with the frame axis sharded over the mesh.

    Remainder frames (batch not divisible by the device count) run as a
    single-device tail so counts are exact. On TPU the fused Pallas kernel
    (``ops.pallas_rdf``) is used; on a single-device CPU backend the
    native AVX host kernel (``ops.native_rdf``); elsewhere the XLA kernel.
    """
    mesh = mesh or get_default_mesh()
    n_dev = _n_mesh_devices(mesh)
    f = positions.shape[0]
    # a 2-D (data, atoms) mesh: route to the tensor-parallel kernel so the
    # atoms axis does real work (i-rows sharded, j side all_gathered over
    # ICI) instead of replicating the full computation
    if (
        "atoms" in getattr(mesh, "shape", {})
        and mesh.shape["atoms"] > 1
        and f % mesh.shape["data"] == 0
        and positions.shape[1] % mesh.shape["atoms"] == 0
    ):
        return sharded_rdf_histogram_2d(
            positions, species_id, pair_table, box,
            cutoff=cutoff, n_bins=n_bins, n_pairs=n_pairs, mesh=mesh,
            i_block=i_block,
        )
    if use_native is None:
        use_native = (
            n_dev == 1
            and positions.dtype == jnp.float32
            and not isinstance(positions, jax.core.Tracer)
            and rdf_use_native()
        )
    if use_native:
        from ..ops import native_rdf

        try:
            return jnp.asarray(
                native_rdf.rdf_histogram_native(
                    positions, species_id, pair_table, box,
                    cutoff=cutoff, n_bins=n_bins, n_pairs=n_pairs,
                )
            )
        except RuntimeError:
            pass  # non-canonical layout etc. — XLA route below
    if use_pallas is None:
        use_pallas = rdf_use_pallas()
    kernel = _rdf_backend_kernel(
        pair_table, box, cutoff, n_bins, n_pairs, i_block, use_pallas
    )
    if n_dev == 1 or f < n_dev:
        return kernel(positions, species_id, pair_table, box)

    main = (f // n_dev) * n_dev

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=P(),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )
    def sharded(pos_shard, sid, ptab, box_):
        h = kernel(pos_shard, sid, ptab, box_)
        return jax.lax.psum(h, "data")

    hist = sharded(positions[:main], species_id, pair_table, box)
    if main < f:
        hist = hist + kernel(positions[main:], species_id, pair_table, box)
    return hist


class _AdfPlan:
    """Static choices for the tiled ADF pipeline (K, packing, cells).

    The pipeline's shapes are all static; saturation (neighbor count
    exceeding K, packed sub-list overflow, cell-capacity overflow) is
    detected from device-side diagnostics and handled by ``escalate``
    + re-running — exact for any geometry.
    """

    def __init__(self, n_avail, box, cutoff, use_pallas):
        from ..ops.cells import cell_lists_applicable

        volume = float(np.prod(np.asarray(box)))
        rho = n_avail / max(volume, 1e-30)
        expected = rho * 4.0 / 3.0 * np.pi * float(cutoff) ** 3
        self.n_avail = n_avail
        self.use_pallas = use_pallas
        # statistical K bound instead of a flat 2x margin: per-center
        # counts concentrate (Poisson-ish — max over F*N rows lands
        # ~6 sqrt(mean) above the mean; measured max 200 at mean 145),
        # and stage-2 fold work scales with K^2. The 2x margin rounded
        # cutoff 6.0 / 10240 atoms up to K=384 when the realised max
        # fits 256: measured 104 -> 72.6 ms/frame (1.43x) with zero
        # overflow. Rare saturation still doubles K and retries exactly
        # (escalate; lists report max_count == k_n when clipped).
        k_tight = expected + 6.0 * np.sqrt(max(expected, 1.0)) + 16.0
        k_n = int(np.clip(-(-int(np.ceil(k_tight)) // 8) * 8, 24, 512))
        k_n = min(k_n, n_avail)
        self.expected = float(expected)
        if use_pallas:
            k_n = max(128, -(-k_n // 128) * 128)
        self.k_n = k_n

        from ..ops.pallas_adf import _JCAP_WINDOWED

        box_np = np.asarray(box)
        # Cell lists beat the O(N^2) scan asymptotically, but TPU gathers
        # make them SLOWER until very large N (171-244 vs 119 ms/frame at
        # 10k for the masked top_k; the windowed sorted extract measured
        # 32 vs 1470 ms/frame at 32k; brick extract 194.6 vs 1032.6 at
        # 131k; 913/1572 ms at 786k/1M vs a ~20-30 s cells extrapolation) —
        # with the Pallas sorted route available they only engage above
        # its verified cap (_JCAP_WINDOWED).
        cells_floor = _JCAP_WINDOWED if use_pallas else 32768
        self.use_cells = n_avail > cells_floor and cell_lists_applicable(
            box_np, float(cutoff)
        )
        self.n_dim = (
            int(np.min(box_np) // float(cutoff)) if self.use_cells else 0
        )
        self.capacity = (
            max(8, -(-int(np.ceil(1.75 * n_avail / self.n_dim**3)) // 8) * 8)
            if self.use_cells
            else 0
        )

        # center packing for the Pallas angle stage: p centers share a
        # 128-lane row when the expected neighbor count fits p sub-lists
        # (first-shell cutoffs see ~10-40 neighbors vs the 128-slot row);
        # the density guess is validated against the realised max_count
        # and downgraded on retry
        self.pack = 1
        if use_pallas:
            for p in (4, 2):
                if int(np.ceil(1.5 * expected)) + 8 <= 128 // p:
                    self.pack = p
                    break
        # z-sorted extract: the ~2*cutoff slab window only pays once
        # 128-atom j-chunks are spatially compact relative to the box
        # (~80% of chunks skipped at 10k atoms / first-shell cutoffs);
        # the sweep's extraction depth scales with the window density
        from ..ops.pallas_adf import (
            brick3_window_bound,
            brick_window_bound,
            extract_e_for,
            window_chunk_bound,
        )

        self.use_sorted = bool(use_pallas) and n_avail >= 4096
        # serpentine brick ((z-slab, snake-y)) sort: per-block windows
        # shrink a further ~3.5x at 65k atoms. Hardware A/B (v5e,
        # 2026-08-18, ms/frame z vs brick): 10240: 21.7 vs 33.5 (z wins —
        # chunk granularity floors the small case), 16384: 61.7 vs 58.1,
        # 32768: 85.1 vs 64.9, 65536: 120.4 vs 93.6, 131072: 462.5 vs
        # 194.6 — brick from 16k up, z below. LATPU_ADF_SORT overrides.
        default_sort = "brick" if n_avail >= 16384 else "z"
        self.sort = (
            os.environ.get("LATPU_ADF_SORT", default_sort)
            if self.use_sorted else "z"
        )
        self.n_arcs = 6
        if self.use_sorted and self.sort == "brick3":
            # 3-level (z-slab, snake y-cell, snake x) sort: the
            # candidate-floor sim shows a ~1.1-1.4x candidate cut ONLY
            # at wide cutoffs (each (slab, y-cell) must hold >= ~3
            # chunks); opt-in via LATPU_ADF_SORT until a hardware A/B
            # lands (one process per arm — see the aliasing note)
            self.n_arcs = 12
            self.w_chunks = brick3_window_bound(
                n_avail, box_np, float(cutoff), n_arcs=self.n_arcs
            )
            self.extract_e = extract_e_for(
                n_avail, box_np, float(cutoff), sort="brick3"
            )
        elif self.use_sorted and self.sort == "brick":
            self.w_chunks = brick_window_bound(
                n_avail, box_np, float(cutoff), n_arcs=self.n_arcs
            )
            self.extract_e = extract_e_for(
                n_avail, box_np, float(cutoff), sort="brick"
            )
        else:
            self.extract_e = (
                extract_e_for(n_avail, box_np, float(cutoff), sort="z")
                if self.use_sorted else 4
            )
            # static scratch bound for the window-relative extract; a
            # block in a z-sparse region can exceed it — the overflow
            # reports via occ and escalate() falls back to the unsorted
            # route. NOTE: this assignment was accidentally nested under
            # the env override below by commit 22c7a27 — the z route then
            # ran with full-width scratches (tc 32 instead of 128-tall
            # blocks): measured 7.3 vs 4.4 ms/frame stage 1 at 10k
            # (benchmarks/adf_stage1_bounds.json before/after the fix).
            self.w_chunks = (
                window_chunk_bound(n_avail, box_np, float(cutoff))
                if self.use_sorted else None
            )
        # per-process A/B override (kernel variants must never share a
        # process — see the env-flag aliasing note in the design docs).
        # extract_e only: w_chunks keeps the bound of the chosen sort
        # (overwriting the brick bound with the z bound would be wrong).
        e_env = os.environ.get("LATPU_ADF_EXTRACT_E")
        if e_env and self.use_sorted:
            self.extract_e = max(1, int(e_env))
        # jrow extract variant (j-value rows, see _neighbor_extract_pallas):
        # production default lives in pallas_adf._JROW_DEFAULT; the env
        # var is the one-process-per-arm A/B hook. Kept OUTSIDE any other
        # override branch (the 22c7a27 lesson above).
        from ..ops.pallas_adf import _JROW_DEFAULT

        j_env = os.environ.get("LATPU_ADF_JROW")
        self.jrow = bool(int(j_env)) if j_env else _JROW_DEFAULT
        self._normalise()

    def _normalise(self):
        if self.use_cells and 27 * self.capacity < self.k_n:
            self.capacity = -(-self.k_n // 27 // 8) * 8
        if self.k_n > 128:
            self.pack = 1  # saturation retries disable packing
        # stage 1 clamps K to the padded atom count; the Pallas stage
        # requires a multiple of 128 — fall back to the XLA angle stage
        # when the clamp breaks that (tiny systems near the tiled gate)
        k_eff = min(self.k_n, -(-self.n_avail // 64) * 64)
        self.use_pallas_run = self.use_pallas and k_eff % 128 == 0
        # fold lane-chunking pays only when the TYPICAL row leaves whole
        # 128-lane chunks past its count (per-center skip predicate):
        # measured 1.29x at K=256/mean 111, but a 13% LOSS at K=256/mean
        # 145 where no chunk skips and the scratch staging is pure cost
        self.fold_chunk = (
            self.k_n > 128
            and getattr(self, "expected", 0.0) < self.k_n - 128
        )

    def escalate(self, max_count: int, max_occ: int) -> bool:
        """Adjust for observed saturation; False when the run was exact."""
        if self.use_cells and max_occ > self.capacity:
            self.capacity *= 2
            self._normalise()
            return True
        if self.use_sorted and not self.use_cells and max_occ > 0:
            # a block's chunk window exceeded the static scratch bound
            # (clamped run under-counts): retry on the unsorted route
            self.use_sorted = False
            self.w_chunks = None
            self._normalise()
            return True
        fits_pack = self.pack == 1 or (
            max_count < self.k_n and max_count <= self.k_n // self.pack
        )
        if (max_count < self.k_n or self.k_n >= self.n_avail) and fits_pack:
            return False
        if not fits_pack:
            # density guess too tight: halve the packing, same lists
            self.pack //= 2
            self._normalise()
            return True
        self.k_n = min(2 * self.k_n, self.n_avail)
        if self.use_pallas:
            self.k_n = -(-self.k_n // 128) * 128
        self._normalise()
        return True


def _sharded_runner(mesh, n_dev, n_counts=0):
    """Build run(kernel, positions, ...): shard the kernel over frames;
    psum the histogram, pmax any trailing diagnostic counts. Frames are
    independent, so they shard over EVERY mesh axis (a multi-axis mesh
    would otherwise replicate the compute along the extra axes)."""
    axes = tuple(mesh.shape.keys())
    frame_spec = axes[0] if len(axes) == 1 else axes

    def run(kernel, positions, species_id, triple_table, box):
        f = positions.shape[0]
        out_spec = (P(),) * (1 + n_counts) if n_counts else P()
        if n_dev == 1 or f < n_dev:
            return kernel(positions, species_id, triple_table, box)

        main = (f // n_dev) * n_dev

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(frame_spec), P(), P(), P()),
            out_specs=out_spec,
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )
        def sharded(pos_shard, sid, ttab, box_):
            out = kernel(pos_shard, sid, ttab, box_)
            if n_counts:
                return (jax.lax.psum(out[0], axes),) + tuple(
                    jax.lax.pmax(c, axes) for c in out[1:]
                )
            return jax.lax.psum(out, axes)

        out = sharded(positions[:main], species_id, triple_table, box)
        if main < f:
            tail = kernel(positions[main:], species_id, triple_table, box)
            if n_counts:
                out = (out[0] + tail[0],) + tuple(
                    jnp.maximum(a, b) for a, b in zip(out[1:], tail[1:])
                )
            else:
                out = out + tail
        return out

    return run


def _adf_pipeline(plan: _AdfPlan, n_species, cutoff, n_bins, norm_power):
    """Per-batch tiled-ADF function ``(pos, sid, ttab, box) -> (hist,
    max_count, max_occ)`` for the plan's static choices.

    Stage 1 builds per-center lists — via cell lists (ops.cells) when
    >= 3 cells fit per box edge, killing the top_k-over-all-N bottleneck
    — and stage 2 histograms the neighbor-pair angles: the fused Pallas
    kernel on TPU, the XLA from-lists kernel elsewhere.
    """
    from ..ops import pallas_adf as _pk
    from ..ops.cells import neighbor_lists_cells
    from ..ops.pallas_adf import (
        _JCAP,
        _JCAP_WINDOWED,
        _pad_sid,
        adf_neighbor_lists,
    )

    use_cells = plan.use_cells
    n_dim = plan.n_dim
    n_avail = plan.n_avail
    use_sorted = getattr(plan, "use_sorted", False)

    def pipeline(pos_shard, sid, ttab, box_, *, _k=plan.k_n,
                 _cap=plan.capacity, use_pallas=plan.use_pallas_run,
                 _pack=plan.pack, _ee=getattr(plan, "extract_e", 4),
                 _wc=getattr(plan, "w_chunks", None),
                 _sort=getattr(plan, "sort", "z"),
                 _arcs=getattr(plan, "n_arcs", 1),
                 _fc=getattr(plan, "fold_chunk", None),
                 _jrow=getattr(plan, "jrow", False)):
        cnts = None
        per_frame_sid = False
        if use_cells:
            r_nn, d_nn, s_nn, sid_pad, mc, occ = neighbor_lists_cells(
                pos_shard, sid, box_, cutoff,
                k_n=_k, n_dim=n_dim, capacity=_cap,
            )
        elif (
            use_pallas and use_sorted
            and n_avail <= (_JCAP_WINDOWED if _wc else _JCAP)
        ):
            # z-sorted extract: the circular chunk window skips the
            # j-chunks outside the ~2*cutoff slab (~80% at 10k atoms);
            # the static w_chunks bound shrinks the scratches to window
            # width (tall center blocks). A window overflowing the bound
            # reports through occ — escalate() then disables the sorted
            # route and the run repeats exactly (deferred, like every
            # other saturation signal).
            rxn, ryn, rzn, d_nn, s_nn, cnts, sid_s, ovf = (
                _pk.sorted_neighbor_extract(
                    pos_shard, sid, box_, cutoff, k_n=_k, e_fixed=_ee,
                    w_chunks=_wc, sort=_sort,
                    n_arcs=_arcs if _sort in ("brick", "brick3") else 1,
                    jrow=_jrow,
                )
            )
            r_nn = (rxn, ryn, rzn)
            sid_pad = sid_s  # (F, Npad): sorting permutes atoms per frame
            per_frame_sid = True
            mc = jnp.max(cnts).astype(jnp.int32)
            occ = ovf
        elif use_pallas and n_avail <= _JCAP:
            # Pallas fused extract kernel (distances + values emitted
            # in-kernel): replaces top_k + gathers, 137 -> 21 ms/frame
            # at 10k atoms; per-center counts drive the angle stage's
            # chunk skip
            _, rxn, ryn, rzn, d_nn, s_nn, cnts = (
                _pk._neighbor_extract_pallas(
                    pos_shard, sid, box_, cutoff, k_n=_k, lean=True
                )
            )
            r_nn = (rxn, ryn, rzn)
            sid_pad = _pad_sid(sid, rxn.shape[1])
            mc = jnp.max(cnts).astype(jnp.int32)
            occ = jnp.asarray(0, jnp.int32)
        else:
            r_nn, d_nn, s_nn, sid_pad, mc = adf_neighbor_lists(
                pos_shard, sid, box_, cutoff, k_n=_k
            )
            occ = jnp.asarray(0, jnp.int32)
        if use_pallas:
            # only the fused extract stage emits per-center counts (the
            # cell-list and top_k stages process every chunk)
            h = _pk.adf_stage2_auto(
                r_nn, d_nn, s_nn, sid_pad, n_bins, n_species,
                norm_power=norm_power, pack=_pack, counts=cnts,
                per_frame_sid=per_frame_sid, fold=True, fold_chunk=_fc,
            )
        else:
            h = adf_ops.adf_pairs_histogram_xla(
                r_nn, d_nn, s_nn, sid_pad, n_bins, n_species,
                norm_power=norm_power,
            )
        return h, mc, occ

    return pipeline


def sharded_adf_histogram(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    triple_table: jnp.ndarray,
    box: jnp.ndarray,
    cutoff: float,
    n_bins: int,
    n_triples: int,
    norm_power: int = 4,
    c_block: int = 8,
    mesh=None,
    tiled: bool | None = None,
) -> jnp.ndarray:
    """ADF histogram with the frame axis sharded over the mesh.

    ``tiled`` selects the memory-bounded (center, j, k)-tile kernel; by
    default it engages automatically for systems above ~1.5k atoms.
    """
    mesh = mesh or get_default_mesh()
    n_dev = _n_mesh_devices(mesh)
    if tiled is None:
        tiled = positions.shape[1] > 1536

    if (
        n_dev == 1
        and positions.dtype == jnp.float32
        and not isinstance(positions, jax.core.Tracer)
        and adf_use_native()
    ):
        from ..ops import native_adf

        try:
            return jnp.asarray(
                native_adf.adf_histogram_native(
                    positions, species_id, triple_table, box,
                    cutoff=cutoff, n_bins=n_bins, n_triples=n_triples,
                    norm_power=norm_power,
                )
            )
        except RuntimeError:
            pass  # unexpected shape/dtype — XLA route below

    if (
        tiled
        and "atoms" in getattr(mesh, "shape", {})
        and mesh.shape["atoms"] > 1
        and positions.shape[0] % mesh.shape["data"] == 0
        and positions.shape[1] % (128 * mesh.shape["atoms"]) == 0
    ):
        plan = _AdfPlan(
            int(positions.shape[1]), box, cutoff,
            use_pallas=jax.default_backend() == "tpu",
        )
        if plan.use_sorted:
            return sharded_adf_histogram_2d(
                positions, species_id, triple_table, box,
                cutoff=cutoff, n_bins=n_bins, n_triples=n_triples,
                norm_power=norm_power, mesh=mesh, plan=plan,
            )

    if not tiled:
        kernel = functools.partial(
            adf_ops.adf_histogram,
            cutoff=cutoff,
            n_bins=n_bins,
            n_triples=n_triples,
            norm_power=norm_power,
            c_block=c_block,
        )
        run = _sharded_runner(mesh, n_dev)
        return run(kernel, positions, species_id, triple_table, box)

    # Large systems: neighbor-list pipeline, O(N K^2). K starts from the
    # average density; a saturated list (max_count == K: locally denser
    # than the average) retries with doubled K, and cell-capacity
    # overflow retries with doubled capacity — exact for any geometry.
    n_species = int(triple_table.shape[0])
    plan = _AdfPlan(
        int(positions.shape[1]), box, cutoff,
        use_pallas=jax.default_backend() == "tpu",
    )
    return _adf_tiled_framesharded(
        positions, species_id, triple_table, box, cutoff, n_bins,
        n_species, norm_power, plan, mesh, n_dev,
    )


def _adf_tiled_framesharded(
    positions, species_id, triple_table, box, cutoff, n_bins,
    n_species, norm_power, plan, mesh, n_dev,
):
    """Frame-sharded tiled-ADF retry loop (shared by the 2-D fallback)."""
    run = _sharded_runner(mesh, n_dev, n_counts=2)
    while True:
        pipeline = _adf_pipeline(plan, n_species, cutoff, n_bins, norm_power)
        hist, max_count, max_occ = run(
            pipeline, positions, species_id, triple_table, box
        )
        if not plan.escalate(int(max_count), int(max_occ)):
            return hist


def adf_frames_per_call(n_atoms, box, cutoff, budget_bytes, cap=16):
    """Route-aware ADF frames-per-feed for the TPU tiled pipeline.

    The generic quadratic batch plan models the O(N^2) gram tiles — which
    ``c_block`` already bounds — and collapses to ~1 frame per batch at
    10k atoms, leaving the Pallas pipeline dispatch-bound on its per-call
    sort+window fixed cost. On the sorted/cells routes the device working
    set is LINEAR in frames (positions + ~5 K-wide f32 neighbor tensors +
    the angle stage's row copies), and taller calls amortise hard:
    measured 21.7 (f=2) -> 10.4 (f=8) -> 9.1 ms/frame (f=16) at 10240
    atoms first-shell (benchmarks/rebaseline.json). ``cap`` stays at the
    measured sweet spot — gains flatten past 8-16 and novel taller shapes
    cost cold Mosaic compiles. Returns 1 off-TPU or below the tiled
    threshold (callers keep the planner's batch there).
    """
    if jax.default_backend() != "tpu" or n_atoms <= 1536:
        return 1
    plan = _AdfPlan(
        int(n_atoms), np.asarray(box), float(cutoff), use_pallas=True
    )
    per_frame = n_atoms * 4 * (3 + 10 * plan.k_n)
    budget = max(int(0.25 * budget_bytes), 1)
    return int(np.clip(budget // max(per_frame, 1), 1, cap))


class AdfBatchRunner:
    """Streamed ADF batches with ONE saturation sync for the whole run.

    ``sharded_adf_histogram`` fetches its diagnostics after every call —
    on a remote-accelerator link that is a blocking round trip plus a
    histogram fetch per batch, and it serialises host loading against
    device compute. Streaming calculators instead ``feed`` every batch
    (dispatch only — the device crunches batch *b* while the host loads
    *b+1*), then call ``finalize`` once: histograms and saturation
    diagnostics accumulate ON DEVICE across batches. If the run
    saturated (rare — K carries a ~2x density margin), ``finalize``
    returns ``None``, the plan has already escalated, and the caller
    re-feeds the same batches.

    ``normalize_per_batch`` divides each batch histogram by its own
    ``total * bin_width`` per triple ON DEVICE (the reference's per-batch
    density normalisation, ``angular_distribution_function.py:421-429``).
    """

    def __init__(
        self,
        n_atoms: int,
        species_id: jnp.ndarray,
        triple_table: jnp.ndarray,
        box: jnp.ndarray,
        cutoff: float,
        n_bins: int,
        n_triples: int,
        norm_power: int = 4,
        c_block: int = 8,
        mesh=None,
        tiled: bool | None = None,
        normalize_per_batch: float | None = None,  # bin width, enables
    ):
        self.mesh = mesh or get_default_mesh()
        self.n_dev = _n_mesh_devices(self.mesh)
        self.species_id = species_id
        self.triple_table = triple_table
        self.box = box
        self.cutoff = cutoff
        self.n_bins = n_bins
        self.n_triples = n_triples
        self.n_species = int(triple_table.shape[0])
        self.norm_power = norm_power
        self.c_block = c_block
        self.tiled = n_atoms > 1536 if tiled is None else tiled
        self.bin_width = normalize_per_batch
        self.plan = (
            _AdfPlan(
                n_atoms, box, cutoff,
                use_pallas=jax.default_backend() == "tpu",
            )
            if self.tiled
            else None
        )
        self._reset()

    def _reset(self):
        self._hist = None
        self._max_count = None
        self._max_occ = None
        if self.tiled:
            pipeline = _adf_pipeline(
                self.plan, self.n_species, self.cutoff, self.n_bins,
                self.norm_power,
            )
        else:
            base = functools.partial(
                adf_ops.adf_histogram,
                cutoff=self.cutoff,
                n_bins=self.n_bins,
                n_triples=self.n_triples,
                norm_power=self.norm_power,
                c_block=self.c_block,
            )

            def pipeline(pos, sid, ttab, box_):
                z = jnp.asarray(0, jnp.int32)
                return base(pos, sid, ttab, box_), z, z

        run = _sharded_runner(self.mesh, self.n_dev, n_counts=2)
        use_native = self.n_dev == 1 and adf_use_native()

        def batch_fn(pos, sid, ttab, box_):
            if (
                use_native
                and pos.dtype == jnp.float32
                and not isinstance(pos, jax.core.Tracer)
            ):
                from ..ops import native_adf

                try:
                    h = jnp.asarray(
                        native_adf.adf_histogram_native(
                            pos, sid, ttab, box_,
                            cutoff=self.cutoff, n_bins=self.n_bins,
                            n_triples=self.n_triples,
                            norm_power=self.norm_power,
                        )
                    )
                    z = jnp.asarray(0, jnp.int32)
                    h, mc, occ = h, z, z
                except RuntimeError:
                    h, mc, occ = run(pipeline, pos, sid, ttab, box_)
            else:
                h, mc, occ = run(pipeline, pos, sid, ttab, box_)
            if self.bin_width is not None:
                total = jnp.sum(h, axis=1, keepdims=True)
                h = jnp.where(total > 0, h / (total * self.bin_width), 0.0)
            return h, mc, occ

        self._batch_fn = batch_fn

    def feed(self, positions: jnp.ndarray) -> None:
        """Dispatch one frame batch; no host synchronisation."""
        h, mc, occ = self._batch_fn(
            positions, self.species_id, self.triple_table, self.box
        )
        self._hist = h if self._hist is None else self._hist + h
        self._max_count = (
            mc if self._max_count is None else jnp.maximum(self._max_count, mc)
        )
        self._max_occ = (
            occ if self._max_occ is None else jnp.maximum(self._max_occ, occ)
        )

    def finalize(self):
        """One device sync. The accumulated histogram, or ``None`` if the
        run saturated — the plan has escalated; re-feed every batch."""
        if self._hist is None:
            raise ValueError("finalize() before any feed()")
        if self.tiled and self.plan.escalate(
            int(self._max_count), int(self._max_occ)
        ):
            self._reset()
            return None
        return self._hist


def sharded_windowed_acf(
    x: jnp.ndarray,
    window: int,
    stride: int,
    chunk: int | None = None,
    tau=None,
    mesh=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed ACF with the *particle* axis sharded over the whole mesh.

    Same contract as ``ops.correlation.windowed_acf_sum``: the ACF sum is
    a plain psum; the per-window particle-MEAN combines as a
    count-weighted mean across shards (exact when particle counts divide,
    and the remainder tail is folded in with its own weight).
    """
    from ..ops.correlation import _auto_chunk, windowed_acf_sum

    mesh = mesh or get_default_mesh()
    n_dev = _n_mesh_devices(mesh)
    n_particles = x.shape[1]
    if n_dev == 1 or n_particles < n_dev:
        return windowed_acf_sum(x, window, stride, chunk=chunk, tau=tau)
    if chunk is None:
        # size for the per-shard slice so the resolved value is concrete
        # before the shard_map trace
        chunk = _auto_chunk(n_particles // n_dev, x.shape[2], window)

    main = (n_particles // n_dev) * n_dev
    axes = tuple(mesh.shape.keys())
    part_spec = axes[0] if len(axes) == 1 else axes

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, part_spec),),
        out_specs=(P(), P()),
    )
    def sharded(x_shard):
        s, pw = windowed_acf_sum(x_shard, window, stride, chunk=chunk, tau=tau)
        n_loc = x_shard.shape[1]
        # pw is the LOCAL particle mean: psum the weighted numerators
        return jax.lax.psum(s, axes), jax.lax.psum(pw * n_loc, axes)

    s, pw_sum = sharded(x[:, :main])
    pw = pw_sum / main
    if main < n_particles:
        s_t, pw_t = windowed_acf_sum(
            x[:, main:], window, stride, chunk=chunk, tau=tau
        )
        s = s + s_t
        n_tail = n_particles - main
        pw = (pw * main + pw_t * n_tail) / n_particles
    return s, pw


def sharded_rdf_histogram_2d(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    pair_table: jnp.ndarray,
    box: jnp.ndarray,
    cutoff: float,
    n_bins: int,
    n_pairs: int,
    mesh,
    i_block: int = 128,
) -> jnp.ndarray:
    """RDF over a 2-D ``(data, atoms)`` mesh.

    Frames shard over ``data`` (pure data parallelism); the i-atom axis
    shards over ``atoms`` (the tensor-parallel analog): each device holds
    its i-rows, ``all_gather``s the full j-side positions over ICI, computes
    the rectangular (i-shard x all-j) partial histogram with the triangle
    mask evaluated on GLOBAL indices, and the partials ``psum`` over both
    axes. Exact: every unordered pair is counted exactly once.
    """
    n_data = mesh.shape["data"]
    n_atoms_axis = mesh.shape["atoms"]
    f, n_pad, _ = positions.shape
    assert f % n_data == 0, "frame count must divide the data axis"
    assert n_pad % n_atoms_axis == 0, "atom padding must divide the atoms axis"

    i_shard = n_pad // n_atoms_axis

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("data", "atoms", None),  # positions: frames x i-rows
            P("atoms"),  # species ids of the local i-rows
            P(),
            P(),
            P(),
        ),
        out_specs=P(),
    )
    def sharded(pos_i_shard, sid_i_shard, sid_full, ptab, box_):
        # j side needs every atom: gather the i-shards over the atoms axis
        pos_full = jax.lax.all_gather(
            pos_i_shard, "atoms", axis=1, tiled=True
        )  # (f_local, n_pad, 3)
        atom_rank = jax.lax.axis_index("atoms")
        i0 = atom_rank * i_shard

        # rectangular partial histogram: local i-rows vs all j, with the
        # global triangle/species masks (same math as ops.rdf.rdf_histogram
        # restricted to one i-stripe)
        from ..ops.geometry import minimum_image
        from ..ops.histogram import bin_indices, masked_histogram

        i_ids = i0 + jnp.arange(i_shard, dtype=jnp.int32)
        j_ids = jnp.arange(pos_full.shape[1], dtype=jnp.int32)
        r = pos_i_shard[:, :, None, :] - pos_full[:, None, :, :]
        r = minimum_image(r, box_.astype(pos_full.dtype))
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))
        triu = j_ids[None, :] > i_ids[:, None]
        valid = (sid_i_shard[:, None] >= 0) & (sid_full[None, :] >= 0)
        mask = (triu & valid)[None] & (d < cutoff)
        pair_id = ptab[
            jnp.maximum(sid_i_shard, 0)[:, None],
            jnp.maximum(sid_full, 0)[None, :],
        ]
        bins = bin_indices(d, 0.0, cutoff, n_bins)
        combined = pair_id[None] * n_bins + bins
        h = masked_histogram(
            combined, mask.astype(jnp.float32), n_pairs * n_bins, "scatter"
        )
        h = jax.lax.psum(h, "atoms")
        return jax.lax.psum(h, "data")

    hist = sharded(positions, species_id, species_id, pair_table, box)
    return hist.reshape(n_pairs, n_bins)


def sharded_adf_histogram_2d(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    triple_table: jnp.ndarray,
    box: jnp.ndarray,
    cutoff: float,
    n_bins: int,
    n_triples: int,
    norm_power: int = 4,
    mesh=None,
    plan: "_AdfPlan | None" = None,
) -> jnp.ndarray:
    """ADF over a 2-D ``(data, atoms)`` mesh.

    Frames shard over ``data``; sorted-center STRIPES shard over
    ``atoms``: every device sorts the full per-frame atom set
    (deterministic — all shards agree), extracts neighbors only for its
    contiguous stripe of the sorted centers against ALL j-atoms
    (:func:`ops.pallas_adf.sorted_neighbor_extract_stripe`), and runs
    the angle stage on its stripe. A center's whole triplet fan lives on
    exactly one device, so the (n_triples, n_bins) partials just
    ``psum`` over both axes — exact. Saturation / window-overflow
    diagnostics pmax and drive the plan's usual deferred retry.
    """
    from ..ops import pallas_adf as _pk

    mesh = mesh or get_default_mesh()
    n_data = mesh.shape["data"]
    n_at = mesh.shape["atoms"]
    f, n, _ = positions.shape
    assert f % n_data == 0, "frame count must divide the data axis"
    assert n % (128 * n_at) == 0, (
        "atom count must pad to 128 * atoms-axis for 128-aligned stripes"
    )
    n_species = int(triple_table.shape[0])
    if plan is None:
        plan = _AdfPlan(
            n, box, cutoff, use_pallas=jax.default_backend() == "tpu"
        )
    assert plan.use_sorted, "the 2-D ADF route needs the sorted extract"
    axes = ("data", "atoms")

    while True:

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("data"), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )
        def sharded(pos_shard, sid, ttab, box_, *, _k=plan.k_n,
                    _pack=plan.pack, _ee=plan.extract_e,
                    _wc=plan.w_chunks, _sort=getattr(plan, "sort", "z"),
                    _arcs=getattr(plan, "n_arcs", 1),
                    _jrow=getattr(plan, "jrow", False)):
            rank = jax.lax.axis_index("atoms")
            rx, ry, rz, d_nn, s_nn, cnts, sid_c, ovf = (
                _pk.sorted_neighbor_extract_stripe(
                    pos_shard, sid, box_, cutoff, rank, n_at,
                    k_n=_k, e_fixed=_ee, w_chunks=_wc, sort=_sort,
                    n_arcs=_arcs if _sort in ("brick", "brick3") else 1,
                    jrow=_jrow,
                )
            )
            h = _pk.adf_stage2_auto(
                (rx, ry, rz), d_nn, s_nn, sid_c, n_bins, n_species,
                norm_power=norm_power, pack=_pack, counts=cnts,
                per_frame_sid=True, fold=True,
            )
            mc = jnp.max(cnts).astype(jnp.int32)
            if _pack > 1:
                # overflowed packed sub-lists are invisible to the angle
                # stage — report as saturation for the retry
                mc = jnp.where(mc > _k // _pack, _k, mc)
            return (
                jax.lax.psum(h, axes),
                jax.lax.pmax(mc, axes),
                jax.lax.pmax(ovf, axes),
            )

        hist, max_count, max_occ = sharded(
            positions, species_id, triple_table, box
        )
        if not plan.escalate(int(max_count), int(max_occ)):
            return hist
        if not plan.use_sorted:
            # overflow disabled the sorted route: the stripe pipeline is
            # gone with it — continue on the frame-sharded path with the
            # already-escalated plan (NOT the public entry, which would
            # rebuild a sorted plan and recurse back here)
            return _adf_tiled_framesharded(
                positions, species_id, triple_table, box, cutoff,
                n_bins, n_species, norm_power, plan, mesh,
                _n_mesh_devices(mesh),
            )


def sharded_windowed_msd(
    x: jnp.ndarray,
    tau_values: jnp.ndarray,
    window: int,
    stride: int,
    mesh=None,
) -> tuple[jnp.ndarray, int]:
    """Windowed MSD with the *particle* axis sharded over the mesh.

    Particles are independent in the MSD sum, so sharding axis 1 needs no
    halo exchange; partial sums merge with one psum.
    """
    mesh = mesh or get_default_mesh()
    n_dev = _n_mesh_devices(mesh)
    n_particles = x.shape[1]
    if n_dev == 1 or n_particles < n_dev:
        return msd_ops.windowed_msd_sum(x, tau_values, window, stride)

    main = (n_particles // n_dev) * n_dev
    # particles are independent: on a multi-axis mesh shard them over ALL
    # axes (a (data, atoms) mesh would otherwise replicate the compute
    # along the unnamed axes)
    axes = tuple(mesh.shape.keys())
    part_spec = axes[0] if len(axes) == 1 else axes

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, part_spec), P()),
        out_specs=(P(), P()),
    )
    def sharded(x_shard, tau):
        s, n = msd_ops.windowed_msd_sum(x_shard, tau, window, stride)
        return jax.lax.psum(s, axes), n

    msum, nw = sharded(x[:, :main], tau_values)
    if main < n_particles:
        extra, _ = msd_ops.windowed_msd_sum(
            x[:, main:], tau_values, window, stride
        )
        msum = msum + extra
    return msum, nw
