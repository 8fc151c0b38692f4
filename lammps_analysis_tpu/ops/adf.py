"""ADF triplet-angle kernels.

TPU-native re-design of the reference's triplet machinery
(``calculators/angular_distribution_function.py:330-430`` +
``utils/neighbour_list.py:112-177``). The reference materialises explicit
triple-index lists from a rolled r_ijk tensor (dynamic shapes, float16
workarounds). Here the angle cosines for a block of central atoms are one
batched Gram matrix — ``einsum('fcjd,fckd->fcjk')`` — which is pure MXU
work, and triples are selected by masks over regular (center, j, k) tiles.

Counting convention reproduces the reference exactly: ordered neighbor pairs
``(j, k)``, ``j != k``, with the triple key ``(s_i, s_j, s_k)`` kept only when
the species indices are non-decreasing (the reference only emits
``combinations_with_replacement`` keys, so e.g. a Cl-centered Na-Cl-Na triple
is dropped, and same-species pairs are counted in both orders).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import minimum_image
from .histogram import bin_indices, masked_histogram

ADF_BIN_RANGE = (0.0, 3.15)  # radians — reference: "0 to a chemists pi" (:216)


def build_triple_table(n_species: int):
    """Triple-key table ``T[a, b, c] -> key index`` (-1 = dropped).

    Key order matches ``itertools.combinations_with_replacement`` over the
    species list (reference ``angular_distribution_function.py:414``).
    """
    table = np.full((n_species,) * 3, -1, dtype=np.int32)
    order = []
    for idx, (a, b, c) in enumerate(
        itertools.combinations_with_replacement(range(n_species), 3)
    ):
        table[a, b, c] = idx
        order.append((a, b, c))
    return table, order


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_bins", "n_triples", "c_block", "norm_power", "jk_block"
    ),
)
def adf_histogram_tiled(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    triple_table: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff: float,
    n_bins: int,
    n_triples: int,
    norm_power: int = 4,
    c_block: int = 4,
    jk_block: int = 1024,
) -> jnp.ndarray:
    """Memory-bounded ADF: (center, j-tile, k-tile) sweep for large systems.

    Identical semantics to :func:`adf_histogram`, but the (C, N, N) angle
    tensor is never materialised — the largest intermediate is
    ``(F, c_block, jk_block, jk_block)`` — so 10k+ atom systems fit.
    """
    f, n_pad0, _ = positions.shape
    n_blocks = -(-n_pad0 // c_block)
    n_tiled = n_blocks * c_block
    if n_tiled != n_pad0:
        positions = jnp.pad(positions, ((0, 0), (0, n_tiled - n_pad0), (0, 0)))
        species_id = jnp.pad(
            species_id, (0, n_tiled - n_pad0), constant_values=-1
        )
    n_pad = positions.shape[1]
    jk_block = min(jk_block, n_pad)
    n_jk = -(-n_pad // jk_block)
    jk_tiled = n_jk * jk_block
    if jk_tiled != n_pad:
        positions = jnp.pad(positions, ((0, 0), (0, jk_tiled - n_pad), (0, 0)))
        species_id = jnp.pad(
            species_id, (0, jk_tiled - n_pad), constant_values=-1
        )
        # keep the center grid consistent with the padded atom count
        n_pad = jk_tiled
        n_blocks = n_pad // c_block
    lo, hi = ADF_BIN_RANGE
    dtype = positions.dtype
    s_count = triple_table.shape[0]
    sid = species_id
    atom_ids = jnp.arange(n_pad, dtype=jnp.int32)

    def center_block(c0):
        pos_c = jax.lax.dynamic_slice_in_dim(positions, c0, c_block, axis=1)
        sid_c = jax.lax.dynamic_slice_in_dim(sid, c0, c_block, axis=0)
        c_ids = c0 + jnp.arange(c_block, dtype=jnp.int32)

        def leg(j0):
            """Displacements and masks center -> one jk tile."""
            pos_j = jax.lax.dynamic_slice_in_dim(
                positions, j0, jk_block, axis=1
            )
            sid_j = jax.lax.dynamic_slice_in_dim(sid, j0, jk_block, axis=0)
            ids_j = jax.lax.dynamic_slice_in_dim(atom_ids, j0, jk_block, axis=0)
            r = pos_j[:, None, :, :] - pos_c[:, :, None, :]
            if box is not None:
                r = minimum_image(r, box.astype(dtype))
            d = jnp.sqrt(jnp.sum(r * r, axis=-1))  # (F, C, TJ)
            neigh = (
                (d < cutoff)
                & (ids_j[None, None, :] != c_ids[None, :, None])
                & (sid_j[None, None, :] >= 0)
                & (sid_c[None, :, None] >= 0)
            )
            return r, d, neigh, sid_j

        def jk_pair(step):
            jb = step // n_jk
            kb = step % n_jk
            r_j, d_j, m_j, s_j = leg(jb * jk_block)
            r_k, d_k, m_k, s_k = leg(kb * jk_block)
            gram = jnp.einsum(
                "fcjd,fckd->fcjk", r_j, r_k,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            denom = d_j[:, :, :, None] * d_k[:, :, None, :]
            cos = gram / jnp.where(denom > 0, denom, 1.0)
            angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0))

            a_id = jnp.maximum(sid_c, 0).astype(jnp.float32)[:, None, None]
            b_id = jnp.maximum(s_j, 0).astype(jnp.float32)[None, :, None]
            cc_id = jnp.maximum(s_k, 0).astype(jnp.float32)[None, None, :]
            s_f = float(s_count)
            sa = s_f - a_id
            block_a = (
                s_f * (s_f + 1.0) * (s_f + 2.0)
                - sa * (sa + 1.0) * (sa + 2.0)
            ) / 6.0
            bb = b_id - a_id
            t_id_f = (
                block_a + bb * (s_f - a_id) - bb * (bb - 1.0) * 0.5
                + (cc_id - b_id)
            )
            ordered = (a_id <= b_id) & (b_id <= cc_id)
            t_id = jnp.where(ordered, t_id_f, -1.0).astype(jnp.int32)

            ids_j = jb * jk_block + jnp.arange(jk_block, dtype=jnp.int32)
            ids_k = kb * jk_block + jnp.arange(jk_block, dtype=jnp.int32)
            mask = (
                m_j[:, :, :, None]
                & m_k[:, :, None, :]
                & (ids_j[:, None] != ids_k[None, :])[None, None, :, :]
                & (t_id >= 0)[None]
            )
            weight = jnp.where(
                mask, 1.0 / jnp.where(denom > 0, denom, 1.0) ** norm_power,
                0.0,
            ).astype(jnp.float32)
            bins = bin_indices(angle, lo, hi, n_bins)
            combined = jnp.maximum(t_id, 0)[None] * n_bins + bins
            return masked_histogram(
                combined, weight, n_triples * n_bins, "auto",
                precision=jax.lax.Precision.HIGHEST,
            )

        steps = jnp.arange(n_jk * n_jk, dtype=jnp.int32)
        return jnp.sum(jax.lax.map(jk_pair, steps), axis=0)

    starts = jnp.arange(n_blocks, dtype=jnp.int32) * c_block
    hists = jax.lax.map(center_block, starts)
    return jnp.sum(hists, axis=0).reshape(n_triples, n_bins)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_bins", "n_triples", "c_block", "norm_power", "max_neighbors"
    ),
)
def adf_histogram_neighbors(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    triple_table: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff: float,
    n_bins: int,
    n_triples: int,
    norm_power: int = 4,
    c_block: int = 64,
    max_neighbors: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Neighbor-list ADF: O(N * K^2) instead of O(N^3).

    For each center a fixed-size ``max_neighbors`` list is selected with
    ``lax.top_k`` over (negated) distances — the TPU-shaped equivalent of
    the reference's within-cutoff triplet preselection
    (``utils/neighbour_list.py:112-177``). Exact whenever every center has
    at most ``max_neighbors`` atoms inside the cutoff (callers size K from
    the density); also returns identical numerics to the brute-force
    kernels in that regime.

    Returns ``(hist, max_count)`` where ``max_count`` is the largest
    number of in-cutoff neighbors any center saw. ``max_count ==
    max_neighbors`` means the list may have saturated (a heterogeneous
    system denser locally than the average) and results may be missing
    triples — callers retry with a larger K.
    """
    f, n_pad0, _ = positions.shape
    n_blocks = -(-n_pad0 // c_block)
    n_tiled = n_blocks * c_block
    if n_tiled != n_pad0:
        positions = jnp.pad(positions, ((0, 0), (0, n_tiled - n_pad0), (0, 0)))
        species_id = jnp.pad(
            species_id, (0, n_tiled - n_pad0), constant_values=-1
        )
    n_pad = positions.shape[1]
    k_n = min(max_neighbors, n_pad)
    lo, hi = ADF_BIN_RANGE
    dtype = positions.dtype
    s_count = triple_table.shape[0]
    sid = species_id
    atom_ids = jnp.arange(n_pad, dtype=jnp.int32)
    big = jnp.asarray(1e30, dtype)

    def center_block(c0):
        pos_c = jax.lax.dynamic_slice_in_dim(positions, c0, c_block, axis=1)
        sid_c = jax.lax.dynamic_slice_in_dim(sid, c0, c_block, axis=0)
        c_ids = c0 + jnp.arange(c_block, dtype=jnp.int32)

        r = positions[:, None, :, :] - pos_c[:, :, None, :]
        if box is not None:
            r = minimum_image(r, box.astype(dtype))
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))  # (F, C, N)
        invalid = (
            (atom_ids[None, None, :] == c_ids[None, :, None])
            | (sid[None, None, :] < 0)
            | (sid_c[None, :, None] < 0)
            | (d >= cutoff)
        )
        d_masked = jnp.where(invalid, big, d)
        neg_d, idx = jax.lax.top_k(-d_masked, k_n)  # (F, C, K)
        d_n = -neg_d
        valid = d_n < cutoff

        r_n = jnp.take_along_axis(r, idx[..., None], axis=2)  # (F, C, K, 3)
        sid_n = sid[idx]  # (F, C, K)

        gram = jnp.einsum(
            "fcjd,fckd->fcjk", r_n, r_n, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        denom = d_n[:, :, :, None] * d_n[:, :, None, :]
        cos = gram / jnp.where(denom > 0, denom, 1.0)
        angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0))  # (F, C, K, K)

        a_id = jnp.maximum(sid_c, 0).astype(jnp.float32)[None, :, None, None]
        b_id = jnp.maximum(sid_n, 0).astype(jnp.float32)[:, :, :, None]
        cc_id = jnp.maximum(sid_n, 0).astype(jnp.float32)[:, :, None, :]
        s_f = float(s_count)
        sa = s_f - a_id
        block_a = (
            s_f * (s_f + 1.0) * (s_f + 2.0) - sa * (sa + 1.0) * (sa + 2.0)
        ) / 6.0
        bb = b_id - a_id
        t_id_f = (
            block_a + bb * (s_f - a_id) - bb * (bb - 1.0) * 0.5 + (cc_id - b_id)
        )
        ordered = (a_id <= b_id) & (b_id <= cc_id)
        t_id = jnp.where(ordered, t_id_f, -1.0).astype(jnp.int32)

        pos_j = jax.lax.broadcasted_iota(jnp.int32, (k_n, k_n), 0)
        pos_k = jax.lax.broadcasted_iota(jnp.int32, (k_n, k_n), 1)
        mask = (
            valid[:, :, :, None]
            & valid[:, :, None, :]
            & (pos_j != pos_k)[None, None, :, :]
            & (t_id >= 0)
        )
        weight = jnp.where(
            mask, 1.0 / jnp.where(denom > 0, denom, 1.0) ** norm_power, 0.0
        ).astype(jnp.float32)
        bins = bin_indices(angle, lo, hi, n_bins)
        combined = jnp.maximum(t_id, 0) * n_bins + bins
        hist = masked_histogram(
            combined, weight, n_triples * n_bins, "auto",
            precision=jax.lax.Precision.HIGHEST,
        )
        # saturation diagnostic: free (valid is already materialised)
        max_count = jnp.max(jnp.sum(valid, axis=2))
        return hist, max_count

    starts = jnp.arange(n_blocks, dtype=jnp.int32) * c_block
    hists, max_counts = jax.lax.map(center_block, starts)
    return (
        jnp.sum(hists, axis=0).reshape(n_triples, n_bins),
        jnp.max(max_counts),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "n_triples", "c_block", "norm_power"),
)
def adf_histogram(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    triple_table: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff: float,
    n_bins: int,
    n_triples: int,
    norm_power: int = 4,
    c_block: int = 8,
) -> jnp.ndarray:
    """Weighted angle histograms per species triple over a frame batch.

    Parameters
    ----------
    positions : (F, Npad, 3) species-concatenated padded frames.
    species_id : (Npad,) int32, -1 = padding.
    triple_table : (S, S, S) key table from :func:`build_triple_table`.
    cutoff : neighbor cutoff for both legs of the angle.
    norm_power : weight = 1 / (|r_ij| |r_ik|)**norm_power (reference default 4).
    c_block : central atoms per tile.

    Returns
    -------
    (n_triples, n_bins) float32 weighted counts (NOT density-normalised —
    the calculator handles the reference's per-batch density normalisation).
    """
    f, n_pad, _ = positions.shape
    dtype = positions.dtype
    n_blocks = -(-n_pad // c_block)
    n_tiled = n_blocks * c_block
    if n_tiled != n_pad:
        positions = jnp.pad(positions, ((0, 0), (0, n_tiled - n_pad), (0, 0)))
        species_id = jnp.pad(
            species_id, (0, n_tiled - n_pad), constant_values=-1
        )
        n_pad = n_tiled
    lo, hi = ADF_BIN_RANGE

    sid = species_id
    j_ids = jnp.arange(n_pad, dtype=jnp.int32)

    def block_hist(c0):
        pos_c = jax.lax.dynamic_slice_in_dim(positions, c0, c_block, axis=1)
        sid_c = jax.lax.dynamic_slice_in_dim(sid, c0, c_block, axis=0)
        c_ids = c0 + jnp.arange(c_block, dtype=jnp.int32)

        # displacement center -> all atoms: (F, C, N, 3)
        r = positions[:, None, :, :] - pos_c[:, :, None, :]
        if box is not None:
            r = minimum_image(r, box.astype(dtype))
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))  # (F, C, N)

        neigh = (
            (d < cutoff)
            & (j_ids[None, None, :] != c_ids[None, :, None])
            & (sid[None, None, :] >= 0)
            & (sid_c[None, :, None] >= 0)
        )  # (F, C, N)

        # Gram matrix of displacement vectors -> MXU.
        gram = jnp.einsum(
            "fcjd,fckd->fcjk", r, r, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dj = d[:, :, :, None]
        dk = d[:, :, None, :]
        denom = dj * dk
        cos = gram / jnp.where(denom > 0, denom, 1.0)
        angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0))  # (F, C, N, N)

        # closed-form combinations-with-replacement index for the ordered
        # triple (a <= b <= c); arithmetic instead of a 3-D table gather
        # (gathers with broadcast indices have faulted this libtpu).
        # A(a) = C(S+2,3) - C(S-a+2,3); within-a pair index as usual.
        s_count = triple_table.shape[0]
        a_id = jnp.maximum(sid_c, 0).astype(jnp.float32)[:, None, None]
        b_id = jnp.maximum(sid, 0).astype(jnp.float32)[None, :, None]
        c_id = jnp.maximum(sid, 0).astype(jnp.float32)[None, None, :]
        s_f = float(s_count)
        sa = s_f - a_id
        block_a = (
            s_f * (s_f + 1.0) * (s_f + 2.0) - sa * (sa + 1.0) * (sa + 2.0)
        ) / 6.0
        bb = b_id - a_id
        t_id_f = (
            block_a + bb * (s_f - a_id) - bb * (bb - 1.0) * 0.5 + (c_id - b_id)
        )
        ordered = (a_id <= b_id) & (b_id <= c_id)
        t_id = jnp.where(ordered, t_id_f, -1.0).astype(jnp.int32)  # (C, N, N)

        mask = (
            neigh[:, :, :, None]
            & neigh[:, :, None, :]
            & (j_ids[None, :] != j_ids[:, None])[None, None, :, :]
            & (t_id >= 0)[None]
        )

        weight = jnp.where(
            mask, 1.0 / jnp.where(denom > 0, denom, 1.0) ** norm_power, 0.0
        ).astype(jnp.float32)

        bins = bin_indices(angle, lo, hi, n_bins)
        combined = jnp.maximum(t_id, 0)[None] * n_bins + bins
        return masked_histogram(combined, weight, n_triples * n_bins, "auto",
                             precision=jax.lax.Precision.HIGHEST)

    starts = jnp.arange(n_blocks, dtype=jnp.int32) * c_block
    hists = jax.lax.map(block_hist, starts)
    return jnp.sum(hists, axis=0).reshape(n_triples, n_bins)


@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "n_species", "norm_power", "c_block"),
)
def adf_pairs_histogram_xla(
    r_n: jnp.ndarray,  # (F, N, K, 3) neighbor displacements
    d_n: jnp.ndarray,  # (F, N, K) neighbor distances
    sid_n: jnp.ndarray,  # (F, N, K) neighbor species, -1 invalid
    sid_c: jnp.ndarray,  # (N,) center species, -1 padding
    n_bins: int,
    n_species: int,
    norm_power: int = 4,
    c_block: int = 64,
) -> jnp.ndarray:
    """XLA angle stage on precomputed neighbor lists.

    The angle/histogram half of :func:`adf_histogram_neighbors`, decoupled
    so the neighbor-list stage can come from cell lists
    (``ops.cells.neighbor_lists_cells``) or the O(N^2) scan. Numerics are
    identical to the fused function.
    """
    f, n, k_nn = r_n.shape[:3]
    n_pad = -(-n // c_block) * c_block
    if n_pad != n:
        r_n = jnp.pad(r_n, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
        d_n = jnp.pad(d_n, ((0, 0), (0, n_pad - n), (0, 0)))
        sid_n = jnp.pad(
            sid_n, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=-1
        )
        sid_c = jnp.pad(sid_c, (0, n_pad - n), constant_values=-1)
        n = n_pad
    lo, hi = ADF_BIN_RANGE
    s_f = float(n_species)
    n_triples = n_species * (n_species + 1) * (n_species + 2) // 6
    sid_cf = sid_c.astype(jnp.float32)

    def center_block(c0):
        r_b = jax.lax.dynamic_slice_in_dim(r_n, c0, c_block, axis=1)
        d_b = jax.lax.dynamic_slice_in_dim(d_n, c0, c_block, axis=1)
        s_b = jax.lax.dynamic_slice_in_dim(sid_n, c0, c_block, axis=1)
        sc_b = jax.lax.dynamic_slice_in_dim(sid_cf, c0, c_block, axis=0)

        gram = jnp.einsum(
            "fcjd,fckd->fcjk", r_b, r_b, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        denom = d_b[:, :, :, None] * d_b[:, :, None, :]
        cos = gram / jnp.where(denom > 0, denom, 1.0)
        angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0))

        a_id = jnp.maximum(sc_b, 0.0)[None, :, None, None]
        b_id = jnp.maximum(s_b, 0).astype(jnp.float32)[:, :, :, None]
        cc_id = jnp.maximum(s_b, 0).astype(jnp.float32)[:, :, None, :]
        sa = s_f - a_id
        block_a = (
            s_f * (s_f + 1.0) * (s_f + 2.0) - sa * (sa + 1.0) * (sa + 2.0)
        ) / 6.0
        bb = b_id - a_id
        t_id_f = (
            block_a + bb * (s_f - a_id) - bb * (bb - 1.0) * 0.5 + (cc_id - b_id)
        )
        ordered = (a_id <= b_id) & (b_id <= cc_id)
        t_id = jnp.where(ordered, t_id_f, -1.0).astype(jnp.int32)

        pos_j = jax.lax.broadcasted_iota(jnp.int32, (k_nn, k_nn), 0)
        pos_k = jax.lax.broadcasted_iota(jnp.int32, (k_nn, k_nn), 1)
        mask = (
            (s_b >= 0)[:, :, :, None]
            & (s_b >= 0)[:, :, None, :]
            & (sc_b >= 0.0)[None, :, None, None]
            & (pos_j != pos_k)[None, None, :, :]
            & (t_id >= 0)
        )
        weight = jnp.where(
            mask,
            1.0 / jnp.where(denom > 0, denom, 1.0) ** norm_power,
            0.0,
        ).astype(jnp.float32)
        bins = bin_indices(angle, lo, hi, n_bins)
        combined = jnp.maximum(t_id, 0) * n_bins + bins
        return masked_histogram(combined, weight, n_triples * n_bins, "auto",
                             precision=jax.lax.Precision.HIGHEST)

    n_blocks = n // c_block
    starts = jnp.arange(n_blocks, dtype=jnp.int32) * c_block
    hists = jax.lax.map(center_block, starts)
    return jnp.sum(hists, axis=0).reshape(n_triples, n_bins)
