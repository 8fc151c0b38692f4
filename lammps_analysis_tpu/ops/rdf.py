"""RDF histogram kernels: tiled minimum-image pair distances + binning.

TPU-native re-design of the reference RDF hot loop
(``calculators/radial_distribution_function.py:617-689`` +
``utils/linalg.py:102-122``). The reference gathers partial triangular index
lists and boolean-masks per species pair — dynamic shapes, fine for TF on
GPU, hostile to XLA on TPU. Here:

* atoms of all species are concatenated, padded to a lane-friendly size, and
  tagged with an integer species id (``-1`` = padding);
* the kernel sweeps regular ``(i-block, all-j)`` tiles; the upper-triangle
  condition, padding, and the cutoff are *masks*, not index lists;
* every (species-pair, bin) is encoded into one flat histogram id so a
  single MXU one-hot contraction bins all species pairs of a tile at once.

Counting convention matches the reference exactly: each unordered pair is
counted once; the same-species factor 2 is applied in the prefactor
(``radial_distribution_function.py:299-345``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import minimum_image
from .histogram import bin_indices, masked_histogram


def build_species_layout(n_per_species: list[int], pad_to: int = 8):
    """Concatenated species layout: ids, padding, unordered-pair index table.

    Returns ``(species_id (Npad,), n_pad, pair_table (S, S), n_pairs,
    pair_names_order)`` where ``pair_table[a, b]`` is the index of the
    unordered pair ``(min(a,b), max(a,b))`` in ``itertools``'
    combinations-with-replacement order — the same ordering the reference
    uses for its result keys (``radial_distribution_function.py:269-274``).
    """
    n_species = len(n_per_species)
    total = int(np.sum(n_per_species))
    n_pad = -(-total // pad_to) * pad_to
    sid = np.full((n_pad,), -1, dtype=np.int32)
    off = 0
    for s, n in enumerate(n_per_species):
        sid[off : off + n] = s
        off += n
    pair_table = np.zeros((n_species, n_species), dtype=np.int32)
    idx = 0
    order = []
    for a in range(n_species):
        for b in range(a, n_species):
            pair_table[a, b] = idx
            pair_table[b, a] = idx
            order.append((a, b))
            idx += 1
    return sid, n_pad, pair_table, idx, order


@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "n_pairs", "i_block", "strategy"),
)
def rdf_histogram(
    positions: jnp.ndarray,
    species_id: jnp.ndarray,
    pair_table: jnp.ndarray,
    box: jnp.ndarray | None,
    cutoff: float,
    n_bins: int,
    n_pairs: int,
    i_block: int = 128,
    strategy: str = "auto",
) -> jnp.ndarray:
    """Per-species-pair distance histograms over a batch of frames.

    Parameters
    ----------
    positions : (F, Npad, 3) frame batch, species-concatenated and padded.
    species_id : (Npad,) int32, -1 marks padding.
    pair_table : (S, S) unordered pair index table.
    box : (3,) box lengths for minimum image, or None for open boundaries.
    cutoff : maximum distance binned.
    n_bins, n_pairs : histogram geometry (static).
    i_block : atoms per i-tile (static; multiple of 8).

    Returns
    -------
    (n_pairs, n_bins) float32 counts of unordered pairs.
    """
    f, n_pad, _ = positions.shape
    dtype = positions.dtype

    # Pad the atom axis to a multiple of the tile size (masked via sid = -1).
    n_blocks = -(-n_pad // i_block)
    n_tiled = n_blocks * i_block
    if n_tiled != n_pad:
        positions = jnp.pad(positions, ((0, 0), (0, n_tiled - n_pad), (0, 0)))
        species_id = jnp.pad(
            species_id, (0, n_tiled - n_pad), constant_values=-1
        )
        n_pad = n_tiled

    j_ids = jnp.arange(n_pad, dtype=jnp.int32)
    sid_j = species_id

    def block_hist(i0):
        pos_i = jax.lax.dynamic_slice_in_dim(positions, i0, i_block, axis=1)
        i_ids = i0 + jnp.arange(i_block, dtype=jnp.int32)
        sid_i = jax.lax.dynamic_slice_in_dim(species_id, i0, i_block, axis=0)

        # (F, B, N, 3) displacement -> (F, B, N) distances, fused by XLA.
        r = pos_i[:, :, None, :] - positions[:, None, :, :]
        if box is not None:
            r = minimum_image(r, box.astype(dtype))
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))

        triu = j_ids[None, :] > i_ids[:, None]  # (B, N): j strictly after i
        valid_sp = (sid_i[:, None] >= 0) & (sid_j[None, :] >= 0)
        mask = (triu & valid_sp)[None] & (d < cutoff)  # (F, B, N)

        pair_id = pair_table[
            jnp.maximum(sid_i, 0)[:, None], jnp.maximum(sid_j, 0)[None, :]
        ]  # (B, N)
        bins = bin_indices(d, 0.0, cutoff, n_bins)  # (F, B, N)
        combined = pair_id[None] * n_bins + bins
        return masked_histogram(
            combined, mask.astype(jnp.float32), n_pairs * n_bins, strategy
        )

    starts = jnp.arange(n_blocks, dtype=jnp.int32) * i_block
    hists = jax.lax.map(block_hist, starts)
    return jnp.sum(hists, axis=0).reshape(n_pairs, n_bins)


def ideal_gas_correction(bin_edges: np.ndarray, box_l: float) -> np.ndarray:
    """Ideal-gas shell term with beyond-half-box corrections.

    Host-side port of the reference's piecewise correction
    (``radial_distribution_function.py:719-826``): plain ``4 pi r^2`` below
    L/2, analytic sphere-box intersection corrections up to ``sqrt(2) L / 2``.
    """
    r = np.asarray(bin_edges, dtype=float)
    lower = box_l / 2.0
    middle = np.sqrt(2.0) * box_l / 2.0
    x = r / box_l  # corrections are expressed in units of the box length

    spherical = 4.0 * np.pi * r**2

    with np.errstate(invalid="ignore", divide="ignore"):
        corr1 = 2.0 * np.pi * x * (3.0 - 4.0 * x) * box_l**2
        arg = 4.0 * x**2 - 2.0
        arctan_1 = np.arctan(np.sqrt(np.maximum(arg, 0.0)))
        arctan_2 = 8.0 * x * np.arctan(
            (2.0 * x * (4.0 * x**2 - 3.0))
            / (np.sqrt(np.maximum(arg, 1e-300)) * (4.0 * x**2 + 1.0))
        )
        corr2 = 2.0 * x * (3.0 * np.pi - 12.0 * arctan_1 + arctan_2) * box_l**2

    out = np.where(r <= lower, spherical, np.where(r < middle, corr1, corr2))
    return out


def rdf_prefactors(
    n_pairs_order: list[tuple[int, int]],
    n_per_species: list[int],
    volume: float,
    n_configurations: int,
    bin_edges: np.ndarray,
    box_l: float,
) -> np.ndarray:
    """Per-(pair, bin) normalisation turning counts into g(r).

    Mirrors ``_calculate_prefactor`` + ``ideal_correction``
    (``radial_distribution_function.py:299-345, 719-826``): factor 2 for
    same-species pairs (each unordered pair counted once), ideal-gas shell
    volume times partner density times observer count times frames.
    """
    # the histogram bins are [i, i+1) * cutoff / n_bins — the TRUE bin width
    # is cutoff / n_bins, NOT the x-axis spacing cutoff / (n_bins - 1)
    # (the reference's bin_width, radial_distribution_function.py:822)
    cutoff = float(bin_edges[-1]) if len(bin_edges) > 1 else 1.0
    bin_width = cutoff / len(bin_edges)
    ideal = ideal_gas_correction(bin_edges, box_l) * bin_width
    out = np.zeros((len(n_pairs_order), len(bin_edges)))
    with np.errstate(divide="ignore", invalid="ignore"):
        for p, (a, b) in enumerate(n_pairs_order):
            scale = 2.0 if a == b else 1.0
            rho = n_per_species[b] / volume
            denom = n_configurations * rho * ideal * n_per_species[a]
            out[p] = np.where(denom > 0, scale / np.where(denom > 0, denom, 1.0), 0.0)
    return out
