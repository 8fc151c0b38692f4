"""Pallas RDF kernel vs the XLA reference kernel (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_analysis_tpu.ops.pallas_rdf import rdf_histogram_pallas
from lammps_analysis_tpu.ops.rdf import build_species_layout, rdf_histogram


@pytest.mark.parametrize("counts", [[40, 24], [64], [16, 16, 16]])
def test_pallas_matches_xla(rng, counts):
    n_total = sum(counts)
    box = (6.0, 6.0, 6.0)
    sid, n_pad, ptab, n_pairs, _ = build_species_layout(counts, pad_to=8)
    pos = np.zeros((2, n_pad, 3), np.float32)
    pos[:, :n_total] = rng.uniform(0, 6, size=(2, n_total, 3)).astype(
        np.float32
    )
    cutoff, n_bins = 2.9, 50
    h_ref = np.asarray(
        rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(np.array(box, np.float32)), cutoff, n_bins,
            n_pairs, i_block=8,
        )
    )
    h_pal = np.asarray(
        rdf_histogram_pallas(
            jnp.asarray(pos), jnp.asarray(sid), cutoff, n_bins,
            len(counts), box, interpret=True,
        )
    )
    np.testing.assert_array_equal(h_pal, h_ref)


def test_pallas_multi_jblock_triangle_and_valid_frames(rng):
    """N > TJ exercises the diagonal-start j-sweep; padded frames beyond
    ``n_valid_frames`` must contribute nothing (garbage in the pad)."""
    n_total = 2100  # > _TJ_MAX -> two j-blocks, i-tiles skip the lower one
    box = (30.0, 30.0, 30.0)
    sid, n_pad, ptab, n_pairs, _ = build_species_layout(
        [n_total // 2, n_total - n_total // 2], pad_to=8
    )
    pos = np.zeros((1, n_pad, 3), np.float32)
    pos[:, :n_total] = rng.uniform(0, 30, size=(1, n_total, 3)).astype(
        np.float32
    )
    cutoff, n_bins = 9.9, 75
    h_ref = np.asarray(
        rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(np.array(box, np.float32)), cutoff, n_bins,
            n_pairs, i_block=128,
        )
    )
    # pad the frame axis with garbage; the dynamic bound must mask it out
    pos_padded = np.concatenate(
        [pos, np.full((1, n_pad, 3), 1e6, np.float32)], axis=0
    )
    h_pal = np.asarray(
        rdf_histogram_pallas(
            jnp.asarray(pos_padded), jnp.asarray(sid), cutoff, n_bins,
            2, box, n_valid_frames=1, interpret=True,
        )
    )
    np.testing.assert_array_equal(h_pal, h_ref)


def test_pallas_pair_index_formula():
    """Closed-form combinations-with-replacement index == table order."""
    for s in (1, 2, 3, 5):
        _, _, ptab, _, order = build_species_layout([4] * s, pad_to=8)
        for a in range(s):
            for b in range(s):
                lo, hi = min(a, b), max(a, b)
                formula = lo * s - lo * (lo - 1) // 2 + (hi - lo)
                assert formula == ptab[a, b], (s, a, b)


def test_padded_atom_count_golden():
    """The wrapper sizes frames-per-call (VMEM) from ``padded_atom_count``;
    these goldens lock the kernel/wrapper agreement that, when broken,
    produced a compile-time scoped-VMEM OOM on small systems."""
    from lammps_analysis_tpu.ops.pallas_rdf import padded_atom_count

    goldens = {8: 128, 216: 256, 512: 512, 1024: 1024, 1025: 1280,
               1500: 1536, 2048: 2048, 10240: 10240}
    for n, expect in goldens.items():
        assert padded_atom_count(n) == expect, (n, padded_atom_count(n))
        assert padded_atom_count(n) >= n
