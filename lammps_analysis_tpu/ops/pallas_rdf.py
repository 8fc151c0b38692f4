"""Pallas TPU kernel: fused minimum-image distances + histogram.

The XLA path (``ops.rdf.rdf_histogram``) materialises per-tile one-hot
matrices in HBM between the compare and the matmul, making wide-histogram
binning HBM-bandwidth-bound. This kernel keeps the whole tile pipeline in
VMEM: displacement -> minimum image -> distance -> combined (pair, bin)
index -> split one-hots -> MXU outer-product accumulation into a resident
(n_hi, n_lo) scratch histogram; one grid pass over i-tiles, j swept inside.

Design notes
------------
* the species-pair index needs no table gather: for species ids ``a <= b``
  of ``S`` species, the combinations-with-replacement index is
  ``a*S - a*(a-1)/2 + (b-a)`` — pure elementwise arithmetic on the VPU
  (same ordering as ``ops.rdf.build_species_layout``);
* the flat (pair, bin) id splits as ``hi*K + lo`` and the histogram is the
  outer-product contraction ``oh_hi^T @ oh_lo`` over the tile's pair axis
  (see ``ops.histogram.masked_histogram_outer``) — entirely in VMEM here;
* frames fold into the contraction: a tile is (F * TI, N) pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "cutoff", "n_bins", "n_species", "box", "i_block", "interpret"
    ),
)
def rdf_histogram_pallas(
    positions: jnp.ndarray,  # (F, N, 3) float32, species-concatenated
    species_id: jnp.ndarray,  # (N,) int32, -1 padding
    cutoff: float,
    n_bins: int,
    n_species: int,
    box: tuple,
    i_block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-species-pair distance histograms; returns (n_pairs, n_bins) f32."""
    f, n, _ = positions.shape
    n_pairs = n_species * (n_species + 1) // 2
    n_total_bins = n_pairs * n_bins

    # split geometry for the outer-product histogram
    k = int(np.ceil(np.sqrt(n_total_bins)))
    n_hi = -(-n_total_bins // k)
    hi_pad = _round_up(n_hi, 128)
    lo_pad = _round_up(k, 128)

    n_pad = _round_up(n, i_block)
    if n_pad != n:
        positions = jnp.pad(positions, ((0, 0), (0, n_pad - n), (0, 0)))
        species_id = jnp.pad(species_id, (0, n_pad - n), constant_values=-1)
    n_blocks = n_pad // i_block

    # (F, N) -> transposed component planes for clean (TI, N) tiles
    px = positions[..., 0]
    py = positions[..., 1]
    pz = positions[..., 2]
    sid_f = species_id.astype(jnp.float32)
    sid_2d = sid_f[None, :]  # (1, N)

    bx, by, bz = (float(b) for b in box)
    inv_bin = n_bins / cutoff

    def kernel(px_ref, py_ref, pz_ref, sid_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        i0 = i * i_block
        sid_i = sid_ref[0, pl.ds(i0, i_block)]  # (TI,)
        # global atom indices for the triu mask
        i_ids = i0 + jax.lax.broadcasted_iota(
            jnp.int32, (i_block, 1), 0
        )[:, 0]
        j_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)[0]

        def frame_body(fi, _):
            xi = px_ref[fi, pl.ds(i0, i_block)]  # (TI,)
            yi = py_ref[fi, pl.ds(i0, i_block)]
            zi = pz_ref[fi, pl.ds(i0, i_block)]
            xj = px_ref[fi, :]  # (N,)
            yj = py_ref[fi, :]
            zj = pz_ref[fi, :]

            dx = xi[:, None] - xj[None, :]
            dy = yi[:, None] - yj[None, :]
            dz = zi[:, None] - zj[None, :]
            dx = dx - bx * jnp.round(dx * (1.0 / bx))
            dy = dy - by * jnp.round(dy * (1.0 / by))
            dz = dz - bz * jnp.round(dz * (1.0 / bz))
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # (TI, N)

            sa = sid_i[:, None]
            sb = sid_ref[0, :][None, :]
            lo_s = jnp.minimum(sa, sb)
            hi_s = jnp.maximum(sa, sb)
            pair_id = (
                lo_s * n_species
                - lo_s * (lo_s - 1.0) * 0.5
                + (hi_s - lo_s)
            )

            bin_f = jnp.floor(d * inv_bin)
            bin_f = jnp.minimum(bin_f, n_bins - 1.0)
            combined = pair_id * n_bins + bin_f  # float32 ids (exact < 2^24)

            mask = (
                (j_ids[None, :] > i_ids[:, None])
                & (sa >= 0)
                & (sb >= 0)
                & (d < cutoff)
            )
            w = jnp.where(mask, 1.0, 0.0)

            hi_id = jnp.floor(combined * (1.0 / k))
            lo_id = combined - hi_id * k

            # one-hots over the padded split axes
            hi_ids = jax.lax.broadcasted_iota(
                jnp.float32, (1, hi_pad), 1
            )
            lo_ids = jax.lax.broadcasted_iota(
                jnp.float32, (1, lo_pad), 1
            )
            # (TI*N, hi_pad) / (TI*N, lo_pad) via 2-step: contract rows
            oh_hi = jnp.where(
                hi_id.reshape(i_block * n_pad, 1) == hi_ids, 1.0, 0.0
            ) * w.reshape(i_block * n_pad, 1)
            oh_lo = jnp.where(
                lo_id.reshape(i_block * n_pad, 1) == lo_ids, 1.0, 0.0
            )
            acc_ref[...] += jax.lax.dot_general(
                oh_hi, oh_lo,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, f, frame_body, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_ref[...]

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (hi_pad, lo_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hi_pad, lo_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((hi_pad, lo_pad), jnp.float32)],
        interpret=interpret,
    )(px, py, pz, sid_2d)

    flat = out[:n_hi, :k].reshape(-1)[:n_total_bins]
    return flat.reshape(n_pairs, n_bins)
