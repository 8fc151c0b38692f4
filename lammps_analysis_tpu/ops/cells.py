"""Cell lists: O(N) spatial binning for short-cutoff neighbor searches.

The reference enumerates neighbors from full O(N^2) distance matrices
(``utils/neighbour_list.py:54-108``); the TPU build's neighbor-list stage
did too, and profiling shows ``lax.top_k`` over all N atoms dominating ADF
wall-clock (83 of 119 ms/frame at 10k atoms). Classic MD cell lists fix
the complexity: atoms bin into cells at least one cutoff wide, and each
center's neighbor candidates come from its 27 adjacent cells — O(density)
instead of O(N) work per center.

TPU-shaped implementation: everything static — cells have a fixed
``capacity`` (the padded occupancy table is ``(n_cells, capacity)``), and
callers get back an ``overflow`` flag (max occupancy observed) for the
K-retry pattern the ADF kernels already use. Atoms are sorted by cell id
once per frame (a 10k-element sort is trivial next to the N^2 it avoids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def cells_per_dim(box_l: float, cutoff: float) -> int:
    """Cells per box edge: cell width must be >= cutoff; need >= 3 cells."""
    d = int(box_l // cutoff)
    return max(d, 1)


def cell_lists_applicable(box, cutoff) -> bool:
    """Cell lists need >= 3 cells per dimension (27-cell neighborhoods
    otherwise degenerate to the whole box) and a cubic-ish box."""
    import numpy as np

    box = np.asarray(box)
    return bool((np.floor(box / cutoff) >= 3).all())


@functools.partial(jax.jit, static_argnames=("n_dim", "capacity"))
def build_cell_table(
    positions: jnp.ndarray,  # (N, 3) one frame, wrapped into the box
    box: jnp.ndarray,  # (3,)
    n_dim: int,
    capacity: int,
    valid: jnp.ndarray | None = None,  # (N,) bool; padding atoms excluded
):
    """Cell occupancy table for one frame.

    Returns ``(table (n_cells + 1, capacity) int32 atom indices, -1
    padding; counts (n_cells + 1,); cell_of_atom (N,); max_occupancy ())``.
    Invalid (padding) atoms land in the extra dummy cell ``n_cells``,
    which no candidate neighborhood reads, so they neither consume real
    capacity nor appear as candidates.
    """
    n = positions.shape[0]
    coord = jnp.clip(
        jnp.floor(positions / box * n_dim).astype(jnp.int32), 0, n_dim - 1
    )  # (N, 3)
    cell_id = (coord[:, 0] * n_dim + coord[:, 1]) * n_dim + coord[:, 2]
    n_cells = n_dim**3
    if valid is not None:
        cell_id = jnp.where(valid, cell_id, n_cells)

    order = jnp.argsort(cell_id)  # stable enough; ties by position
    sorted_ids = cell_id[order]
    # rank of each atom within its cell: index in the sorted run
    run_start = jnp.searchsorted(sorted_ids, sorted_ids, side="left")
    slot = jnp.arange(n, dtype=jnp.int32) - run_start.astype(jnp.int32)
    slot_clipped = jnp.minimum(slot, capacity - 1)

    table = jnp.full((n_cells + 1, capacity), -1, dtype=jnp.int32)
    table = table.at[sorted_ids, slot_clipped].set(
        order.astype(jnp.int32), mode="drop"
    )
    counts = jnp.zeros((n_cells + 1,), jnp.int32).at[cell_id].add(1)
    # dummy-cell occupancy is irrelevant for overflow detection
    return table, counts, cell_id, jnp.max(counts[:n_cells])


def neighbor_cell_offsets() -> jnp.ndarray:
    """(27, 3) integer offsets of the 3x3x3 cell neighborhood."""
    import numpy as np

    r = np.arange(-1, 2)
    return jnp.asarray(
        np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(27, 3)
    )


@functools.partial(jax.jit, static_argnames=("n_dim", "capacity"))
def candidate_table(
    table: jnp.ndarray,  # (n_cells, capacity)
    n_dim: int,
    capacity: int,
):
    """Per-cell candidate atom indices from the 27-cell neighborhood.

    Returns ``(n_cells, 27 * capacity)`` int32, -1 padding. Periodic
    wrapping of cell coordinates matches the minimum-image convention used
    by the distance kernels.
    """
    n_cells = n_dim**3
    ids = jnp.arange(n_cells, dtype=jnp.int32)
    cz = ids % n_dim
    cy = (ids // n_dim) % n_dim
    cx = ids // (n_dim * n_dim)
    offs = neighbor_cell_offsets()  # (27, 3)
    nx = (cx[:, None] + offs[None, :, 0]) % n_dim
    ny = (cy[:, None] + offs[None, :, 1]) % n_dim
    nz = (cz[:, None] + offs[None, :, 2]) % n_dim
    ncell = (nx * n_dim + ny) * n_dim + nz  # (n_cells, 27)
    return table[ncell].reshape(n_cells, 27 * capacity)


@functools.partial(
    jax.jit, static_argnames=("k_n", "n_dim", "capacity", "c_block")
)
def neighbor_lists_cells(
    positions: jnp.ndarray,  # (F, N, 3) wrapped positions
    species_id: jnp.ndarray,  # (N,) int32, -1 padding
    box: jnp.ndarray,  # (3,)
    cutoff,
    k_n: int,
    n_dim: int,
    capacity: int,
    c_block: int = 64,  # kept for signature parity; cells set the blocking
):
    """Per-center top-K in-cutoff neighbors via cell lists, cell-major.

    Same contract as ``pallas_adf.adf_neighbor_lists`` — returns
    ``(r_n, d_n, sid_n, sid_pad, max_count, max_occupancy)`` in the
    ORIGINAL atom order — but the top_k runs over the 27-cell candidate
    set (27 * capacity) instead of all N atoms.

    TPU-shaped data movement: atoms scatter once per frame into a
    cell-sorted padded layout; every cell block then reads its centers and
    its 27 neighbor cells as CONTIGUOUS dynamic slices (no per-center
    random gathers — element gathers measured slower than the O(N^2) scan
    they replaced), and one chunky row-gather at the end maps results back
    to atom order. ``max_occupancy > capacity`` means cells overflowed and
    results dropped atoms: callers MUST retry with a larger capacity.
    """
    from .geometry import minimum_image

    f, n, _ = positions.shape
    dtype = positions.dtype
    sid = species_id
    big = jnp.asarray(1e30, dtype)
    n_cells = n_dim**3
    n_cand = 27 * capacity
    k_n = min(k_n, n_cand)
    cb = 8  # cells per map step (batches the tiny per-cell work)
    n_cell_blocks = -(-n_cells // cb)
    # rows cover all (block-padded) cells plus the dummy cell for padding
    # atoms; block-padding cells read rows with sid = -1 (all invalid)
    n_rows = (max(n_cell_blocks * cb, n_cells) + 1) * capacity

    coord = jnp.clip(
        jnp.floor(positions / box * n_dim).astype(jnp.int32), 0, n_dim - 1
    )  # (F, N, 3)
    cell_id = (coord[..., 0] * n_dim + coord[..., 1]) * n_dim + coord[..., 2]
    cell_id = jnp.where(sid[None, :] >= 0, cell_id, n_cells)  # (F, N)

    def frame_rows(cid_f):
        order = jnp.argsort(cid_f)
        sorted_ids = cid_f[order]
        run_start = jnp.searchsorted(sorted_ids, sorted_ids, side="left")
        slot = jnp.arange(n, dtype=jnp.int32) - run_start.astype(jnp.int32)
        # row of each atom in the padded sorted layout (original order)
        rows_sorted = sorted_ids * capacity + jnp.minimum(slot, capacity - 1)
        row_of_atom = jnp.zeros((n,), jnp.int32).at[order].set(rows_sorted)
        counts = jnp.zeros((n_cells + 1,), jnp.int32).at[cid_f].add(1)
        return row_of_atom, jnp.max(counts[:n_cells])

    row_of_atom, occs = jax.vmap(frame_rows)(cell_id)  # (F, N), (F,)
    max_occ = jnp.max(occs)

    # scatter into the cell-sorted padded layout
    atom_ids = jnp.arange(n, dtype=jnp.int32)

    def scatter_frame(pos_f, rows_f):
        pos_p = jnp.zeros((n_rows, 3), dtype).at[rows_f].set(pos_f)
        sid_p = jnp.full((n_rows,), -1, jnp.int32).at[rows_f].set(sid)
        aid_p = jnp.full((n_rows,), -1, jnp.int32).at[rows_f].set(atom_ids)
        return pos_p, sid_p, aid_p

    pos_pad, sid_pad_rows, aid_pad = jax.vmap(scatter_frame)(
        positions, row_of_atom
    )  # (F, n_rows, ...)

    # 27-neighborhood cell ids (static table)
    ids = np.arange(n_cells)
    cz = ids % n_dim
    cy = (ids // n_dim) % n_dim
    cx = ids // (n_dim * n_dim)
    r3 = np.arange(-1, 2)
    offs = np.stack(np.meshgrid(r3, r3, r3, indexing="ij"), -1).reshape(27, 3)
    ncell = (
        ((cx[:, None] + offs[None, :, 0]) % n_dim) * n_dim
        + (cy[:, None] + offs[None, :, 1]) % n_dim
    ) * n_dim + (cz[:, None] + offs[None, :, 2]) % n_dim
    ncell = jnp.asarray(ncell.astype(np.int32))  # (n_cells, 27)

    # candidate row indices per cell (static): 27 contiguous capacity-runs
    cand_rows = (
        ncell[:, :, None] * capacity
        + jnp.arange(capacity, dtype=jnp.int32)[None, None, :]
    ).reshape(n_cells, n_cand)  # (n_cells, 27 * capacity)

    if n_cell_blocks * cb != n_cells:
        pad_cells = n_cell_blocks * cb - n_cells
        # pad with the dummy cell's rows (all-invalid candidates/centers)
        cand_rows = jnp.concatenate(
            [cand_rows,
             jnp.full((pad_cells, n_cand), n_cells * capacity, jnp.int32)],
            axis=0,
        )

    def cell_block(b0):
        rows_c = jax.lax.dynamic_slice_in_dim(cand_rows, b0, cb, axis=0)
        # centers: cb contiguous capacity-runs starting at b0 * capacity
        c0 = b0 * capacity
        ctr_pos = jax.lax.dynamic_slice_in_dim(
            pos_pad, c0, cb * capacity, axis=1
        ).reshape(f, cb, capacity, 3)
        ctr_sid = jax.lax.dynamic_slice_in_dim(
            sid_pad_rows, c0, cb * capacity, axis=1
        ).reshape(f, cb, capacity)
        ctr_aid = jax.lax.dynamic_slice_in_dim(
            aid_pad, c0, cb * capacity, axis=1
        ).reshape(f, cb, capacity)
        # one coalesced row-gather for all cb cells' candidate sets
        flat = rows_c.reshape(-1)  # (cb * n_cand)
        cnd_pos = pos_pad[:, flat].reshape(f, cb, n_cand, 3)
        cnd_sid = sid_pad_rows[:, flat].reshape(f, cb, n_cand)
        cnd_aid = aid_pad[:, flat].reshape(f, cb, n_cand)

        r = cnd_pos[:, :, None, :, :] - ctr_pos[:, :, :, None, :]
        r = minimum_image(r, box.astype(dtype))
        d = jnp.sqrt(jnp.sum(r * r, axis=-1))  # (F, cb, capacity, n_cand)
        invalid = (
            (cnd_sid[:, :, None, :] < 0)
            | (ctr_sid[:, :, :, None] < 0)
            | (cnd_aid[:, :, None, :] == ctr_aid[:, :, :, None])
            | (d >= cutoff)
        )
        d_masked = jnp.where(invalid, big, d)
        neg_d, kidx = jax.lax.top_k(-d_masked, k_n)
        d_nn = -neg_d
        valid = d_nn < cutoff
        r_nn = jnp.take_along_axis(r, kidx[..., None], axis=3)
        s_nn = jnp.where(
            valid,
            jnp.take_along_axis(
                jnp.broadcast_to(
                    cnd_sid[:, :, None, :], (f, cb, capacity, n_cand)
                ),
                kidx, axis=3,
            ),
            -1,
        )
        return (
            r_nn.reshape(f, cb * capacity, k_n, 3),
            d_nn.reshape(f, cb * capacity, k_n),
            s_nn.reshape(f, cb * capacity, k_n),
            jnp.max(jnp.sum(valid, axis=3)),
        )

    blocks = jnp.arange(n_cell_blocks, dtype=jnp.int32) * cb
    r_b, d_b, s_b, mc = jax.lax.map(cell_block, blocks)
    # (B, F, cb*capacity, ...) -> padded sorted layout (F, rows, ...)
    rows_total = n_cell_blocks * cb * capacity
    r_rows = jnp.moveaxis(r_b, 0, 1).reshape(f, rows_total, k_n, 3)
    d_rows = jnp.moveaxis(d_b, 0, 1).reshape(f, rows_total, k_n)
    s_rows = jnp.moveaxis(s_b, 0, 1).reshape(f, rows_total, k_n)

    # chunky row-gather back to original atom order (rows are K-wide)
    safe_rows = jnp.minimum(row_of_atom, n_cells * capacity - 1)
    r_n = jnp.take_along_axis(
        r_rows, safe_rows[:, :, None, None], axis=1
    )
    d_n = jnp.take_along_axis(d_rows, safe_rows[:, :, None], axis=1)
    sid_n = jnp.take_along_axis(s_rows, safe_rows[:, :, None], axis=1)
    # padding atoms (dummy cell) read an arbitrary row: mask them out
    pad_ctr = (sid < 0)[None, :]
    sid_n = jnp.where(pad_ctr[..., None], -1, sid_n)
    return r_n, d_n, sid_n, sid, jnp.max(mc), max_occ
