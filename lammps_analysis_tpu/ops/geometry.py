"""Geometry primitives: minimum-image displacements, pairwise distances.

TPU-native replacements for the reference's TF linalg helpers
(``mdsuite/utils/linalg.py:36-259`` and ``utils/neighbour_list.py``). The
design difference: instead of materialising triangular index lists
(``get_partial_triu_indices``) the kernels here work on **regular (i, j)
blocks with masks** — rectangular tiles map onto the VPU/MXU, index gathers
do not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def time_cumsum(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Cumulative sum along the (leading) time axis, backend-tuned.

    XLA's CPU lowering of ``cumsum`` over a long leading axis is ~20x
    slower than a plain ``lax.scan`` running sum (measured 6.2 s vs
    0.33 s on (4000, 10240, 3) f32): the scan does one vectorised row
    add per step. On TPU the scan's sequential grid is the slow path
    and the native ``cumsum`` lowering wins, so the choice follows the
    backend the enclosing jit targets.
    """
    if jax.default_backend() != "cpu":
        from ..utils.devices import bandwidth_bound_device

        if bandwidth_bound_device() is None:
            return jnp.cumsum(x, axis=axis)
    if axis != 0:
        x = jnp.moveaxis(x, axis, 0)
    def step(c, row):
        c = c + row
        return c, c
    _, y = jax.lax.scan(step, jnp.zeros_like(x[0]), x)
    if axis != 0:
        y = jnp.moveaxis(y, 0, axis)
    return y


def minimum_image(r_ij: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Apply the minimum-image convention to displacement vectors.

    ``r_ij`` has trailing dim 3 (or matching ``box``); ``box`` is the
    orthorhombic box edge-length vector. Reference analog:
    ``apply_minimum_image`` (``utils/linalg.py:84-99``).
    """
    return r_ij - box * jnp.round(r_ij / box)


def pair_displacements(
    pos_i: jnp.ndarray, pos_j: jnp.ndarray, box: jnp.ndarray | None
) -> jnp.ndarray:
    """Blockwise displacement tensor ``(I, J, 3)`` between two position sets."""
    r = pos_i[:, None, :] - pos_j[None, :, :]
    if box is not None:
        r = minimum_image(r, box)
    return r


def pair_distances(
    pos_i: jnp.ndarray, pos_j: jnp.ndarray, box: jnp.ndarray | None
) -> jnp.ndarray:
    """Blockwise distance matrix ``(I, J)`` with minimum image."""
    r = pair_displacements(pos_i, pos_j, box)
    return jnp.sqrt(jnp.sum(r * r, axis=-1))


def angle_between(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) between batched vectors (reference ``utils/linalg.py:36-81``)."""
    cos = jnp.sum(v1 * v2, axis=-1) / (
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    )
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def cartesian_to_spherical(xyz: jnp.ndarray) -> jnp.ndarray:
    """``(..., 3)`` cartesian -> ``(r, theta, phi)`` (reference ``linalg.py:139-183``)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arccos(jnp.where(r > 0, z / jnp.where(r > 0, r, 1.0), 1.0))
    phi = jnp.arctan2(y, x)
    return jnp.stack([r, theta, phi], axis=-1)


def spherical_to_cartesian(rtp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`cartesian_to_spherical` (reference ``linalg.py:185-219``)."""
    r, theta, phi = rtp[..., 0], rtp[..., 1], rtp[..., 2]
    return jnp.stack(
        [
            r * jnp.sin(theta) * jnp.cos(phi),
            r * jnp.sin(theta) * jnp.sin(phi),
            r * jnp.cos(theta),
        ],
        axis=-1,
    )


def wrap_coordinates(
    pos: jnp.ndarray, box: jnp.ndarray, center: bool = False
) -> jnp.ndarray:
    """Wrap positions into the primary box image.

    ``center=True`` wraps into ``[-box/2, box/2)`` instead of ``[0, box)``
    (reference: ``transformations/wrap_coordinates.py:51-80``). The
    centered form must shift BEFORE the floor-wrap and shift back after —
    a plain post-shift of the ``[0, box)`` wrap produces values that are
    not congruent to the input modulo the box (same finding as the
    CoordinateWrapper fix).
    """
    if center:
        pos = pos + box * 0.5
    wrapped = pos - box * jnp.floor(pos / box)
    if center:
        wrapped = wrapped - box * 0.5
    return wrapped
