"""Device mesh management.

The reference has no distributed execution at all (SURVEY §2.7); this module
is the new, first-class TPU component: a process-wide default
:class:`jax.sharding.Mesh` over which calculators shard their work. The
canonical layout is a 1-D ``("data",)`` mesh — analysis workloads shard
over frames/windows (data parallelism) with ``psum`` merges of histograms
and correlation partial sums riding ICI. A 2-D ``("data", "atoms")`` mesh
is available for pairwise kernels on very large systems.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_active_mesh: Optional[Mesh] = None


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over (the first n) local devices, axis name ``data``."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def make_2d_mesh(data: int, atoms: int) -> Mesh:
    """2-D ``(data, atoms)`` mesh for frame x atom-tile sharding."""
    devices = np.array(jax.devices()[: data * atoms]).reshape(data, atoms)
    return Mesh(devices, axis_names=("data", "atoms"))


def get_default_mesh() -> Mesh:
    """The active mesh (context-set, else all local devices on ``data``)."""
    if _active_mesh is not None:
        return _active_mesh
    return make_data_mesh()


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Override the default mesh within a scope."""
    global _active_mesh
    prev = _active_mesh
    _active_mesh = mesh
    try:
        yield mesh
    finally:
        _active_mesh = prev


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """NamedSharding that splits one array axis over the ``data`` mesh axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, PartitionSpec(*spec))
