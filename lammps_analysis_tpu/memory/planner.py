"""Static batch planner: memory budgets -> frame-slab / atom-tile plans.

TPU-native replacement for the reference MemoryManager + DataManager pair
(``mdsuite/memory_management/memory_manager.py:179-372``,
``mdsuite/database/data_manager.py:118-341``). The reference computed
batch sizes from host RAM at generator-construction time and streamed
Python generators; here a *static plan* is computed once from the actual
memory budget (host RAM on CPU, HBM on TPU) and drives jit-compatible
fixed-shape slabs:

* ``frame_batch``: contiguous frame slabs sized to the budget with the same
  per-calculator scale-function cost model as the reference;
* ``atom_block``: i-tile size for pairwise kernels (the reference's
  atom-wise minibatch ladder, ``memory_manager.py:257-340``, becomes a tile
  dimension choice);
* window plans mirror ``get_ensemble_loop`` (``memory_manager.py:342-372``).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import numpy as np

from ..utils.config import config
from ..utils.meta import device_memory_bytes
from ..utils.scale_functions import resolve_scale_function

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class BatchPlan:
    """A static plan for streaming one calculator/transformation run."""

    frame_batch: int  # frames per slab
    n_batches: int
    remainder: int  # frames in the final short slab (0 if exact)
    atom_block: int  # i-tile size for pairwise kernels
    total_frames: int
    #: largest full-atom-width slab that fits the budget BEFORE the
    #: data_range clamp — ``raw_frame_batch < data_range`` means one
    #: window of all atoms exceeds the budget and the stream must split
    #: the atom axis (reference ``_compute_atomwise_minibatch``,
    #: ``memory_manager.py:257-340``). 0 = unrecorded (legacy callers).
    raw_frame_batch: int = 0

    def slabs(self, offset: int = 0):
        """Yield (start, stop) frame ranges."""
        start = offset
        while start < self.total_frames:
            stop = min(start + self.frame_batch, self.total_frames)
            yield start, stop
            start = stop


class BatchPlanner:
    """Computes memory-bounded batch plans for the active backend."""

    def __init__(self, memory_budget_bytes: Optional[int] = None):
        self._budget_override = memory_budget_bytes

    @property
    def budget_bytes(self) -> int:
        if self._budget_override is not None:
            return self._budget_override
        import jax
        import psutil

        if jax.default_backend() in ("tpu", "gpu"):
            return int(device_memory_bytes() * config.device_memory_fraction)
        return int(psutil.virtual_memory().total * config.memory_fraction)

    # ------------------------------------------------------------------ plans
    def plan(
        self,
        n_frames: int,
        bytes_per_frame: float,
        scale_function: Optional[dict] = None,
        min_batch: int = 1,
        max_batch: Optional[int] = None,
        data_range: Optional[int] = None,
    ) -> BatchPlan:
        """Compute the frame-slab plan.

        ``bytes_per_frame`` is the raw footprint of one configuration of all
        loaded datasets; the scale function turns it into the calculator's
        working-set estimate (reference ``get_batch_size``,
        ``memory_manager.py:179-219``).
        """
        fn, kwargs = resolve_scale_function(scale_function)
        budget = self.budget_bytes

        # Largest batch whose scaled footprint fits the budget. Scale
        # functions are monotone; bisect on the frame count.
        lo, hi = 1, max(n_frames, 1)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if fn(mid * bytes_per_frame, **kwargs) <= budget:
                lo = mid
            else:
                hi = mid - 1
        batch = raw = lo
        if data_range is not None:
            # windows must fit entirely inside a slab
            batch = max(batch, data_range)
        batch = max(batch, min_batch)
        if max_batch:
            batch = min(batch, max_batch)
        batch = min(batch, n_frames) if n_frames else batch

        n_batches, rem = divmod(n_frames, batch) if batch else (0, 0)
        if rem:
            n_batches += 1
        atom_block = self.atom_block_for(bytes_per_frame, scale_function)
        plan = BatchPlan(
            frame_batch=batch,
            n_batches=n_batches,
            remainder=rem,
            atom_block=atom_block,
            total_frames=n_frames,
            raw_frame_batch=raw,
        )
        log.debug("batch plan: %s (budget %.1f GB)", plan, budget / 2**30)
        return plan

    def window_atoms_per_group(
        self,
        n_atoms: int,
        data_range: int,
        bytes_per_atom_frame: float,
        scale_function: Optional[dict] = None,
    ) -> int:
        """Atoms per minibatch so ONE window of that many atoms fits.

        TPU-native form of the reference's atom-wise minibatch fraction
        ladder (``memory_manager.py:257-340``, fractions 1/2 ... 1/200 ->
        single atom): instead of trying fixed fractions, bisect the exact
        largest atom count whose ``data_range``-frame window fits the
        budget. Floors at 1 atom (the reference's single-atom fallback) —
        a window of one atom that still exceeds the budget streams anyway,
        exactly as the reference would.
        """
        fn, kwargs = resolve_scale_function(scale_function)
        budget = self.budget_bytes
        lo, hi = 1, max(int(n_atoms), 1)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if fn(data_range * mid * bytes_per_atom_frame, **kwargs) <= budget:
                lo = mid
            else:
                hi = mid - 1
        return lo

    @staticmethod
    def atom_block_for(bytes_per_frame: float, scale_function: Optional[dict]) -> int:
        """i-tile size for pairwise kernels — lane-aligned, memory-safe.

        Replaces the reference's fraction ladder
        (1/2 ... 1/200 -> single atom, ``memory_manager.py:294-334``) with a
        fixed power-of-two tile that is always VMEM-friendly.
        """
        if scale_function and (
            "quadratic" in scale_function or "polynomial" in scale_function
        ):
            return 128
        return 512

    #: per-slab ceiling for streamed transformations. The memory budget
    #: alone lets a 100k-frame store plan a near-whole-trajectory slab
    #: (measured: one 10.5 GB load per species), which defeats the
    #: one-slab-lookahead prefetch (nothing overlaps the first giant
    #: read), thrashes the page cache, and pays h5py's cold interleaved
    #: read rate for the whole stage. Host-side streaming wants many
    #: same-shaped ~0.5-1 GB slabs: one cached jit compile, loads
    #: overlapped with compute (IonicCurrent stage on a 22.9 GB store:
    #: 103 s unbounded -> load-bound with the cap).
    TRANSFORMATION_SLAB_BYTES = 2**30

    def transformation_batch_size(self, trafo, experiment) -> int:
        """Frames per slab for a transformation run."""
        n_atoms = max(
            (sp.n_particles for sp in experiment.species.values()), default=1
        )
        n_props = len(trafo.input_properties) + 1
        bytes_per_frame = n_atoms * 3 * 8 * n_props
        fn, kwargs = resolve_scale_function(trafo.scale_function)
        budget = min(self.budget_bytes, self.TRANSFORMATION_SLAB_BYTES)
        batch = int(budget / max(fn(bytes_per_frame, **kwargs), 1))
        return int(np.clip(batch, 1, max(experiment.number_of_configurations, 1)))

    @staticmethod
    def window_plan(n_frames: int, data_range: int, correlation_time: int) -> int:
        """Number of sliding windows (reference ``get_ensemble_loop``)."""
        if n_frames < data_range:
            return 0
        return (n_frames - data_range) // correlation_time + 1
