"""Transformation base machinery: streamed derivation of per-frame tensors.

TPU-native re-design of ``mdsuite/transformations/transformations.py:66-619``:

* a transformation declares ``input_properties`` -> ``output_property`` and a
  pure jittable ``transform_batch(batch, carryover) -> (out, carry)`` where
  ``batch`` maps property names to ``(T, N, d)`` arrays (time leading) and
  carryover is an arbitrary pytree (the reference's cross-batch state, e.g.
  the unwrapper's last positions, becomes a scan-style carry);
* the runner streams frame slabs from the store, resolves each input through
  the same cascade as the reference (stored dataset -> constant from
  experiment/species metadata -> recursively run the producing
  transformation, ``transformations.py:352-433``), and appends outputs to
  the store with an offset cursor so incremental ingestion extends results
  (``transformations.py:275-326``);
* single-species transformations run once per species; multi-species ones
  consume all species and write a system series under ``Observables``.
"""

from __future__ import annotations

import abc
import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..database.contracts import (
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
)
from ..database.trajectory_store import join_path
from ..utils.constants import CannotFindPropertyError, DatasetKeys
from ..utils.progress import progress_iter

log = logging.getLogger(__name__)

#: properties resolvable as constants from experiment/species metadata
#: (reference: the input-resolution cascade, ``transformations.py:390-433``)
_METADATA_PROPERTIES = ("Box_Array", "Time_Step", "Sample_Rate", "Charge", "Masses")


class Transformation(abc.ABC):
    """Base class: declares I/O properties and the pure batch kernel."""

    #: inputs needed per species
    input_properties: List[PropertyInfo] = []
    #: derived property written back to the store
    output_property: PropertyInfo = None
    #: memory cost model spec (same format as the reference)
    scale_function: dict = {"linear": {"scale_factor": 1}}
    #: True -> consume every species, emit one system-wide series
    multi_species: bool = False
    #: stateful transformations need sequential batches (carryover)
    requires_carryover: bool = False
    #: optional numpy implementation of ``transform_batch`` used when the
    #: placement policy routes this stage to the host CPU. The O(bytes)
    #: reductions (flux transforms) hit single-core memory bandwidth as
    #: BLAS batched matmuls (~15.6 GB/s measured) where the jitted XLA
    #: path pays a host->jax buffer copy plus a strided reduce
    #: (~0.8 GB/s) — a ~20x stage-level gap on slow-link machines
    transform_batch_host = None

    @abc.abstractmethod
    def transform_batch(
        self, batch: Dict[str, jnp.ndarray], carryover: Any = None
    ) -> Tuple[jnp.ndarray, Any]:
        """Pure function: property arrays -> output array (+ new carry).

        For single-species transformations ``batch`` maps property name ->
        ``(T, N, d)``; multi-species ones receive
        ``{species: {prop: array}}``. Output is ``(T, N_out, d_out)`` with
        ``N_out = 1`` for system series.
        """

    def bootstrap_carry(self, experiment, sp_name: str, offset: int):
        """Reconstruct the carry when resuming a stateful transformation at
        ``offset`` (appended data). Default: no carry (fresh seam) — see
        :class:`CoordinateUnwrapper` for a seam-free reconstruction."""
        log.warning(
            "%s resumes at frame %d without carry state; results before "
            "and after the append boundary may be discontinuous.",
            type(self).__name__, offset,
        )
        return None

    def bootstrap_carry_multi(self, experiment, species, offset: int):
        """Multi-species analog of :meth:`bootstrap_carry` (resume at
        ``offset`` after an append). Default: no carry, with the same loud
        warning — see :class:`KinaciIntegratedHeatCurrent` for an exact
        re-integration."""
        log.warning(
            "%s resumes at frame %d without carry state; results before "
            "and after the append boundary may be discontinuous.",
            type(self).__name__, offset,
        )
        return None

    # ------------------------------------------------------------------ runner
    def run_transformation(self, experiment, species: Optional[List[str]] = None):
        """Execute against an experiment, writing results into its store.

        Reference analog: ``SingleSpeciesTrafo.run_transformation``
        (``transformations.py:446-519``) / ``MultiSpeciesTrafo...`` (:553).
        """
        if self.multi_species:
            self._run_multi(experiment, species)
        else:
            self._run_single(experiment, species)
        experiment.refresh_property_groups()

    # -- single species -------------------------------------------------------
    def _run_single(self, experiment, species):
        species = species or list(experiment.species)
        for sp_name in species:
            out_path = join_path(sp_name, self.output_property.name)
            if experiment.store.check_existence(out_path):
                done = experiment.store.get_cursor(out_path)
                if done >= experiment.number_of_configurations:
                    log.debug("%s exists for %s; skipping", out_path, sp_name)
                    continue
            self._transform_species(experiment, sp_name)

    def _transform_species(self, experiment, sp_name: str):
        n_configs = experiment.number_of_configurations
        sources = {
            prop.name: self._resolve_input(experiment, sp_name, prop)
            for prop in self.input_properties
        }
        # entity(): molecule names resolve too — a calculator's dependency
        # check runs transformations for mapped-molecule "species", whose
        # info lives in experiment.molecules, not experiment.species
        n_particles = experiment.entity(sp_name).n_particles
        self._ensure_output(experiment, sp_name, n_particles, n_configs)

        offset = experiment.store.get_cursor(
            join_path(sp_name, self.output_property.name)
        )
        carry = None
        if offset > 0 and self.requires_carryover:
            carry = self.bootstrap_carry(experiment, sp_name, offset)
        from ..utils.devices import bandwidth_bound_compute

        # transformations are O(1) flops/byte: run where the data lives
        # when the accelerator link is slow (measured policy)
        with bandwidth_bound_compute() as host_dev:
            kernel = self._select_kernel(host_dev)
            batches = list(self._batches(experiment, n_configs, offset))
            for batch in progress_iter(
                self._prefetched_batches(sources, batches),
                desc=f"{type(self).__name__} {sp_name}",
                total=len(batches), unit="slab",
            ):
                out, carry = kernel(batch, carry)
                self._write_output(experiment, sp_name, np.asarray(out))

    # -- multi species --------------------------------------------------------
    def _run_multi(self, experiment, species):
        species = species or list(experiment.species)
        out_path = join_path(DatasetKeys.OBSERVABLES, self.output_property.name)
        n_configs = experiment.number_of_configurations
        if experiment.store.check_existence(out_path):
            if experiment.store.get_cursor(out_path) >= n_configs:
                log.debug("%s exists; skipping", out_path)
                return
        sources = {
            sp: {
                prop.name: self._resolve_input(experiment, sp, prop)
                for prop in self.input_properties
            }
            for sp in species
        }
        self._ensure_output(experiment, DatasetKeys.OBSERVABLES, 1, n_configs)
        offset = experiment.store.get_cursor(out_path)
        carry = None
        if offset > 0 and self.requires_carryover:
            carry = self.bootstrap_carry_multi(experiment, species, offset)
        from ..utils.devices import bandwidth_bound_compute

        with bandwidth_bound_compute() as host_dev:
            kernel = self._select_kernel(host_dev)
            batches = list(self._batches(experiment, n_configs, offset))
            for batch in progress_iter(
                self._prefetched_batches(sources, batches, nested=True),
                desc=type(self).__name__,
                total=len(batches), unit="slab",
            ):
                out, carry = kernel(batch, carry)
                out = np.asarray(out)
                if out.ndim == 2:  # (T, d) -> (T, 1, d)
                    out = out[:, None, :]
                self._write_output(experiment, DatasetKeys.OBSERVABLES, out)

    # -- plumbing -------------------------------------------------------------
    def _select_kernel(self, host_dev):
        """Pick the numpy host kernel when the stage runs on the host CPU.

        ``host_dev`` is ``bandwidth_bound_compute()``'s placement: non-None
        means a slow accelerator link routed this stage to the host; it is
        also None when the default backend IS the CPU, so check that too.
        Either way the data lives in host RAM and a numpy kernel (when the
        transformation provides one) skips the host->jax buffer copy and
        runs the reduction as BLAS streaming matmuls.
        """
        if self.transform_batch_host is not None:
            import jax

            if host_dev is not None or jax.default_backend() == "cpu":
                return self.transform_batch_host
        return self._batch_kernel()

    def _batch_kernel(self):
        """The jit-compiled ``transform_batch``.

        Un-jitted, each jnp op dispatches separately and materialises a
        full slab-sized temporary (measured 18 s vs 2.6 s jitted for the
        unwrapper on a 1 GB slab — XLA fuses the diff/round/cumsum chain
        into single passes). One recompile for the remainder slab.
        """
        import jax

        if not getattr(self, "_jitted_kernel", None):
            self._jitted_kernel = jax.jit(self.transform_batch)
        return self._jitted_kernel

    def _prefetched_batches(self, sources, slabs, nested: bool = False):
        """Yield input batches with one-slab lookahead.

        The next slab's HDF5 reads run in a background thread while the
        main thread computes and writes the current slab (h5py serialises
        the actual HDF5 calls on its global lock, so reads overlap the
        jitted compute, which releases the GIL).
        """
        import concurrent.futures

        def load(bounds):
            start, stop = bounds
            if nested:
                return {
                    sp: {name: fetch(start, stop) for name, fetch in per.items()}
                    for sp, per in sources.items()
                }
            return {name: fetch(start, stop) for name, fetch in sources.items()}

        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
            pending = None
            for bounds in slabs:
                fut = pool.submit(load, bounds)
                if pending is not None:
                    yield pending.result()
                pending = fut
            if pending is not None:
                yield pending.result()

    def _batches(self, experiment, n_configs: int, offset: int):
        """Frame slabs [start, stop) still to process."""
        batch_frames = experiment.planner.transformation_batch_size(
            self, experiment
        )
        start = offset
        while start < n_configs:
            stop = min(start + batch_frames, n_configs)
            yield start, stop
            start = stop

    def _resolve_input(self, experiment, sp_name: str, prop: PropertyInfo):
        """Input cascade: dataset -> metadata constant -> producing trafo."""
        path = join_path(sp_name, prop.name)
        # loaders return plain NumPy: they run in the prefetch thread, where
        # jnp.asarray would ignore the main thread's (thread-local)
        # ``jax.default_device`` placement scope; the jitted kernel places
        # its own inputs at dispatch time
        if experiment.store.check_existence(path):
            return lambda a, b, p=path: experiment.store.load(
                [p], frames=slice(a, b)
            )[p]
        const = self._metadata_constant(experiment, sp_name, prop)
        if const is not None:
            return lambda a, b, c=const: c
        # recursively produce the input (reference:
        # ``get_prop_through_transformation``, transformations.py:352-388)
        from .registry import transformation_for_property

        producer = transformation_for_property(
            prop.name, experiment=experiment, species=sp_name
        )
        if producer is None:
            raise CannotFindPropertyError(
                f"Property {prop.name!r} for species {sp_name!r} is neither "
                "stored, derivable from metadata, nor produced by any "
                "transformation."
            )
        log.info(
            "Transformation dependency: running %s to obtain %s",
            type(producer).__name__,
            prop.name,
        )
        producer.run_transformation(experiment, [sp_name])
        return lambda a, b, p=path: experiment.store.load(
            [p], frames=slice(a, b)
        )[p]

    @staticmethod
    def _metadata_constant(experiment, sp_name: str, prop: PropertyInfo):
        if prop.name not in _METADATA_PROPERTIES:
            return None
        if prop.name == "Box_Array":
            return np.asarray(experiment.box_array)
        if prop.name == "Time_Step":
            return np.asarray(experiment.time_step)
        if prop.name == "Sample_Rate":
            return np.asarray(experiment.sample_rate)
        from ..utils.constants import SpeciesNotFoundError

        try:
            sp: SpeciesInfo = experiment.entity(sp_name)
        except SpeciesNotFoundError:
            return None
        if prop.name == "Charge":
            if sp.charge is None:
                return None
            return np.full((1, 1, 1), float(sp.charge))
        if prop.name == "Masses":
            if not sp.mass:
                return None
            return np.full((1, 1, 1), float(sp.mass))
        return None

    def _ensure_output(self, experiment, group: str, n_particles: int, n_configs: int):
        path = join_path(group, self.output_property.name)
        if not experiment.store.check_existence(path):
            import jax

            # derived datasets persist in the compute dtype: under the
            # default f32 device config an f64 dataset would double the
            # write volume while storing downcast-then-upcast values
            # (x64 runs — the parity/test configuration — still get f64)
            dtype = "float64" if jax.config.jax_enable_x64 else "float32"
            experiment.store.ensure_dataset(
                group,
                self.output_property.name,
                n_configs,
                n_particles,
                self.output_property.n_dims,
                dtype=dtype,
            )
        else:
            with_shape = experiment.store.get_data_size(path)
            if with_shape[0] < n_configs:
                experiment.store.resize_datasets(
                    {path: n_configs - with_shape[0]}
                )

    def _write_output(self, experiment, group: str, data: np.ndarray):
        sp = SpeciesInfo(group, data.shape[1], [self.output_property])
        chunk = TrajectoryChunkData([sp], data.shape[0])
        chunk.add_data(data, 0, group, self.output_property.name)
        experiment.store.add_chunk(chunk)
