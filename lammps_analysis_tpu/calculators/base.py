"""Calculator orchestration: cache -> compute -> persist -> plot.

Re-design of the reference's ``@call`` decorator + ``Calculator`` /
``TrajectoryCalculator`` bases (``mdsuite/calculators/calculator.py:52-148``,
``trajectory_calculator.py:49-406``). The orchestration contract is kept
exactly: a calculator invocation first probes the results DB for a
computation with identical canonical args and experiment version; a miss
runs the analysis and persists per-subject result series; the return value
is a :class:`Computation` (or ``{experiment: Computation}`` when invoked
from a project).

The TF generator machinery is replaced by the static
:class:`~lammps_analysis_tpu.memory.planner.BatchPlanner` plan + NumPy slab
loads + jit-compiled JAX kernels; host-side post-processing (fits,
integrals) stays NumPy/SciPy.
"""

from __future__ import annotations

import abc
import logging
from typing import Any, Dict, List, Optional, Union

import numpy as np

from ..database.results_db import Computation
from ..database.trajectory_store import join_path
from ..memory.planner import BatchPlan
from ..utils.constants import DatasetKeys
from ..utils.progress import progress_iter
from ..transformations.registry import transformation_for_property

log = logging.getLogger(__name__)


def window_aligned_slabs(
    n_frames: int, slab: int, data_range: int, correlation_time: int
) -> List[tuple]:
    """Window-aligned (start, stop) slabs covering every sliding window.

    The windows of a whole-array run start at ``0, ct, 2*ct, ...`` while
    ``start + data_range <= n_frames``. Each slab begins on a window start
    and is long enough for at least one window, so iterating windows
    slab-relatively (``0, ct, ...`` within each slab) enumerates exactly
    the global window set, each window once (property-tested).
    """
    # a slab must hold at least one whole window (the batch plan and the
    # max_slab_bytes clamp both guarantee this; guard the pure function)
    slab = max(slab, data_range)
    slabs = []
    start = 0
    while start + data_range <= n_frames:
        stop = min(start + slab, n_frames)
        slabs.append((start, stop))
        if stop >= n_frames:
            break
        n_windows = (stop - start - data_range) // correlation_time + 1
        start = start + n_windows * correlation_time
    return slabs


class Calculator(abc.ABC):
    """Base orchestration for all calculators."""

    #: subject-independent scalar outputs (e.g. diffusion_coefficient)
    result_keys: List[str] = []
    #: per-subject series outputs (e.g. time, msd)
    result_series_keys: List[str] = []
    #: True -> operates on the Observables group, one System subject
    system_property: bool = False

    def __init__(self, experiment=None, experiments=None, plot: bool = True):
        # plotting defaults ON for reference API parity (calculator.py:94)
        self.experiment = experiment
        self.experiments = experiments or ([experiment] if experiment else [])
        # project-bound call (experiment=None): ALWAYS return a dict keyed
        # by experiment name, even for one active experiment — reference
        # ``calculator.py:110-146`` (``return_dict = self.experiment is
        # None``); experiment-bound calls return the bare Computation
        self._return_dict = experiment is None
        self.plot = plot
        self.args: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return type(self).__name__

    # ------------------------------------------------------------ entry point
    def __call__(self, **kwargs) -> Union[Computation, Dict[str, Computation]]:
        plot = kwargs.pop("plot", self.plot)
        # force=True invalidates the cached computation with these exact
        # args and recomputes (the reference can only recompute via an
        # experiment-version bump; this is the per-call hook)
        force = kwargs.pop("force", False)
        results: Dict[str, Computation] = {}
        for exp in self.experiments:
            self.experiment = exp
            self.args = self.prepare_args(**kwargs)
            cache_args = dict(self.args)
            if force:
                exp.db.delete_computations(exp.name, self.name, cache_args)
            comp = exp.db.find_computation(
                exp.name, self.name, cache_args, exp.version
            )
            if comp is None:
                log.info("%s: computing on %s", self.name, exp.name)
                data = self.run_calculator()
                comp = exp.db.store_computation(
                    exp.name, self.name, cache_args, exp.version, data
                )
            else:
                log.info("%s: cache hit on %s", self.name, exp.name)
            if plot:
                try:
                    self.plot_results(comp)
                except Exception as err:  # plotting must never kill analysis
                    log.warning("%s: plotting failed: %s", self.name, err)
            results[exp.name] = comp
        if self._return_dict or len(results) > 1:
            return results
        return next(iter(results.values()))

    # ---------------------------------------------------------------- plugin
    @abc.abstractmethod
    def prepare_args(self, **kwargs) -> Dict[str, Any]:
        """Parse user kwargs into the canonical (JSON-serialisable) arg dict.

        The returned dict is the cache key — it must contain every argument
        that affects the numerical result (reference: per-calculator ``Args``
        dataclasses doubling as cache keys).
        """

    @abc.abstractmethod
    def run_calculator(self) -> Dict[str, dict]:
        """Run the analysis; return ``{subject_key: result_dict}``."""

    def plot_results(self, computation: Computation) -> None:
        """Default plots: a PNG grid plus a self-contained interactive HTML
        (the reference writes bokeh HTML per analysis,
        ``visualizer/d2_data_visualization.py:36-140``)."""
        from ..visualizer.html_plots import write_html_plot
        from ..visualizer.plots import plot_series_results

        plot_series_results(
            computation,
            self.result_series_keys,
            out_dir=self.experiment.path / "figures",
            title=self.name,
        )
        write_html_plot(
            computation,
            self.result_series_keys,
            out_dir=self.experiment.path / "figures",
            title=self.name,
        )


class TrajectoryCalculator(Calculator):
    """Adds trajectory streaming + dependency resolution to Calculator."""

    #: property this calculator streams (PropertyInfo)
    loaded_property = None
    #: memory cost model (same spec format as the reference)
    scale_function: dict = {"linear": {"scale_factor": 1}}
    #: dtype for device kernels
    dtype = "float64"

    # ------------------------------------------------------- tau/window setup
    def _handle_tau_values(self) -> np.ndarray:
        """Normalise ``tau_values`` (int / list / slice) and return times.

        Port of ``trajectory_calculator.py:196-228``; also sets
        ``self.data_resolution`` and may adjust ``args['data_range']``.
        """
        tau = self.args.get("tau_values", None)
        data_range = self.args["data_range"]
        if isinstance(tau, dict) and "slice" in tau:
            tau = slice(*tau["slice"])  # canonical encoded form
        if isinstance(tau, int):
            self.data_resolution = tau
            tau = np.linspace(0, data_range - 1, tau, dtype=int)
        elif isinstance(tau, (list, np.ndarray)):
            tau = np.asarray(tau, dtype=int)
            self.data_resolution = len(tau)
            self.args["data_range"] = int(tau[-1] + 1)
        elif tau is None or isinstance(tau, slice):
            full = np.arange(data_range, dtype=int)
            tau = full[tau] if isinstance(tau, slice) else full
            self.data_resolution = len(tau)
        else:
            raise TypeError(f"Unsupported tau_values {tau!r}")
        self.tau_values = tau
        times = (
            tau
            * self.experiment.time_step
            * self.experiment.sample_rate
        )
        return np.asarray(times, dtype=float)

    # ------------------------------------------------------------ dependencies
    def _run_dependency_check(self, species: Optional[List[str]] = None):
        """Auto-run transformations that produce the loaded property.

        Port of ``trajectory_calculator.py:117-194`` (``_resolve_dependencies``).
        """
        if self.loaded_property is None:
            return
        prop = self.loaded_property.name
        exp = self.experiment

        def complete(path):
            # present AND covering every configuration (appended data must
            # re-trigger the producing transformation)
            return (
                exp.store.check_existence(path)
                and exp.store.get_cursor(path) >= exp.number_of_configurations
            )

        if self.system_property:
            path = join_path(DatasetKeys.OBSERVABLES, prop)
            if complete(path):
                return
            producer = transformation_for_property(prop)
            if producer is None:
                raise ValueError(
                    f"{self.name}: required property {prop} not in store and "
                    "no transformation produces it."
                )
            producer.run_transformation(self.experiment)
            return
        for sp in species or self.args.get("species", []):
            path = join_path(sp, prop)
            if complete(path):
                continue
            if self._fusible_unwrap(sp):
                # config.fuse_streaming: the streaming layer unwraps the
                # wrapped positions on the fly — do not materialise
                continue
            producer = transformation_for_property(
                prop, experiment=self.experiment, species=sp
            )
            if producer is None:
                raise ValueError(
                    f"{self.name}: required property {prop} missing for "
                    f"species {sp} and no transformation produces it."
                )
            producer.run_transformation(self.experiment, [sp])

    @staticmethod
    def encode_tau_values(tau) -> object:
        """Canonical JSON-able form of ``tau_values`` (cache-key safe).

        Accepts None / int (sub-sample count) / list / ndarray of lag
        indices / slice. The encoded form round-trips through
        :meth:`_handle_tau_values`.
        """
        if tau is None:
            return None
        if isinstance(tau, slice):
            if tau == slice(None):
                return None
            return {"slice": [tau.start, tau.stop, tau.step]}
        if isinstance(tau, (int, np.integer)):
            return int(tau)
        return [int(t) for t in tau]

    # ---------------------------------------------------------- atom selection
    @staticmethod
    def encode_atom_selection(sel) -> object:
        """Canonical JSON-able form of an atom selection (cache-key safe).

        Accepts None / slice / list of indices / {species: list}
        (reference: ``atom_selection`` kwargs, e.g.
        ``radial_distribution_function.py:135``).
        """
        if sel is None:
            return None
        if isinstance(sel, slice):
            if sel == slice(None):
                return None
            return {"slice": [sel.start, sel.stop, sel.step]}
        if isinstance(sel, dict):
            return {k: [int(i) for i in v] for k, v in sel.items()}
        return [int(i) for i in sel]

    @staticmethod
    def resolve_atom_selection(encoded, species: str):
        """Encoded selection -> store-level atoms argument for one species."""
        if encoded is None:
            return None
        if isinstance(encoded, dict):
            if "slice" in encoded and isinstance(encoded["slice"], list):
                return slice(*encoded["slice"])
            per_species = encoded.get(species)
            # dtype pinned: an EMPTY list would default to float64 and
            # break fancy indexing
            return (
                np.asarray(per_species, dtype=np.int64)
                if per_species is not None
                else None
            )
        return np.asarray(encoded, dtype=np.int64)

    def selected_counts(self, species) -> List[int]:
        """Per-species particle counts after applying ``args['atom_selection']``.

        Structural calculators must size their padded layouts from the
        *selected* atoms so the loaded slabs match the kernel shapes.
        """
        counts = []
        for sp in species:
            sel = self.resolve_atom_selection(
                self.args.get("atom_selection"), sp
            )
            full = self.experiment.entity(sp).n_particles
            if sel is None:
                counts.append(full)
            elif isinstance(sel, slice):
                counts.append(len(range(*sel.indices(full))))
            else:
                counts.append(len(sel))
        return counts

    # --------------------------------------------------------------- loading
    def load_concat_positions(self, species, frame_idx, n_pad, dtype):
        """Sampled frames for several species, concatenated + padded.

        Shared by the structural calculators (RDF/ADF/SDF): loads the
        calculator's ``loaded_property`` for each species at the given
        frame indices (honoring atom selections), concatenates along the
        atom axis and zero-pads to ``n_pad``.
        """
        exp = self.experiment
        paths = [join_path(sp, self.loaded_property.name) for sp in species]
        parts = []
        for sp, p in zip(species, paths):
            sel = self.resolve_atom_selection(
                self.args.get("atom_selection"), sp
            )
            parts.append(
                exp.store.load(
                    [p], frames=np.asarray(frame_idx), atoms=sel, dtype=dtype
                )[p]
            )
        pos = np.concatenate(parts, axis=1)
        if pos.shape[1] < n_pad:
            pad = np.zeros(
                (pos.shape[0], n_pad - pos.shape[1], 3), dtype=pos.dtype
            )
            pos = np.concatenate([pos, pad], axis=1)
        return pos

    # --------------------------------------------------------------- streaming
    def _plan_for(self, paths: List[str], data_range: Optional[int] = None) -> BatchPlan:
        n_frames = self.experiment.number_of_configurations
        bytes_per_frame = 0
        for p in paths:
            _, n_atoms, n_dims = self.experiment.store.get_data_size(p)
            bytes_per_frame += n_atoms * n_dims * 8
        return self.experiment.planner.plan(
            n_frames=n_frames,
            bytes_per_frame=bytes_per_frame,
            scale_function=self.scale_function,
            data_range=data_range,
        )

    def _window_slab_plan(
        self, path: str, data_range: int, correlation_time: int,
        max_slab_bytes: Optional[int] = None,
    ) -> list:
        """Window-aligned (start, stop) slabs covering every sliding window.

        Consecutive slabs overlap by ``data_range - correlation_time`` frames
        so every window (stride ``correlation_time``) is seen exactly once
        across slab boundaries. ``max_slab_bytes`` additionally caps the
        slab size (callers whose per-slab kernels compile or degrade
        superlinearly in the slab length — the fused unwrap scan — want
        many same-shaped moderate slabs, not two huge ones).
        """
        plan = self._plan_for([path], data_range=data_range)
        n_frames = plan.total_frames
        slab = plan.frame_batch
        if max_slab_bytes is not None:
            _, n_atoms, n_dims = self.experiment.store.get_data_size(path)
            per_frame = max(n_atoms * n_dims * 4, 1)
            slab = max(
                min(slab, max_slab_bytes // per_frame), 2 * data_range
            )
        return window_aligned_slabs(
            n_frames, slab, data_range, correlation_time
        )

    def _fusible_unwrap(self, species: str) -> bool:
        """True when this calculator's unwrapped-positions stream should be
        computed on the fly from the wrapped positions.

        Requires ``config.fuse_streaming``, an absent/incomplete
        ``Unwrapped_Positions`` dataset (a complete materialised one is
        strictly cheaper to read), and complete ``Positions``.
        """
        from ..database.properties import mdsuite_properties as mp
        from ..utils.config import config

        if not getattr(self, "supports_fused_streaming", False):
            return False  # calculator loads outside _stream_property
        if not config.fuse_streaming or self.loaded_property is None:
            return False
        if self.loaded_property.name != mp.unwrapped_positions.name:
            return False
        exp = self.experiment
        store = exp.store
        n_conf = exp.number_of_configurations

        def complete(path):
            return (
                store.check_existence(path)
                and store.get_cursor(path) >= n_conf
            )

        return not complete(
            join_path(species, mp.unwrapped_positions.name)
        ) and complete(join_path(species, mp.positions.name))

    def _stream_placement(self):
        """Placement + load dtype for bandwidth-bound streamed stages.

        Windowed correlations and on-the-fly transformations are O(1)
        flops/byte: behind a slow accelerator link (measured policy,
        ``utils/devices.py``) the slabs commit to the host CPU device and
        the jitted kernels follow the placement. Loads happen in the dtype
        the kernels will actually run — f64 only under an x64-enabled CPU
        run (the parity/test configuration); loading f64 that jit
        immediately downcasts would double the disk and host->device
        transfer volume for nothing.
        """
        import jax

        from ..utils.devices import bandwidth_bound_device

        device = bandwidth_bound_device()
        on_cpu = device is not None or jax.default_backend() == "cpu"
        dtype = (
            np.float64
            if on_cpu and jax.config.jax_enable_x64
            else np.float32
        )
        return device, dtype

    def _stream_unwrapped_fused(
        self, species: str, data_range: int, correlation_time: int
    ):
        """Stream ``Positions`` slabs and unwrap them on the fly.

        The unwrap carry (previous frame's wrapped position + image
        count) chains across the window-aligned slabs: the carry for slab
        k+1 is reconstructed from slab k's arrays at the frame just
        before slab k+1's start — so every slab is seam-free and the
        result is bit-identical to streaming a materialised
        ``Unwrapped_Positions`` dataset (the unwrap math is batch-size
        invariant). Skips one full-trajectory disk WRITE and one READ.

        When ``correlation_time > data_range`` the window plan's slabs are
        disjoint; the unwrap is path-dependent (jump detection needs every
        consecutive-frame diff), so each load extends through the next
        slab's first frame — the gap frames are integrated into the carry
        but not yielded.
        """
        import jax.numpy as jnp

        from ..database.properties import mdsuite_properties as mp
        from ..pipeline.prefetch import prefetch_to_device
        from ..transformations.coordinate_transforms import CoordinateUnwrapper

        exp = self.experiment
        pos_path = join_path(species, mp.positions.name)
        # moderate same-shaped slabs: the unwrap scan's XLA-CPU compile
        # cost grows with the slab length (measured ~60-100 s for a
        # 55k-frame slab vs seconds at 8k) and its execution rate drops
        # ~2.7x; ~0.5 GB slabs keep one cached compile + peak throughput
        slabs = self._window_slab_plan(
            pos_path, data_range, correlation_time,
            max_slab_bytes=1 << 29,
        )
        # (start, yield_stop, load_stop): load through the next slab's
        # start so the seam frame is always in range
        ext = [
            (
                start,
                stop,
                max(stop, slabs[i + 1][0]) if i + 1 < len(slabs) else stop,
            )
            for i, (start, stop) in enumerate(slabs)
        ]
        atoms = self.resolve_atom_selection(
            self.args.get("atom_selection"), species
        )
        store = exp.store
        device, dtype = self._stream_placement()

        def load(slab):
            start, _, load_stop = slab
            return store.load(
                [pos_path], frames=slice(start, load_stop), atoms=atoms,
                dtype=dtype,
            )[pos_path]

        trafo = CoordinateUnwrapper()
        # jit-compiled: eager dispatch materialises a slab-sized temporary
        # per op (measured 18 s vs 2.6 s per 1 GB slab — see
        # Transformation._batch_kernel)
        kernel = trafo._batch_kernel()
        box = jnp.asarray(np.asarray(exp.box_array, dtype=dtype))
        carry = None
        for i, pos in enumerate(
            progress_iter(
                prefetch_to_device(load, ext, depth=2, device=device),
                desc=f"{self.name} {species} (fused unwrap)",
                total=len(ext), unit="slab",
            )
        ):
            unwrapped, _ = kernel(
                {
                    mp.positions.name: pos,
                    mp.box_length.name: box,
                },
                carry,
            )
            start, stop, _ = ext[i]
            if i + 1 < len(ext):
                # seam for the NEXT slab: state at the frame before its
                # start, image counts recovered exactly as
                # CoordinateUnwrapper.bootstrap_carry does from the store
                j = ext[i + 1][0] - 1 - start
                image = jnp.round((unwrapped[j] - pos[j]) / box)
                carry = (pos[j], image)
            yield unwrapped[: stop - start]

    def _stream_properties_multi(
        self,
        species_list: List[str],
        prop_name: str,
        data_range: int,
        correlation_time: int,
    ):
        """Yield ``{species: slab}`` dicts over window-aligned slabs.

        Multi-species analog of :meth:`_stream_property` for calculators
        that correlate two species' series (the distinct diffusion
        family) — replaces their full-trajectory ``load_matrix`` loads
        with prefetched streaming (a 100k-frame pair is ~25 GB loaded
        whole; slabs are bounded by the batch plan).
        """
        from ..pipeline.prefetch import prefetch_to_device

        store = self.experiment.store
        paths = {sp: join_path(sp, prop_name) for sp in species_list}
        # same 512 MiB cap as _stream_property (the windowed kernels
        # degrade past the cache-friendly regime); each slab loads every
        # species, so the per-path budget is divided by the species count
        slabs = self._window_slab_plan(
            next(iter(paths.values())), data_range, correlation_time,
            max_slab_bytes=(1 << 29) // max(len(set(paths.values())), 1),
        )
        device, dtype = self._stream_placement()

        def load(slab):
            start, stop = slab
            data = store.load(
                sorted(set(paths.values())),
                frames=slice(start, stop),
                dtype=dtype,
            )
            return {sp: data[p] for sp, p in paths.items()}

        yield from progress_iter(
            prefetch_to_device(load, slabs, depth=2, device=device),
            desc=f"{self.name} {'+'.join(species_list)}/{prop_name}",
            total=len(slabs), unit="slab",
        )

    def _stream_property(
        self, species: str, prop_name: str, data_range: int, correlation_time: int
    ):
        """Yield device-resident (T_slab, N, d) arrays, prefetched.

        Disk reads + host->device transfers of slab k+1 overlap with the
        caller's device compute on slab k (double buffering; replaces the
        reference's tf.data prefetch). Honors ``args['atom_selection']``.

        With ``config.fuse_streaming`` an unwrapped-positions stream whose
        dataset is not materialised is derived on the fly from the wrapped
        positions (see :meth:`_stream_unwrapped_fused`).
        """
        from ..pipeline.prefetch import prefetch_to_device

        from ..database.properties import mdsuite_properties as _mp

        if prop_name == _mp.unwrapped_positions.name and self._fusible_unwrap(
            species
        ):
            yield from self._stream_unwrapped_fused(
                species, data_range, correlation_time
            )
            return

        path = join_path(species, prop_name)
        # cap slabs at 512 MiB even when the memory budget allows more:
        # the windowed kernels lose an order of magnitude past the
        # cache-friendly regime (comb MSD measured 128-143 M wfa/s on
        # <=1.2 GiB slabs vs 12.5 M on the planner's uncapped 3.2 GiB
        # slab at 10k atoms), XLA-CPU compile time grows with slab
        # length, and same-shaped moderate slabs reuse one compile
        slabs = self._window_slab_plan(
            path, data_range, correlation_time, max_slab_bytes=1 << 29
        )
        atoms = self.resolve_atom_selection(
            self.args.get("atom_selection"), species
        )
        store = self.experiment.store
        device, dtype = self._stream_placement()

        def load(slab):
            start, stop = slab
            return store.load(
                [path], frames=slice(start, stop), atoms=atoms, dtype=dtype
            )[path]

        yield from progress_iter(
            prefetch_to_device(load, slabs, depth=2, device=device),
            desc=f"{self.name} {path}", total=len(slabs), unit="slab",
        )
