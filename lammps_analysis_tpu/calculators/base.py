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
import dataclasses
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


@dataclasses.dataclass(frozen=True)
class StreamSlabInfo:
    """Provenance of one streamed slab (atom-minibatch aware).

    ``group``/``n_groups`` describe the atom-axis minibatch the slab
    belongs to: when one ``data_range``-frame window of all atoms exceeds
    the memory budget, the stream splits the (selected) atoms into
    ``n_groups`` contiguous groups and re-streams the frame slabs per
    group (reference atom-wise minibatching,
    ``memory_manager.py:257-340`` / ``data_manager.py:223-281``).
    """

    start: int  # global frame start of the slab
    stop: int  # global frame stop (exclusive)
    slab_index: int  # position in the slab sequence (same for every group)
    n_slabs: int
    group: int  # atom-group index
    n_groups: int


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

    def _window_stream_plan(
        self,
        path: str,
        data_range: int,
        correlation_time: int,
        max_slab_bytes: Optional[int] = None,
        n_selected: Optional[int] = None,
    ) -> tuple:
        """``(slabs, n_groups)`` — frame slabs plus an atom-axis split.

        When one full-width ``data_range``-frame window fits the budget
        (``plan.raw_frame_batch >= data_range``) this is exactly
        :meth:`_window_slab_plan` with ``n_groups = 1``. Otherwise the
        reference's graceful degradation applies
        (``memory_manager.py:257-340``): the (selected) atom axis is split
        into ``n_groups`` minibatches sized so one window of one group
        fits, and the frame slabs are re-sized to the reduced width.
        ``n_selected`` is the post-``atom_selection`` atom count driving
        the split (for multi-species streams: the summed count across the
        streamed paths, all sharing the budget).
        """
        plan = self._plan_for([path], data_range=data_range)
        _, n_atoms, n_dims = self.experiment.store.get_data_size(path)
        n_sel = int(n_atoms if n_selected is None else n_selected)
        raw = plan.raw_frame_batch or plan.frame_batch
        if raw >= data_range or n_sel <= 1:
            return (
                self._window_slab_plan(
                    path, data_range, correlation_time,
                    max_slab_bytes=max_slab_bytes,
                ),
                1,
            )
        planner = self.experiment.planner
        bpaf = n_dims * 8  # bytes per atom-frame (f64 planning, as _plan_for)
        m = planner.window_atoms_per_group(
            n_sel, data_range, bpaf, self.scale_function
        )
        n_groups = -(-n_sel // m)
        gplan = planner.plan(
            n_frames=plan.total_frames,
            bytes_per_frame=m * bpaf,
            scale_function=self.scale_function,
            data_range=data_range,
        )
        slab = gplan.frame_batch
        if max_slab_bytes is not None:
            per_frame = max(m * n_dims * 4, 1)
            # same 2*data_range floor as _window_slab_plan: a one-window
            # slab would double the slab count and seam-overlap I/O
            slab = max(
                min(slab, max_slab_bytes // per_frame), 2 * data_range
            )
        log.info(
            "%s %s: one %d-frame window of %d atoms exceeds the memory "
            "budget; splitting the atom axis into %d minibatches of <= %d "
            "atoms", self.name, path, data_range, n_sel, n_groups, m,
        )
        return (
            window_aligned_slabs(
                plan.total_frames, slab, data_range, correlation_time
            ),
            n_groups,
        )

    @staticmethod
    def _atom_groups(sel, n_full: int, n_groups: int) -> list:
        """Split a resolved atom selection into contiguous index groups.

        ``n_groups == 1`` returns ``[sel]`` unchanged (None / slice /
        index array — the store reads slices cheaper than fancy indices).
        """
        if n_groups <= 1:
            return [sel]
        if sel is None:
            base = np.arange(n_full, dtype=np.int64)
        elif isinstance(sel, slice):
            base = np.arange(n_full, dtype=np.int64)[sel]
        else:
            base = np.asarray(sel, dtype=np.int64)
        return list(np.array_split(base, n_groups))

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
        self, species: str, data_range: int, correlation_time: int,
        atoms=None, slabs: Optional[list] = None,
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
        if slabs is None:
            # moderate same-shaped slabs: the unwrap scan's XLA-CPU
            # compile cost grows with the slab length (measured ~60-100 s
            # for a 55k-frame slab vs seconds at 8k) and its execution
            # rate drops ~2.7x; ~0.5 GB slabs keep one cached compile +
            # peak throughput. Callers (``_stream_property``) pass the
            # atom-minibatch-aware plan; standalone use re-derives it.
            slabs = self._window_slab_plan(
                pos_path, data_range, correlation_time,
                max_slab_bytes=1 << 29,
            )
            atoms = self.resolve_atom_selection(
                self.args.get("atom_selection"), species
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
        with_info: bool = False,
    ):
        """Yield ``{species: slab}`` dicts over window-aligned slabs.

        Multi-species analog of :meth:`_stream_property` for calculators
        that correlate two species' series (the distinct diffusion
        family) — replaces their full-trajectory ``load_matrix`` loads
        with prefetched streaming (a 100k-frame pair is ~25 GB loaded
        whole; slabs are bounded by the batch plan). Honors per-species
        ``args['atom_selection']``.

        Over-budget windows split the atom axis of EVERY species into the
        same number of contiguous groups. Ordering is slab-major (outer
        loop frames, inner loop atom groups) so consumers can finalise
        each slab's windows as soon as its last group arrives — the
        distinct calculators' bilinear cross terms only need the
        per-slab particle sums, which accumulate across groups. Pass
        ``with_info=True`` for ``(dict, StreamSlabInfo)`` pairs.
        """
        from ..pipeline.prefetch import prefetch_to_device

        store = self.experiment.store
        # preserve order, load each distinct species once
        uniq = list(dict.fromkeys(species_list))
        paths = {sp: join_path(sp, prop_name) for sp in species_list}
        sels = {
            sp: self.resolve_atom_selection(
                self.args.get("atom_selection"), sp
            )
            for sp in uniq
        }
        n_full = {sp: store.get_data_size(paths[sp])[1] for sp in uniq}

        def count(sp):
            sel = sels[sp]
            if sel is None:
                return n_full[sp]
            if isinstance(sel, slice):
                return len(range(*sel.indices(n_full[sp])))
            return len(sel)

        n_sel_total = sum(count(sp) for sp in uniq)
        # same 512 MiB cap as _stream_property (the windowed kernels
        # degrade past the cache-friendly regime); each slab loads every
        # species, so the per-path budget is divided by the species count
        slabs, n_groups = self._window_stream_plan(
            paths[uniq[0]], data_range, correlation_time,
            max_slab_bytes=(1 << 29) // max(len(set(paths.values())), 1),
            n_selected=n_sel_total,
        )
        groups = {
            sp: self._atom_groups(sels[sp], n_full[sp], n_groups)
            for sp in uniq
        }
        device, dtype = self._stream_placement()

        def load(item):
            (start, stop), gi = item
            data = {}
            for sp in uniq:
                data[sp] = store.load(
                    [paths[sp]], frames=slice(start, stop),
                    atoms=groups[sp][gi], dtype=dtype,
                )[paths[sp]]
            return {sp: data[sp] for sp in species_list}

        items = [
            (slab, gi) for slab in slabs for gi in range(n_groups)
        ]
        stream = progress_iter(
            prefetch_to_device(load, items, depth=2, device=device),
            desc=f"{self.name} {'+'.join(species_list)}/{prop_name}",
            total=len(items), unit="slab",
        )
        for k, data in enumerate(stream):
            if with_info:
                si, gi = divmod(k, n_groups)
                yield data, StreamSlabInfo(
                    start=slabs[si][0], stop=slabs[si][1],
                    slab_index=si, n_slabs=len(slabs),
                    group=gi, n_groups=n_groups,
                )
            else:
                yield data

    def _stream_property(
        self, species: str, prop_name: str, data_range: int,
        correlation_time: int, with_info: bool = False,
    ):
        """Yield device-resident (T_slab, N, d) arrays, prefetched.

        Disk reads + host->device transfers of slab k+1 overlap with the
        caller's device compute on slab k (double buffering; replaces the
        reference's tf.data prefetch). Honors ``args['atom_selection']``.

        With ``config.fuse_streaming`` an unwrapped-positions stream whose
        dataset is not materialised is derived on the fly from the wrapped
        positions (see :meth:`_stream_unwrapped_fused`).

        When one ``data_range``-frame window of all (selected) atoms
        exceeds the memory budget, the atom axis is split into contiguous
        minibatches and the slab sequence repeats per group — outer loop
        atoms, inner loop frames, exactly the reference's
        ``atom_generator`` ordering (``data_manager.py:223-281``). Windowed
        sums stay additive across groups; consumers needing per-window
        reconstruction pass ``with_info=True`` to receive
        ``(array, StreamSlabInfo)`` pairs.
        """
        from ..pipeline.prefetch import prefetch_to_device

        from ..database.properties import mdsuite_properties as _mp

        fused = (
            prop_name == _mp.unwrapped_positions.name
            and self._fusible_unwrap(species)
        )
        plan_path = join_path(
            species, _mp.positions.name if fused else prop_name
        )
        atoms = self.resolve_atom_selection(
            self.args.get("atom_selection"), species
        )
        store = self.experiment.store
        _, n_full, _ = store.get_data_size(plan_path)
        if atoms is None:
            n_sel = n_full
        elif isinstance(atoms, slice):
            n_sel = len(range(*atoms.indices(n_full)))
        else:
            n_sel = len(atoms)
        # cap slabs at 512 MiB even when the memory budget allows more:
        # the windowed kernels lose an order of magnitude past the
        # cache-friendly regime (comb MSD measured 128-143 M wfa/s on
        # <=1.2 GiB slabs vs 12.5 M on the planner's uncapped 3.2 GiB
        # slab at 10k atoms), XLA-CPU compile time grows with slab
        # length, and same-shaped moderate slabs reuse one compile
        slabs, n_groups = self._window_stream_plan(
            plan_path, data_range, correlation_time,
            max_slab_bytes=1 << 29, n_selected=n_sel,
        )
        groups = self._atom_groups(atoms, n_full, n_groups)
        device, dtype = self._stream_placement()

        for gi, g_atoms in enumerate(groups):
            if fused:
                inner = self._stream_unwrapped_fused(
                    species, data_range, correlation_time,
                    atoms=g_atoms, slabs=slabs,
                )
            else:
                path = join_path(species, prop_name)

                def load(slab, _a=g_atoms):
                    start, stop = slab
                    return store.load(
                        [path], frames=slice(start, stop), atoms=_a,
                        dtype=dtype,
                    )[path]

                inner = progress_iter(
                    prefetch_to_device(load, slabs, depth=2, device=device),
                    desc=f"{self.name} {path}"
                    + (f" [atoms {gi + 1}/{n_groups}]" if n_groups > 1 else ""),
                    total=len(slabs), unit="slab",
                )
            for si, arr in enumerate(inner):
                if with_info:
                    yield arr, StreamSlabInfo(
                        start=slabs[si][0], stop=slabs[si][1],
                        slab_index=si, n_slabs=len(slabs),
                        group=gi, n_groups=n_groups,
                    )
                else:
                    yield arr
