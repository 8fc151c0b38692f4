"""Angular distribution function calculator.

TPU-native re-design of
``mdsuite/calculators/angular_distribution_function.py:71-609``: triplet
angles at each central atom within a cutoff, weighted by
``1/(|r_ij||r_ik|)^norm_power``, histogrammed over [0, 3.15] rad per species
triple (``combinations_with_replacement`` keys, including the reference's
ordered-triple counting quirks — see ``ops.adf``), density-normalised per
frame batch, reported in degrees with the max-peak angle.

The triplet enumeration is the batched Gram-matrix kernel in
:mod:`lammps_analysis_tpu.ops.adf` (MXU work) instead of the reference's
rolled-r_ijk index extraction; frames shard over the device mesh.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..database.properties import mdsuite_properties as mp
from ..database.trajectory_store import join_path
from ..ops import adf as adf_ops
from ..ops import rdf as rdf_ops
from .base import TrajectoryCalculator

log = logging.getLogger(__name__)


class AngularDistributionFunction(TrajectoryCalculator):
    """ADF for all species triples."""

    loaded_property = mp.positions
    scale_function = {"quadratic": {"outer_scale_factor": 10}}
    result_keys = ["max_peak"]
    result_series_keys = ["angle", "adf"]
    dtype = "float32"

    def prepare_args(
        self,
        number_of_configurations: int = 5,
        cutoff: float = 6.0,
        start: int = 1,
        stop: int = None,
        number_of_bins: int = 500,
        species: list = None,
        norm_power: int = 4,
        molecules: bool = False,
        atom_selection=None,
        **kwargs,
    ) -> Dict[str, Any]:
        exp = self.experiment
        if stop is None:
            stop = exp.number_of_configurations - 1
        if species is None:
            species = list(exp.molecules) if molecules else list(exp.species)
        number_of_configurations = min(
            number_of_configurations, exp.number_of_configurations
        )
        return {
            "number_of_configurations": int(number_of_configurations),
            "cutoff": float(cutoff),
            "start": int(start),
            "stop": int(stop),
            "number_of_bins": int(number_of_bins),
            "species": list(species),
            "norm_power": int(norm_power),
            "molecules": bool(molecules),
            "atom_selection": self.encode_atom_selection(atom_selection),
        }

    def run_calculator(self) -> Dict[str, dict]:
        a = self.args
        exp = self.experiment
        species = a["species"]
        n_bins = a["number_of_bins"]
        # auto-derive Positions (e.g. wrap unwrapped-only stores) — the
        # reference ADF does this too (angular_distribution_function.py:228)
        self._run_dependency_check(species)

        sample_configs = np.unique(
            np.linspace(a["start"], a["stop"], a["number_of_configurations"],
                        dtype=int)
        )
        n_per_species = self.selected_counts(species)
        sid, n_pad, _, _, _ = rdf_ops.build_species_layout(n_per_species, pad_to=8)
        ttab, triple_order = adf_ops.build_triple_table(len(species))
        n_triples = len(triple_order)

        plan = self._plan_for(
            [join_path(sp, self.loaded_property.name) for sp in species]
        )
        frames_per_batch = max(1, min(plan.frame_batch, len(sample_configs)))
        # On the TPU tiled route the quadratic plan collapses to ~1
        # frame/batch while the pipeline's per-call fixed cost wants
        # taller calls (2.4x at f=16, see adf_frames_per_call)
        from ..parallel.sharded_ops import adf_frames_per_call

        fpc = adf_frames_per_call(
            n_pad,
            np.asarray(exp.box_array, dtype=np.float32),
            a["cutoff"],
            self.experiment.planner.budget_bytes,
        )
        frames_per_batch = max(
            frames_per_batch, min(fpc, len(sample_configs))
        )
        dtype = np.float32

        box = jnp.asarray(np.asarray(exp.box_array, dtype=dtype))
        sid_j = jnp.asarray(sid)
        ttab_j = jnp.asarray(ttab)

        lo, hi = adf_ops.ADF_BIN_RANGE
        bin_width = (hi - lo) / n_bins
        n_batches = -(-len(sample_configs) // frames_per_batch)
        # balance the split (sizes differ by <= 1) instead of a full-size
        # run followed by an arbitrarily small tail: at most 2 compiled
        # batch shapes and no tiny dispatch at the end
        frames_per_batch = -(-len(sample_configs) // n_batches)
        # ~10 (F, C, N, N) intermediates are live in the small-system ADF
        # tile; keep each under ~128 MB so the peak stays well inside HBM
        per_center = max(frames_per_batch * n_pad * n_pad * 4, 1)
        c_block = int(np.clip(2**27 // per_center, 1, min(8, n_pad)))

        # One streamed pass with a SINGLE saturation sync at the end:
        # per-batch histogram fetches + diagnostic round trips are gone,
        # and the prefetch thread loads batch b+1 while the device crunches
        # batch b (per-batch density normalisation runs on device).
        from ..pipeline.prefetch import prefetch_to_device
        from ..parallel.sharded_ops import AdfBatchRunner

        runner = AdfBatchRunner(
            n_atoms=n_pad,
            species_id=sid_j,
            triple_table=ttab_j,
            box=box,
            cutoff=a["cutoff"],
            n_bins=n_bins,
            n_triples=n_triples,
            norm_power=a["norm_power"],
            c_block=c_block,
            normalize_per_batch=bin_width,
        )

        def load_batch(b):
            idx = sample_configs[
                b * frames_per_batch : (b + 1) * frames_per_batch
            ]
            return self.load_concat_positions(species, idx, n_pad, dtype)

        from ..utils.progress import progress_iter

        while True:
            for pos in progress_iter(
                prefetch_to_device(load_batch, range(n_batches)),
                desc=self.name, total=n_batches, unit="batch",
            ):
                runner.feed(jnp.asarray(pos))
            hist = runner.finalize()
            if hist is not None:
                break
        hist_total = np.asarray(hist, dtype=np.float64)

        # degrees conversion with the reference's literal 180/3.14159 (:457-459)
        angles_deg = np.linspace(
            lo * (180 / 3.14159), hi * (180 / 3.14159), n_bins
        )
        results = {}
        for t, (ia, ib, ic) in enumerate(triple_order):
            key = f"{species[ia]}_{species[ib]}_{species[ic]}"
            hist = hist_total[t]
            max_peak = float(angles_deg[int(np.argmax(hist))])
            results[key] = {
                "max_peak": max_peak,
                "angle": angles_deg.tolist(),
                "adf": hist.tolist(),
            }
        return results

