"""Spatial distribution function calculator.

Port of ``mdsuite/calculators/spatial_distribution_function.py:72-330``
(experimental upstream): minimum-image displacement vectors between a
reference species and a partner species with length in ``[r_min, r_max]``
are projected onto the unit sphere and binned into an (theta, phi) 2-D
histogram. Output: the histogram plus the unit-sphere bin coordinates; a
matplotlib 3-D rendering replaces the reference's open3d viewer.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..database.properties import mdsuite_properties as mp
from ..database.trajectory_store import join_path
from ..ops.geometry import (
    cartesian_to_spherical,
    minimum_image,
    spherical_to_cartesian,
)
from ..ops.histogram import bin_indices, histogram2d_masked
from .base import TrajectoryCalculator

log = logging.getLogger(__name__)


class SpatialDistributionFunction(TrajectoryCalculator):
    """Angular density of neighbors in a radial shell."""

    loaded_property = mp.positions
    scale_function = {"quadratic": {"outer_scale_factor": 1}}
    result_series_keys = ["sdf", "sphere"]
    dtype = "float32"

    def prepare_args(
        self,
        molecules: bool = False,
        start: int = 1,
        stop: int = 10,
        number_of_configurations: int = 5,
        r_min: float = 4.0,
        r_max: float = 4.5,
        species: list = None,
        n_bins: int = 100,
        **kwargs,
    ) -> Dict[str, Any]:
        exp = self.experiment
        if species is None:
            species = list(exp.molecules) if molecules else list(exp.species)
        stop = min(stop, exp.number_of_configurations - 1)
        return {
            "molecules": bool(molecules),
            "start": int(start),
            "stop": int(stop),
            "number_of_configurations": int(number_of_configurations),
            "r_min": float(r_min),
            "r_max": float(r_max),
            "species": list(species)[:2],
            "n_bins": int(n_bins),
        }

    def run_calculator(self) -> Dict[str, dict]:
        a = self.args
        exp = self.experiment
        species = a["species"]
        sp_a = species[0]
        sp_b = species[1] if len(species) > 1 else species[0]
        n_bins = a["n_bins"]
        # auto-derive Positions when only unwrapped/scaled are stored
        self._run_dependency_check(species)

        idx = np.unique(
            np.linspace(a["start"], a["stop"], a["number_of_configurations"],
                        dtype=int)
        )
        n_a = exp.entity(sp_a).n_particles
        n_b = exp.entity(sp_b).n_particles
        box = jnp.asarray(np.asarray(exp.box_array, dtype=np.float32))

        # stream frame batches and tile the a-axis so the largest live
        # tensor is (fpb, a_block, Nb, 3) — the reference (and round 1)
        # materialised the full (F, Na, Nb, 3) displacement tensor, a
        # quadratic blow-up beyond the default 5 configurations
        per_pair_bytes = 4 * 3 * 4  # r + rtp float32, fused
        budget = max(int(0.2 * exp.planner.budget_bytes), 1)
        # a-block sized for one frame; frames batch up only when the whole
        # (Na, Nb) pair block fits the budget
        a_block = int(np.clip(budget // max(n_b * per_pair_bytes, 1), 1, n_a))
        fpb = 1
        if a_block >= n_a:
            fpb = int(np.clip(
                budget // max(n_a * n_b * per_pair_bytes, 1), 1, len(idx)
            ))

        import functools

        import jax

        @functools.partial(jax.jit, static_argnames=("same",))
        def sdf_batch(pa, pb, a0_base, same):
            r = pb[:, None, :, :] - pa[:, :, None, :]
            r = minimum_image(r, box)
            rtp = cartesian_to_spherical(r)  # (F, A, Nb, 3)
            d = rtp[..., 0]
            mask = (d >= a["r_min"]) & (d <= a["r_max"])
            if same:
                a_ids = a0_base + jnp.arange(pa.shape[1])
                b_ids = jnp.arange(pb.shape[1])
                mask = mask & (a_ids[None, :, None] != b_ids[None, None, :])
            theta_idx = bin_indices(rtp[..., 1], 0.0, math.pi, n_bins)
            phi_idx = bin_indices(rtp[..., 2], -math.pi, math.pi, n_bins)
            # "auto" = backend-appropriate: the 2-D histogram is n_bins^2
            # wide — on TPU the MXU outer-product path compiles and runs
            # well where the scatter lowering is pathologically slow to
            # compile; on host CPU scatter is native-fast and the forced
            # "outer" ran the 10k-atom SDF 6.1x slower (13.8 s/frame vs
            # 2.26, benchmarks/distinct_sdf_perf.json)
            return histogram2d_masked(
                theta_idx, phi_idx, mask.astype(jnp.float32), n_bins, n_bins,
                strategy="auto",
            )

        # native AVX host kernel on a CPU-only backend (same policy as
        # RDF/ADF: ``config.native_cpu_kernels = False`` restores XLA).
        # The shell selects ~0.2% of pairs at production workloads, so
        # the native two-pass sweep (branchless d^2 scan + rare-branch
        # angle/bin) measures 519 Mpairs/s vs 12.1 M for the jitted
        # XLA-CPU batch (43x kernel-level; calculator e2e 128.5 vs 2159
        # ms/frame at 10240 atoms — benchmarks/distinct_sdf_perf.json).
        import jax as _jax

        from ..ops import native_sdf
        from ..utils.config import config as _config

        use_native = (
            _config.native_cpu_kernels
            and _jax.default_backend() == "cpu"
            and native_sdf.available()
        )
        box_np = np.asarray(exp.box_array, dtype=np.float32)

        hist = np.zeros((n_bins, n_bins), dtype=np.float64)
        path_a = join_path(sp_a, mp.positions.name)
        path_b = join_path(sp_b, mp.positions.name)
        for f0 in range(0, len(idx), fpb):
            fsel = idx[f0 : f0 + fpb]
            pos_a = exp.store.load([path_a], frames=fsel, dtype=np.float32)[
                path_a
            ]
            # same-species runs reuse the array (one HDF5 read, half the RAM)
            pos_b = (
                pos_a
                if path_b == path_a
                else exp.store.load(
                    [path_b], frames=fsel, dtype=np.float32
                )[path_b]
            )
            if use_native:
                try:
                    hist += native_sdf.sdf_histogram_native(
                        pos_a, pos_b, box_np, a["r_min"], a["r_max"],
                        n_bins, sp_a == sp_b,
                    )
                    continue
                except RuntimeError:
                    use_native = False  # fall through to XLA for the rest
            pb_j = jnp.asarray(pos_b)
            for a0 in range(0, n_a, a_block):
                pa_j = jnp.asarray(pos_a[:, a0 : a0 + a_block])
                hist += np.asarray(
                    sdf_batch(pa_j, pb_j, a0, sp_a == sp_b),
                    dtype=np.float64,
                )

        sphere = self._unit_sphere(n_bins)
        results = {
            "System": {
                "sdf": np.asarray(hist, dtype=np.float64).tolist(),
                "sphere": sphere.tolist(),
            }
        }
        return results

    @staticmethod
    def _unit_sphere(n_bins: int) -> np.ndarray:
        """Bin-center coordinates on the unit sphere (reference ``:256-275``)."""
        theta = np.linspace(0, math.pi, n_bins)
        phi = np.linspace(-math.pi, math.pi, n_bins)
        tt, pp = np.meshgrid(theta, phi)
        rtp = np.stack([np.ones_like(tt), tt, pp], axis=-1)
        return np.asarray(spherical_to_cartesian(jnp.asarray(rtp)))

    def plot_results(self, computation):
        """3-D scatter of the SDF on the unit sphere (replaces open3d)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        data = computation["System"]
        sphere = np.asarray(data["sphere"], dtype=float).reshape(-1, 3)
        colors = np.asarray(data["sdf"], dtype=float).T.reshape(-1)
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        sc = ax.scatter(
            sphere[:, 0], sphere[:, 1], sphere[:, 2], c=colors, s=4,
            cmap="viridis",
        )
        fig.colorbar(sc, shrink=0.7)
        ax.set_title("Spatial distribution function")
        out = self.experiment.path / "figures" / "SpatialDistributionFunction.png"
        out.parent.mkdir(exist_ok=True)
        fig.savefig(out, dpi=110)
        plt.close(fig)

        # interactive companion (open3d-viewer parity,
        # ``d3_data_visualizer.py:39-208``): unit-sphere cloud colored by
        # SDF intensity, drag/zoom in a self-contained HTML
        from ..visualizer.html3d import write_html_3d

        write_html_3d(
            [[("SDF", sphere)]],
            self.experiment.path
            / "figures"
            / "SpatialDistributionFunction3D.html",
            title="Spatial distribution function",
            values=[colors],
            radius=3.0,
        )
        return out
