"""Distinct (cross-particle) diffusion coefficients — Einstein and Green-Kubo.

Ports of ``einstein_distinct_diffusion_coefficients.py:60-351`` and
``green_kubo_distinct_diffusion_coefficients.py:58-362`` (both flagged
experimental upstream). The reference evaluates an O(N_a x N_b) vmap "Gram
map" of pairwise correlations; this build exploits bilinearity —
``mean_{i,j} corr(a_i, b_j) == corr(mean_i a_i, mean_j b_j)`` — so the
cross term is a single correlation of particle-averaged series, O(N) work,
numerically identical (the self-term is subtracted separately for same
species, exactly as the reference does).
"""

from __future__ import annotations

import itertools
import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..database.properties import mdsuite_properties as mp
from ..ops.correlation import cross_correlation_biased, window_starts
from ..utils.fitting import fit_einstein_curve
from .base import TrajectoryCalculator

log = logging.getLogger(__name__)


def _window_slabs(x: np.ndarray, window: int, stride: int):
    starts = np.asarray(window_starts(x.shape[0], window, stride))
    for s in starts:
        yield x[s : s + window]


class EinsteinDistinctDiffusionCoefficients(TrajectoryCalculator):
    """Distinct Einstein diffusion: cross-particle displacement correlations.

    Per window: ``mean_dims[ avg_i d_i^a * avg_j d_j^b ]`` minus the
    self-term ``mean_i mean_dims d_i^2`` for identical species (reference
    ``_map_over_particles`` / ``_compute_self_correlation``). D = slope/2
    (dimension averaging is inside the map, reference ``:293-303``).
    """

    loaded_property = mp.unwrapped_positions
    scale_function = {"linear": {"scale_factor": 10}}
    result_keys = ["diffusion_coefficient", "uncertainty"]
    result_series_keys = ["time", "msd"]

    def prepare_args(
        self,
        species: list = None,
        data_range: int = 100,
        correlation_time: int = 1,
        fit_range: int = -1,
        tau_values=None,
        molecules: bool = False,
        atom_selection=None,
        **kwargs,
    ) -> Dict[str, Any]:
        if species is None:
            species = list(self.experiment.species)
        tau_enc = self.encode_tau_values(tau_values)
        if isinstance(tau_enc, list):
            data_range = tau_enc[-1] + 1
        if fit_range == -1:
            fit_range = int(data_range - 1)
        return {
            "species": list(species),
            "data_range": int(data_range),
            "correlation_time": int(correlation_time),
            "fit_range": int(fit_range),
            "molecules": bool(molecules),
            "tau_values": tau_enc,
            "atom_selection": self.encode_atom_selection(atom_selection),
        }

    def run_calculator(self) -> Dict[str, dict]:
        a = self.args
        exp = self.experiment
        self._run_dependency_check(a["species"])
        times = self._handle_tau_values() * exp.units.time
        w = a["data_range"]
        tau_idx = np.asarray(self.tau_values)
        results = {}
        ct = a["correlation_time"]
        for sp_a, sp_b in itertools.combinations_with_replacement(a["species"], 2):
            msd_sum = np.zeros(self.data_resolution)
            n_windows = 0
            pend = None  # per-slab accumulator for atom-minibatched slabs
            # streamed window-aligned slabs: the full pair is never
            # resident (a 100k-frame pair loaded whole is ~25 GB)
            for slab, info in self._stream_properties_multi(
                [sp_a, sp_b], self.loaded_property.name, w, ct,
                with_info=True,
            ):
                if info.n_groups == 1:
                    xa = np.asarray(slab[sp_a])
                    xb = np.asarray(slab[sp_b])
                    for seg_a, seg_b in zip(
                        _window_slabs(xa, w, ct),
                        _window_slabs(xb, w, ct),
                    ):
                        da = seg_a[tau_idx] - seg_a[0]  # (R, Na, 3)
                        db = seg_b[tau_idx] - seg_b[0]
                        cross = np.mean(
                            da.mean(axis=1) * db.mean(axis=1), axis=-1
                        )  # (W,)
                        if sp_a == sp_b:
                            cross = cross - np.mean(
                                np.mean(da * db, axis=-1), axis=1
                            )
                        msd_sum += cross
                        n_windows += 1
                    continue
                # atom-minibatched path: the bilinear cross term only
                # needs the per-slab particle SUMS, which accumulate
                # across groups; the same-species self term is additive
                # over particles and accumulates per window per group
                xa = np.asarray(slab[sp_a], dtype=np.float64)
                if info.group == 0:
                    pend = {"sa": 0.0, "sb": 0.0, "self": 0.0,
                            "na": 0, "nb": 0}
                pend["sa"] = pend["sa"] + xa.sum(axis=1)  # (T, 3)
                pend["na"] += xa.shape[1]
                if sp_a == sp_b:
                    selfw = [
                        np.sum(
                            np.mean(
                                (seg[tau_idx] - seg[0]) ** 2, axis=-1
                            ),
                            axis=1,
                        )
                        for seg in _window_slabs(xa, w, ct)
                    ]
                    pend["self"] = pend["self"] + np.asarray(selfw)
                else:
                    xb = np.asarray(slab[sp_b], dtype=np.float64)
                    pend["sb"] = pend["sb"] + xb.sum(axis=1)
                    pend["nb"] += xb.shape[1]
                if info.group == info.n_groups - 1:
                    na = pend["na"]
                    sb = pend["sa"] if sp_a == sp_b else pend["sb"]
                    nb = na if sp_a == sp_b else pend["nb"]
                    for wi, (seg_a, seg_b) in enumerate(zip(
                        _window_slabs(pend["sa"], w, ct),
                        _window_slabs(sb, w, ct),
                    )):
                        da = (seg_a[tau_idx] - seg_a[0]) / na  # (R, 3)
                        db = (seg_b[tau_idx] - seg_b[0]) / nb
                        cross = np.mean(da * db, axis=-1)  # (R,)
                        if sp_a == sp_b:
                            cross = cross - pend["self"][wi] / na
                        msd_sum += cross
                        n_windows += 1
                    pend = None
            if n_windows == 0:
                raise ValueError(
                    f"{self.name}: data_range {w} exceeds the "
                    f"{exp.number_of_configurations} available "
                    "configurations."
                )
            msd = msd_sum / n_windows
            msd *= exp.units.length**2
            try:
                popt, pcov, _, _ = fit_einstein_curve(
                    times, msd, fit_max_index=a["fit_range"]
                )
                sign = 1.0
            except ValueError:
                popt, pcov, _, _ = fit_einstein_curve(
                    times, np.abs(msd), fit_max_index=a["fit_range"]
                )
                sign = -1.0
            error = np.sqrt(np.diag(pcov))[0]
            results[f"{sp_a}_{sp_b}"] = {
                "diffusion_coefficient": sign * popt[0] / 2.0,
                "uncertainty": error / 2.0,
                "time": times.tolist(),
                "msd": msd.tolist(),
            }
        return results


class GreenKuboDistinctDiffusionCoefficients(TrajectoryCalculator):
    """Distinct GK diffusion: cross-particle velocity correlations.

    Per window: raw (unnormalised) positive-lag cross-correlation averaged
    over dimensions and particle pairs (reference ``correlate`` helper,
    ``utils/calculator_helper_methods.py:110-150``), self-term subtracted
    for identical species; D = mean over windows of
    ``prefactor * trapz(vacf, t)`` with
    ``prefactor = length^2 / (time_unit * (data_range - 1))``
    (``green_kubo_distinct_diffusion_coefficients.py:297-313``).
    """

    loaded_property = mp.velocities
    scale_function = {"linear": {"scale_factor": 10}}
    result_keys = ["diffusion_coefficient", "uncertainty"]
    result_series_keys = ["time", "vacf"]

    def prepare_args(
        self,
        species: list = None,
        data_range: int = 500,
        correlation_time: int = 1,
        integration_range: int = None,
        tau_values=None,
        molecules: bool = False,
        atom_selection=None,
        **kwargs,
    ) -> Dict[str, Any]:
        if species is None:
            species = list(self.experiment.species)
        tau_enc = self.encode_tau_values(tau_values)
        if isinstance(tau_enc, list):
            data_range = tau_enc[-1] + 1
        if integration_range is None:
            integration_range = data_range - 1
        return {
            "species": list(species),
            "data_range": int(data_range),
            "correlation_time": int(correlation_time),
            "integration_range": int(integration_range),
            "molecules": bool(molecules),
            "tau_values": tau_enc,
            "atom_selection": self.encode_atom_selection(atom_selection),
        }

    @staticmethod
    def _raw_cross_corr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Positive-lag unnormalised cross-correlation, mean over dims.

        ``out[k] = mean_d sum_t a[t+k, d] b[t, d]`` — matches
        ``jnp.correlate(a, b, 'full')[N-1:]`` averaged over dimensions.
        """
        w = a.shape[0]
        # biased estimator times W gives the raw sum
        cc = cross_correlation_biased(
            jnp.asarray(b), jnp.asarray(a), axis=0
        )  # sum_t b[t] a[t+k] / W
        return np.asarray(jnp.mean(cc, axis=-1)) * w

    def run_calculator(self) -> Dict[str, dict]:
        a = self.args
        exp = self.experiment
        self._run_dependency_check(a["species"])
        times = self._handle_tau_values()  # raw sim units (reference parity)
        w = a["data_range"]
        tau_idx = np.asarray(self.tau_values)
        prefactor = exp.units.length**2 / (exp.units.time * (w - 1))
        results = {}
        ct = a["correlation_time"]
        for sp_a, sp_b in itertools.combinations_with_replacement(a["species"], 2):
            vacf_sum = np.zeros(self.data_resolution)
            sigmas = []
            pend = None  # per-slab accumulator for atom-minibatched slabs
            # streamed window-aligned slabs (the full pair is never
            # resident — see EinsteinDistinct)
            for slab, info in self._stream_properties_multi(
                [sp_a, sp_b], self.loaded_property.name, w, ct,
                with_info=True,
            ):
                if info.n_groups == 1:
                    xa = np.asarray(slab[sp_a])
                    xb = np.asarray(slab[sp_b])
                    for full_a, full_b in zip(
                        _window_slabs(xa, w, ct),
                        _window_slabs(xb, w, ct),
                    ):
                        # gather the window at the requested lags before
                        # correlating (reference gathers the ensemble at
                        # tau_values)
                        seg_a, seg_b = full_a[tau_idx], full_b[tau_idx]
                        # bilinearity: mean_{ij} corr(a_i, b_j)
                        #            = corr(mean a, mean b)
                        cross = self._raw_cross_corr(
                            seg_a.mean(axis=1), seg_b.mean(axis=1)
                        )
                        if sp_a == sp_b:
                            # mean over particles of per-particle self
                            # correlation — one batched FFT over the
                            # particle axis (was a Python loop)
                            w_len = seg_a.shape[0]
                            cc = cross_correlation_biased(
                                jnp.asarray(seg_b), jnp.asarray(seg_a),
                                axis=0,
                            )  # (W, N, 3)
                            per_particle = (
                                np.asarray(jnp.mean(cc, axis=(1, 2)))
                                * w_len
                            )
                            cross = cross - per_particle
                        vacf_sum += cross
                        sigmas.append(
                            prefactor * np.trapezoid(cross, x=times)
                        )
                    continue
                # atom-minibatched path: corr is bilinear, so the cross
                # term only needs per-slab particle SUMS (accumulated
                # across groups); the same-species self term is additive
                # over particles
                xa = np.asarray(slab[sp_a], dtype=np.float64)
                if info.group == 0:
                    pend = {"sa": 0.0, "sb": 0.0, "self": 0.0,
                            "na": 0, "nb": 0}
                pend["sa"] = pend["sa"] + xa.sum(axis=1)  # (T, 3)
                pend["na"] += xa.shape[1]
                if sp_a == sp_b:
                    selfw = []
                    for full in _window_slabs(xa, w, ct):
                        seg = full[tau_idx]
                        w_len = seg.shape[0]
                        cc = cross_correlation_biased(
                            jnp.asarray(seg), jnp.asarray(seg), axis=0
                        )  # (W, n_g, 3)
                        selfw.append(
                            np.asarray(jnp.mean(cc, axis=2).sum(axis=1))
                            * w_len
                        )
                    pend["self"] = pend["self"] + np.asarray(selfw)
                else:
                    xb = np.asarray(slab[sp_b], dtype=np.float64)
                    pend["sb"] = pend["sb"] + xb.sum(axis=1)
                    pend["nb"] += xb.shape[1]
                if info.group == info.n_groups - 1:
                    na = pend["na"]
                    sb = pend["sa"] if sp_a == sp_b else pend["sb"]
                    nb = na if sp_a == sp_b else pend["nb"]
                    for wi, (full_a, full_b) in enumerate(zip(
                        _window_slabs(pend["sa"], w, ct),
                        _window_slabs(sb, w, ct),
                    )):
                        seg_a = full_a[tau_idx] / na  # (R, 3) mean series
                        seg_b = full_b[tau_idx] / nb
                        cross = self._raw_cross_corr(seg_a, seg_b)
                        if sp_a == sp_b:
                            cross = cross - pend["self"][wi] / na
                        vacf_sum += cross
                        sigmas.append(
                            prefactor * np.trapezoid(cross, x=times)
                        )
                    pend = None
            if not sigmas:
                raise ValueError(
                    f"{self.name}: data_range {w} exceeds the "
                    f"{exp.number_of_configurations} available "
                    "configurations."
                )
            vacf = vacf_sum / len(sigmas)
            sigmas = np.asarray(sigmas)
            results[f"{sp_a}_{sp_b}"] = {
                "diffusion_coefficient": float(np.mean(sigmas)),
                "uncertainty": float(np.std(sigmas) / np.sqrt(len(sigmas))),
                "time": times.tolist(),
                "vacf": vacf.tolist(),
            }
        return results
