"""Green-Kubo self-diffusion coefficients.

Port of ``mdsuite/calculators/green_kubo_self_diffusion_coefficients.py``:
per-window biased VACF (tfp ``auto_correlation(center=False,
normalize=False)`` == the FFT estimator in ``ops.correlation``), unit
scaling to m^2/s^2, the reference's ``n_windows * (n_particles + 1)``
normalisation quirk, D = (1/3) * cumulative-trapezoid integral at
``integration_range - 1``, SEM over per-window integrals.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from scipy.integrate import cumulative_trapezoid

from ..database.properties import mdsuite_properties as mp
from ..parallel.sharded_ops import sharded_windowed_acf
from .base import TrajectoryCalculator

log = logging.getLogger(__name__)


class GreenKuboDiffusionCoefficients(TrajectoryCalculator):
    """Self-diffusion from the velocity autocorrelation function."""

    loaded_property = mp.velocities
    scale_function = {"linear": {"scale_factor": 150}}
    result_keys = ["diffusion_coefficient", "uncertainty"]
    result_series_keys = ["time", "acf", "integral", "integral_uncertainty"]

    def prepare_args(
        self,
        species: list = None,
        data_range: int = 500,
        correlation_time: int = 1,
        tau_values=None,
        molecules: bool = False,
        integration_range: int = None,
        atom_selection=None,
        **kwargs,
    ) -> Dict[str, Any]:
        exp = self.experiment
        if species is None:
            species = list(exp.molecules) if molecules else list(exp.species)
        tau_enc = self.encode_tau_values(tau_values)
        if isinstance(tau_enc, list):
            data_range = tau_enc[-1] + 1
        if integration_range is None:
            integration_range = data_range - 1
        return {
            "species": list(species),
            "data_range": int(data_range),
            "correlation_time": int(correlation_time),
            "molecules": bool(molecules),
            "integration_range": int(integration_range),
            "tau_values": tau_enc,
            "atom_selection": self.encode_atom_selection(atom_selection),
        }

    def run_calculator(self) -> Dict[str, dict]:
        a = self.args
        exp = self.experiment
        results = {}
        vel_scale = exp.units.length**2 / exp.units.time**2
        for sp in a["species"]:
            self._run_dependency_check([sp])
            times = self._handle_tau_values() * exp.units.time
            data_range = a["data_range"]
            tau = (
                None
                if a.get("tau_values") is None
                else jnp.asarray(self.tau_values)
            )

            acf_sum = np.zeros(self.data_resolution)
            sigmas = []
            count = 0
            for slab in self._stream_property(
                sp, self.loaded_property.name, data_range, a["correlation_time"]
            ):
                s, per_window = sharded_windowed_acf(
                    jnp.asarray(slab), data_range, a["correlation_time"],
                    tau=tau,
                )
                acf_sum += vel_scale * np.asarray(s, dtype=np.float64)
                n_particles = slab.shape[1]
                n_windows = per_window.shape[0]
                count += n_windows * (n_particles + 1)
                # per-window integrals for the SEM (reference :199-206)
                sigmas.append(
                    cumulative_trapezoid(
                        vel_scale * np.asarray(per_window, dtype=np.float64),
                        x=times, axis=1,
                    )
                )

            if count == 0:
                raise ValueError(
                    f"{self.name}: data_range {data_range} exceeds available "
                    "configurations."
                )
            acf = acf_sum / count
            sigma = cumulative_trapezoid(acf, x=times)
            sigmas = np.concatenate(sigmas, axis=0)
            sigma_sem = np.std(sigmas, axis=0) / np.sqrt(len(sigmas))

            ir = min(a["integration_range"] - 1, len(sigma) - 1)
            results[sp] = {
                "diffusion_coefficient": [float(sigma[ir] / 3.0)],
                "uncertainty": [float(sigma_sem[ir] / 3.0)],
                "time": times.tolist(),
                "acf": acf.tolist(),
                "integral": sigma.tolist(),
                "integral_uncertainty": sigma_sem.tolist(),
            }
            log.info("%s D_%s = %.4e m^2/s", self.name, sp, sigma[ir] / 3.0)
        return results
