"""Time-series inspection: rolling-mean plots of stored properties.

Port of ``mdsuite/time_series/base.py:47-120`` + ``energies.py:38-43``: a
TimeSeries loads one property for chosen species, applies a rolling mean,
and plots the per-frame total over time (quick simulation sanity checks,
e.g. potential-energy drift).
"""

from __future__ import annotations

import logging
import pathlib
from typing import List, Optional

import numpy as np

from ..database.properties import mdsuite_properties as mp
from ..database.trajectory_store import join_path

log = logging.getLogger(__name__)


class TimeSeries:
    """Base: load -> rolling mean -> plot."""

    loaded_property = None

    def __init__(self, experiment):
        self.experiment = experiment

    def __call__(
        self,
        species: Optional[List[str]] = None,
        window: int = 1,
        save_plot: bool = True,
    ) -> dict:
        exp = self.experiment
        prop = self.loaded_property.name
        if species is None:
            species = [
                sp for sp in exp.species
                if exp.store.check_existence(join_path(sp, prop))
            ]
        if not species:
            raise ValueError(
                f"No species with stored property {prop!r} in {exp.name!r}"
            )
        series = {}
        for sp in species:
            data = exp.store.load([join_path(sp, prop)])[join_path(sp, prop)]
            total = data.sum(axis=(1, 2))  # per-frame total over atoms/dims
            if window > 1:
                kernel = np.ones(window) / window
                total = np.convolve(total, kernel, mode="valid")
            series[sp] = total
        times = (
            np.arange(max(len(v) for v in series.values()))
            * exp.time_step
            * exp.sample_rate
        )
        if save_plot:
            self._plot(times, series)
        return {"time": times, "series": series}

    def _plot(self, times, series) -> pathlib.Path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        for sp, vals in series.items():
            ax.plot(times[: len(vals)], vals, label=sp, lw=1.0)
        ax.set_xlabel("time (sim units)")
        ax.set_ylabel(self.loaded_property.name)
        ax.legend()
        ax.grid(alpha=0.3)
        out = (
            self.experiment.path / "figures"
            / f"timeseries_{self.loaded_property.name}.png"
        )
        out.parent.mkdir(exist_ok=True)
        fig.tight_layout()
        fig.savefig(out, dpi=110)
        plt.close(fig)
        log.info("wrote %s", out)
        return out


class Energies(TimeSeries):
    """Potential-energy time series (reference ``energies.py:38-43``)."""

    loaded_property = mp.potential_energy


class Temperature(TimeSeries):
    """Temperature time series."""

    loaded_property = mp.temperature


class KineticEnergies(TimeSeries):
    """Kinetic-energy time series."""

    loaded_property = mp.kinetic_energy


time_series_dict = {
    "Energies": Energies,
    "Temperature": Temperature,
    "KineticEnergies": KineticEnergies,
}
