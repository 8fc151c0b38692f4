"""Particle-trajectory visualization (matplotlib backend).

Replaces the reference's znvis/open3d interactive viewers
(``mdsuite/visualizer/znvis_visualizer.py:41-140``,
``d3_data_visualizer.py:39-208`` — neither dependency is in this image)
with a non-interactive renderer: a 3-D scatter of selected frames written
to the experiment's ``figures/`` directory, one panel per frame.
"""

from __future__ import annotations

import logging
import pathlib
from typing import List, Optional

import numpy as np


from ..database.trajectory_store import join_path

log = logging.getLogger(__name__)

_COLORS = ["tab:blue", "tab:orange", "tab:green", "tab:red", "tab:purple",
           "tab:brown", "tab:pink", "tab:gray"]


class TrajectoryVisualizer:
    """Render selected configurations of an experiment to PNG."""

    def __init__(
        self,
        experiment,
        species: Optional[List[str]] = None,
        molecules: bool = False,
        property_name: str = "Positions",
    ):
        self.experiment = experiment
        if species is None:
            species = (
                list(experiment.molecules)
                if molecules
                else [s for s in experiment.species if s != "Observables"]
            )
        self.species = species
        self.property_name = property_name

    def run(self, frames: Optional[List[int]] = None) -> pathlib.Path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        exp = self.experiment
        explicit_frames = frames
        if frames is None:
            n = exp.number_of_configurations
            frames = sorted({0, n // 2, n - 1})
        fig = plt.figure(figsize=(5 * len(frames), 5))
        for i, frame in enumerate(frames):
            ax = fig.add_subplot(1, len(frames), i + 1, projection="3d")
            for c, sp in enumerate(self.species):
                path = join_path(sp, self.property_name)
                if not exp.store.check_existence(path):
                    continue
                pos = exp.store.load([path], frames=slice(frame, frame + 1))[
                    path
                ][0]
                ax.scatter(
                    pos[:, 0], pos[:, 1], pos[:, 2],
                    s=12, label=sp, color=_COLORS[c % len(_COLORS)],
                    alpha=0.8,
                )
            ax.set_title(f"frame {frame}")
            if i == 0:
                ax.legend(loc="upper left", fontsize=8)
        out = exp.path / "figures" / "trajectory.png"
        out.parent.mkdir(exist_ok=True)
        fig.tight_layout()
        fig.savefig(out, dpi=110)
        plt.close(fig)
        log.info("wrote %s", out)

        # interactive companion: drag/zoom/play point-cloud HTML
        # (znvis-viewer parity, ``znvis_visualizer.py:41-140``). The
        # animation samples up to 60 frames across the trajectory when
        # the caller did not pin an explicit frame list (the PNG keeps
        # its three panels) — one batched load per species.
        from .html3d import write_html_3d

        anim = (
            np.unique(
                np.linspace(
                    0, exp.number_of_configurations - 1,
                    min(exp.number_of_configurations, 60), dtype=int,
                )
            )
            if explicit_frames is None
            else np.asarray(frames, dtype=int)
        )
        per_species = {}
        for sp in self.species:
            path = join_path(sp, self.property_name)
            if not exp.store.check_existence(path):
                continue
            per_species[sp] = exp.store.load([path], frames=anim)[path]
        html_frames = [
            [(sp, data[i]) for sp, data in per_species.items()]
            for i in range(len(anim))
        ]
        write_html_3d(
            html_frames,
            exp.path / "figures" / "trajectory.html",
            title=f"{exp.name} trajectory",
            frame_labels=[f"frame {int(f)}" for f in anim],
        )
        return out
