"""RunComputation: the ``exp.run.X(...)`` / ``project.run.X(...)`` hub.

Port of ``mdsuite/experiment/run.py:58-242``: every calculator and
transformation is exposed as an attribute so users get IDE-discoverable
entry points; transformations invoked through it loop over the bound
experiments.
"""

from __future__ import annotations

from typing import List, Optional


def _calculator_registry():
    """name -> class for every calculator (built lazily to avoid cycles)."""
    from ..calculators import ALL_CALCULATORS

    return ALL_CALCULATORS


def _transformation_registry():
    from ..transformations.registry import ALL_TRANSFORMATIONS

    return ALL_TRANSFORMATIONS


class RunComputation:
    """Dispatch hub bound to one experiment or a list of experiments."""

    def __init__(self, experiment=None, experiments: Optional[List] = None):
        self.experiment = experiment
        self.experiments = experiments or ([experiment] if experiment else [])

    def __getattr__(self, name: str):
        calcs = _calculator_registry()
        if name in calcs:
            cls = calcs[name]
            # a project-bound hub has experiment=None: the calculator then
            # returns {experiment_name: Computation} even for a single
            # active experiment (reference ``calculator.py:110-146``,
            # "dictionary of shape {name: data} when called from the
            # project class"); an experiment-bound hub returns the bare
            # Computation
            return cls(
                experiment=self.experiment,
                experiments=self.experiments,
            )
        trafos = _transformation_registry()
        if name in trafos:
            cls = trafos[name]

            def run_trafo(species=None, **kwargs):
                trafo = cls(**kwargs) if kwargs else cls()
                for exp in self.experiments:
                    exp.cls_transformation_run(trafo, species=species)

            return run_trafo
        raise AttributeError(
            f"No calculator or transformation named {name!r}. Available "
            f"calculators: {sorted(calcs)}; transformations: {sorted(trafos)}"
        )

    def __dir__(self):  # IDE autocomplete parity with the reference hub
        return sorted(
            set(super().__dir__())
            | set(_calculator_registry())
            | set(_transformation_registry())
        )
