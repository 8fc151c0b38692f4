"""lammps_analysis_tpu — TPU-native trajectory-analysis framework.

A ground-up, TPU-first re-design of the capabilities of MDSuite
(SamTov/LAMMPS-Analysis): ingest MD trajectories (LAMMPS dump / extxyz /
flux files / in-memory arrays) into a chunked store, derive per-frame
tensors through composable transformations, and compute observables (RDF,
ADF, Einstein/Green-Kubo transport coefficients, coordination numbers,
structure factor, ...) as jit-compiled JAX programs with Pallas kernels on
the hot paths, sharded over a TPU mesh.

Public API mirrors the reference package entry
(``/root/reference/mdsuite/__init__.py:35-50``): ``Project``, ``Experiment``,
``units``, ``Molecule``, plus the global ``config``.
"""

from __future__ import annotations

import logging

from .utils import units
from .utils.config import config, enable_persistent_compile_cache

enable_persistent_compile_cache()
from .utils.molecule import Molecule
from .database.properties import mdsuite_properties, properties
from .utils.report import Report

_LAZY = {
    "Project": ("lammps_analysis_tpu.project.project", "Project"),
    "Experiment": ("lammps_analysis_tpu.experiment.experiment", "Experiment"),
}


def __getattr__(name):
    """Lazy top-level imports (keeps `import lammps_analysis_tpu` light)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "Project",
    "Experiment",
    "Molecule",
    "Report",
    "units",
    "utils",
    "config",
    "properties",
    "mdsuite_properties",
]

__version__ = "0.1.0"

_log = logging.getLogger(__name__)
if not _log.handlers:  # mirror the reference's stdout INFO handler
    _handler = logging.StreamHandler()
    _handler.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
    _log.addHandler(_handler)
    _log.setLevel(logging.INFO)
