"""Global configuration singleton.

TPU-first analog of the reference config (``mdsuite/utils/config.py:30-59``).
Instead of a host-RAM ``memory_fraction`` only, this config also carries the
device-memory budget used by the static batch planner, the compute dtype for
device kernels, and jupyter/plot toggles.
"""

from __future__ import annotations

import contextlib
import dataclasses


@dataclasses.dataclass
class Config:
    """Global runtime configuration.

    Attributes
    ----------
    jupyter : bool
        Whether we are running inside a notebook (affects progress bars only).
    memory_fraction : float
        Fraction of the (host or device) memory budget the batch planner may
        plan into. Same default as the reference (0.5).
    device_memory_fraction : float
        Fraction of per-device HBM the planner may fill with trajectory data.
    compute_dtype : str
        Default dtype for device kernels of *structural* calculators
        ("float32" on TPU; dynamic calculators use float64 on CPU backends
        for parity with the reference's tf.float64 path).
    accumulate_dtype : str
        Dtype used for long-running accumulations (histograms, ACF sums).
    interactive_plots : bool
        If False, plots are written to files only.
    """

    jupyter: bool = False
    memory_fraction: float = 0.5
    device_memory_fraction: float = 0.6
    compute_dtype: str = "float32"
    accumulate_dtype: str = "float64"
    interactive_plots: bool = False


config = Config()


@contextlib.contextmanager
def change_memory_fraction(desired_memory: float):
    """Temporarily override ``config.memory_fraction``.

    Test hook mirroring ``mdsuite/utils/helpers.py:60-120`` — integration tests
    shrink the memory budget to force the mini-batched code paths.
    """
    old = config.memory_fraction
    config.memory_fraction = desired_memory
    try:
        yield config
    finally:
        config.memory_fraction = old
