"""Environment report.

Analog of the reference's scooby-based report
(``mdsuite/utils/report_computer_characteristics.py:37``), without the scooby
dependency: collects Python/JAX/device/host information into a printable
summary.
"""

from __future__ import annotations

import platform
import sys


class Report:
    """Collect and render environment information."""

    def __init__(self, additional: dict = None):
        self.info = self._collect()
        if additional:
            self.info.update(additional)

    @staticmethod
    def _collect() -> dict:
        info = {
            "python": sys.version.split()[0],
            "platform": platform.platform(),
            "machine": platform.machine(),
        }
        try:
            import psutil

            info["cpu_count"] = psutil.cpu_count()
            info["memory_gb"] = round(psutil.virtual_memory().total / 2**30, 1)
        except Exception:  # pragma: no cover
            pass
        for mod in ("numpy", "scipy", "h5py", "jax"):
            try:
                info[mod] = __import__(mod).__version__
            except Exception:  # pragma: no cover
                info[mod] = "unavailable"
        try:
            import jax

            info["devices"] = [str(d) for d in jax.devices()]
            info["default_backend"] = jax.default_backend()
        except Exception:  # pragma: no cover
            info["devices"] = []
        return info

    def __repr__(self) -> str:
        width = max(len(k) for k in self.info)
        lines = [f"{k.rjust(width)} : {v}" for k, v in sorted(self.info.items())]
        return "\n".join(["lammps_analysis_tpu environment report", "-" * 40, *lines])
