"""Smoke tests: the shipped examples must run end-to-end.

Mirrors the reference CI's notebook job (``pytest --nbmake ./examples``,
``.github/workflows/pytest.yml:62``) — examples are executable docs and rot
without coverage.
"""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.parametrize(
    "script",
    ["molten_nacl_analysis.py", "water_molecule_study.py",
     "flux_transport_analysis.py", "binary_trajectory_analysis.py",
     "multi_device_scaling.py"],
)
def test_example_runs(script, tmp_path):
    env = {
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
        "HOME": str(tmp_path),
        "TMPDIR": str(tmp_path),
        "PATH": "/usr/bin:/bin:/usr/local/bin",
    }
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / script)],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "figures" in proc.stdout.lower()
