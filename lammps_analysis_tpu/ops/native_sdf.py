"""ctypes bridge to the native C++ SDF (spatial distribution) kernel.

Loads ``native/_sdf_kernel.so`` (building it with g++ on first use) and
exposes :func:`sdf_histogram_native` — the CPU production route for the
spatial distribution function's shell-selection + (theta, phi) 2-D
histogram when no accelerator is attached. Mirrors the jitted XLA batch
(``calculators/spatial_distribution_function.py::sdf_batch``; reference
analog ``mdsuite/calculators/spatial_distribution_function.py:72-330``)
up to f32 rounding and libm-vs-XLA acos/atan2 ulp differences at bin
edges. Measured ~0.9 G pairs/s on this host vs ~12 M pairs/s for the
jitted XLA-CPU route at the 10240-atom benchmark shell (the shell
selects ~0.2% of pairs, so the sweep is the d^2 scan, not the angles).

Callers check :func:`available` and fall back to the XLA kernel when the
toolchain is missing or inputs are not (F, N, 3) float32.
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "_sdf_kernel.so"
_SRC_PATH = _NATIVE_DIR / "sdf_kernel.cpp"

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fno-math-errno", "-shared",
        "-fPIC", "-std=c++17", str(_SRC_PATH), "-o", str(_SO_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError) as err:
        log.warning("native SDF kernel build failed (%s); using XLA", err)
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        stale = (
            _SO_PATH.exists()
            and _SRC_PATH.exists()
            and _SRC_PATH.stat().st_mtime > _SO_PATH.stat().st_mtime
        )
        if not _SO_PATH.exists() or stale:
            if not _SRC_PATH.exists() or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError as err:
            log.warning("cannot load native SDF kernel: %s", err)
            _build_failed = True
            return None
        lib.sdf_hist_f32.restype = ctypes.c_int64
        lib.sdf_hist_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def sdf_histogram_native(
    pos_a,
    pos_b,
    box,
    r_min: float,
    r_max: float,
    n_bins: int,
    same_species: bool,
) -> np.ndarray:
    """(theta, phi) shell histogram on the host CPU.

    Same contract as the calculator's jitted ``sdf_batch`` summed over
    the a-axis tiles: float64 counts of shape ``(n_bins, n_bins)``.
    Raises ``RuntimeError`` when the native kernel cannot serve this
    call — callers catch and use the XLA route.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native SDF kernel unavailable")
    pa = np.ascontiguousarray(np.asarray(pos_a))
    pb = np.ascontiguousarray(np.asarray(pos_b))
    for p in (pa, pb):
        if p.dtype != np.float32 or p.ndim != 3 or p.shape[-1] != 3:
            raise RuntimeError(
                "native SDF kernel serves (F, N, 3) float32 only"
            )
    if pa.shape[0] != pb.shape[0]:
        raise RuntimeError("frame counts differ")
    if box is not None:
        box_arr = np.ascontiguousarray(np.asarray(box, dtype=np.float32))
        box_ptr = box_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        box_ptr = None
    out = np.zeros((n_bins, n_bins), dtype=np.uint64)
    rc = lib.sdf_hist_f32(
        pa.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pa.shape[0], pa.shape[1], pb.shape[1],
        box_ptr,
        float(r_min), float(r_max), int(n_bins),
        1 if same_species else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError(f"native SDF kernel failed (rc={rc})")
    return out.astype(np.float64)
