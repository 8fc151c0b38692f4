"""ctypes bridge to the native C++ ADF triplet-angle kernel.

Loads ``native/_adf_kernel.so`` (building it with g++ on first use when the
shared object is absent or stale) and exposes :func:`adf_histogram_native`
— the CPU production route for the ADF triplet histogram when no
accelerator is attached. The kernel mirrors the XLA neighbor-list kernel's
semantics (``ops/adf.py::adf_histogram_neighbors``; reference analog:
``mdsuite/calculators/angular_distribution_function.py:330-430`` +
``mdsuite/utils/neighbour_list.py:112-177``) up to f32 rounding /
summation order.

Unlike the RDF bridge there is no canonical-layout requirement: the kernel
reads the per-atom species id directly (padding = -1). Callers check
:func:`available` and fall back to the XLA route when the toolchain is
missing or the dtype is not float32.
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
_SO_PATH = _NATIVE_DIR / "_adf_kernel.so"
_SRC_PATH = _NATIVE_DIR / "adf_kernel.cpp"

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
        log.warning("native ADF kernel build failed (%s); using XLA", err)
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
            log.warning("cannot load native ADF kernel: %s", err)
            _build_failed = True
            return None
        lib.adf_hist_f32.restype = ctypes.c_int64
        lib.adf_hist_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def adf_histogram_native(
    positions,
    species_id,
    triple_table,
    box,
    cutoff: float,
    n_bins: int,
    n_triples: int,
    norm_power: int = 4,
    bin_range: tuple[float, float] | None = None,
) -> np.ndarray:
    """Per-triple weighted angle histograms on the host CPU.

    Same contract as ``ops.adf.adf_histogram`` (float32 weighted counts of
    shape ``(n_triples, n_bins)``); raises ``RuntimeError`` when the native
    kernel cannot serve this call — callers catch and use the XLA route.
    """
    from .adf import ADF_BIN_RANGE

    lib = _load()
    if lib is None:
        raise RuntimeError("native ADF kernel unavailable")
    pos = np.ascontiguousarray(np.asarray(positions))
    if pos.dtype != np.float32 or pos.ndim != 3 or pos.shape[-1] != 3:
        raise RuntimeError("native ADF kernel serves (F, N, 3) float32 only")
    sid = np.ascontiguousarray(np.asarray(species_id, dtype=np.int32))
    if sid.ndim != 1 or sid.shape[0] != pos.shape[1]:
        raise RuntimeError("species_id must be (n_atoms,)")
    ttab = np.ascontiguousarray(np.asarray(triple_table, dtype=np.int32))
    if ttab.ndim != 3:
        raise RuntimeError("triple_table must be (S, S, S)")
    if int(ttab.max(initial=0)) >= int(n_triples):
        # the C++ kernel writes out[tid * n_bins + bin] unchecked — a
        # table/count mismatch would corrupt the heap (the XLA route
        # merely drops out-of-range scatter indices)
        raise RuntimeError(
            f"triple_table refers to triple id {int(ttab.max())} but only "
            f"{n_triples} output rows were allocated"
        )
    n_species = ttab.shape[0]
    lo, hi = bin_range if bin_range is not None else ADF_BIN_RANGE
    out = np.zeros((n_triples, n_bins), dtype=np.float64)
    if box is not None:
        box_arr = np.ascontiguousarray(np.asarray(box, dtype=np.float32))
        box_ptr = box_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        box_ptr = None
    rc = lib.adf_hist_f32(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pos.shape[0], pos.shape[1],
        sid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_species,
        ttab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        box_ptr,
        float(cutoff), int(n_bins), int(n_triples), int(norm_power),
        float(lo), float(hi),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"native ADF kernel failed (rc={rc})")
    return out.astype(np.float32)
