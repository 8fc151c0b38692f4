"""ctypes bridge to the native C++ table parser.

Loads ``native/_table_parser.so`` (building it with g++ on first use if the
shared object is absent), exposing :func:`parse_table_block`. Falls back
cleanly — callers check :func:`available` and use the pandas engine when the
native path cannot be built.
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
_SO_PATH = _NATIVE_DIR / "_table_parser.so"
_SRC_PATH = _NATIVE_DIR / "table_parser.cpp"

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC_PATH), "-o", str(_SO_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError) as err:
        log.warning("native parser build failed (%s); using pandas engine", err)
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
            log.warning("cannot load native parser: %s", err)
            _build_failed = True
            return None
        lib.parse_table_block.restype = ctypes.c_long
        lib.parse_table_block.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.parse_table_block_by_id.restype = ctypes.c_long
        lib.parse_table_block_by_id.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.parse_scatter_f32.restype = ctypes.c_long
        lib.parse_scatter_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.offset_after_nth_newline.restype = ctypes.c_long
        lib.offset_after_nth_newline.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ]
        lib.count_newlines.restype = ctypes.c_long
        lib.count_newlines.argtypes = [ctypes.c_char_p, ctypes.c_long]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_table_block(
    text: bytes,
    n_configs: int,
    n_header_lines: int,
    n_particles: int,
    n_cols: int,
    id_col: int | None = None,
) -> np.ndarray:
    """Parse a raw text block -> (n_configs, n_particles, n_cols) float64.

    Non-numeric tokens (element columns) come back as NaN. With ``id_col``
    set, rows are placed by their integer id (1..n_particles) — the id sort
    happens inside the single native pass. Ids outside that range fall back
    to unsorted parsing (caller then argsorts).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    out = np.empty((n_configs, n_particles, n_cols), dtype=np.float64)
    out_ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    written = -2
    if id_col is not None:
        written = lib.parse_table_block_by_id(
            text, len(text), n_configs, n_header_lines, n_particles,
            n_cols, id_col, out_ptr,
        )
        if written == out.size:
            return out
        if written not in (-2, -3):
            raise ValueError(
                f"native parser wrote {written} values, expected {out.size} "
                "(truncated or malformed block)"
            )
    written = lib.parse_table_block(
        text, len(text), n_configs, n_header_lines, n_particles, n_cols,
        out_ptr,
    )
    if written != out.size:
        raise ValueError(
            f"native parser wrote {written} values, expected {out.size} "
            "(truncated or malformed block)"
        )
    if id_col is not None:
        # non-contiguous ids: sort on the host
        order = np.argsort(out[:, :, id_col], axis=1, kind="stable")
        out = np.take_along_axis(out, order[:, :, None], axis=1)
    return out


class ScatterLayout:
    """Precomputed destination layout for :func:`parse_scatter_f32`.

    Built once per reader spec: sorted row -> (species index, row within
    species), per-property column lists, species row counts.
    """

    def __init__(self, species_to_line_idx, property_to_column_idx,
                 species_order, prop_order):
        n_particles = sum(len(v) for v in species_to_line_idx.values())
        self.species_order = list(species_order)
        self.prop_order = list(prop_order)
        row_species = np.empty(n_particles, dtype=np.int32)
        row_dest = np.empty(n_particles, dtype=np.int32)
        sp_rows = np.empty(len(self.species_order), dtype=np.int64)
        for s, name in enumerate(self.species_order):
            rows = np.asarray(species_to_line_idx[name], dtype=np.intp)
            row_species[rows] = s
            row_dest[rows] = np.arange(len(rows), dtype=np.int32)
            sp_rows[s] = len(rows)
        cols_flat, off = [], [0]
        for pname in self.prop_order:
            cols = list(property_to_column_idx[pname])
            cols_flat.extend(cols)
            off.append(len(cols_flat))
        self.row_species = row_species
        self.row_dest = row_dest
        self.sp_rows = sp_rows
        self.prop_cols = np.asarray(cols_flat, dtype=np.int32)
        self.prop_off = np.asarray(off, dtype=np.int32)
        self.prop_dims = [
            int(self.prop_off[i + 1] - self.prop_off[i])
            for i in range(len(self.prop_order))
        ]


def parse_scatter_f32(
    text: bytes,
    n_configs: int,
    n_header_lines: int,
    n_particles: int,
    n_cols: int,
    layout: ScatterLayout,
    id_col: int | None = None,
):
    """Parse a block straight into per-(species, property) f32 buffers.

    Returns ``{(species, prop): (n_configs, n_sp, d) float32 array}`` or
    ``None`` when the fused path cannot serve the block (non-1..N atom
    ids) — callers fall back to :func:`parse_table_block`. Only the id
    and property columns are numerically parsed; everything else (e.g.
    the element column) is token-skipped.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    n_props = len(layout.prop_order)
    bufs = {}
    ptrs = (ctypes.c_void_p * (len(layout.species_order) * n_props))()
    for s, sname in enumerate(layout.species_order):
        for p, pname in enumerate(layout.prop_order):
            arr = np.empty(
                (n_configs, int(layout.sp_rows[s]), layout.prop_dims[p]),
                dtype=np.float32,
            )
            bufs[(sname, pname)] = arr
            ptrs[s * n_props + p] = arr.ctypes.data_as(ctypes.c_void_p)
    rc = lib.parse_scatter_f32(
        text, len(text), n_configs, n_header_lines, n_particles, n_cols,
        -1 if id_col is None else int(id_col),
        layout.row_species.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        layout.row_dest.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_props,
        layout.prop_cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        layout.prop_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        layout.sp_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ptrs,
    )
    if rc == -2:
        return None  # non-contiguous / duplicate ids: caller falls back
    if rc < 0:
        raise ValueError(
            f"native scatter parser failed (rc={rc}) — truncated block?"
        )
    return bufs


def count_newlines(text: bytes) -> int:
    lib = _load()
    if lib is None:
        return text.count(b"\n")
    return lib.count_newlines(text, len(text))


def offset_after_nth_newline(text: bytes, n: int) -> int:
    """Byte offset just past the n-th newline (-1 if fewer exist)."""
    lib = _load()
    if lib is None:  # pragma: no cover - pure-python fallback
        pos = -1
        for _ in range(n):
            pos = text.find(b"\n", pos + 1)
            if pos < 0:
                return -1
        return pos + 1
    return lib.offset_after_nth_newline(text, len(text), n)
