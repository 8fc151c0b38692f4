"""Shared engine for tabular text trajectory formats (LAMMPS dump, extxyz, flux).

Re-design of ``mdsuite/file_io/tabular_text_files.py:57-281``. The per-line
Python parse loop of the reference is replaced with block reads + pandas'
C CSV engine: a batch of configurations is read as one raw text block,
header lines stripped, parsed in one ``read_csv`` call, reshaped to
``(batch, particles, columns)``, id-sorted per configuration with one
vectorised argsort, then sliced per species/property. A native C++ parser
(``native/``) can be swapped in behind the same interface.
"""

from __future__ import annotations

import dataclasses
import io
import itertools
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd

from ..database.contracts import (
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from ..database.properties import PropertyInfo
from ..utils.meta import optimize_batch_size
from .base import FileProcessor


@dataclasses.dataclass
class TabularReaderSpec:
    """Everything the shared engine needs to slice a tabular file.

    Reference analog: ``TabularTextFileReaderMData``
    (``tabular_text_files.py:16-54``).
    """

    n_configs: int
    species_to_line_idx: Dict[str, List[int]]  # rows (after id-sort) per species
    property_to_column_idx: Dict[str, List[int]]
    n_header_lines: int
    n_particles: int
    header_lines_for_each_config: bool = True
    sort_by_column_idx: Optional[int] = None
    n_cols: Optional[int] = None  # enables the native C++ parser path


def extract_properties_from_header(
    header_names: List[str], column_map: Dict[PropertyInfo, List[str]]
) -> Dict[str, List[int]]:
    """Map canonical property names -> column indices present in the file.

    Reference analog: ``lammps_trajectory_files.py:245-298``. A property is
    included only if *all* its component columns are present.
    """
    col_idx = {name: i for i, name in enumerate(header_names)}
    out = {}
    for prop, names in column_map.items():
        if all(n in col_idx for n in names):
            out[prop.name] = [col_idx[n] for n in names]
    return out


def species_list_from_spec(spec: TabularReaderSpec) -> List[SpeciesInfo]:
    """Build the species list announced to the store from a reader spec."""
    props = [
        PropertyInfo(name, len(cols))
        for name, cols in spec.property_to_column_idx.items()
    ]
    return [
        SpeciesInfo(name=name, n_particles=len(rows), properties=props)
        for name, rows in spec.species_to_line_idx.items()
    ]


class TabularTextReader(FileProcessor):
    """Base reader for text files laid out as per-configuration row blocks."""

    def __init__(
        self,
        file_path,
        column_map: Dict[PropertyInfo, List[str]],
        custom_column_map: Optional[Dict[str, List[str]]] = None,
    ):
        super().__init__()
        self.file_path = str(file_path)
        self._column_map = dict(column_map)
        if custom_column_map:
            for name, cols in custom_column_map.items():
                self._column_map[PropertyInfo(name, len(cols))] = cols
        self._spec: TabularReaderSpec | None = None

    # -- format-specific ------------------------------------------------------
    def _get_spec(self) -> TabularReaderSpec:
        raise NotImplementedError

    @property
    def spec(self) -> TabularReaderSpec:
        if self._spec is None:
            self._spec = self._get_spec()
        return self._spec

    # -- shared engine --------------------------------------------------------
    def get_configurations_generator(self) -> Iterator[TrajectoryChunkData]:
        spec = self.spec
        species_list = species_list_from_spec(spec)
        batch_size = optimize_batch_size(self.file_path, spec.n_configs)

        lines_per_config = spec.n_particles + (
            spec.n_header_lines if spec.header_lines_for_each_config else 0
        )

        from . import native_parser

        if spec.n_cols is not None and native_parser.available():
            yield from self._native_stream(
                spec, species_list, batch_size, lines_per_config
            )
            return

        with open(self.file_path, "r") as f:
            if not spec.header_lines_for_each_config:
                for _ in range(spec.n_header_lines):
                    f.readline()
            n_read = 0
            while n_read < spec.n_configs:
                n_batch = min(batch_size, spec.n_configs - n_read)
                chunk = self._read_batch(f, n_batch, lines_per_config, species_list)
                n_read += n_batch
                yield chunk

    def _native_stream(
        self, spec, species_list, batch_size: int, lines_per_config: int
    ) -> Iterator[TrajectoryChunkData]:
        """Byte-block streaming through the C++ parser.

        Raw blocks are read with ``f.read`` (no Python per-line iteration);
        config boundaries are located by vectorised newline indexing, then
        the block parses in native code.
        """
        from . import native_parser

        read_size = 32 * 2**20
        with open(self.file_path, "rb") as f:
            if not spec.header_lines_for_each_config:
                for _ in range(spec.n_header_lines):
                    f.readline()
            leftover = b""
            n_read = 0
            at_eof = False
            while n_read < spec.n_configs:
                block = leftover + f.read(read_size)
                if not block:
                    raise EOFError(
                        f"{self.file_path}: ended after {n_read} of "
                        f"{spec.n_configs} configurations"
                    )
                if len(block) < len(leftover) + read_size:
                    at_eof = True
                    if not block.endswith(b"\n"):
                        block += b"\n"
                n_lines = native_parser.count_newlines(block)
                complete = min(
                    n_lines // lines_per_config,
                    batch_size,
                    spec.n_configs - n_read,
                )
                if complete == 0:
                    if at_eof:
                        raise EOFError(
                            f"{self.file_path}: truncated configuration at "
                            f"index {n_read}"
                        )
                    leftover = block
                    continue
                consumed = native_parser.offset_after_nth_newline(
                    block, complete * lines_per_config
                )
                n_header = (
                    spec.n_header_lines
                    if spec.header_lines_for_each_config
                    else 0
                )
                chunk = self._native_scatter_chunk(
                    block[:consumed], complete, n_header, species_list
                )
                if chunk is None:
                    data = native_parser.parse_table_block(
                        block[:consumed], complete, n_header,
                        spec.n_particles, spec.n_cols,
                        id_col=spec.sort_by_column_idx,
                    )
                    chunk = self._chunk_from_array(
                        data, species_list, pre_sorted=True
                    )
                leftover = block[consumed:]
                n_read += complete
                yield chunk

    def _native_scatter_chunk(self, block, n_configs, n_header, species_list):
        """Fused native parse straight into per-(species, property) f32
        chunk buffers (one pass, one copy, store dtype — see
        ``native/table_parser.cpp::parse_scatter_f32``). Returns ``None``
        when the block's atom ids are not 1..N (fallback path sorts on
        the host)."""
        from . import native_parser

        spec = self.spec
        layout = getattr(self, "_scatter_layout", None)
        if layout is None:
            prop_names = [
                p.name for sp in species_list for p in sp.properties
            ]
            # properties are spec-global: every species carries the same
            # property -> column map, so one prop order serves all
            prop_order = list(dict.fromkeys(prop_names))
            layout = native_parser.ScatterLayout(
                spec.species_to_line_idx,
                spec.property_to_column_idx,
                [sp.name for sp in species_list],
                prop_order,
            )
            self._scatter_layout = layout
        bufs = native_parser.parse_scatter_f32(
            block, n_configs, n_header, spec.n_particles, spec.n_cols,
            layout, id_col=spec.sort_by_column_idx,
        )
        if bufs is None:
            return None
        chunk = TrajectoryChunkData(species_list, n_configs)
        for sp in species_list:
            for prop in sp.properties:
                chunk.attach_data(bufs[(sp.name, prop.name)], sp.name, prop.name)
        return chunk

    def _flat_gather_indices(self, species_list):
        """Per-(species, property) flat indices into a ``(N * C,)`` plane.

        One fancy gather per output array replaces the old
        row-gather + column-slice + chunk-copy chain (3 passes over the
        data; 6x slower measured at 4000 interleaved atoms). Cached on
        the reader — the layout is fixed per spec.
        """
        if getattr(self, "_flat_idx_cache", None) is not None:
            return self._flat_idx_cache
        spec = self.spec
        n_cols = spec.n_cols or max(
            c for cols in spec.property_to_column_idx.values() for c in cols
        ) + 1
        cache = {}
        for sp in species_list:
            rows = np.asarray(spec.species_to_line_idx[sp.name], dtype=np.intp)
            for prop in sp.properties:
                cols = np.asarray(
                    spec.property_to_column_idx[prop.name], dtype=np.intp
                )
                cache[(sp.name, prop.name)] = (
                    rows[:, None] * n_cols + cols[None, :]
                ).ravel()
        self._flat_idx_cache = (cache, n_cols)
        return self._flat_idx_cache

    def _chunk_from_array(self, data: np.ndarray, species_list, pre_sorted=False):
        spec = self.spec
        if spec.sort_by_column_idx is not None and not pre_sorted:
            ids = data[:, :, spec.sort_by_column_idx]
            order = np.argsort(ids, axis=1, kind="stable")
            data = np.take_along_axis(data, order[:, :, None], axis=1)
        idx_cache, n_cols = self._flat_gather_indices(species_list)
        t, n, c = data.shape
        chunk = TrajectoryChunkData(species_list, t)
        if c == n_cols:
            flat = data.reshape(t, n * c)
            for sp in species_list:
                for prop in sp.properties:
                    idx = idx_cache[(sp.name, prop.name)]
                    arr = flat[:, idx].reshape(t, -1, len(
                        spec.property_to_column_idx[prop.name]
                    ))
                    chunk.attach_data(arr, sp.name, prop.name)
            return chunk
        # column count differs from the spec (defensive): legacy path
        for sp in species_list:
            rows = _as_slice(spec.species_to_line_idx[sp.name])
            sp_block = data[:, rows, :]
            for prop in sp.properties:
                cols = _as_slice(spec.property_to_column_idx[prop.name])
                chunk.add_data(sp_block[:, :, cols], 0, sp.name, prop.name)
        return chunk

    def _read_batch(
        self, f, n_batch: int, lines_per_config: int, species_list
    ) -> TrajectoryChunkData:
        raw = list(itertools.islice(f, n_batch * lines_per_config))
        data = self._parse_block(raw, n_batch)
        return self._chunk_from_array(data, species_list)

    def _parse_block(self, raw: List[str], n_batch: int) -> np.ndarray:
        """Raw lines -> float64 ``(n_batch, n_particles, n_cols)`` via the
        pandas C engine with numeric coercion (fallback when the native
        parser cannot be built)."""
        spec = self.spec
        if spec.header_lines_for_each_config and spec.n_header_lines:
            lines_per_config = spec.n_particles + spec.n_header_lines
            keep = []
            for c in range(n_batch):
                base = c * lines_per_config + spec.n_header_lines
                keep.extend(raw[base : base + spec.n_particles])
            raw = keep
        frame = pd.read_csv(
            io.StringIO("".join(raw)),
            sep=r"\s+",
            header=None,
            engine="c",
        )
        data = frame.apply(pd.to_numeric, errors="coerce").to_numpy(
            dtype=np.float64
        )
        return data.reshape(n_batch, spec.n_particles, -1)


def _as_slice(indices: List[int]):
    """Contiguous ASCENDING index lists become slices (views beat
    fancy-index copies). The test must be exact equality with the range —
    an endpoint-only check accepts permuted/gapped lists like [5, 9, 7]
    and silently selects the wrong columns."""
    if len(indices) == 1:
        return slice(indices[0], indices[0] + 1)
    if indices == list(range(indices[0], indices[0] + len(indices))):
        return slice(indices[0], indices[-1] + 1)
    return indices


def read_n_lines(f, n: int) -> List[str]:
    lines = list(itertools.islice(f, n))
    if len(lines) < n:
        raise EOFError(f"Expected {n} lines, file ended after {len(lines)}")
    return lines


def skip_n_lines(f, n: int) -> None:
    for _ in itertools.islice(f, n):
        pass
