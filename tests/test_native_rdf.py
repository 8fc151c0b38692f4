"""Native C++ RDF kernel: correctness vs the XLA kernel + routing.

The native host kernel (``native/rdf_kernel.cpp``) is the CPU production
route for the RDF pair histogram; it must agree with the XLA kernel on
every count (up to f32 rounding at bin edges — exact on these seeds) and
the ``sharded_rdf_histogram`` routing must engage it exactly when
(single-device mesh, CPU backend, float32, canonical species layout,
``config.native_cpu_kernels``) all hold.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_analysis_tpu.ops import native_rdf
from lammps_analysis_tpu.ops import rdf as rdf_ops
from lammps_analysis_tpu.parallel.mesh import make_data_mesh, use_mesh
from lammps_analysis_tpu.parallel.sharded_ops import sharded_rdf_histogram
from lammps_analysis_tpu.utils.config import config

pytestmark = pytest.mark.skipif(
    not native_rdf.available(), reason="native RDF kernel not buildable"
)


@pytest.fixture()
def system(rng):
    counts = [37, 21, 14]
    box = np.array([8.0, 9.0, 7.5], np.float32)
    sid, n_pad, ptab, n_pairs, _ = rdf_ops.build_species_layout(counts, pad_to=8)
    pos = np.zeros((5, n_pad, 3), np.float32)
    pos[:, : sum(counts)] = rng.uniform(
        0, 7.5, size=(5, sum(counts), 3)
    ).astype(np.float32)
    return sid, ptab, n_pairs, pos, box


def test_native_matches_xla(system):
    sid, ptab, n_pairs, pos, box = system
    h_native = native_rdf.rdf_histogram_native(
        pos, sid, ptab, box, cutoff=3.7, n_bins=64, n_pairs=n_pairs
    )
    h_xla = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), 3.7, 64, n_pairs, i_block=8,
        )
    )
    np.testing.assert_array_equal(h_native, h_xla)


def test_native_open_boundaries(system):
    sid, ptab, n_pairs, pos, _ = system
    h_native = native_rdf.rdf_histogram_native(
        pos, sid, ptab, None, cutoff=3.7, n_bins=64, n_pairs=n_pairs
    )
    h_xla = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            None, 3.7, 64, n_pairs, i_block=8,
        )
    )
    np.testing.assert_array_equal(h_native, h_xla)


def test_species_segment_validation():
    ok = native_rdf.species_segments(
        np.array([0, 0, 1, 1, 1, -1, -1], np.int32)
    )
    assert ok is not None
    np.testing.assert_array_equal(ok[0], [0, 2])
    np.testing.assert_array_equal(ok[1], [2, 3])
    # interleaved, reordered, padding mid-array, missing species: rejected
    for bad in ([0, 1, 0, 1], [1, 1, 0, 0], [0, -1, 1], [1, 1, 1]):
        assert native_rdf.species_segments(np.array(bad, np.int32)) is None


def test_sharded_route_uses_native(system, monkeypatch):
    sid, ptab, n_pairs, pos, box = system
    calls = {"n": 0}
    real = native_rdf.rdf_histogram_native

    def spy(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(native_rdf, "rdf_histogram_native", spy)
    with use_mesh(make_data_mesh(1)):
        h = sharded_rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=3.7, n_bins=64, n_pairs=n_pairs,
            i_block=8,
        )
    assert calls["n"] == 1
    h_xla = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), 3.7, 64, n_pairs, i_block=8,
        )
    )
    np.testing.assert_array_equal(np.asarray(h), h_xla)


def test_sharded_route_respects_config_and_dtype(system, monkeypatch):
    sid, ptab, n_pairs, pos, box = system

    def boom(*args, **kwargs):  # pragma: no cover - must not be called
        raise AssertionError("native kernel must not engage")

    monkeypatch.setattr(native_rdf, "rdf_histogram_native", boom)
    # config off
    monkeypatch.setattr(config, "native_cpu_kernels", False)
    with use_mesh(make_data_mesh(1)):
        sharded_rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=3.7, n_bins=64, n_pairs=n_pairs,
            i_block=8,
        )
    # config on but float64 positions
    monkeypatch.setattr(config, "native_cpu_kernels", True)
    with use_mesh(make_data_mesh(1)):
        sharded_rdf_histogram(
            jnp.asarray(pos, dtype=jnp.float64), jnp.asarray(sid),
            jnp.asarray(ptab), jnp.asarray(box), cutoff=3.7, n_bins=64,
            n_pairs=n_pairs, i_block=8,
        )
    # multi-device mesh keeps the sharded XLA path
    with use_mesh(make_data_mesh(8)):
        sharded_rdf_histogram(
            jnp.asarray(pos)[:8], jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=3.7, n_bins=64, n_pairs=n_pairs,
            i_block=8,
        )


def test_non_canonical_layout_falls_back(rng, monkeypatch):
    """Shuffled species ids: the native route declines, XLA serves."""
    n = 48
    sid = np.array([0, 1] * (n // 2), np.int32)  # interleaved
    ptab = np.array([[0, 1], [1, 2]], np.int32)
    pos = rng.uniform(0, 6, size=(3, n, 3)).astype(np.float32)
    box = np.array([6.0] * 3, np.float32)
    with use_mesh(make_data_mesh(1)):
        h = sharded_rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.9, n_bins=32, n_pairs=3, i_block=8,
        )
    h_xla = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), 2.9, 32, 3, i_block=8,
        )
    )
    np.testing.assert_array_equal(np.asarray(h), h_xla)
