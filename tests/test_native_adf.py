"""Native C++ ADF kernel: correctness vs oracle + XLA, and routing.

The native host kernel (``native/adf_kernel.cpp``) is the CPU production
route for the ADF triplet histogram; it must agree with an f64 numpy
oracle of the triple-counting semantics and with the XLA kernels up to
f32 rounding / summation order, and the ``sharded_adf_histogram`` /
``AdfBatchRunner`` routing must engage it exactly when (single-device
mesh, CPU backend, float32, ``config.native_cpu_kernels``) all hold.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_analysis_tpu.ops import adf as adf_ops
from lammps_analysis_tpu.ops import native_adf
from lammps_analysis_tpu.ops.adf import ADF_BIN_RANGE, build_triple_table
from lammps_analysis_tpu.parallel.mesh import make_data_mesh, use_mesh
from lammps_analysis_tpu.parallel.sharded_ops import (
    AdfBatchRunner,
    sharded_adf_histogram,
)
from lammps_analysis_tpu.utils.config import config

pytestmark = pytest.mark.skipif(
    not native_adf.available(), reason="native ADF kernel not buildable"
)


def adf_oracle(pos, sid, ttab, box, cutoff, n_bins, n_triples, norm_power):
    """f64 numpy triple loop with the XLA kernel's exact semantics."""
    lo, hi = ADF_BIN_RANGE
    out = np.zeros((n_triples, n_bins))
    pos = np.asarray(pos, np.float64)
    for f in range(pos.shape[0]):
        for i in range(pos.shape[1]):
            if sid[i] < 0:
                continue
            disp = pos[f] - pos[f, i]
            if box is not None:
                disp = disp - box * np.round(disp / box)
            d = np.linalg.norm(disp, axis=1)
            neigh = [
                j
                for j in range(pos.shape[1])
                if j != i and sid[j] >= 0 and d[j] < cutoff
            ]
            for j in neigh:
                for k in neigh:
                    if j == k:
                        continue
                    t = ttab[sid[i], sid[j], sid[k]]
                    if t < 0:
                        continue
                    denom = d[j] * d[k]
                    g = denom if denom > 0 else 1.0
                    cos = np.clip(disp[j] @ disp[k] / g, -1.0, 1.0)
                    ang = np.arccos(cos)
                    b = min(max(int((ang - lo) / (hi - lo) * n_bins), 0),
                            n_bins - 1)
                    out[t, b] += 1.0 / g**norm_power
    return out


@pytest.fixture()
def system(rng):
    n = 120
    box = np.array([7.0, 8.0, 6.5], np.float32)
    sid = np.concatenate(
        [
            np.zeros(50, np.int32),
            np.ones(40, np.int32),
            np.full(22, 2, np.int32),
            np.full(8, -1, np.int32),
        ]
    )
    pos = np.zeros((2, n, 3), np.float32)
    pos[:, :112] = rng.uniform(0, 6.5, size=(2, 112, 3)).astype(np.float32)
    ttab, order = build_triple_table(3)
    return pos, sid, ttab, len(order), box


def test_native_matches_f64_oracle(system):
    pos, sid, ttab, n_triples, box = system
    h = native_adf.adf_histogram_native(
        pos, sid, ttab, box, cutoff=2.4, n_bins=40, n_triples=n_triples
    )
    ref = adf_oracle(pos, sid, ttab, box, 2.4, 40, n_triples, 4)
    assert h.sum() > 0
    np.testing.assert_allclose(h, ref, rtol=1e-4, atol=1e-5 * ref.max())


def test_native_matches_xla(system):
    pos, sid, ttab, n_triples, box = system
    for cutoff, norm_power in ((2.4, 4), (3.1, 2), (2.4, 0)):
        h = native_adf.adf_histogram_native(
            pos, sid, ttab, box, cutoff=cutoff, n_bins=40,
            n_triples=n_triples, norm_power=norm_power,
        )
        h_xla = np.asarray(
            adf_ops.adf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
                jnp.asarray(box), cutoff=cutoff, n_bins=40,
                n_triples=n_triples, norm_power=norm_power, c_block=8,
            )
        )
        np.testing.assert_allclose(
            h, h_xla, rtol=1e-4, atol=1e-5 * max(h_xla.max(), 1.0)
        )


def test_native_open_boundaries(system):
    pos, sid, ttab, n_triples, _ = system
    h = native_adf.adf_histogram_native(
        pos, sid, ttab, None, cutoff=2.4, n_bins=40, n_triples=n_triples
    )
    ref = adf_oracle(pos, sid, ttab, None, 2.4, 40, n_triples, 4)
    assert h.sum() > 0
    np.testing.assert_allclose(h, ref, rtol=1e-4, atol=1e-5 * ref.max())


def test_native_rejects_bad_inputs(system):
    pos, sid, ttab, n_triples, box = system
    with pytest.raises(RuntimeError):
        native_adf.adf_histogram_native(
            pos.astype(np.float64), sid, ttab, box,
            cutoff=2.4, n_bins=40, n_triples=n_triples,
        )
    with pytest.raises(RuntimeError):
        native_adf.adf_histogram_native(
            pos, sid[:-1], ttab, box,
            cutoff=2.4, n_bins=40, n_triples=n_triples,
        )


def test_sharded_route_uses_native(system, monkeypatch):
    pos, sid, ttab, n_triples, box = system
    calls = {"n": 0}
    real = native_adf.adf_histogram_native

    def spy(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(native_adf, "adf_histogram_native", spy)
    with use_mesh(make_data_mesh(1)):
        h = sharded_adf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box), cutoff=2.4, n_bins=40, n_triples=n_triples,
        )
    assert calls["n"] == 1
    ref = adf_oracle(pos, sid, ttab, box, 2.4, 40, n_triples, 4)
    np.testing.assert_allclose(
        np.asarray(h), ref, rtol=1e-4, atol=1e-5 * ref.max()
    )


def test_sharded_route_respects_config_and_mesh(system, monkeypatch):
    pos, sid, ttab, n_triples, box = system

    def boom(*args, **kwargs):  # pragma: no cover - must not be called
        raise AssertionError("native kernel must not engage")

    monkeypatch.setattr(native_adf, "adf_histogram_native", boom)
    monkeypatch.setattr(config, "native_cpu_kernels", False)
    with use_mesh(make_data_mesh(1)):
        sharded_adf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box), cutoff=2.4, n_bins=40, n_triples=n_triples,
        )
    # multi-device mesh keeps the sharded XLA path
    monkeypatch.setattr(config, "native_cpu_kernels", True)
    with use_mesh(make_data_mesh(8)):
        sharded_adf_histogram(
            jnp.asarray(pos)[:2], jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box), cutoff=2.4, n_bins=40, n_triples=n_triples,
        )


def test_batch_runner_uses_native(system, monkeypatch):
    pos, sid, ttab, n_triples, box = system
    calls = {"n": 0}
    real = native_adf.adf_histogram_native

    def spy(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(native_adf, "adf_histogram_native", spy)
    with use_mesh(make_data_mesh(1)):
        runner = AdfBatchRunner(
            pos.shape[1], jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box), cutoff=2.4, n_bins=40, n_triples=n_triples,
        )
        runner.feed(jnp.asarray(pos[:1]))
        runner.feed(jnp.asarray(pos[1:]))
        h = runner.finalize()
    assert calls["n"] == 2
    ref = adf_oracle(pos, sid, ttab, box, 2.4, 40, n_triples, 4)
    np.testing.assert_allclose(
        np.asarray(h), ref, rtol=1e-4, atol=1e-5 * ref.max()
    )


def test_native_cell_route_large_system(rng):
    """The counting-sort cell-list route (the production path at headline
    scale) only engages at n_pad >= 1024 with a >= 3-cells-per-dim
    periodic box — every other test system is 120 atoms and exercises
    only the O(N^2) fallback. 1100 atoms, ~6 cells/dim, positions well
    outside [0, box) to exercise the pre-wrap, compared to the f64
    oracle (ADVICE r2)."""
    n, box_l, cutoff, n_bins = 1100, 12.0, 2.0, 40
    box = np.array([box_l] * 3, np.float32)
    sid = np.concatenate(
        [np.zeros(500, np.int32), np.ones(400, np.int32),
         np.full(184, 2, np.int32), np.full(16, -1, np.int32)]
    )
    pos = np.zeros((1, n, 3), np.float32)
    # spread across [-box, 2*box): images of every kind hit the wrap path
    pos[:, :1084] = rng.uniform(-box_l, 2 * box_l, size=(1, 1084, 3)).astype(
        np.float32
    )
    ttab, order = build_triple_table(3)
    n_triples = len(order)

    got = native_adf.adf_histogram_native(
        pos, sid, ttab, box, cutoff, n_bins, n_triples, 4
    )
    ref = adf_oracle(pos, sid, ttab, box, cutoff, n_bins, n_triples, 4)
    assert got.shape == (n_triples, n_bins)
    assert got.sum() > 0, "degenerate test: no triples found"
    # f32 kernel vs f64 oracle: per-bin boundary flips possible, totals
    # and mass distribution must agree tightly
    np.testing.assert_allclose(
        got.sum(axis=1), ref.sum(axis=1), rtol=5e-4,
        err_msg="cell route per-triple totals diverge from the f64 oracle",
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=ref.max() * 2e-3)


def test_native_rejects_overflowing_triple_table(system):
    """A triple_table id >= n_triples must be rejected up front: the C++
    kernel writes out[tid * n_bins + bin] unchecked (ADVICE r2)."""
    pos, sid, ttab, n_triples, box = system
    bad = ttab.copy()
    bad_flat = np.asarray(bad).copy()
    bad_flat[0, 0, 0] = n_triples  # one past the allocated rows
    with pytest.raises(RuntimeError, match="triple id"):
        native_adf.adf_histogram_native(
            pos, sid, bad_flat, box, 2.4, 40, n_triples, 4
        )
