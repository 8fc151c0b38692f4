"""Unit tests for support modules: units, planner, prefetch, data tables."""

import time

import numpy as np
import pytest

from lammps_analysis_tpu.data.elements import COVALENT_RADII, mass_of
from lammps_analysis_tpu.data.form_factors import form_factor
from lammps_analysis_tpu.memory.planner import BatchPlanner
from lammps_analysis_tpu.pipeline.prefetch import prefetch_to_device
from lammps_analysis_tpu.utils.config import change_memory_fraction, config
from lammps_analysis_tpu.utils.meta import (
    get_dimensionality,
    get_machine_properties,
    smooth_series,
    sort_array_by_column,
)
from lammps_analysis_tpu.utils.scale_functions import (
    SCALE_FUNCTIONS,
    resolve_scale_function,
)
from lammps_analysis_tpu.utils.units import (
    METAL,
    REAL,
    SI,
    UnitSystem,
    resolve_units,
)


def test_unit_systems():
    assert resolve_units("metal") is METAL
    assert resolve_units("REAL") is REAL
    assert resolve_units(SI) is SI
    with pytest.raises(ValueError, match="Unknown unit system"):
        resolve_units("bogus")
    assert METAL.volume == METAL.length**3
    assert REAL.time == 1e-15 and REAL.length == 1e-10


def test_element_tables():
    assert abs(mass_of("Na") - 22.990) < 1e-3
    assert mass_of("Na1") == mass_of("Na")  # numeric suffixes strip
    assert mass_of("Unobtainium", default=7.0) == 7.0
    assert COVALENT_RADII["O"] < COVALENT_RADII["Na"]


def test_form_factors():
    q = np.linspace(0.5, 12, 50)
    f_na = form_factor("Na", q)
    # f(q->0) approaches the electron count; monotone decreasing overall
    assert 10.0 < f_na[0] < 11.5
    assert f_na[0] > f_na[-1]
    with pytest.raises(KeyError, match="Cromer-Mann"):
        form_factor("Xx", q)


def test_scale_functions():
    fn, kwargs = resolve_scale_function({"quadratic": {"outer_scale_factor": 3}})
    assert fn(2.0, **kwargs) == 12.0
    fn, kwargs = resolve_scale_function(None)
    assert fn(5.0, **kwargs) == 5.0
    assert set(SCALE_FUNCTIONS) == {
        "linear", "log-linear", "quadratic", "polynomial"
    }


def test_config_context():
    before = config.memory_fraction
    with change_memory_fraction(0.01):
        assert config.memory_fraction == 0.01
    assert config.memory_fraction == before


def test_meta_helpers(rng):
    arr = np.array([[3, 30.0], [1, 10.0], [2, 20.0]])
    out = sort_array_by_column(arr, 0)
    np.testing.assert_array_equal(out[:, 1], [10.0, 20.0, 30.0])
    assert get_dimensionality([1.0, 2.0, 3.0]) == 3
    assert get_dimensionality([1.0, 2.0, 0.0]) == 2
    y = rng.normal(size=50)
    sm = smooth_series(y, window=11, order=2)
    assert sm.shape == y.shape
    assert np.std(sm) < np.std(y)
    props = get_machine_properties()
    assert props["memory"] > 0 and props["cpu_count"] >= 1


def test_window_plan():
    assert BatchPlanner.window_plan(100, 20, 10) == 9
    assert BatchPlanner.window_plan(10, 20, 1) == 0
    assert BatchPlanner.window_plan(20, 20, 5) == 1


def test_prefetch_order_and_overlap():
    loads = []

    def load(i):
        loads.append(i)
        time.sleep(0.01)
        return np.full((4,), i, dtype=np.float64)

    out = list(prefetch_to_device(load, list(range(7)), depth=2))
    assert [int(np.asarray(o)[0]) for o in out] == list(range(7))
    assert sorted(loads) == list(range(7))
    assert list(prefetch_to_device(load, [], depth=2)) == []


def test_profiling_stopwatch():
    from lammps_analysis_tpu.utils.profiling import Stopwatch, device_trace

    sw = Stopwatch()
    with sw.section("a"):
        time.sleep(0.01)
    with sw.section("a"):
        pass
    assert sw.counts["a"] == 2
    assert sw.totals["a"] >= 0.01
    assert "a:" in sw.report()
    assert sw.throughput("a", 100) > 0
    with device_trace(None):  # no-op path
        pass


def test_chemfiles_gate():
    from lammps_analysis_tpu.file_io import chemfiles_io

    if not chemfiles_io.CHEMFILES_AVAILABLE:
        with pytest.raises(ImportError, match="chemfiles"):
            chemfiles_io.ChemfilesRead("x.trr")


def test_multihost_helpers():
    from lammps_analysis_tpu.parallel import multihost

    assert multihost.is_multihost() is False


def test_golden_section_search_brackets_minimum(rng):
    """Golden-section search must bracket the true sampled minimum.

    Regression: a dead branch once returned the same tuple regardless of
    which side held the minimum. Checked against brute-force argmin on an
    RDF-like double-peak curve and a quadratic.
    """
    from lammps_analysis_tpu.utils.meta import golden_section_search

    x = np.linspace(0.0, 5.0, 2001)
    # quadratic with min at 2.7
    y = (x - 2.7) ** 2
    lo, hi = golden_section_search([x, y], 0.5, 4.5)
    assert lo <= 2.7 <= hi
    assert hi - lo < 0.01

    # RDF-like double peak, minimum in between (like CN shell finding)
    g = (
        2.5 * np.exp(-((x - 1.0) ** 2) / 0.02)
        + 1.6 * np.exp(-((x - 2.2) ** 2) / 0.08)
        + 1.0 / (1.0 + np.exp(-(x - 0.8) * 10))
        - 1.0 / (1.0 + np.exp(-(x - 0.8) * 10))
    )
    a, b = 1.0, 2.2  # search between the two peaks
    mask = (x >= a) & (x <= b)
    true_min = x[mask][np.argmin(g[mask])]
    lo, hi = golden_section_search([x, g], a, b)
    assert lo - 0.01 <= true_min <= hi + 0.01
    # bound order must not matter
    lo2, hi2 = golden_section_search([x, g], b, a)
    assert (lo2, hi2) == (lo, hi)

    # degenerate interval returns immediately
    assert golden_section_search([x, g], 1.0, 1.0) == (1.0, 1.0)


def test_golden_section_matches_scipy_golden():
    """Against scipy.optimize.golden on a smooth interpolable function."""
    from scipy.optimize import golden as scipy_golden

    from lammps_analysis_tpu.utils.meta import golden_section_search

    x = np.linspace(0.0, 4.0, 4001)
    f = lambda v: np.sin(3 * v) + 0.5 * v  # min near 1.57 in [1, 2.5]
    y = f(x)
    ref = scipy_golden(f, brack=(1.0, 1.8, 2.5), tol=1e-8)
    lo, hi = golden_section_search([x, y], 1.0, 2.5)
    assert lo - 1e-3 <= ref <= hi + 1e-3


def test_bandwidth_probe_deadline(monkeypatch):
    """A wedged link must not stall the probe: past the deadline the link
    classifies as slow with a bounded bandwidth estimate (observed: a
    wedged remote tunnel blocked the old probe for 18 minutes)."""
    import time as _time

    import jax

    from lammps_analysis_tpu.utils import devices as dv

    dv.reset_measurement()
    monkeypatch.setattr(dv, "PROBE_DEADLINE_S", 0.2)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def hang_put(x, d):
        _time.sleep(2.0)
        return x

    monkeypatch.setattr(jax, "device_put", hang_put)
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [None])
    t0 = _time.perf_counter()
    mbps = dv.device_transfer_bandwidth_mbps()
    assert _time.perf_counter() - t0 < 1.5  # returned at the deadline
    assert mbps < dv.SLOW_LINK_MBPS
    dv.reset_measurement()


def test_compile_cache_is_host_keyed():
    """The persistent XLA cache dir must embed a host-CPU fingerprint:
    AOT executables are machine-specific (a host migration served stale
    code compiled for another CPU — 4x slower scans, SIGILL risk)."""
    import re

    import jax

    from lammps_analysis_tpu.utils.config import (
        _host_fingerprint,
        enable_persistent_compile_cache,
    )

    fp = _host_fingerprint()
    assert re.fullmatch(r"[0-9a-f]{12}", fp)
    assert _host_fingerprint() == fp  # stable within a host
    enable_persistent_compile_cache()  # idempotent (already set on import)
    cache_dir = jax.config.jax_compilation_cache_dir
    assert cache_dir is not None and cache_dir.endswith(f"host-{fp}")


def test_fingerprint_distinguishes_cpu_steppings(monkeypatch, tmp_path):
    """Generic cloud model names + identical flag sets collide across CPU
    generations; LLVM tunes codegen from cpuid family/model/stepping
    (e.g. +prefer-no-gather), so those lines MUST move the hash — a real
    second migration served mis-targeted AOT code on the name+flags key."""
    import builtins

    import importlib

    cfg = importlib.import_module("lammps_analysis_tpu.utils.config")

    def cpuinfo(stepping):
        return (
            "vendor_id\t: GenuineIntel\n"
            "cpu family\t: 6\n"
            "model\t\t: 207\n"
            "model name\t: Intel(R) Xeon(R) Processor @ 2.10GHz\n"
            f"stepping\t: {stepping}\n"
            "microcode\t: 0x1\n"
            "flags\t\t: fpu avx2 avx512f amx-bf16\n"
            "\n"
            "power management:\n"
        )

    real_open = builtins.open
    fps = {}
    for stepping in (2, 8):
        p = tmp_path / f"cpuinfo_{stepping}"
        p.write_text(cpuinfo(stepping))

        def fake_open(path, *a, _p=p, **k):
            if path == "/proc/cpuinfo":
                return real_open(_p, *a, **k)
            return real_open(path, *a, **k)

        monkeypatch.setattr(builtins, "open", fake_open)
        fps[stepping] = cfg._host_fingerprint()
        monkeypatch.setattr(builtins, "open", real_open)
    assert fps[2] != fps[8]


def test_progress_iter_pass_through_and_toggle():
    """Progress bars (reference parity: tqdm on every loop) must be a
    zero-cost pass-through when disabled, auto-off under pytest (stderr
    is not a TTY), and a faithful iterator when forced on."""
    from lammps_analysis_tpu.utils.config import config
    from lammps_analysis_tpu.utils.progress import _enabled, progress_iter

    # auto mode under pytest: stderr is not a tty and jupyter is False
    assert config.progress_bars is None
    assert _enabled() is False
    items = list(progress_iter(iter(range(5)), desc="x"))
    assert items == [0, 1, 2, 3, 4]

    # forced on: still yields exactly the underlying items (tqdm wraps)
    config.progress_bars = True
    try:
        assert _enabled() is True
        gen = (i * i for i in range(4))
        assert list(progress_iter(gen, desc="x", total=4)) == [0, 1, 4, 9]
    finally:
        config.progress_bars = None

    # forced off beats jupyter auto-on
    config.progress_bars = False
    config.jupyter = True
    try:
        assert _enabled() is False
    finally:
        config.progress_bars = None
        config.jupyter = False
    assert _enabled() is False
