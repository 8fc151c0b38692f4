"""Native C++ SDF kernel: equivalence with the XLA route and calculator
integration (mirrors tests/test_native_rdf.py's discipline)."""

from __future__ import annotations

import math

import numpy as np
import pytest

import jax.numpy as jnp

from lammps_analysis_tpu.ops import native_sdf
from lammps_analysis_tpu.ops.geometry import (
    cartesian_to_spherical,
    minimum_image,
)
from lammps_analysis_tpu.ops.histogram import bin_indices, histogram2d_masked

pytestmark = pytest.mark.skipif(
    not native_sdf.available(), reason="native toolchain unavailable"
)


def _xla_sdf(pa, pb, box, r_min, r_max, n_bins, same):
    r = pb[:, None, :, :] - pa[:, :, None, :]
    r = minimum_image(r, box)
    rtp = cartesian_to_spherical(r)
    d = rtp[..., 0]
    mask = (d >= r_min) & (d <= r_max)
    if same:
        ids = jnp.arange(pa.shape[1])
        mask = mask & (ids[None, :, None] != ids[None, None, :])
    ti = bin_indices(rtp[..., 1], 0.0, math.pi, n_bins)
    pj = bin_indices(rtp[..., 2], -math.pi, math.pi, n_bins)
    return np.asarray(
        histogram2d_masked(ti, pj, mask.astype(jnp.float32), n_bins, n_bins),
        dtype=np.float64,
    )


@pytest.mark.parametrize(
    "na,nb,frames,same", [(100, 120, 3, False), (150, 150, 2, True)]
)
def test_native_sdf_matches_xla(rng, na, nb, frames, same):
    """Totals must match EXACTLY; per-bin differences are bounded by
    libm-vs-XLA acos/atan2 ulp flips at bin edges (measured 0 on these
    workloads, allowed <= 2)."""
    box_l = 7.0
    pa = rng.uniform(0, box_l, (frames, na, 3)).astype(np.float32)
    pb = pa if same else rng.uniform(
        0, box_l, (frames, nb, 3)
    ).astype(np.float32)
    box = np.array([box_l] * 3, np.float32)
    h_n = native_sdf.sdf_histogram_native(pa, pb, box, 0.8, 2.4, 24, same)
    h_x = _xla_sdf(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(box),
        0.8, 2.4, 24, same,
    )
    assert h_n.sum() == h_x.sum()
    assert np.abs(h_n - h_x).sum() <= 2


def test_native_sdf_input_validation():
    with pytest.raises(RuntimeError):
        native_sdf.sdf_histogram_native(
            np.zeros((2, 4, 3), np.float64),  # wrong dtype
            np.zeros((2, 4, 3), np.float32),
            np.ones(3, np.float32), 0.5, 1.0, 8, False,
        )


def test_sdf_calculator_uses_native_on_cpu(tmp_path, rng, monkeypatch):
    """On the CPU backend the calculator must route through the native
    kernel (and produce the same result as the XLA route, which the
    config flag restores)."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend test")
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        SpeciesInfo,
        TrajectoryChunkData,
        TrajectoryMetadata,
    )
    from lammps_analysis_tpu.database.properties import PropertyInfo
    from lammps_analysis_tpu.file_io import ScriptInput
    from lammps_analysis_tpu.utils.config import config

    n_frames, box_l = 12, 6.0
    POS = PropertyInfo("Positions", 3)
    sp = [SpeciesInfo("Na", 40, [POS]), SpeciesInfo("Cl", 40, [POS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box_l] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(rng.uniform(0, box_l, (n_frames, 40, 3)), 0, "Na",
                   "Positions")
    chunk.add_data(rng.uniform(0, box_l, (n_frames, 40, 3)), 0, "Cl",
                   "Positions")
    project = latpu.Project(name="sdfnat", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    calls = {"n": 0}
    orig = native_sdf.sdf_histogram_native

    def spy(*args, **kw):
        calls["n"] += 1
        return orig(*args, **kw)

    monkeypatch.setattr(native_sdf, "sdf_histogram_native", spy)
    kw = dict(number_of_configurations=8, start=1, stop=n_frames - 1,
              r_min=0.5, r_max=2.0, n_bins=16, plot=False)
    res_native = exp.run.SpatialDistributionFunction(**kw)
    assert calls["n"] >= 1, "native kernel not used on the CPU backend"
    h_native = np.asarray(res_native.data_dict["System"]["sdf"])
    monkeypatch.setattr(config, "native_cpu_kernels", False)
    res_xla = exp.run.SpatialDistributionFunction(force=True, **kw)
    h_xla = np.asarray(res_xla.data_dict["System"]["sdf"])
    assert h_native.sum() == h_xla.sum()
    assert np.abs(h_native - h_xla).sum() <= 2
