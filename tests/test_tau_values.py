"""tau_values must be honored (and cache-keyed) by every windowed calculator.

These lock the behavior the round-1 review flagged: the system calculators
accepted ``tau_values`` and silently hardcoded ``None``. Reference
semantics (``trajectory_calculator.py:196-228``): int -> linspace lag
sub-sampling; explicit list -> lag indices AND ``data_range = last + 1``;
slice -> applied to ``arange(data_range)``. In the GK family the window is
gathered at the lags BEFORE the ACF
(``green_kubo_ionic_conductivity.py:201``).
"""

import numpy as np

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.database import (
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from lammps_analysis_tpu.file_io import ScriptInput

VEL = PropertyInfo("Velocities", 3)
UNWRAPPED = PropertyInfo("Unwrapped_Positions", 3)


def _ionic_exp(tmp_path, rng, n_frames=800, n_each=8, dt=0.05):
    sp = [
        SpeciesInfo("Na", n_each, [VEL, UNWRAPPED]),
        SpeciesInfo("Cl", n_each, [VEL, UNWRAPPED]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    for name in ("Na", "Cl"):
        v = rng.normal(size=(n_frames, n_each, 3))
        chunk.add_data(v, 0, name, "Velocities")
        chunk.add_data(np.cumsum(v * dt, axis=0), 0, name, "Unwrapped_Positions")
    project = latpu.Project(name="p", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=dt, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)
    return exp


def test_gk_ionic_tau_int_subsamples(tmp_path, rng):
    exp = _ionic_exp(tmp_path, rng)
    full = exp.run.GreenKuboIonicConductivity(
        data_range=64, correlation_time=32, plot=False
    )
    sub = exp.run.GreenKuboIonicConductivity(
        data_range=64, correlation_time=32, tau_values=16, plot=False
    )
    assert len(sub["System"]["time"]) == 16
    assert len(sub["System"]["acf"]) == 16
    assert len(full["System"]["time"]) == 64
    assert np.isfinite(sub["System"]["ionic_conductivity"][0])
    # distinct cache entries: re-run with tau returns the tau result
    again = exp.run.GreenKuboIonicConductivity(
        data_range=64, correlation_time=32, tau_values=16, plot=False
    )
    assert again["System"]["acf"] == sub["System"]["acf"]
    # lag times are the sub-sampled ones (linspace over the window)
    expected_lags = np.linspace(0, 63, 16, dtype=int) * 0.05
    np.testing.assert_allclose(sub["System"]["time"], expected_lags)


def test_gk_ionic_tau_identity_matches_full(tmp_path, rng):
    """tau = linspace(0, W-1, W) is the identity gather -> exact match."""
    exp = _ionic_exp(tmp_path, rng, n_frames=400)
    full = exp.run.GreenKuboIonicConductivity(
        data_range=32, correlation_time=16, plot=False
    )
    ident = exp.run.GreenKuboIonicConductivity(
        data_range=32, correlation_time=16, tau_values=32, plot=False
    )
    np.testing.assert_allclose(
        ident["System"]["acf"], full["System"]["acf"], rtol=1e-12
    )
    np.testing.assert_allclose(
        ident["System"]["ionic_conductivity"][0],
        full["System"]["ionic_conductivity"][0],
        rtol=1e-12,
    )


def test_gk_ionic_tau_list_pins_data_range(tmp_path, rng):
    exp = _ionic_exp(tmp_path, rng, n_frames=400)
    lags = [0, 2, 4, 8, 16, 31]
    res = exp.run.GreenKuboIonicConductivity(
        data_range=999, correlation_time=16, tau_values=lags, plot=False
    )
    np.testing.assert_allclose(
        res["System"]["time"], np.asarray(lags) * 0.05
    )


def test_eh_ionic_tau_subsamples_msd(tmp_path, rng):
    exp = _ionic_exp(tmp_path, rng, n_frames=400)
    res = exp.run.EinsteinHelfandIonicConductivity(
        data_range=64, correlation_time=32, tau_values=8, plot=False
    )
    assert len(res["System"]["msd"]) == 8
    assert len(res["System"]["time"]) == 8
    assert np.isfinite(res["System"]["ionic_conductivity"])


def test_gk_self_diffusion_tau(tmp_path, rng):
    exp = _ionic_exp(tmp_path, rng, n_frames=400)
    res = exp.run.GreenKuboDiffusionCoefficients(
        data_range=32, correlation_time=16, tau_values=np.s_[::2], plot=False
    )
    assert len(res["Na"]["acf"]) == 16  # slice ::2 of a 32-window
    assert np.isfinite(res["Na"]["diffusion_coefficient"][0])
    # white-noise VACF: integral dominated by lag 0; D ~ sigma_v^2*dt/2 per dim
    full = exp.run.GreenKuboDiffusionCoefficients(
        data_range=32, correlation_time=16, plot=False
    )
    # lag-0 terms agree statistically (sub-sampled series averages a
    # different sample set, so exact equality is not expected — the
    # reference's gather-then-autocorrelate behaves identically)
    np.testing.assert_allclose(
        res["Na"]["acf"][0], full["Na"]["acf"][0], rtol=0.05
    )


def test_distinct_einstein_tau(tmp_path, rng):
    exp = _ionic_exp(tmp_path, rng, n_frames=300)
    res = exp.run.EinsteinDistinctDiffusionCoefficients(
        data_range=40, correlation_time=20, tau_values=10,
        species=["Na"], plot=False,
    )
    assert len(res["Na_Na"]["msd"]) == 10
    assert np.isfinite(res["Na_Na"]["diffusion_coefficient"])
