"""Framework-vs-reference golden parity on one synthetic NaCl trajectory.

The reference pins whole-observable outputs to stored goldens fetched from
DataHub (e.g. ``CI/integration_tests/calculators/
test_green_kubo_ionic_conductivity.py:38-60``). No network here, so the
goldens are generated locally: ``reference_oracles.py`` re-implements the
reference's observable math (windowing, counters, prefactors, units) in
plain numpy, and these tests assert the framework matches at 1e-5 or
better — the BASELINE.md parity target. The GK thermal/viscosity
formulation divergence (the build window-averages; the reference reports
the first window's integral) is demonstrated numerically, not just argued.
"""

import numpy as np
import pytest

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.database import (
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from lammps_analysis_tpu.file_io import ScriptInput

import reference_oracles as oracle

POS = PropertyInfo("Positions", 3)
VEL = PropertyInfo("Velocities", 3)
UNWRAPPED = PropertyInfo("Unwrapped_Positions", 3)


@pytest.fixture()
def nacl(tmp_path, rng):
    """Synthetic molten-NaCl-like trajectory with every needed property."""
    n_each, n_frames, box, dt = 24, 400, 12.0, 0.002
    sp = [
        SpeciesInfo("Na", n_each, [POS, VEL, UNWRAPPED]),
        SpeciesInfo("Cl", n_each, [POS, VEL, UNWRAPPED]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=1400.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    data = {}
    for name in ("Na", "Cl"):
        vel = rng.normal(scale=3.0, size=(n_frames, n_each, 3))
        unwrapped = np.cumsum(vel * dt, axis=0) + rng.uniform(
            0, box, (1, n_each, 3)
        )
        pos = unwrapped % box
        chunk.add_data(pos, 0, name, "Positions")
        chunk.add_data(vel, 0, name, "Velocities")
        chunk.add_data(unwrapped, 0, name, "Unwrapped_Positions")
        data[name] = {"pos": pos, "vel": vel, "unwrapped": unwrapped}
    project = latpu.Project(name="parity", storage_path=tmp_path)
    exp = project.add_experiment(
        "nacl", timestep=dt, temperature=1400.0, units="metal",
        simulation_data=ScriptInput(chunk, meta, "nacl_synth"),
    )
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)
    return exp, data, dict(box=box, dt=dt, n_frames=n_frames, n_each=n_each)


def test_rdf_parity(nacl):
    exp, data, cfg = nacl
    box, n_bins, cutoff = cfg["box"], 120, 5.5
    n_conf = 8
    res = exp.run.RadialDistributionFunction(
        number_of_configurations=n_conf, start=0, stop=cfg["n_frames"] - 1,
        cutoff=cutoff, number_of_bins=n_bins, plot=False,
    )
    sample_idx = np.unique(
        np.linspace(0, cfg["n_frames"] - 1, n_conf, dtype=int)
    )
    ref = oracle.rdf_reference(
        {k: v["pos"] for k, v in data.items()},
        sample_idx,
        np.array([box] * 3),
        volume=box**3,
        cutoff=cutoff,
        n_bins=n_bins,
        units_length=exp.units.length,
    )
    for pair in ("Na_Na", "Na_Cl", "Cl_Cl"):
        x_ref, g_ref = ref[pair]
        np.testing.assert_allclose(res[pair]["x"], x_ref, rtol=1e-10)
        np.testing.assert_allclose(
            res[pair]["y"], g_ref, rtol=1e-5, atol=1e-8,
            err_msg=f"g(r) parity broken for {pair}",
        )


def test_adf_parity(nacl):
    exp, data, cfg = nacl
    n_bins, cutoff, n_conf = 60, 4.0, 3
    res = exp.run.AngularDistributionFunction(
        number_of_configurations=n_conf, start=0, stop=cfg["n_frames"] - 1,
        cutoff=cutoff, number_of_bins=n_bins, norm_power=4, plot=False,
    )
    sample_idx = np.unique(
        np.linspace(0, cfg["n_frames"] - 1, n_conf, dtype=int)
    )
    ref = oracle.adf_reference(
        {k: v["pos"] for k, v in data.items()},
        sample_idx,
        np.array([cfg["box"]] * 3),
        cutoff=cutoff,
        n_bins=n_bins,
        norm_power=4,
    )
    for key in ("Na_Na_Na", "Na_Na_Cl", "Na_Cl_Cl", "Cl_Cl_Cl"):
        ang_ref, h_ref = ref[key]
        np.testing.assert_allclose(res[key]["angle"], ang_ref, rtol=1e-10)
        np.testing.assert_allclose(
            res[key]["adf"], h_ref, rtol=2e-4, atol=1e-7,
            err_msg=f"ADF parity broken for {key}",
        )
        # peak position parity (the reference's functional-test criterion)
        assert np.argmax(res[key]["adf"]) == np.argmax(h_ref)


def test_einstein_diffusion_parity(nacl):
    exp, data, cfg = nacl
    w, stride = 64, 32
    res = exp.run.EinsteinDiffusionCoefficients(
        data_range=w, correlation_time=stride, plot=False
    )
    for sp in ("Na", "Cl"):
        t_ref, msd_ref = oracle.einstein_msd_reference(
            data[sp]["unwrapped"], w, stride, cfg["dt"], 1,
            exp.units.length, exp.units.time,
        )
        np.testing.assert_allclose(res[sp]["time"], t_ref, rtol=1e-12)
        np.testing.assert_allclose(
            res[sp]["msd"], msd_ref, rtol=1e-9,
            err_msg=f"MSD parity broken for {sp}",
        )
        # same MSD + same fit => same D
        from lammps_analysis_tpu.utils.fitting import fit_einstein_curve

        popt, _, _, _ = fit_einstein_curve(t_ref, msd_ref, fit_max_index=w - 1)
        np.testing.assert_allclose(
            res[sp]["diffusion_coefficient"], popt[0] / 6.0, rtol=1e-9
        )


def test_gk_ionic_conductivity_parity(nacl):
    exp, data, cfg = nacl
    w, stride = 64, 32
    res = exp.run.GreenKuboIonicConductivity(
        data_range=w, correlation_time=stride, plot=False
    )
    sigma_ref, sem_ref, acf_ref, integral_ref = (
        oracle.gk_ionic_conductivity_reference(
            {k: v["vel"] for k, v in data.items()},
            {"Na": 1.0, "Cl": -1.0},
            data_range=w,
            correlation_time=stride,
            integration_range=w - 1,
            dt=cfg["dt"],
            sample_rate=1,
            temperature=1400.0,
            volume=cfg["box"] ** 3,
            units_length=exp.units.length,
            units_volume=exp.units.volume,
            units_time=exp.units.time,
        )
    )
    np.testing.assert_allclose(res["System"]["acf"], acf_ref, rtol=1e-7)
    np.testing.assert_allclose(
        res["System"]["integral"], integral_ref, rtol=1e-7
    )
    np.testing.assert_allclose(
        res["System"]["ionic_conductivity"][0], sigma_ref, rtol=1e-6,
        err_msg="GK ionic conductivity parity broken",
    )
    np.testing.assert_allclose(
        res["System"]["uncertainty"][0], sem_ref, rtol=1e-6
    )


def test_gk_thermal_formulation_divergence_documented(tmp_path, rng):
    """The build's GK thermal = mean over window integrals; the reference
    reports the FIRST window's integral (and the second as 'uncertainty',
    ``green_kubo_thermal_conductivity.py:215-225``; its integration test is
    disabled upstream). By linearity of the trapezoid both agree exactly
    when one window exists, and the build equals the per-window mean in
    general — demonstrated here with numbers, not asserted rhetoric.
    """
    n_frames, dt, w, stride = 400, 0.1, 64, 32
    prop = PropertyInfo("Thermal_Flux", 3)
    sp = [SpeciesInfo("Observables", 1, [prop])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    flux = rng.normal(scale=2.0, size=(n_frames, 1, 3))
    chunk.add_data(flux, 0, "Observables", "Thermal_Flux")
    project = latpu.Project(name="gkt", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=dt, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "flux"),
    )
    res = exp.run.GreenKuboThermalConductivity(
        data_range=w, correlation_time=stride, plot=False
    )
    prefactor, sigmas = oracle.gk_thermal_window_integrals_reference(
        flux[:, 0, :], w, stride, w, dt, 1, 300.0, 1000.0, exp.units
    )
    ours = res["System"]["thermal_conductivity"][0]
    reference_formulation = prefactor * sigmas[0]
    # the build == mean over windows (trapezoid linearity)
    np.testing.assert_allclose(ours, prefactor * sigmas.mean(), rtol=1e-9)
    # the reference formulation == the first window alone; on this series
    # the single-window estimate deviates from the window mean:
    rel_gap = abs(reference_formulation - ours) / abs(ours)
    assert rel_gap > 0, "expected a measurable formulation gap"
    # with a single window both formulations coincide exactly
    exp2 = latpu.Project(name="gkt1", storage_path=tmp_path).add_experiment(
        "e", timestep=dt, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "flux"),
    )
    res1 = exp2.run.GreenKuboThermalConductivity(
        data_range=w, correlation_time=n_frames, plot=False
    )
    np.testing.assert_allclose(
        res1["System"]["thermal_conductivity"][0],
        prefactor * sigmas[0],
        rtol=1e-9,
    )
