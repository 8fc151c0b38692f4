"""Integration tests: conductivity / thermal / viscosity calculators.

Analytic-oracle pattern: white-noise fluxes and random-walk currents with
known transport coefficients, pushed through the full dependency chain
(velocities -> IonicCurrent -> GK conductivity, etc.).
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
from lammps_analysis_tpu.file_io import LAMMPSFluxFile, ScriptInput
from lammps_analysis_tpu.utils.units import boltzmann_constant, elementary_charge

VEL = PropertyInfo("Velocities", 3)
UNWRAPPED = PropertyInfo("Unwrapped_Positions", 3)


def _ionic_experiment(tmp_path, rng, n_frames=4000, n_each=16, sigma_v=1.0, dt=0.05):
    """Two oppositely charged species with white-noise velocities."""
    sp = [
        SpeciesInfo("Na", n_each, [VEL, UNWRAPPED]),
        SpeciesInfo("Cl", n_each, [VEL, UNWRAPPED]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    vel = {}
    for name in ("Na", "Cl"):
        v = rng.normal(scale=sigma_v, size=(n_frames, n_each, 3))
        vel[name] = v
        chunk.add_data(v, 0, name, "Velocities")
        # positions integrated from velocities (for the Einstein-Helfand path)
        pos = np.cumsum(v * dt, axis=0)
        chunk.add_data(pos, 0, name, "Unwrapped_Positions")

    project = latpu.Project(name="proj", storage_path=tmp_path)
    exp = project.add_experiment(
        "ionic", timestep=dt, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "ionic_data"),
    )
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)
    return exp, vel


def _sigma_expected(n_total, sigma_v, dt, temperature, volume):
    return (
        elementary_charge**2
        * n_total
        * sigma_v**2
        * dt
        / (2 * boltzmann_constant * temperature * volume)
    )


def test_green_kubo_ionic_conductivity(tmp_path, rng):
    exp, _ = _ionic_experiment(tmp_path, rng)
    res = exp.run.GreenKuboIonicConductivity(
        data_range=64, correlation_time=32, plot=False
    )
    assert exp.store.check_existence("Observables/Ionic_Current")
    sigma = res["System"]["ionic_conductivity"][0]
    expected = _sigma_expected(32, 1.0, 0.05, 300.0, 1000.0)
    assert abs(sigma - expected) / expected < 0.15


def test_einstein_helfand_ionic_conductivity(tmp_path, rng):
    exp, _ = _ionic_experiment(tmp_path, rng)
    res = exp.run.EinsteinHelfandIonicConductivity(
        data_range=64, correlation_time=32, plot=False
    )
    assert exp.store.check_existence("Observables/Translational_Dipole_Moment")
    sigma = res["System"]["ionic_conductivity"]
    expected = _sigma_expected(32, 1.0, 0.05, 300.0, 1000.0)
    # EH needs long diffusive regimes; accept looser tolerance
    assert abs(sigma - expected) / expected < 0.35


def _observables_experiment(tmp_path, rng, prop_name, n_frames=4000, sigma_j=2.0,
                            dt=0.1, temperature=300.0):
    prop = PropertyInfo(prop_name, 3)
    sp = [SpeciesInfo("Observables", 1, [prop])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1, temperature=temperature,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    series = rng.normal(scale=sigma_j, size=(n_frames, 1, 3))
    chunk.add_data(series, 0, "Observables", prop_name)
    project = latpu.Project(name="proj", storage_path=tmp_path)
    exp = project.add_experiment(
        "obs", timestep=dt, temperature=temperature, units="si",
        simulation_data=ScriptInput(chunk, meta, f"{prop_name}_data"),
    )
    return exp


def test_green_kubo_thermal_conductivity(tmp_path, rng):
    exp = _observables_experiment(tmp_path, rng, "Thermal_Flux")
    w = 64
    res = exp.run.GreenKuboThermalConductivity(
        data_range=w, correlation_time=32, plot=False
    )
    kappa = res["System"]["thermal_conductivity"][0]
    # white-noise flux: kappa = sigma_J^2 dt / (2 kB T^2 V) * W/(W-1) (SI)
    expected = (
        2.0**2 * 0.1 / (2 * boltzmann_constant * 300.0**2 * 1000.0) * w / (w - 1)
    )
    assert abs(kappa - expected) / expected < 0.15


def test_einstein_helfand_thermal_conductivity_runs(tmp_path, rng):
    exp = _observables_experiment(tmp_path, rng, "Integrated_Heat_Current")
    res = exp.run.EinsteinHelfandThermalConductivity(
        data_range=64, correlation_time=32, plot=False
    )
    assert np.isfinite(res["System"]["thermal_conductivity"])


def test_green_kubo_viscosity(tmp_path, rng):
    exp = _observables_experiment(tmp_path, rng, "Momentum_Flux")
    w = 64
    res = exp.run.GreenKuboViscosity(
        data_range=w, correlation_time=32, plot=False
    )
    eta = res["System"]["viscosity"][0]
    expected = (
        2.0**2 * 0.1 / (2 * boltzmann_constant * 300.0 * 1000.0) * w / (w - 1)
    )
    assert abs(eta - expected) / expected < 0.15


def test_green_kubo_viscosity_flux_from_file(tmp_path, rng):
    """Flux-file ingestion feeds GreenKuboViscosityFlux directly."""
    n_steps = 3000
    stress = rng.normal(scale=1.5, size=(n_steps, 3))
    path = tmp_path / "flux.dat"
    with open(path, "w") as f:
        f.write("# log\n")
        f.write("time pxy pxz pyz\n")
        for t in range(n_steps):
            f.write("%d %.8f %.8f %.8f\n" % (t, *stress[t]))
    project = latpu.Project(name="proj", storage_path=tmp_path)
    exp = project.add_experiment(
        "visc", timestep=0.1, temperature=300.0, units="si",
        simulation_data=LAMMPSFluxFile(
            path, sample_rate=1, box_l=[10.0, 10.0, 10.0]
        ),
    )
    res = exp.run.GreenKuboViscosityFlux(
        data_range=64, correlation_time=32, plot=False
    )
    eta = res["System"]["viscosity"][0]
    # volume in numerator (flux-file prefactor): eta = V sigma^2 dt W/(W-1) / (2 kB T)
    expected = (
        1000.0 * 1.5**2 * 0.1 / (2 * boltzmann_constant * 300.0) * 64 / 63
    )
    assert abs(eta - expected) / expected < 0.2


def test_nernst_einstein_from_diffusion(tmp_path, rng):
    exp, _ = _ionic_experiment(tmp_path, rng, n_frames=1500)
    diff = exp.run.GreenKuboDiffusionCoefficients(
        data_range=64, correlation_time=64, plot=False
    )
    res = exp.run.NernstEinsteinIonicConductivity(diffusion_data=diff, plot=False)
    sigma_ne = res["System"]["nernst_einstein_ionic_conductivity"]
    expected = _sigma_expected(32, 1.0, 0.05, 300.0, 1000.0)
    assert abs(sigma_ne - expected) / expected < 0.2

    # reference species arg (nernst_einstein_...py:101-104): restricts
    # which species' D_i enter the sum — and keys the cache separately
    res_na = exp.run.NernstEinsteinIonicConductivity(
        diffusion_data=diff, species=["Na"], plot=False
    )
    sigma_na = res_na["System"]["nernst_einstein_ionic_conductivity"]
    assert 0 < sigma_na < sigma_ne
    res_cl = exp.run.NernstEinsteinIonicConductivity(
        diffusion_data=diff, species=["Cl"], plot=False
    )
    sigma_cl = res_cl["System"]["nernst_einstein_ionic_conductivity"]
    np.testing.assert_allclose(sigma_na + sigma_cl, sigma_ne, rtol=1e-10)


def test_nernst_einstein_data_range_parameterises_autorun(tmp_path, rng):
    """Without diffusion_data, data_range flows into the auto-run Einstein
    diffusion (reference signature, nernst_einstein_...py:73) — and
    different data_range values produce distinct cached computations."""
    exp, _ = _ionic_experiment(tmp_path, rng, n_frames=800)
    res_a = exp.run.NernstEinsteinIonicConductivity(
        data_range=48, plot=False
    )
    res_b = exp.run.NernstEinsteinIonicConductivity(
        data_range=96, plot=False
    )
    assert res_a.args["diffusion_args"]["data_range"] == 48
    assert res_b.args["diffusion_args"]["data_range"] == 96
    assert np.isfinite(
        res_a["System"]["nernst_einstein_ionic_conductivity"]
    )


def test_distinct_diffusion_runs(tmp_path, rng):
    exp, _ = _ionic_experiment(tmp_path, rng, n_frames=600)
    res = exp.run.EinsteinDistinctDiffusionCoefficients(
        data_range=40, correlation_time=40, plot=False
    )
    assert set(res.keys()) == {"Na_Na", "Na_Cl", "Cl_Cl"}
    for key in res.keys():
        assert np.isfinite(res[key]["diffusion_coefficient"])
    res_gk = exp.run.GreenKuboDistinctDiffusionCoefficients(
        data_range=40, correlation_time=40, plot=False
    )
    for key in res_gk.keys():
        assert np.isfinite(res_gk[key]["diffusion_coefficient"])


def test_gk_ionic_conductivity_metal_units(tmp_path, rng):
    """Unit plumbing: same analytic oracle expressed in LAMMPS metal units."""
    from lammps_analysis_tpu.utils.units import METAL

    n_frames, n_each, sigma_v, dt = 4000, 16, 3.0, 0.01  # A/ps, ps
    box = 12.0  # Angstrom
    sp = [
        SpeciesInfo("Na", n_each, [VEL]),
        SpeciesInfo("Cl", n_each, [VEL]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    for name in ("Na", "Cl"):
        chunk.add_data(
            rng.normal(scale=sigma_v, size=(n_frames, n_each, 3)), 0, name,
            "Velocities",
        )
    project = latpu.Project(name="proj", storage_path=tmp_path)
    exp = project.add_experiment(
        "metal", timestep=dt, temperature=300.0, units="metal",
        simulation_data=ScriptInput(chunk, meta, "m_data"),
    )
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)
    res = exp.run.GreenKuboIonicConductivity(
        data_range=64, correlation_time=32, plot=False
    )
    sigma = res["System"]["ionic_conductivity"][0]
    # sigma = e^2 L_u^2 * N_tot sigma_v^2 * dt_sim / (2 kB T V_sim V_u t_u)
    expected = (
        elementary_charge**2 * METAL.length**2 * 32 * sigma_v**2 * dt
        / (2 * boltzmann_constant * 300.0 * box**3 * METAL.volume * METAL.time)
    )
    assert abs(sigma - expected) / expected < 0.15
    assert sigma > 0


def test_thermal_chain_from_per_atom_data(tmp_path, rng):
    """Per-atom stress/KE/PE/velocities -> ThermalFlux trafo -> GK kappa,
    plus the Einstein-Helfand and Kinaci chains from the same store."""
    n_frames, n_atoms, dt = 1500, 12, 0.1
    props = [
        PropertyInfo("Stress", 6), PropertyInfo("Velocities", 3),
        PropertyInfo("Kinetic_Energy", 1), PropertyInfo("Potential_Energy", 1),
        PropertyInfo("Unwrapped_Positions", 3), PropertyInfo("Forces", 3),
    ]
    sp = [SpeciesInfo("X", n_atoms, props)]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(rng.normal(size=(n_frames, n_atoms, 6)), 0, "X", "Stress")
    chunk.add_data(rng.normal(size=(n_frames, n_atoms, 3)), 0, "X", "Velocities")
    chunk.add_data(rng.normal(size=(n_frames, n_atoms, 1)) ** 2, 0, "X", "Kinetic_Energy")
    chunk.add_data(-rng.normal(size=(n_frames, n_atoms, 1)) ** 2, 0, "X", "Potential_Energy")
    chunk.add_data(
        np.cumsum(rng.normal(scale=0.05, size=(n_frames, n_atoms, 3)), axis=0),
        0, "X", "Unwrapped_Positions",
    )
    chunk.add_data(rng.normal(size=(n_frames, n_atoms, 3)), 0, "X", "Forces")

    project = latpu.Project(name="proj", storage_path=tmp_path)
    exp = project.add_experiment(
        "thermal", timestep=dt, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "t_data"),
    )
    res = exp.run.GreenKuboThermalConductivity(
        data_range=64, correlation_time=64, plot=False
    )
    assert exp.store.check_existence("Observables/Thermal_Flux")
    assert np.isfinite(res["System"]["thermal_conductivity"][0])

    res_eh = exp.run.EinsteinHelfandThermalConductivity(
        data_range=64, correlation_time=64, plot=False
    )
    assert exp.store.check_existence("Observables/Integrated_Heat_Current")
    assert np.isfinite(res_eh["System"]["thermal_conductivity"])

    res_kin = exp.run.EinsteinHelfandThermalKinaci(
        data_range=64, correlation_time=64, plot=False
    )
    assert exp.store.check_existence("Observables/Kinaci_Heat_Current")
    assert np.isfinite(res_kin["System"]["thermal_conductivity"])

    res_visc = exp.run.GreenKuboViscosity(
        data_range=64, correlation_time=64, plot=False
    )
    assert exp.store.check_existence("Observables/Momentum_Flux")
    assert np.isfinite(res_visc["System"]["viscosity"][0])


def test_distinct_diffusion_multislab_equals_single(tmp_path, rng):
    """Shrinking the memory budget forces multi-slab streaming; the
    window-aligned slabs must reproduce the single-slab results exactly
    (same windows, same math — the TPU analog of the reference's
    desired_memory parametrisation)."""
    from lammps_analysis_tpu.utils.config import change_memory_fraction

    exp, _ = _ionic_experiment(tmp_path, rng, n_frames=600)
    kw = dict(data_range=40, correlation_time=40, plot=False)
    ref_e = exp.run.EinsteinDistinctDiffusionCoefficients(**kw)
    ref_g = exp.run.GreenKuboDistinctDiffusionCoefficients(**kw)
    with change_memory_fraction(1e-7):
        small_e = exp.run.EinsteinDistinctDiffusionCoefficients(
            force=True, **kw
        )
        small_g = exp.run.GreenKuboDistinctDiffusionCoefficients(
            force=True, **kw
        )
    for key in ref_e.keys():
        np.testing.assert_allclose(
            small_e[key]["msd"], ref_e[key]["msd"], rtol=1e-10
        )
        np.testing.assert_allclose(
            small_g[key]["vacf"], ref_g[key]["vacf"], rtol=1e-10
        )


def test_nernst_einstein_corrected_flag(tmp_path, rng):
    """corrected=True (reference arg) auto-runs the distinct diffusion and
    emits the corrected conductivity key."""
    exp, _ = _ionic_experiment(tmp_path, rng, n_frames=600)
    diff = exp.run.GreenKuboDiffusionCoefficients(
        data_range=40, correlation_time=40, plot=False
    )
    res = exp.run.NernstEinsteinIonicConductivity(
        diffusion_data=diff, corrected=True, plot=False
    )
    assert "corrected_nernst_einstein_ionic_conductivity" in res["System"]
    assert np.isfinite(
        res["System"]["corrected_nernst_einstein_ionic_conductivity"]
    )


def test_gk_thermal_reference_estimator(tmp_path, rng):
    """reference_estimator=True must reproduce the upstream first-window
    estimator exactly: value = prefactor * trapz of the FIRST window's
    data_range-scaled ACF, "uncertainty" = the SECOND window's
    (``green_kubo_thermal_conductivity.py:199-233``)."""
    exp = _observables_experiment(tmp_path, rng, "Thermal_Flux", n_frames=600)
    w, ct = 64, 32
    res = exp.run.GreenKuboThermalConductivity(
        data_range=w, correlation_time=ct, reference_estimator=True,
        plot=False,
    )
    x = exp.store.load(["Observables/Thermal_Flux"])["Observables/Thermal_Flux"]
    times = np.arange(w) * 0.1  # dt * sample_rate, raw sim units
    ir = w  # reference default integration_range = data_range

    def window_jacf(k):
        seg = np.asarray(x[k * ct : k * ct + w, 0, :], dtype=np.float64)
        acf = np.zeros(w)
        for lag in range(w):
            acf[lag] = np.sum(seg[: w - lag] * seg[lag:]) / w
        return w * acf  # data_range * sum_dims biased acf

    pref = 1.0 / (
        3 * (w - 1) * 300.0**2 * exp.units.boltzmann * 1000.0
    ) * (exp.units.energy / exp.units.length / exp.units.time)
    sig0 = pref * np.trapezoid(window_jacf(0)[:ir], x=times[:ir])
    sig1 = pref * np.trapezoid(window_jacf(1)[:ir], x=times[:ir])
    np.testing.assert_allclose(
        res["System"]["thermal_conductivity"][0], sig0, rtol=1e-8
    )
    np.testing.assert_allclose(
        res["System"]["uncertainty"][0], sig1, rtol=1e-8
    )
    # the flag is part of the cache key: both variants coexist
    res_avg = exp.run.GreenKuboThermalConductivity(
        data_range=w, correlation_time=ct, plot=False
    )
    assert (
        res_avg["System"]["thermal_conductivity"][0]
        != res["System"]["thermal_conductivity"][0]
    )


def test_gk_viscosity_reference_estimator_runs(tmp_path, rng):
    exp = _observables_experiment(tmp_path, rng, "Momentum_Flux", n_frames=400)
    res = exp.run.GreenKuboViscosity(
        data_range=64, correlation_time=64, reference_estimator=True,
        plot=False,
    )
    assert np.isfinite(res["System"]["viscosity"][0])
    # unsupported calculators must refuse rather than silently ignore
    with pytest.raises(ValueError, match="reference_estimator"):
        exp2 = _observables_experiment(
            tmp_path / "ion", rng, "Ionic_Current", n_frames=300
        )
        exp2.run.GreenKuboIonicConductivity(
            data_range=64, reference_estimator=True, plot=False
        )


def test_kinaci_reference_accumulation(tmp_path, rng):
    """reference_accumulation=True reproduces the upstream coupled
    cross-species accumulation (running add_n of per-atom force-work
    integrals, ``kinaci_integrated_heat_current.py:61-86``) exactly."""
    n_frames, n_each, dt = 300, 6, 0.1
    props = [
        PropertyInfo("Unwrapped_Positions", 3), PropertyInfo("Velocities", 3),
        PropertyInfo("Forces", 3), PropertyInfo("Potential_Energy", 1),
    ]
    sp = [SpeciesInfo("Na", n_each, props), SpeciesInfo("Cl", n_each, props)]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    data = {}
    chunk = TrajectoryChunkData(sp, n_frames)
    for name in ("Na", "Cl"):
        d = {
            "Unwrapped_Positions": np.cumsum(
                rng.normal(scale=0.05, size=(n_frames, n_each, 3)), axis=0
            ),
            "Velocities": rng.normal(size=(n_frames, n_each, 3)),
            "Forces": rng.normal(size=(n_frames, n_each, 3)),
            "Potential_Energy": -rng.normal(size=(n_frames, n_each, 1)) ** 2,
        }
        data[name] = d
        for k, v in d.items():
            chunk.add_data(v, 0, name, k)

    project = latpu.Project(name="proj", storage_path=tmp_path)
    exp = project.add_experiment(
        "kin", timestep=dt, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "k_data"),
    )
    exp.run.KinaciIntegratedHeatCurrent(reference_accumulation=True)
    out = exp.store.load(["Observables/Kinaci_Heat_Current"])[
        "Observables/Kinaci_Heat_Current"
    ][:, 0, :]

    # numpy oracle: upstream coupled accumulation over the whole series
    running = np.zeros((n_frames, n_each))
    expected = np.zeros((n_frames, 3))
    for name in ("Na", "Cl"):  # declaration order
        d = data[name]
        integrand = np.einsum("tnd,tnd->tn", d["Forces"], d["Velocities"])
        running = running + np.cumsum(integrand, axis=0) * dt
        r_k = np.einsum("tn,tnd->td", running, d["Unwrapped_Positions"])
        r_p = np.einsum(
            "tn,tnd->td", d["Potential_Energy"][..., 0],
            d["Unwrapped_Positions"],
        )
        expected += r_k + r_p
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-8)

    # and it differs from the order-independent default formulation
    project2 = latpu.Project(name="proj2", storage_path=tmp_path / "p2")
    chunk2 = TrajectoryChunkData(sp, n_frames)
    for name in ("Na", "Cl"):
        for k, v in data[name].items():
            chunk2.add_data(v, 0, name, k)
    exp2 = project2.add_experiment(
        "kin", timestep=dt, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk2, meta, "k_data"),
    )
    exp2.run.KinaciIntegratedHeatCurrent()
    out_default = exp2.store.load(["Observables/Kinaci_Heat_Current"])[
        "Observables/Kinaci_Heat_Current"
    ][:, 0, :]
    assert not np.allclose(out, out_default)
