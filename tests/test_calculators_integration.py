"""Integration tests: full Project pipeline against analytic oracles.

Models the reference synthetic-physics tests
(``CI/integration_tests/calculators/test_einstein_diffusion_coefficients.py``):
random-walk trajectories with a known diffusion coefficient injected via
``ScriptInput``, run through the complete Project -> Experiment -> calculator
stack, result compared to the analytic value.
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

UNWRAPPED = PropertyInfo("Unwrapped_Positions", 3)
POSITIONS = PropertyInfo("Positions", 3)
VELOCITIES = PropertyInfo("Velocities", 3)


def make_project(tmp_path):
    return latpu.Project(name="proj", storage_path=tmp_path)


def random_walk(rng, n_frames, n_atoms, step_std):
    steps = rng.normal(scale=step_std, size=(n_frames, n_atoms, 3))
    return np.cumsum(steps, axis=0)


def test_einstein_diffusion_random_walk(tmp_path, rng):
    """D of a random walk must equal step_std^2 / (2 dt) per dimension."""
    n_frames, n_atoms, step_std, dt = 500, 40, 0.05, 0.1
    pos = random_walk(rng, n_frames, n_atoms, step_std)

    sp = [SpeciesInfo("X", n_atoms, [UNWRAPPED])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[100.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(pos, 0, "X", "Unwrapped_Positions")

    project = make_project(tmp_path)
    exp = project.add_experiment(
        "rw", timestep=dt, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "rw_data"),
    )
    res = exp.run.EinsteinDiffusionCoefficients(
        data_range=100, correlation_time=10, plot=False
    )
    d_expected = step_std**2 / (2 * dt)
    d_measured = res["X"]["diffusion_coefficient"]
    assert abs(d_measured - d_expected) / d_expected < 0.05

    # cache hit: identical args return the stored computation
    res2 = exp.run.EinsteinDiffusionCoefficients(
        data_range=100, correlation_time=10, plot=False
    )
    assert res2["X"]["diffusion_coefficient"] == d_measured


def test_einstein_diffusion_auto_unwrap(tmp_path, rng):
    """Wrapped positions + box must auto-run CoordinateUnwrapper."""
    n_frames, n_atoms, step_std, dt = 300, 20, 0.05, 0.1
    box = 2.0
    unwrapped = random_walk(rng, n_frames, n_atoms, step_std) + box / 2
    wrapped = unwrapped - box * np.floor(unwrapped / box)

    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(wrapped, 0, "X", "Positions")

    project = make_project(tmp_path)
    exp = project.add_experiment(
        "wrap", timestep=dt, units="si",
        simulation_data=ScriptInput(chunk, meta, "wrap_data"),
    )
    res = exp.run.EinsteinDiffusionCoefficients(
        data_range=60, correlation_time=10, plot=False
    )
    # the unwrapped dataset must now exist in the store
    assert exp.store.check_existence("X/Unwrapped_Positions")
    d_expected = step_std**2 / (2 * dt)
    d_measured = res["X"]["diffusion_coefficient"]
    assert abs(d_measured - d_expected) / d_expected < 0.08


def test_green_kubo_diffusion_white_noise(tmp_path, rng):
    """White-noise velocities: D = sigma_v^2 * dt / 2 (trapezoid of the
    delta-like VACF)."""
    n_frames, n_atoms, sigma_v, dt = 2000, 30, 1.0, 0.05
    vel = rng.normal(scale=sigma_v, size=(n_frames, n_atoms, 3))

    sp = [SpeciesInfo("X", n_atoms, [VELOCITIES])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(vel, 0, "X", "Velocities")

    project = make_project(tmp_path)
    exp = project.add_experiment(
        "gk", timestep=dt, units="si",
        simulation_data=ScriptInput(chunk, meta, "gk_data"),
    )
    res = exp.run.GreenKuboDiffusionCoefficients(
        data_range=100, correlation_time=50, plot=False
    )
    d_expected = sigma_v**2 * dt / 2
    d_measured = res["X"]["diffusion_coefficient"][0]
    assert abs(d_measured - d_expected) / d_expected < 0.1


def test_rdf_ideal_gas_through_project(tmp_path, rng):
    """Uniform random positions -> g(r) ~ 1 via the full stack."""
    n_frames, n_na, n_cl, box = 30, 60, 60, 10.0
    sp = [
        SpeciesInfo("Na", n_na, [POSITIONS]),
        SpeciesInfo("Cl", n_cl, [POSITIONS]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=1000.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(rng.uniform(0, box, (n_frames, n_na, 3)), 0, "Na", "Positions")
    chunk.add_data(rng.uniform(0, box, (n_frames, n_cl, 3)), 0, "Cl", "Positions")

    project = make_project(tmp_path)
    project.add_experiment(
        "ig", timestep=0.1, temperature=1000.0, units="real",
        simulation_data=ScriptInput(chunk, meta, "ig_data"),
    )
    res = project.run.RadialDistributionFunction(
        number_of_configurations=n_frames, plot=False
    )
    # project-level runs return {experiment: Computation} even for a
    # single experiment (reference calculator.py:110-146)
    comp = res["ig"]
    for key in ("Na_Na", "Na_Cl", "Cl_Cl"):
        g = np.asarray(comp[key]["y"])
        assert abs(np.mean(g[len(g) // 2 :]) - 1.0) < 0.1, key
    # x axis is in nm: cutoff (box/2 - 0.1) Angstrom = 0.49 nm for real units
    x = np.asarray(comp["Na_Na"]["x"])
    assert abs(x[-1] - (box / 2 - 0.1) / 10) < 1e-6


def test_project_reload_persists(tmp_path, rng):
    n_frames, n_atoms = 50, 10
    sp = [SpeciesInfo("X", n_atoms, [UNWRAPPED])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[5.0] * 3, sample_rate=1
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(random_walk(rng, n_frames, n_atoms, 0.1), 0, "X", "Unwrapped_Positions")

    project = make_project(tmp_path)
    exp = project.add_experiment(
        "persist", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "p_data"),
    )
    res = exp.run.EinsteinDiffusionCoefficients(data_range=20, plot=False)
    d = res["X"]["diffusion_coefficient"]

    # fresh Project object: same directory, everything restored
    project2 = latpu.Project(name="proj", storage_path=tmp_path)
    exp2 = project2.experiments["persist"]
    assert exp2.number_of_configurations == n_frames
    assert exp2.species["X"].n_particles == n_atoms
    res2 = exp2.run.EinsteinDiffusionCoefficients(data_range=20, plot=False)
    assert res2["X"]["diffusion_coefficient"] == d
    assert exp2.db.list_computations("persist")  # provenance retained


def test_project_multi_experiment_dispatch(tmp_path, rng):
    """project.run over several active experiments returns a dict keyed by
    experiment name (reference: calculator.py:110-146)."""
    project = latpu.Project(name="multi", storage_path=tmp_path)
    for name, scale in (("slow", 0.02), ("fast", 0.2)):
        n_frames, n_atoms = 80, 8
        pos = np.cumsum(
            rng.normal(scale=scale, size=(n_frames, n_atoms, 3)), axis=0
        )
        sp = [SpeciesInfo("X", n_atoms, [UNWRAPPED])]
        meta = TrajectoryMetadata(
            n_configurations=n_frames, species_list=sp, box_l=[50.0] * 3,
            sample_rate=1,
        )
        chunk = TrajectoryChunkData(sp, n_frames)
        chunk.add_data(pos, 0, "X", "Unwrapped_Positions")
        project.add_experiment(
            name, timestep=0.1, units="si",
            simulation_data=ScriptInput(chunk, meta, f"{name}_data"),
        )
    res = project.run.EinsteinDiffusionCoefficients(
        data_range=30, correlation_time=10, plot=False
    )
    assert set(res.keys()) == {"slow", "fast"}
    d_slow = res["slow"]["X"]["diffusion_coefficient"]
    d_fast = res["fast"]["X"]["diffusion_coefficient"]
    assert d_fast > 10 * d_slow

    # deactivating an experiment drops it from project-level runs; the
    # project hub still returns a dict for a single active experiment
    # (reference calculator.py:110-146), unlike exp.run
    project.disable_experiments(["slow"])
    res2 = project.run.EinsteinDiffusionCoefficients(
        data_range=20, correlation_time=10, plot=False
    )
    assert set(res2.keys()) == {"fast"}
    from lammps_analysis_tpu.database.results_db import Computation

    assert isinstance(res2["fast"], Computation)
    exp_res = project.experiments["fast"].run.EinsteinDiffusionCoefficients(
        data_range=20, correlation_time=10, plot=False
    )
    assert isinstance(exp_res, Computation)  # experiment-bound: bare


def test_run_hub_exposes_full_reference_surface(tmp_path):
    """API parity: every calculator/transformation name the reference's
    RunComputation exposes (mdsuite/experiment/run.py:114-316) must resolve
    on ``exp.run`` here, so reference users can switch without renames."""
    reference_names = [
        "AngularDistributionFunction", "CoordinateUnwrapper",
        "CoordinateWrapper", "CoordinationNumbers",
        "EinsteinDiffusionCoefficients",
        "EinsteinDistinctDiffusionCoefficients",
        "EinsteinHelfandIonicConductivity",
        "EinsteinHelfandThermalConductivity", "EinsteinHelfandThermalKinaci",
        "GreenKuboDiffusionCoefficients",
        "GreenKuboDistinctDiffusionCoefficients", "GreenKuboIonicConductivity",
        "GreenKuboThermalConductivity", "GreenKuboViscosity",
        "GreenKuboViscosityFlux", "IntegratedHeatCurrent", "IonicCurrent",
        "KinaciIntegratedHeatCurrent", "KirkwoodBuffIntegral", "MolecularMap",
        "MomentumFlux", "NernstEinsteinIonicConductivity",
        "PotentialOfMeanForce", "RadialDistributionFunction",
        "ScaleCoordinates", "SpatialDistributionFunction", "StructureFactor",
        "ThermalFlux", "TranslationalDipoleMoment", "UnwrapViaIndices",
        "VelocityFromPositions",
    ]
    exp = latpu.Project(name="parity", storage_path=tmp_path).add_experiment(
        "e", timestep=1.0, temperature=300.0, units="metal"
    )
    missing = [n for n in reference_names if not hasattr(exp.run, n)]
    assert not missing, f"run hub missing reference names: {missing}"


def test_einstein_diffusion_fused_unwrap_streaming(tmp_path, rng):
    """config.fuse_streaming: unwrap on the fly — identical result to the
    materialised path, and NO Unwrapped_Positions dataset is written."""
    from lammps_analysis_tpu.utils.config import config

    n_frames, n_atoms, step_std, dt = 300, 20, 0.05, 0.1
    box = 2.0
    unwrapped = random_walk(rng, n_frames, n_atoms, step_std) + box / 2
    wrapped = unwrapped - box * np.floor(unwrapped / box)

    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1,
    )

    def build(name):
        chunk = TrajectoryChunkData(sp, n_frames)
        chunk.add_data(wrapped, 0, "X", "Positions")
        project = latpu.Project(name=name, storage_path=tmp_path)
        return project.add_experiment(
            "wrap", timestep=dt, units="si",
            simulation_data=ScriptInput(chunk, meta, "wrap_data"),
        )

    exp_mat = build("mat")
    res_mat = exp_mat.run.EinsteinDiffusionCoefficients(
        data_range=60, correlation_time=10, plot=False
    )
    assert exp_mat.store.check_existence("X/Unwrapped_Positions")

    exp_fused = build("fused")
    config.fuse_streaming = True
    try:
        res_fused = exp_fused.run.EinsteinDiffusionCoefficients(
            data_range=60, correlation_time=10, plot=False
        )
    finally:
        config.fuse_streaming = False
    # the fused run must NOT have materialised the dataset
    assert not exp_fused.store.check_existence("X/Unwrapped_Positions")
    # identical math: the unwrap carry chain is batch-size invariant
    np.testing.assert_allclose(
        np.array(res_fused["X"]["msd"]), np.array(res_mat["X"]["msd"]),
        rtol=1e-12,
    )
    assert (
        res_fused["X"]["diffusion_coefficient"]
        == res_mat["X"]["diffusion_coefficient"]
    )


def test_fused_unwrap_prefers_materialised(tmp_path, rng):
    """With the dataset already materialised, fusion must NOT engage (a
    complete dataset is strictly cheaper to read than to recompute)."""
    from lammps_analysis_tpu.calculators.einstein_diffusion_coefficients import (
        EinsteinDiffusionCoefficients,
    )
    from lammps_analysis_tpu.utils.config import config

    n_frames, n_atoms, step_std, dt = 200, 10, 0.05, 0.1
    box = 2.0
    unwrapped = random_walk(rng, n_frames, n_atoms, step_std) + box / 2
    wrapped = unwrapped - box * np.floor(unwrapped / box)
    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(wrapped, 0, "X", "Positions")
    project = latpu.Project(name="pref", storage_path=tmp_path)
    exp = project.add_experiment(
        "wrap", timestep=dt, units="si",
        simulation_data=ScriptInput(chunk, meta, "wrap_data"),
    )
    exp.run.CoordinateUnwrapper()
    calc = EinsteinDiffusionCoefficients(exp)
    calc.args = calc.prepare_args(data_range=50, correlation_time=10)
    config.fuse_streaming = True
    try:
        assert not calc._fusible_unwrap("X")
    finally:
        config.fuse_streaming = False


def test_force_recompute(tmp_path, rng):
    """force=True must invalidate the cached computation and recompute."""
    n_frames, n_atoms, step_std, dt = 200, 10, 0.05, 0.1
    pos = random_walk(rng, n_frames, n_atoms, step_std)
    sp = [SpeciesInfo("X", n_atoms, [UNWRAPPED])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[100.0] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(pos, 0, "X", "Unwrapped_Positions")
    project = make_project(tmp_path)
    exp = project.add_experiment(
        "f", timestep=dt, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    calls = []
    from lammps_analysis_tpu.calculators.einstein_diffusion_coefficients import (
        EinsteinDiffusionCoefficients,
    )
    orig = EinsteinDiffusionCoefficients.run_calculator

    def spy(self):
        calls.append(1)
        return orig(self)

    EinsteinDiffusionCoefficients.run_calculator = spy
    try:
        exp.run.EinsteinDiffusionCoefficients(data_range=50, plot=False)
        exp.run.EinsteinDiffusionCoefficients(data_range=50, plot=False)
        assert len(calls) == 1  # cache hit
        exp.run.EinsteinDiffusionCoefficients(
            data_range=50, plot=False, force=True
        )
        assert len(calls) == 2  # forced recompute
    finally:
        EinsteinDiffusionCoefficients.run_calculator = orig


def test_fused_unwrap_multislab_carry(tmp_path, rng):
    """Fused unwrap across MANY overlapping slabs (tiny memory budget)
    must chain the carry seam-free and equal the materialised path."""
    from lammps_analysis_tpu.utils.config import change_memory_fraction, config

    n_frames, n_atoms, step_std, dt = 600, 12, 0.3, 0.1
    box = 2.0
    unwrapped = random_walk(rng, n_frames, n_atoms, step_std) + box / 2
    wrapped = unwrapped - box * np.floor(unwrapped / box)
    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1,
    )

    def build(name):
        chunk = TrajectoryChunkData(sp, n_frames)
        chunk.add_data(wrapped, 0, "X", "Positions")
        project = latpu.Project(name=name, storage_path=tmp_path)
        return project.add_experiment(
            "w", timestep=dt, units="si",
            simulation_data=ScriptInput(chunk, meta, "d"),
        )

    exp_mat = build("mat")
    res_mat = exp_mat.run.EinsteinDiffusionCoefficients(
        data_range=64, correlation_time=16, plot=False
    )

    exp_fused = build("fused")
    from lammps_analysis_tpu.calculators.einstein_diffusion_coefficients import (
        EinsteinDiffusionCoefficients,
    )
    probe = EinsteinDiffusionCoefficients(exp_fused)
    probe.args = probe.prepare_args(data_range=64, correlation_time=16)
    with change_memory_fraction(1e-7):
        slabs = probe._window_slab_plan(
            "X/Positions", 64, 16, max_slab_bytes=1 << 29
        )
        assert len(slabs) > 3, "budget did not force multiple slabs"
        config.fuse_streaming = True
        try:
            res_fused = exp_fused.run.EinsteinDiffusionCoefficients(
                data_range=64, correlation_time=16, plot=False
            )
        finally:
            config.fuse_streaming = False
    np.testing.assert_allclose(
        np.array(res_fused["X"]["msd"]), np.array(res_mat["X"]["msd"]),
        rtol=1e-10,
    )


def test_project_add_data_and_load_experiments(tmp_path, rng):
    """Project.add_data dispatches ingestion per experiment name;
    load_experiments re-activates (reference project.py:247-306)."""
    n_frames, n_atoms = 50, 8
    sp = [SpeciesInfo("X", n_atoms, [UNWRAPPED])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[9.0] * 3,
        sample_rate=1,
    )

    def make_chunk():
        chunk = TrajectoryChunkData(sp, n_frames)
        chunk.add_data(random_walk(rng, n_frames, n_atoms, 0.1), 0, "X",
                       "Unwrapped_Positions")
        return chunk

    project = make_project(tmp_path)
    project.add_experiment("e1", timestep=0.1, units="si")
    project.add_experiment("e2", timestep=0.1, units="si")
    project.add_data({
        "e1": ScriptInput(make_chunk(), meta, "d1"),
        "e2": ScriptInput(make_chunk(), meta, "d2"),
    })
    assert project.experiments["e1"].number_of_configurations == n_frames
    assert project.experiments["e2"].number_of_configurations == n_frames
    with pytest.raises(KeyError):
        project.add_data({"nope": ScriptInput(make_chunk(), meta, "d3")})

    project.disable_experiments(["e2"])
    assert set(project.active_experiments) == {"e1"}
    project.load_experiments("e2")
    assert set(project.active_experiments) == {"e1", "e2"}


def test_experiment_name_must_start_with_letter(tmp_path):
    """Reference contract (experiment.py:163-165): names that cannot be
    attributes (digit-leading) are rejected at creation."""
    import pytest as _pytest

    project = latpu.Project(name="names", storage_path=tmp_path)
    with _pytest.raises(ValueError):
        project.add_experiment("250K", timestep=0.1, units="metal")


def test_project_description_setter_and_file(tmp_path):
    """Reference contract (database/project_database.py:68-88): setting
    description persists across re-opens, and a value naming an existing
    file stores the file's CONTENTS."""
    p1 = latpu.Project(name="descp", storage_path=tmp_path)
    p1.description = "HelloWorld"
    assert latpu.Project(name="descp", storage_path=tmp_path).description == (
        "HelloWorld"
    )
    f = tmp_path / "desc.md"
    f.write_text("FromFile")
    p1.description = str(f)
    assert latpu.Project(name="descp", storage_path=tmp_path).description == (
        "FromFile"
    )


def test_custom_units_roundtrip(tmp_path):
    """Reference contract (test_experiment_database.py:205-228): a custom
    Units object passed to add_experiment survives project re-open."""
    from lammps_analysis_tpu.utils.units import UnitSystem

    cu = UnitSystem(
        name="custom", time=1.0, length=1.0, energy=2.0, NkTV2p=1.0,
        temperature=100.0, pressure=123.0, boltzmann=25.0,
    )
    p1 = latpu.Project(name="unitsp", storage_path=tmp_path)
    p1.add_experiment("Exp01", timestep=0.1, units="si")
    p1.add_experiment("Exp02", timestep=0.1, units=cu)
    p2 = latpu.Project(name="unitsp", storage_path=tmp_path)
    assert p2.experiments["Exp01"].units.name == "si"
    assert p2.experiments["Exp02"].units == cu


def test_species_charge_assignment_persists(tmp_path, rng):
    """Reference notebook contract (Molten_Salt_Comparison.ipynb):
    ``experiments.X.species["Na"].charge = 1`` works; here it also
    persists across re-open (the reference keeps it session-only)."""
    import dataclasses

    pi = PropertyInfo("Positions", 3)
    sps = [SpeciesInfo("Na", 4, [pi])]
    meta = TrajectoryMetadata(
        n_configurations=3, species_list=sps, box_l=[5.0] * 3, sample_rate=1
    )
    ch = TrajectoryChunkData(sps, 3)
    ch.add_data(rng.uniform(0, 5, (3, 4, 3)), 0, "Na", "Positions")
    p = latpu.Project(name="spq", storage_path=tmp_path)
    e = p.add_experiment(
        "NaCl", timestep=0.1, units="metal",
        simulation_data=ScriptInput(ch, meta, "m"),
    )
    e.species["Na"].charge = 1
    e.species["Na"].mass = 22.99
    sp = latpu.Project(name="spq", storage_path=tmp_path).experiments[
        "NaCl"
    ].species["Na"]
    assert sp.charge == 1.0 and sp.mass == 22.99
    with pytest.raises(dataclasses.FrozenInstanceError):
        sp.n_particles = 7


def test_windowed_stream_slabs_capped_at_512mib(tmp_path, rng):
    """The windowed streaming path caps slabs at 512 MiB even when the
    memory budget allows more: the planner's uncapped slab (3.2 GiB at
    10k atoms x 55k frames) drops the comb-MSD kernel an order of
    magnitude below its cache-friendly rate and inflates XLA-CPU compile
    time (slab-length-dependent). Locks both the cap arithmetic on a
    simulated production-size store and the wiring from
    ``_stream_property``."""
    n_frames, n_atoms = 200, 8
    pos = random_walk(rng, n_frames, n_atoms, 0.05)
    sp = [SpeciesInfo("X", n_atoms, [UNWRAPPED])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[100.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(pos, 0, "X", "Unwrapped_Positions")
    project = make_project(tmp_path)
    exp = project.add_experiment(
        "cap", timestep=0.1, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )

    from lammps_analysis_tpu.calculators.einstein_diffusion_coefficients import (
        EinsteinDiffusionCoefficients,
    )

    calc = EinsteinDiffusionCoefficients(exp)
    calc.args = calc.prepare_args(data_range=64, correlation_time=16)

    # Wiring: _stream_property must pass the 512 MiB cap down.
    seen = {}
    orig = calc._window_slab_plan

    def spy(path, data_range, correlation_time, max_slab_bytes=None):
        seen["max_slab_bytes"] = max_slab_bytes
        return orig(path, data_range, correlation_time,
                    max_slab_bytes=max_slab_bytes)

    calc._window_slab_plan = spy
    next(iter(calc._stream_property("X", "Unwrapped_Positions", 64, 16)))
    assert seen["max_slab_bytes"] == 1 << 29
    calc._window_slab_plan = orig

    # Cap arithmetic at production scale: simulate a 10240-atom store
    # whose memory budget would hand out 55k-frame (~6.9 GiB) slabs.
    big_atoms, big_frames = 10240, 110_000
    data_range, correlation_time = 512, 256

    class FakePlan:
        total_frames = big_frames
        frame_batch = 55_000

    calc._plan_for = lambda paths, data_range=None: FakePlan()
    store_get = exp.store.get_data_size
    exp.store.get_data_size = lambda path: (big_frames, big_atoms, 3)
    try:
        slabs = calc._window_slab_plan(
            "X/Unwrapped_Positions", data_range, correlation_time,
            max_slab_bytes=1 << 29,
        )
    finally:
        exp.store.get_data_size = store_get

    per_frame = big_atoms * 3 * 4
    cap_frames = max((1 << 29) // per_frame, 2 * data_range)
    # window alignment may extend a slab by < one window past the cap
    assert all(stop - start <= cap_frames + data_range
               for start, stop in slabs)
    assert len(slabs) > 10, "cap did not split the plan into many slabs"
    # coverage invariant survives the cap: every window seen exactly once
    starts = sorted(
        w for start, stop in slabs
        for w in range(start, stop - data_range + 1, correlation_time)
        if (w - start) % correlation_time == 0
    )
    expected = list(range(0, big_frames - data_range + 1, correlation_time))
    assert [s for i, s in enumerate(starts) if i == 0 or s != starts[i - 1]] == expected


def test_multi_species_stream_slabs_capped(tmp_path, rng):
    """_stream_properties_multi (distinct-diffusion family) must cap its
    window slabs at 512 MiB divided by the species count — every slab
    loads all species, and the windowed kernels fall off the same
    cache-regime cliff as the single-species path."""
    n_frames, n_atoms = 180, 6
    pos = random_walk(rng, n_frames, n_atoms, 0.05)
    sp = [SpeciesInfo("A", n_atoms, [UNWRAPPED]),
          SpeciesInfo("B", n_atoms, [UNWRAPPED])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[100.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(pos, 0, "A", "Unwrapped_Positions")
    chunk.add_data(pos + 1.0, 0, "B", "Unwrapped_Positions")
    project = make_project(tmp_path)
    exp = project.add_experiment(
        "mcap", timestep=0.1, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )

    from lammps_analysis_tpu.calculators.distinct_diffusion_coefficients import (
        EinsteinDistinctDiffusionCoefficients,
    )

    calc = EinsteinDistinctDiffusionCoefficients(exp)
    calc.args = calc.prepare_args(data_range=32, correlation_time=8)

    seen = {}
    orig = calc._window_slab_plan

    def spy(path, data_range, correlation_time, max_slab_bytes=None):
        seen["max_slab_bytes"] = max_slab_bytes
        return orig(path, data_range, correlation_time,
                    max_slab_bytes=max_slab_bytes)

    calc._window_slab_plan = spy
    next(iter(calc._stream_properties_multi(
        ["A", "B"], "Unwrapped_Positions", 32, 8
    )))
    assert seen["max_slab_bytes"] == (1 << 29) // 2
