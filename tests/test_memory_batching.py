"""Memory-budget equivalence: tiny batches must reproduce full-memory results.

The reference tests memory management by shrinking the allowed RAM and
asserting identical physics (``desired_memory`` parametrisation,
``CI/integration_tests/calculators/test_einstein_diffusion_coefficients.py:45``
+ ``utils/helpers.py:60``). Same strategy here via
``change_memory_fraction``: the planner then emits many small window-aligned
slabs, and results must match the single-slab run exactly.
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
from lammps_analysis_tpu.memory.planner import BatchPlanner
from lammps_analysis_tpu.utils.config import change_memory_fraction

UNWRAPPED = PropertyInfo("Unwrapped_Positions", 3)
VEL = PropertyInfo("Velocities", 3)


def _experiment(tmp_path, rng, name):
    n_frames, n_atoms = 400, 10
    pos = np.cumsum(rng.normal(scale=0.1, size=(n_frames, n_atoms, 3)), axis=0)
    vel = rng.normal(size=(n_frames, n_atoms, 3))
    sp = [SpeciesInfo("X", n_atoms, [UNWRAPPED, VEL])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[50.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(pos, 0, "X", "Unwrapped_Positions")
    chunk.add_data(vel, 0, "X", "Velocities")
    project = latpu.Project(name=name, storage_path=tmp_path)
    return project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )


@pytest.mark.parametrize("calculator,kwargs", [
    ("EinsteinDiffusionCoefficients", dict(data_range=64, correlation_time=8)),
    ("GreenKuboDiffusionCoefficients", dict(data_range=64, correlation_time=8)),
])
def test_tiny_memory_budget_equivalence(tmp_path, rng, calculator, kwargs):
    seed = np.random.default_rng(123)
    exp_full = _experiment(tmp_path / "full", np.random.default_rng(9), "p1")
    exp_tiny = _experiment(tmp_path / "tiny", np.random.default_rng(9), "p2")

    res_full = getattr(exp_full.run, calculator)(plot=False, **kwargs)

    with change_memory_fraction(1e-7):
        # sanity: the plan is actually forced into many slabs
        plan = BatchPlanner().plan(
            n_frames=400, bytes_per_frame=10 * 3 * 8, data_range=64
        )
        assert plan.frame_batch == 64  # clamped to one window per slab
        res_tiny = getattr(exp_tiny.run, calculator)(plot=False, **kwargs)

    d_full = np.atleast_1d(res_full["X"]["diffusion_coefficient"])[0]
    d_tiny = np.atleast_1d(res_tiny["X"]["diffusion_coefficient"])[0]
    np.testing.assert_allclose(d_tiny, d_full, rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(res_tiny["X"][
            "msd" if "Einstein" in calculator else "acf"
        ]),
        np.asarray(res_full["X"][
            "msd" if "Einstein" in calculator else "acf"
        ]),
        rtol=1e-8,
    )


def test_planner_scale_functions():
    planner = BatchPlanner(memory_budget_bytes=10_000_000)
    lin = planner.plan(n_frames=1000, bytes_per_frame=1000)
    quad = planner.plan(
        n_frames=1000, bytes_per_frame=1000,
        scale_function={"quadratic": {"outer_scale_factor": 1}},
    )
    assert lin.frame_batch == 1000  # fits entirely
    assert quad.frame_batch < lin.frame_batch  # quadratic cost caps the slab
    assert quad.atom_block == 128 and lin.atom_block == 512


def _two_species_experiment(tmp_path, seed, name, n_frames=300, na=9, nb=5):
    rng = np.random.default_rng(seed)
    sp = [
        SpeciesInfo("A", na, [UNWRAPPED, VEL]),
        SpeciesInfo("B", nb, [UNWRAPPED, VEL]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[50.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    for s, n in (("A", na), ("B", nb)):
        pos = np.cumsum(
            rng.normal(scale=0.1, size=(n_frames, n, 3)), axis=0
        )
        chunk.add_data(pos, 0, s, "Unwrapped_Positions")
        chunk.add_data(rng.normal(size=(n_frames, n, 3)), 0, s, "Velocities")
    project = latpu.Project(name=name, storage_path=tmp_path)
    return project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )


@pytest.mark.parametrize("calculator,series_key,kwargs", [
    ("EinsteinDiffusionCoefficients", "msd",
     dict(data_range=64, correlation_time=8)),
    ("GreenKuboDiffusionCoefficients", "acf",
     dict(data_range=64, correlation_time=8)),
    ("EinsteinDistinctDiffusionCoefficients", "msd",
     dict(data_range=48, correlation_time=16)),
    ("GreenKuboDistinctDiffusionCoefficients", "vacf",
     dict(data_range=48, correlation_time=16)),
])
def test_atom_minibatch_forced_equivalence(tmp_path, calculator, series_key, kwargs):
    """Over-budget windows must split the ATOM axis (reference
    ``memory_manager.py:257-340``) and still reproduce the full-memory
    result: the stream yields per-group slabs whose windowed sums are
    additive over atoms."""
    import psutil

    exp_full = _two_species_experiment(tmp_path / "full", 7, "p1")
    exp_tiny = _two_species_experiment(tmp_path / "tiny", 7, "p2")

    res_full = getattr(exp_full.run, calculator)(plot=False, **kwargs)

    # ~3 KB budget: one 64-frame window of 14 atoms is ~21.5 KB raw (x10
    # scale function), so the plan MUST split the atom axis
    with change_memory_fraction(3_000 / psutil.virtual_memory().total):
        import lammps_analysis_tpu.calculators as calcs

        cls = getattr(calcs, calculator)
        probe = cls(exp_tiny)
        probe.args = probe.prepare_args(**kwargs)
        _, n_groups = probe._window_stream_plan(
            "A/Unwrapped_Positions", kwargs["data_range"],
            kwargs["correlation_time"], n_selected=9,
        )
        assert n_groups > 1, "budget did not force the atom-axis split"
        res_tiny = getattr(exp_tiny.run, calculator)(plot=False, **kwargs)

    for key in res_full.data_dict:
        np.testing.assert_allclose(
            np.asarray(res_tiny[key][series_key]),
            np.asarray(res_full[key][series_key]),
            rtol=1e-8, atol=1e-12,
            err_msg=f"{calculator}[{key}] diverges under atom minibatching",
        )
        d_full = np.atleast_1d(res_full[key]["diffusion_coefficient"])[0]
        d_tiny = np.atleast_1d(res_tiny[key]["diffusion_coefficient"])[0]
        np.testing.assert_allclose(d_tiny, d_full, rtol=1e-7)


def test_atom_minibatch_with_fused_unwrap(tmp_path):
    """Atom-axis minibatching must compose with on-the-fly unwrap
    streaming: each atom group carries its own unwrap seam chain."""
    import psutil

    from lammps_analysis_tpu.utils.config import config

    POSITIONS = PropertyInfo("Positions", 3)
    n_frames, n_atoms, box = 300, 8, 2.0
    rng = np.random.default_rng(11)
    unwrapped = np.cumsum(
        rng.normal(scale=0.3, size=(n_frames, n_atoms, 3)), axis=0
    ) + box / 2
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
            "w", timestep=0.1, units="si",
            simulation_data=ScriptInput(chunk, meta, "d"),
        )

    kw = dict(data_range=64, correlation_time=8, plot=False)
    res_mat = build("mat").run.EinsteinDiffusionCoefficients(**kw)

    exp_fused = build("fused")
    with change_memory_fraction(3_000 / psutil.virtual_memory().total):
        config.fuse_streaming = True
        try:
            res_fused = exp_fused.run.EinsteinDiffusionCoefficients(**kw)
        finally:
            config.fuse_streaming = False
    np.testing.assert_allclose(
        np.asarray(res_fused["X"]["msd"]), np.asarray(res_mat["X"]["msd"]),
        rtol=1e-8, atol=1e-12,
    )
