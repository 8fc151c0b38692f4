"""Regression tests for the round-2 adversarial code-review findings.

Each test locks a specific fixed defect:

* wrap convention — CoordinateWrapper(center_box=True) must produce the
  reference's [-L/2, L/2) interval (``wrap_coordinates.py:62-74``), not a
  rigidly +L/2-shifted [0, L).
* producer registry — a scaled-coordinates-only store must resolve
  Positions via ScaleCoordinates instead of recursing
  CoordinateWrapper <-> CoordinateUnwrapper forever.
* multi-species carry resume — KinaciIntegratedHeatCurrent re-run after
  an append must chain its per-atom force-work integrals exactly.
* fused-unwrap gap seam — correlation_time > data_range makes the window
  plan's slabs disjoint; the on-the-fly unwrap must integrate the gap
  frames into the carry (the unwrap is path-dependent).
* post-processor cache keys — the full source-RDF arg dict must key the
  cache (atom_selection/start/stop collisions served stale results).
* molecule-species transformations — the dependency cascade may run a
  transformation for a mapped molecule "species".
* distinct calculators raise on zero windows instead of returning zeros.
* StructureFactor pair parsing survives underscores in entity names.
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

POSITIONS = PropertyInfo("Positions", 3)
SCALED = PropertyInfo("Scaled_Positions", 3)
UNWRAPPED = PropertyInfo("Unwrapped_Positions", 3)
VELOCITIES = PropertyInfo("Velocities", 3)
FORCES = PropertyInfo("Forces", 3)
PE = PropertyInfo("Potential_Energy", 1)


def _experiment(tmp_path, name, species, data, n_frames, box=8.0, **kwargs):
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=species, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(species, n_frames)
    for sp_name, prop_name, arr in data:
        chunk.add_data(arr, 0, sp_name, prop_name)
    project = latpu.Project(name=name, storage_path=tmp_path)
    return project.add_experiment(
        name + "_e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, name + "_d"), **kwargs
    )


# --------------------------------------------------------------- wrap convention
def test_wrap_center_box_matches_reference_interval(rng):
    """center_box=True wraps to [-L/2, L/2) exactly as the reference:
    +L/2 shift, floor-wrap, -L/2 shift (NOT the un-compensated -L/2
    pre-shift that landed everything in [0, L))."""
    import jax.numpy as jnp

    from lammps_analysis_tpu.transformations import CoordinateWrapper

    box = np.array([4.0, 6.0, 8.0])
    unwrapped = rng.normal(scale=10.0, size=(7, 5, 3))
    out, _ = CoordinateWrapper(center_box=True).transform_batch(
        {
            "Unwrapped_Positions": jnp.asarray(unwrapped),
            "Box_Array": jnp.asarray(box),
        }
    )
    out = np.asarray(out)
    assert (out >= -box / 2).all() and (out < box / 2).all()
    shifted = unwrapped + box / 2
    expected = shifted - np.floor(shifted / box) * box - box / 2
    np.testing.assert_allclose(out, expected, atol=1e-12)
    # and the uncentered variant stays [0, L)
    out0, _ = CoordinateWrapper(center_box=False).transform_batch(
        {
            "Unwrapped_Positions": jnp.asarray(unwrapped),
            "Box_Array": jnp.asarray(box),
        }
    )
    out0 = np.asarray(out0)
    assert (out0 >= 0).all() and (out0 < box).all()


# --------------------------------------------------------------- producer registry
def test_scaled_only_store_derives_positions_without_recursion(tmp_path, rng):
    """A LAMMPS xs-style store (Scaled_Positions only) must resolve
    Positions via ScaleCoordinates — the old classes[0] choice recursed
    CoordinateWrapper <-> CoordinateUnwrapper until RecursionError."""
    n_frames, n_atoms, box = 40, 6, 8.0
    frac = rng.uniform(0.05, 0.95, size=(n_frames, n_atoms, 3))
    exp = _experiment(
        tmp_path, "scaledonly", [SpeciesInfo("X", n_atoms, [SCALED])],
        [("X", "Scaled_Positions", frac)], n_frames, box=box,
    )
    res = exp.run.RadialDistributionFunction(
        number_of_configurations=8, cutoff=3.0, number_of_bins=40, plot=False
    )
    pos = exp.store.load(["X/Positions"], frames=slice(0, n_frames))[
        "X/Positions"
    ]
    np.testing.assert_allclose(pos, frac * box, rtol=1e-6)
    assert "X_X" in res.data_dict


def test_registry_returns_none_without_a_coordinate_source(tmp_path, rng):
    """No stored coordinate set of any kind -> no producer (the caller
    raises a clear error instead of recursing)."""
    from lammps_analysis_tpu.transformations import transformation_for_property

    n_frames, n_atoms = 10, 4
    exp = _experiment(
        tmp_path, "velonly", [SpeciesInfo("X", n_atoms, [VELOCITIES])],
        [("X", "Velocities", rng.normal(size=(n_frames, n_atoms, 3)))],
        n_frames,
    )
    assert transformation_for_property(
        "Positions", experiment=exp, species="X"
    ) is None
    assert transformation_for_property(
        "Unwrapped_Positions", experiment=exp, species="X"
    ) is None


# --------------------------------------------------------- multi-species carry resume
def test_kinaci_append_resume_chains_carry(tmp_path, rng):
    """Appending frames and re-running the Kinaci transformation must
    equal the one-shot run: the per-atom force-work integral is
    re-integrated at resume (it is NOT recoverable from the stored
    species-summed output)."""
    from lammps_analysis_tpu.transformations import KinaciIntegratedHeatCurrent

    n_frames, n_atoms = 24, 3
    props = [UNWRAPPED, VELOCITIES, FORCES, PE]
    sp = [SpeciesInfo("X", n_atoms, props)]
    pos = np.cumsum(rng.normal(size=(n_frames, n_atoms, 3)), axis=0)
    vel = rng.normal(size=(n_frames, n_atoms, 3))
    force = rng.normal(size=(n_frames, n_atoms, 3))
    pe = rng.normal(size=(n_frames, n_atoms, 1))

    def data(lo, hi):
        return [
            ("X", "Unwrapped_Positions", pos[lo:hi]),
            ("X", "Velocities", vel[lo:hi]),
            ("X", "Forces", force[lo:hi]),
            ("X", "Potential_Energy", pe[lo:hi]),
        ]

    # one-shot reference
    exp_full = _experiment(tmp_path, "kfull", sp, data(0, n_frames), n_frames)
    KinaciIntegratedHeatCurrent().run_transformation(exp_full)
    full = exp_full.store.load(
        ["Observables/Kinaci_Heat_Current"], frames=slice(0, n_frames)
    )["Observables/Kinaci_Heat_Current"]

    # split run with an append in between
    half = n_frames // 2
    exp_inc = _experiment(tmp_path, "kinc", sp, data(0, half), half)
    KinaciIntegratedHeatCurrent().run_transformation(exp_inc)
    meta2 = TrajectoryMetadata(
        n_configurations=n_frames - half, species_list=sp,
        box_l=[8.0] * 3, sample_rate=1,
    )
    chunk2 = TrajectoryChunkData(sp, n_frames - half)
    for sp_name, prop_name, arr in data(half, n_frames):
        chunk2.add_data(arr, 0, sp_name, prop_name)
    exp_inc.add_data(ScriptInput(chunk2, meta2, "part2"))
    KinaciIntegratedHeatCurrent().run_transformation(exp_inc)
    inc = exp_inc.store.load(
        ["Observables/Kinaci_Heat_Current"], frames=slice(0, n_frames)
    )["Observables/Kinaci_Heat_Current"]
    np.testing.assert_allclose(inc, full, rtol=1e-5, atol=1e-7)


# --------------------------------------------------------- fused-unwrap gap seam
def test_fused_unwrap_disjoint_slabs_integrate_gap(tmp_path, rng):
    """correlation_time > data_range: the window plan's slabs are
    disjoint, but jump detection needs every consecutive-frame diff —
    the fused stream must load the gap frames into the carry. The old
    clamped seam index silently chained from the wrong frame."""
    from lammps_analysis_tpu.calculators.einstein_diffusion_coefficients import (
        EinsteinDiffusionCoefficients,
    )
    from lammps_analysis_tpu.utils.config import change_memory_fraction, config

    n_frames, n_atoms, box, dt = 600, 8, 2.0, 0.1
    unwrapped = (
        np.cumsum(rng.normal(scale=0.3, size=(n_frames, n_atoms, 3)), axis=0)
        + box / 2
    )
    wrapped = unwrapped - box * np.floor(unwrapped / box)
    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]

    def build(name):
        return _experiment(
            tmp_path, name, sp, [("X", "Positions", wrapped)], n_frames,
            box=box,
        )

    kw = dict(data_range=24, correlation_time=100, plot=False)
    res_mat = build("gapmat").run.EinsteinDiffusionCoefficients(**kw)

    exp_fused = build("gapfused")
    probe = EinsteinDiffusionCoefficients(exp_fused)
    probe.args = probe.prepare_args(data_range=24, correlation_time=100)
    with change_memory_fraction(1e-7):
        slabs = probe._window_slab_plan("X/Positions", 24, 100)
        assert len(slabs) > 2, "budget did not force multiple slabs"
        assert any(
            b[0] > a[1] for a, b in zip(slabs, slabs[1:])
        ), "plan has no gaps; the regression needs disjoint slabs"
        config.fuse_streaming = True
        try:
            res_fused = exp_fused.run.EinsteinDiffusionCoefficients(**kw)
        finally:
            config.fuse_streaming = False
    np.testing.assert_allclose(
        np.array(res_fused["X"]["msd"]), np.array(res_mat["X"]["msd"]),
        rtol=1e-10,
    )


# --------------------------------------------------------- post-processor cache keys
def test_postprocessor_cache_keyed_by_full_rdf_args(tmp_path, rng):
    """Two source RDFs differing only in atom_selection must produce two
    distinct CoordinationNumbers computations (bins/cutoff/n_conf-only
    keys collided and served the first result for the second call)."""
    n_frames, box = 30, 6.0
    # two interpenetrating tight pairs so g(r) has a clear near peak
    base = rng.uniform(1.0, 5.0, size=(1, 12, 3)).repeat(n_frames, axis=0)
    base += rng.normal(scale=0.01, size=base.shape)
    partner = base + 0.9
    pos = np.concatenate([base, partner], axis=1)
    exp = _experiment(
        tmp_path, "cnkey", [SpeciesInfo("A", 24, [POSITIONS])],
        [("A", "Positions", pos % box)], n_frames, box=box,
    )
    kw = dict(
        number_of_configurations=10, cutoff=3.0, number_of_bins=60,
        plot=False,
    )
    rdf_sel = exp.run.RadialDistributionFunction(
        atom_selection=slice(0, 12), **kw
    )
    rdf_all = exp.run.RadialDistributionFunction(**kw)
    assert rdf_sel.args != rdf_all.args

    from lammps_analysis_tpu.calculators.post_processing import (
        CoordinationNumbers,
    )

    calls = []
    orig = CoordinationNumbers.run_calculator

    def spy(self):
        calls.append(dict(self.args))
        return orig(self)

    CoordinationNumbers.run_calculator = spy
    try:
        exp.run.CoordinationNumbers(rdf_data=rdf_sel, plot=False)
        exp.run.CoordinationNumbers(rdf_data=rdf_all, plot=False)
    finally:
        CoordinationNumbers.run_calculator = orig
    assert len(calls) == 2, "second CN call was served the first's cache"
    assert calls[0] != calls[1]


# --------------------------------------------------------- molecule-species trafos
def test_transformation_runs_for_molecule_species(tmp_path, rng):
    """The dependency cascade may run a transformation for a mapped
    molecule 'species'; sizing must resolve through entity(), not
    experiment.species (KeyError before the fix)."""
    from tests.test_molecule_mapping import make_water_experiment

    from lammps_analysis_tpu.transformations import VelocityFromPositions

    exp, _ = make_water_experiment(tmp_path, rng, n_mol=4, n_frames=20)
    exp.run.MolecularMap(
        molecules=[
            latpu.Molecule(name="water", smiles="[H]O[H]", amount=4,
                           cutoff=1.2)
        ]
    )
    VelocityFromPositions().run_transformation(exp, ["water"])
    out = exp.store.load(
        ["water/Velocities_From_Positions"], frames=slice(0, 20)
    )["water/Velocities_From_Positions"]
    assert out.shape == (20, 4, 3)
    com = exp.store.load(
        ["water/Unwrapped_Positions"], frames=slice(0, 20)
    )["water/Unwrapped_Positions"]
    np.testing.assert_allclose(
        out[:-1], np.diff(com, axis=0) / 0.1, rtol=1e-4, atol=1e-6
    )


# --------------------------------------------------------- zero-window raise
def test_distinct_calculators_raise_on_oversized_data_range(tmp_path, rng):
    n_frames, n_atoms = 20, 5
    pos = np.cumsum(rng.normal(size=(n_frames, n_atoms, 3)), axis=0)
    vel = rng.normal(size=(n_frames, n_atoms, 3))
    exp = _experiment(
        tmp_path, "zerowin",
        [SpeciesInfo("X", n_atoms, [UNWRAPPED, VELOCITIES])],
        [("X", "Unwrapped_Positions", pos), ("X", "Velocities", vel)],
        n_frames,
    )
    with pytest.raises(ValueError, match="exceeds"):
        exp.run.EinsteinDistinctDiffusionCoefficients(
            data_range=500, plot=False
        )
    with pytest.raises(ValueError, match="exceeds"):
        exp.run.GreenKuboDistinctDiffusionCoefficients(
            data_range=500, plot=False
        )


# --------------------------------------------------------- SF pair parsing
def test_structure_factor_pair_split_handles_underscores():
    from lammps_analysis_tpu.calculators.post_processing import StructureFactor

    names = {"mol_1", "Na", "Cl"}
    assert StructureFactor._split_pair("mol_1_mol_1", names) == (
        "mol_1", "mol_1",
    )
    assert StructureFactor._split_pair("Na_Cl", names) == ("Na", "Cl")
    assert StructureFactor._split_pair("mol_1_Na", names) == ("mol_1", "Na")
    with pytest.raises(ValueError, match="does not split"):
        StructureFactor._split_pair("K_K", names)


# =====================================================================
# second review batch: storage / ingestion / orchestration findings
# =====================================================================

class _FlakyScript(ScriptInput):
    """ScriptInput that dies after its first chunk on the first attempt."""

    def __init__(self, chunk, meta, name, fail_once=True):
        super().__init__(chunk, meta, name)
        self.fail = fail_once

    def get_configurations_generator(self):
        gen = super().get_configurations_generator()
        first = next(gen)
        # split the single chunk into two halves so a mid-stream crash
        # leaves a partial write
        half = first.chunk_size // 2
        for lo, hi in ((0, half), (half, first.chunk_size)):
            sub = TrajectoryChunkData(first.species_list, hi - lo)
            for sp in first.species_list:
                for prop in sp.properties:
                    sub.add_data(
                        first.get_data(sp.name, prop.name)[lo:hi], 0,
                        sp.name, prop.name,
                    )
            yield sub
            if self.fail:
                self.fail = False
                raise EOFError("simulated truncated source")


def test_add_data_crash_is_clean_and_retry_rewrites(tmp_path, rng):
    """A mid-stream ingestion failure must leave the experiment's frame
    count at the pre-append value (metadata persists only after a
    successful stream), and retrying the SAME source must rewrite its
    frames instead of double-counting/duplicating."""
    n_frames, n_atoms = 20, 4
    pos = rng.uniform(0, 8, size=(n_frames, n_atoms, 3))
    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[8.0] * 3,
        sample_rate=1,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(pos, 0, "X", "Positions")
    project = latpu.Project(name="crashsafe", storage_path=tmp_path)
    exp = project.add_experiment("e", timestep=0.1, units="si")

    flaky = _FlakyScript(chunk, meta, "src")
    with pytest.raises(EOFError):
        exp.add_data(flaky)
    assert exp.number_of_configurations == 0
    assert list(exp.read_files) == []

    # retry (same ledger key, generator now succeeds)
    exp.add_data(flaky)
    assert exp.number_of_configurations == n_frames
    got = exp.store.load(["X/Positions"], frames=slice(0, n_frames))[
        "X/Positions"
    ]
    np.testing.assert_allclose(got, pos, rtol=1e-6)
    # and the ledger makes a third call a no-op
    exp.add_data(_FlakyScript(chunk, meta, "src", fail_once=False))
    assert exp.number_of_configurations == n_frames


def test_append_with_new_property_lands_on_shared_time_axis(tmp_path, rng):
    """A property first appearing in the SECOND source must be written at
    frames N1.. (zero-filled before), not at 0..N2 misaligned."""
    n1, n2, n_atoms = 10, 12, 3
    pos = rng.uniform(0, 8, size=(n1 + n2, n_atoms, 3))
    vel = rng.normal(size=(n2, n_atoms, 3))

    sp1 = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta1 = TrajectoryMetadata(
        n_configurations=n1, species_list=sp1, box_l=[8.0] * 3,
        sample_rate=1,
    )
    c1 = TrajectoryChunkData(sp1, n1)
    c1.add_data(pos[:n1], 0, "X", "Positions")

    sp2 = [SpeciesInfo("X", n_atoms, [POSITIONS, VELOCITIES])]
    meta2 = TrajectoryMetadata(
        n_configurations=n2, species_list=sp2, box_l=[8.0] * 3,
        sample_rate=1,
    )
    c2 = TrajectoryChunkData(sp2, n2)
    c2.add_data(pos[n1:], 0, "X", "Positions")
    c2.add_data(vel, 0, "X", "Velocities")

    project = latpu.Project(name="newprop", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(c1, meta1, "s1"),
    )
    exp.add_data(ScriptInput(c2, meta2, "s2"))

    got_pos = exp.store.load(["X/Positions"], frames=slice(0, n1 + n2))[
        "X/Positions"
    ]
    np.testing.assert_allclose(got_pos, pos, rtol=1e-6)
    got_vel = exp.store.load(["X/Velocities"], frames=slice(0, n1 + n2))[
        "X/Velocities"
    ]
    np.testing.assert_allclose(got_vel[:n1], 0.0)  # zero-filled lead
    np.testing.assert_allclose(got_vel[n1:], vel, rtol=1e-6)


def test_as_slice_rejects_permuted_indices():
    from lammps_analysis_tpu.file_io.tabular import _as_slice

    assert _as_slice([5, 6, 7]) == slice(5, 8)
    assert _as_slice([3]) == slice(3, 4)
    # endpoint distance == len-1 but NOT contiguous ascending
    assert _as_slice([5, 9, 7]) == [5, 9, 7]
    assert _as_slice([7, 6, 5]) == [7, 6, 5]


def test_extxyz_fractional_time_interval_leaves_sample_rate_unset(tmp_path):
    lines = []
    for t in (0.0, 0.25, 0.5):
        lines.append("2")
        lines.append(
            f'Lattice="8 0 0 0 8 0 0 0 8" Properties=species:S:1:pos:R:3 '
            f"time={t}"
        )
        lines.append("Na 1.0 1.0 1.0")
        lines.append("Na 2.0 2.0 2.0")
    p = tmp_path / "frac.extxyz"
    p.write_text("\n".join(lines) + "\n")
    from lammps_analysis_tpu.file_io import EXTXYZFile

    meta = EXTXYZFile(p).metadata
    assert meta.sample_rate is None  # was int(round(0.25)) == 0


def test_lammps_dump_without_id_column(tmp_path, rng):
    """id-less dumps are readable when declared sorted; a clear error
    (not ValueError-from-list.index) otherwise."""
    from lammps_analysis_tpu.file_io import LAMMPSDumpFile

    n_frames, n_atoms, box = 3, 4, 8.0
    pos = rng.uniform(0, box, size=(n_frames, n_atoms, 3))
    p = tmp_path / "noid.dump"
    with open(p, "w") as f:
        for t in range(n_frames):
            f.write("ITEM: TIMESTEP\n%d\n" % (t * 10))
            f.write("ITEM: NUMBER OF ATOMS\n%d\n" % n_atoms)
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            for _ in range(3):
                f.write("0.0 %.4f\n" % box)
            f.write("ITEM: ATOMS element x y z\n")
            for i in range(n_atoms):
                f.write("Ar %.8f %.8f %.8f\n" % tuple(pos[t, i]))

    with pytest.raises(ValueError, match="trajectory_is_sorted_by_ids"):
        LAMMPSDumpFile(p).metadata

    reader = LAMMPSDumpFile(p, trajectory_is_sorted_by_ids=True)
    assert reader.metadata.n_configurations == n_frames
    chunks = list(reader.get_configurations_generator())
    got = np.concatenate(
        [c.get_data("Ar", "Positions") for c in chunks], axis=0
    )
    np.testing.assert_allclose(got, pos, atol=1e-7)


def test_coordination_numbers_molecule_pair_keys(tmp_path, rng):
    """CN on a molecule-COM RDF whose entity names contain underscores
    must resolve the first entity's density (was pair.split('_')[0] ->
    KeyError 'mol'); matches the reference's first-species convention."""
    from lammps_analysis_tpu.database.results_db import Computation

    n_frames, n_atoms = 5, 100
    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[20.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(rng.uniform(0, 20, (n_frames, n_atoms, 3)), 0, "X",
                   "Positions")
    project = latpu.Project(name="cnmol", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, temperature=300.0, units="real",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    exp.molecules = {"mol_1": {"n_particles": 50, "properties": []}}

    r = np.linspace(0, 0.5, 200)
    g = np.where(r > 0.15, 1.0, 0.0) + 2.0 * np.exp(
        -((r - 0.25) ** 2) / (2 * 0.02**2)
    )
    rdf = Computation(
        "RadialDistributionFunction",
        {"number_of_bins": 200, "cutoff": 5.0},
        {"mol_1_mol_1": {"x": r.tolist(), "y": g.tolist()}},
        "synthetic",
    )
    res = exp.run.CoordinationNumbers(rdf_data=rdf, plot=False)
    cn = np.asarray(res["mol_1_mol_1"]["cn"])
    # density must be the molecule count (50), not a species lookup crash
    volume_nm3 = exp.volume * exp.units.volume / 1e-27
    from scipy.integrate import cumulative_trapezoid

    direct = 4 * np.pi * (50 / volume_nm3) * cumulative_trapezoid(
        r[1:][1:] ** 2 * g[1:][1:], x=r[1:][1:]
    )
    np.testing.assert_allclose(cn, direct, rtol=1e-10)


def test_nernst_einstein_corrected_molecule_names(tmp_path, rng):
    """Corrected NE must include distinct terms whose pair keys carry
    underscore entity names (were silently dropped by pair.split('_'))."""
    from lammps_analysis_tpu.database.results_db import Computation
    from lammps_analysis_tpu.utils.units import (
        boltzmann_constant, elementary_charge,
    )

    n_frames, n_atoms = 5, 64
    sp = [SpeciesInfo("X", n_atoms, [POSITIONS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[20.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(rng.uniform(0, 20, (n_frames, n_atoms, 3)), 0, "X",
                   "Positions")
    project = latpu.Project(name="nemol", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    exp.set_charge("X", 1.0)
    exp.molecules = {
        "ion_pair": {"n_particles": 32, "charge": 1.0, "properties": []},
    }

    d_self = Computation(
        "EinsteinDiffusionCoefficients", {"data_range": 4},
        {"X": {"diffusion_coefficient": 1e-9, "uncertainty": 0.0},
         "ion_pair": {"diffusion_coefficient": 2e-9, "uncertainty": 0.0}},
        "e",
    )
    d_dist = Computation(
        "EinsteinDistinctDiffusionCoefficients", {"data_range": 4},
        {"ion_pair_ion_pair": {"diffusion_coefficient": 5e-10}},
        "e",
    )
    res = exp.run.NernstEinsteinIonicConductivity(
        diffusion_data=d_self, distinct_diffusion_data=d_dist, plot=False,
    )
    out = res.data_dict["System"]
    n_total = n_atoms  # molecules are not counted in the species total
    vol = exp.volume * exp.units.volume
    kt = boltzmann_constant * 300.0
    base = n_total * elementary_charge**2 / (vol * kt)
    x_x, x_m = n_atoms / n_total, 32 / n_total
    expected_self = base * (x_x * 1e-9 + x_m * 2e-9)
    np.testing.assert_allclose(
        out["nernst_einstein_ionic_conductivity"], expected_self, rtol=1e-12
    )
    expected_corr = expected_self + base * x_m * x_m * 5e-10
    np.testing.assert_allclose(
        out["corrected_nernst_einstein_ionic_conductivity"], expected_corr,
        rtol=1e-12,
    )


def test_results_db_preserves_arg_order(tmp_path):
    from lammps_analysis_tpu.database.results_db import ResultsDatabase

    db = ResultsDatabase(tmp_path / "r.db")
    db.ensure_experiment("e")
    args = {"species": ["Na", "Cl"], "cutoff": 5.0, "alpha": 1}
    db.store_computation("e", "Calc", args, 1, {"System": {"x": [1.0]}})
    found = db.find_computation("e", "Calc", args, 1)
    assert list(found.args) == list(args), "stored args lost call order"
    assert found.args["species"] == ["Na", "Cl"]


# ------------------------------------------------- round-4 advisor findings
def test_iter_in_background_abandoned_consumer_unblocks_producer():
    """An abandoned consumer must not leave the producer thread blocked
    on the sentinel put forever (advisor r3): with the queue full when
    the generator is closed, the stop event has to unblock the _END /
    exception puts too."""
    import threading
    import time as _time

    from lammps_analysis_tpu.pipeline.prefetch import iter_in_background

    def gen():
        yield 0
        yield 1  # fills the depth-1 queue after the consumer took 0

    before = {t for t in threading.enumerate()}
    it = iter_in_background(gen(), depth=1)
    assert next(it) == 0
    # give the producer time to enqueue item 1 and move on to the _END put
    _time.sleep(0.3)
    it.close()  # sets the stop event
    workers = [
        t for t in threading.enumerate()
        if t.name == "ingest-parse" and t not in before
    ]
    for t in workers:
        t.join(timeout=5.0)
        assert not t.is_alive(), "producer thread leaked after consumer close"


def test_grouped_window_slabs_keep_two_window_floor(tmp_path, rng):
    """In the atom-split regime the max_slab_bytes clamp must keep the
    same 2*data_range slab floor as the single-group path (advisor r3):
    a one-window slab doubles slab count and seam-overlap I/O."""
    import psutil

    from lammps_analysis_tpu.calculators import EinsteinDiffusionCoefficients
    from lammps_analysis_tpu.utils.config import change_memory_fraction

    n_frames, n_atoms = 400, 14
    pos = np.cumsum(rng.normal(scale=0.1, size=(n_frames, n_atoms, 3)), axis=0)
    exp = _experiment(
        tmp_path, "slabfloor",
        [SpeciesInfo("X", n_atoms, [UNWRAPPED])],
        [("X", "Unwrapped_Positions", pos)],
        n_frames,
    )
    data_range, correlation_time = 64, 8
    with change_memory_fraction(3_000 / psutil.virtual_memory().total):
        probe = EinsteinDiffusionCoefficients(exp)
        probe.args = probe.prepare_args(
            data_range=data_range, correlation_time=correlation_time,
        )
        slabs, n_groups = probe._window_stream_plan(
            "X/Unwrapped_Positions", data_range, correlation_time,
            max_slab_bytes=1,  # cap below even one window: floor must hold
        )
    assert n_groups > 1, "budget did not force the atom-axis split"
    starts_stops = list(slabs)
    for start, stop in starts_stops[:-1]:
        assert stop - start >= 2 * data_range, (
            f"slab ({start}, {stop}) below the 2*data_range floor"
        )


def test_adf_plan_z_route_keeps_window_scratch_bound():
    """The z-sorted ADF route must carry its window-relative scratch
    bound WITHOUT the LATPU_ADF_EXTRACT_E override: commit 22c7a27
    accidentally nested the w_chunks assignment under the env-override
    branch, silently dropping production to full-width scratches
    (measured 11.8 -> 9.0 ms/frame pipeline at 10k after the fix)."""
    import os

    from lammps_analysis_tpu.parallel.sharded_ops import _AdfPlan

    assert "LATPU_ADF_EXTRACT_E" not in os.environ
    box = np.array([40.0] * 3, np.float32)
    plan = _AdfPlan(10240, box, 3.6, use_pallas=True)
    assert plan.use_sorted and plan.sort == "z"
    assert getattr(plan, "w_chunks", None), (
        "z route lost its window_chunk_bound (the 22c7a27 nesting bug)"
    )
    # and the env override must NOT clobber the brick route's bound
    plan_b = _AdfPlan(65536, np.array([74.2] * 3, np.float32), 3.6,
                      use_pallas=True)
    assert plan_b.sort == "brick" and plan_b.w_chunks
