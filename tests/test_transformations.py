"""Transformation unit tests: pure batch kernels vs numpy re-derivations.

Models ``CI/unit_tests/transformations/test_transformations.py`` — each
transformation's ``transform_batch`` is exercised directly on random
tensors, plus carryover chaining across batch splits.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lammps_analysis_tpu.transformations import (
    CoordinateUnwrapper,
    CoordinateWrapper,
    IntegratedHeatCurrent,
    IonicCurrent,
    KinaciIntegratedHeatCurrent,
    MomentumFlux,
    ScaleCoordinates,
    ThermalFlux,
    TranslationalDipoleMoment,
    UnwrapViaIndices,
    VelocityFromPositions,
)


def test_unwrapper_recovers_continuous_walk(rng):
    box = np.array([3.0, 4.0, 5.0])
    true_pos = np.cumsum(rng.normal(scale=0.4, size=(60, 7, 3)), axis=0) + 10
    wrapped = true_pos - box * np.floor(true_pos / box)
    out, carry = CoordinateUnwrapper().transform_batch(
        {"Positions": jnp.asarray(wrapped), "Box_Array": jnp.asarray(box)}
    )
    out = np.asarray(out)
    # unwrapped trajectory differs from truth only by a constant image shift
    shift = out[0] - true_pos[0]
    np.testing.assert_allclose(out, true_pos + shift, atol=1e-9)


def test_unwrapper_carryover_equals_single_batch(rng):
    box = np.array([2.0, 2.0, 2.0])
    true_pos = np.cumsum(rng.normal(scale=0.3, size=(50, 4, 3)), axis=0)
    wrapped = true_pos - box * np.floor(true_pos / box)
    full, _ = CoordinateUnwrapper().transform_batch(
        {"Positions": jnp.asarray(wrapped), "Box_Array": jnp.asarray(box)}
    )
    trafo = CoordinateUnwrapper()
    carry = None
    parts = []
    for part in (wrapped[:13], wrapped[13:31], wrapped[31:]):
        out, carry = trafo.transform_batch(
            {"Positions": jnp.asarray(part), "Box_Array": jnp.asarray(box)},
            carry,
        )
        parts.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(full), atol=1e-9)


def test_unwrap_via_indices(rng):
    box = np.array([3.0, 3.0, 3.0])
    pos = rng.uniform(0, 3, size=(10, 5, 3))
    images = rng.integers(-3, 4, size=(10, 5, 3)).astype(float)
    out, _ = UnwrapViaIndices().transform_batch(
        {"Positions": jnp.asarray(pos), "Box_Array": jnp.asarray(box),
         "Box_Images": jnp.asarray(images)}
    )
    np.testing.assert_allclose(np.asarray(out), pos + images * box, atol=1e-12)


def test_wrap_and_scale(rng):
    box = np.array([4.0, 4.0, 4.0])
    unwrapped = rng.normal(scale=10, size=(6, 8, 3))
    wrapped, _ = CoordinateWrapper(center_box=False).transform_batch(
        {"Unwrapped_Positions": jnp.asarray(unwrapped),
         "Box_Array": jnp.asarray(box)}
    )
    wrapped = np.asarray(wrapped)
    assert (wrapped >= 0).all() and (wrapped < 4.0).all()
    np.testing.assert_allclose(
        np.round((unwrapped - wrapped) / box), (unwrapped - wrapped) / box,
        atol=1e-9,
    )
    scaled = rng.uniform(0, 1, size=(6, 8, 3))
    out, _ = ScaleCoordinates().transform_batch(
        {"Scaled_Positions": jnp.asarray(scaled), "Box_Array": jnp.asarray(box)}
    )
    np.testing.assert_allclose(np.asarray(out), scaled * box, atol=1e-12)


def test_velocity_from_positions(rng):
    pos = np.cumsum(rng.normal(size=(20, 3, 3)), axis=0)
    out, _ = VelocityFromPositions().transform_batch(
        {"Unwrapped_Positions": jnp.asarray(pos),
         "Time_Step": jnp.asarray(0.5), "Sample_Rate": jnp.asarray(4.0)}
    )
    out = np.asarray(out)
    expect = (pos[1:] - pos[:-1]) / 2.0
    np.testing.assert_allclose(out[:-1], expect, atol=1e-12)
    np.testing.assert_allclose(out[-1], expect[-1], atol=1e-12)  # duplicated


def test_ionic_current_two_species(rng):
    """Mirror of the reference unit test (test_transformations.py:59-80)."""
    vel_a = rng.normal(size=(12, 5, 3))
    vel_b = rng.normal(size=(12, 3, 3))
    out, _ = IonicCurrent().transform_batch(
        {
            "A": {"Velocities": jnp.asarray(vel_a),
                  "Charge": jnp.full((1, 1, 1), 2.0)},
            "B": {"Velocities": jnp.asarray(vel_b),
                  "Charge": jnp.full((1, 1, 1), -1.0)},
        }
    )
    expect = 2.0 * vel_a.sum(axis=1) - vel_b.sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-12)


def test_translational_dipole_moment(rng):
    pos = rng.normal(size=(7, 4, 3))
    out, _ = TranslationalDipoleMoment().transform_batch(
        {"X": {"Unwrapped_Positions": jnp.asarray(pos),
               "Charge": jnp.full((1, 1, 1), -1.5)}}
    )
    np.testing.assert_allclose(np.asarray(out), -1.5 * pos.sum(axis=1), atol=1e-12)


def test_thermal_flux_voigt_contraction(rng):
    t, n = 5, 6
    stress = rng.normal(size=(t, n, 6))
    vel = rng.normal(size=(t, n, 3))
    ke = rng.normal(size=(t, n, 1))
    pe = rng.normal(size=(t, n, 1))
    out, _ = ThermalFlux().transform_batch(
        {"X": {"Stress": jnp.asarray(stress), "Velocities": jnp.asarray(vel),
               "Kinetic_Energy": jnp.asarray(ke), "Potential_Energy": jnp.asarray(pe)}}
    )
    # numpy oracle with explicit Voigt [xx, yy, zz, xy, xz, yz]
    s = stress
    phi = np.stack(
        [
            s[..., 0] * vel[..., 0] + s[..., 3] * vel[..., 1] + s[..., 4] * vel[..., 2],
            s[..., 3] * vel[..., 0] + s[..., 1] * vel[..., 1] + s[..., 5] * vel[..., 2],
            s[..., 4] * vel[..., 0] + s[..., 5] * vel[..., 1] + s[..., 2] * vel[..., 2],
        ],
        axis=-1,
    )
    expect = ((ke + pe) * vel - phi).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-12)


def test_momentum_flux_offdiagonals(rng):
    stress = rng.normal(size=(4, 5, 6))
    out, _ = MomentumFlux().transform_batch(
        {"X": {"Stress": jnp.asarray(stress)}}
    )
    expect = np.stack(
        [stress[..., 3].sum(1), stress[..., 4].sum(1), stress[..., 5].sum(1)],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-12)


def test_integrated_heat_current(rng):
    pos = rng.normal(size=(6, 4, 3))
    ke = rng.normal(size=(6, 4, 1))
    pe = rng.normal(size=(6, 4, 1))
    out, _ = IntegratedHeatCurrent().transform_batch(
        {"X": {"Unwrapped_Positions": jnp.asarray(pos),
               "Kinetic_Energy": jnp.asarray(ke), "Potential_Energy": jnp.asarray(pe)}}
    )
    np.testing.assert_allclose(
        np.asarray(out), ((ke + pe) * pos).sum(axis=1), atol=1e-12
    )


def test_kinaci_carryover_chains(rng):
    t, n = 24, 3
    dt = 0.25
    pos = rng.normal(size=(t, n, 3))
    vel = rng.normal(size=(t, n, 3))
    force = rng.normal(size=(t, n, 3))
    pe = rng.normal(size=(t, n, 1))

    def batch(lo, hi):
        return {
            "X": {
                "Unwrapped_Positions": jnp.asarray(pos[lo:hi]),
                "Velocities": jnp.asarray(vel[lo:hi]),
                "Forces": jnp.asarray(force[lo:hi]),
                "Potential_Energy": jnp.asarray(pe[lo:hi]),
                "Time_Step": jnp.asarray(dt),
                "Sample_Rate": jnp.asarray(1.0),
            }
        }

    trafo = KinaciIntegratedHeatCurrent()
    full, _ = trafo.transform_batch(batch(0, t))
    out1, carry = trafo.transform_batch(batch(0, 10))
    out2, _ = trafo.transform_batch(batch(10, t), carry)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(out1), np.asarray(out2)]),
        np.asarray(full),
        atol=1e-10,
    )


def test_host_kernels_match_jit_kernels(rng):
    """Every numpy ``transform_batch_host`` agrees with the jitted jnp
    kernel — the host fast path reassociates the atom sums into BLAS
    batched matmuls, so the comparison locks the reformulation."""
    t, n_a, n_b = 9, 7, 4

    def both(trafo, batch, carry=None):
        jout, jcarry = trafo.transform_batch(batch, carry)
        hout, hcarry = trafo.transform_batch_host(batch, carry)
        np.testing.assert_allclose(
            np.asarray(hout), np.asarray(jout), rtol=1e-9, atol=1e-9
        )
        return jcarry, hcarry

    vel = {sp: rng.normal(size=(t, n, 3)) for sp, n in (("A", n_a), ("B", n_b))}
    # constant scalar charge AND a stored per-frame (T, N, 1) charge
    both(IonicCurrent(), {
        "A": {"Velocities": vel["A"], "Charge": np.full((1, 1, 1), 2.0)},
        "B": {"Velocities": vel["B"],
              "Charge": rng.normal(size=(t, n_b, 1))},
    })
    both(TranslationalDipoleMoment(), {
        "A": {"Unwrapped_Positions": rng.normal(size=(t, n_a, 3)),
              "Charge": np.full((1, 1, 1), -1.5)},
    })
    both(ThermalFlux(), {
        "A": {"Stress": rng.normal(size=(t, n_a, 6)),
              "Velocities": vel["A"],
              "Kinetic_Energy": rng.normal(size=(t, n_a, 1)),
              "Potential_Energy": rng.normal(size=(t, n_a, 1))},
        "B": {"Stress": rng.normal(size=(t, n_b, 6)),
              "Velocities": vel["B"],
              "Kinetic_Energy": rng.normal(size=(t, n_b, 1)),
              "Potential_Energy": rng.normal(size=(t, n_b, 1))},
    })
    both(IntegratedHeatCurrent(), {
        "A": {"Unwrapped_Positions": rng.normal(size=(t, n_a, 3)),
              "Kinetic_Energy": rng.normal(size=(t, n_a, 1)),
              "Potential_Energy": rng.normal(size=(t, n_a, 1))},
    })
    both(MomentumFlux(), {
        "A": {"Stress": rng.normal(size=(t, n_a, 6))},
        "B": {"Stress": rng.normal(size=(t, n_b, 6))},
    })


def test_kinaci_host_kernel_carry_chains(rng):
    """Host Kinaci matches the jnp kernel across a batch seam, mixing the
    two kernels' carries (the runner may hand either's carry onward)."""
    t, n = 24, 3
    pos = rng.normal(size=(t, n, 3))
    vel = rng.normal(size=(t, n, 3))
    force = rng.normal(size=(t, n, 3))
    pe = rng.normal(size=(t, n, 1))

    def batch(lo, hi):
        return {
            "X": {
                "Unwrapped_Positions": pos[lo:hi],
                "Velocities": vel[lo:hi],
                "Forces": force[lo:hi],
                "Potential_Energy": pe[lo:hi],
                "Time_Step": np.asarray(0.25),
                "Sample_Rate": np.asarray(1.0),
            }
        }

    trafo = KinaciIntegratedHeatCurrent()
    full, _ = trafo.transform_batch(batch(0, t))
    out1, carry = trafo.transform_batch_host(batch(0, 10))
    out2, _ = trafo.transform_batch_host(batch(10, t), carry)
    np.testing.assert_allclose(
        np.concatenate([out1, out2]), np.asarray(full), rtol=1e-9, atol=1e-9
    )


def test_runner_selects_host_kernel_on_cpu(tmp_path, rng):
    """On the CPU backend the runner must use the numpy host kernel (the
    jitted path would silently pay the buffer copy)."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        PropertyInfo, SpeciesInfo, TrajectoryChunkData, TrajectoryMetadata,
    )
    from lammps_analysis_tpu.file_io import ScriptInput

    vel_prop = PropertyInfo("Velocities", 3)
    species = [SpeciesInfo("Na", 4, [vel_prop], charge=1.0),
               SpeciesInfo("Cl", 3, [vel_prop], charge=-1.0)]
    n_frames = 12
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=species, box_l=[5.0] * 3,
    )
    chunk = TrajectoryChunkData(species, n_frames)
    data = {}
    for sp in species:
        data[sp.name] = rng.normal(size=(n_frames, sp.n_particles, 3))
        chunk.add_data(data[sp.name], 0, sp.name, "Velocities")
    project = latpu.Project(name="hostsel", storage_path=tmp_path)
    exp = project.add_experiment("e", timestep=0.1, temperature=300.0)
    exp.add_data(ScriptInput(chunk, meta, "c0"))
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)

    trafo = IonicCurrent()
    called = {"jit": False}
    orig = trafo._batch_kernel

    def spy():
        called["jit"] = True
        return orig()

    trafo._batch_kernel = spy
    trafo.run_transformation(exp)
    assert not called["jit"], "host-routed stage fell back to the jit path"
    out = exp.store.load(
        ["Observables/Ionic_Current"], frames=slice(0, n_frames)
    )["Observables/Ionic_Current"]
    expect = data["Na"].sum(axis=1) - data["Cl"].sum(axis=1)
    np.testing.assert_allclose(out[:, 0, :], expect, rtol=1e-6, atol=1e-6)


def test_unwrap_choice_prefers_box_images(tmp_path, rng):
    """With Box_Images stored, dependency resolution uses UnwrapViaIndices
    (reference _unwrap_choice, trajectory_calculator.py:181-194)."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        PropertyInfo, SpeciesInfo, TrajectoryChunkData, TrajectoryMetadata,
    )
    from lammps_analysis_tpu.file_io import ScriptInput

    box = 3.0
    n_frames, n_atoms = 60, 5
    true_pos = np.cumsum(rng.normal(scale=0.3, size=(n_frames, n_atoms, 3)), axis=0)
    images = np.floor(true_pos / box)
    wrapped = true_pos - images * box
    props = [PropertyInfo("Positions", 3), PropertyInfo("Box_Images", 3)]
    sp = [SpeciesInfo("X", n_atoms, props)]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3, sample_rate=1
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(wrapped, 0, "X", "Positions")
    chunk.add_data(images, 0, "X", "Box_Images")
    project = latpu.Project(name="p", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    exp.run.EinsteinDiffusionCoefficients(data_range=20, correlation_time=10,
                                          plot=False)
    # image-based unwrap reproduces the TRUE positions exactly (no carry
    # heuristics) — that is the signature of UnwrapViaIndices
    got = exp.load_matrix("Unwrapped_Positions", ["X"])["X"]
    np.testing.assert_allclose(got, true_pos, atol=1e-10)


def test_transformation_run_options(rng, tmp_path):
    """The reference's four dispatch styles all work (its CI drives them:
    CI/integration_tests/transformations/test_transformation_run_options.py):
    from the project hub, from the experiment hub, repeated calls are
    idempotent (no double-write), attribute-style experiment access, and
    passing a transformation INSTANCE to cls_transformation_run."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database.contracts import (
        SpeciesInfo,
        TrajectoryChunkData,
        TrajectoryMetadata,
    )
    from lammps_analysis_tpu.database.properties import PropertyInfo
    from lammps_analysis_tpu.file_io import ScriptInput
    from lammps_analysis_tpu.transformations import CoordinateUnwrapper

    pi = PropertyInfo("Positions", 3)
    sp = [SpeciesInfo("Na", 6, [pi])]
    meta = TrajectoryMetadata(
        n_configurations=10, species_list=sp, box_l=[5.0] * 3, sample_rate=1
    )
    chunk = TrajectoryChunkData(sp, 10)
    chunk.add_data(rng.uniform(0, 5, (10, 6, 3)), 0, "Na", "Positions")
    project = latpu.Project(name="runopts", storage_path=tmp_path)
    project.add_experiment(
        "NaCl", timestep=0.1, units="metal",
        simulation_data=ScriptInput(chunk, meta, "m"),
    )

    project.run.CoordinateUnwrapper()
    project.run.CoordinateUnwrapper()  # idempotent from the project hub

    exp = project.experiments.NaCl  # attribute access, reference style
    first = exp.store.load(["Na/Unwrapped_Positions"])["Na/Unwrapped_Positions"]
    exp.run.CoordinateUnwrapper()  # idempotent from the experiment hub
    np.testing.assert_array_equal(
        first,
        exp.store.load(["Na/Unwrapped_Positions"])["Na/Unwrapped_Positions"],
    )

    # instance dispatch (cls_transformation_run)
    exp.cls_transformation_run(CoordinateUnwrapper())
    np.testing.assert_array_equal(
        first,
        exp.store.load(["Na/Unwrapped_Positions"])["Na/Unwrapped_Positions"],
    )
    with pytest.raises(AttributeError):
        project.experiments.DoesNotExist
