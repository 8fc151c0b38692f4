"""Reader tests: synthetic LAMMPS dump / extxyz / flux files round-trip.

Models the reference reader smoke tests
(``CI/unit_tests/project/test_project_add_experiment.py:118-306``) but with
full value verification against the arrays used to write the files.
"""

import numpy as np
import pytest

from lammps_analysis_tpu.file_io import (
    EXTXYZFile,
    LAMMPSDumpFile,
    LAMMPSFluxFile,
    ScriptInput,
)
from lammps_analysis_tpu.database import (
    PropertyInfo,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)


def write_lammps_dump(path, pos, vel, species, box, dt=10, shuffle=True, rng=None):
    """Write a dump with optionally shuffled atom ids per config."""
    n_frames, n_atoms, _ = pos.shape
    with open(path, "w") as f:
        for t in range(n_frames):
            order = np.arange(n_atoms)
            if shuffle and rng is not None:
                rng.shuffle(order)
            f.write("ITEM: TIMESTEP\n%d\n" % (t * dt))
            f.write("ITEM: NUMBER OF ATOMS\n%d\n" % n_atoms)
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            for b in box:
                f.write("0.0 %.4f\n" % b)
            f.write("ITEM: ATOMS id element x y z vx vy vz\n")
            for i in order:
                f.write(
                    "%d %s %.8f %.8f %.8f %.8f %.8f %.8f\n"
                    % (i + 1, species[i], *pos[t, i], *vel[t, i])
                )


@pytest.fixture()
def dump_data(rng):
    n_frames, n_na, n_cl = 7, 5, 3
    n = n_na + n_cl
    pos = rng.uniform(0, 8.0, size=(n_frames, n, 3))
    vel = rng.normal(size=(n_frames, n, 3))
    species = ["Na"] * n_na + ["Cl"] * n_cl
    return pos, vel, species


def test_lammps_dump_reader(tmp_path, dump_data, rng):
    pos, vel, species = dump_data
    path = tmp_path / "traj.lammpstraj"
    write_lammps_dump(path, pos, vel, species, [8.0, 8.0, 8.0], dt=10, rng=rng)

    reader = LAMMPSDumpFile(path)
    meta = reader.metadata
    assert meta.n_configurations == 7
    assert meta.box_l == [8.0, 8.0, 8.0]
    assert meta.sample_rate == 10
    by_name = {s.name: s for s in meta.species_list}
    assert by_name["Na"].n_particles == 5
    assert by_name["Cl"].n_particles == 3
    assert sorted(p.name for p in by_name["Na"].properties) == [
        "Positions",
        "Velocities",
    ]

    chunks = list(reader.get_configurations_generator())
    got_pos = np.concatenate(
        [c.get_data("Na", "Positions") for c in chunks], axis=0
    )
    np.testing.assert_allclose(got_pos, pos[:, :5], atol=1e-7)
    got_cl_vel = np.concatenate(
        [c.get_data("Cl", "Velocities") for c in chunks], axis=0
    )
    np.testing.assert_allclose(got_cl_vel, vel[:, 5:], atol=1e-7)


def test_lammps_dump_type_column(tmp_path, dump_data, rng):
    pos, vel, _ = dump_data
    species = ["1"] * 5 + ["2"] * 3
    path = tmp_path / "traj.dump"
    with open(path, "w") as f:
        for t in range(7):
            f.write("ITEM: TIMESTEP\n%d\nITEM: NUMBER OF ATOMS\n8\n" % t)
            f.write("ITEM: BOX BOUNDS pp pp pp\n0 8\n0 8\n0 8\n")
            f.write("ITEM: ATOMS id type x y z\n")
            for i in range(8):
                f.write("%d %s %.6f %.6f %.6f\n" % (i + 1, species[i], *pos[t, i]))
    reader = LAMMPSDumpFile(path)
    names = {s.name: s.n_particles for s in reader.metadata.species_list}
    assert names == {"1": 5, "2": 3}


def test_extxyz_reader(tmp_path, rng):
    n_frames, n_o, n_h = 4, 2, 4
    n = n_o + n_h
    pos = rng.uniform(0, 5.0, size=(n_frames, n, 3))
    force = rng.normal(size=(n_frames, n, 3))
    species = ["O"] * n_o + ["H"] * n_h
    path = tmp_path / "traj.extxyz"
    with open(path, "w") as f:
        for t in range(n_frames):
            f.write("%d\n" % n)
            f.write(
                'Lattice="5.0 0 0 0 5.0 0 0 0 5.0" '
                "Properties=species:S:1:pos:R:3:force:R:3 Time=%d\n" % (t * 2)
            )
            for i in range(n):
                f.write(
                    "%s %.8f %.8f %.8f %.8f %.8f %.8f\n"
                    % (species[i], *pos[t, i], *force[t, i])
                )
    reader = EXTXYZFile(path)
    meta = reader.metadata
    assert meta.n_configurations == 4
    assert meta.box_l == [5.0, 5.0, 5.0]
    assert meta.sample_rate == 2
    chunks = list(reader.get_configurations_generator())
    got = np.concatenate([c.get_data("H", "Forces") for c in chunks], axis=0)
    np.testing.assert_allclose(got, force[:, n_o:], atol=1e-7)


def test_lammps_flux_reader(tmp_path, rng):
    n_steps = 11
    flux = rng.normal(size=(n_steps, 3))
    temp = rng.uniform(290, 310, size=n_steps)
    path = tmp_path / "flux.dat"
    with open(path, "w") as f:
        f.write("# LAMMPS heat flux output\n")
        f.write("time temp c_flux_thermal[1] c_flux_thermal[2] c_flux_thermal[3]\n")
        for t in range(n_steps):
            f.write("%d %.6f %.8f %.8f %.8f\n" % (t, temp[t], *flux[t]))
    reader = LAMMPSFluxFile(path, sample_rate=5, box_l=[10.0, 10.0, 10.0])
    meta = reader.metadata
    assert meta.n_configurations == n_steps
    assert meta.sample_rate == 5
    assert meta.species_list[0].name == "Observables"
    assert meta.species_list[0].n_particles == 1
    chunks = list(reader.get_configurations_generator())
    got = np.concatenate(
        [c.get_data("Observables", "Thermal_Flux") for c in chunks], axis=0
    )
    np.testing.assert_allclose(got[:, 0, :], flux, atol=1e-7)


def test_script_input_roundtrip(rng):
    props = [PropertyInfo("Positions", 3)]
    sp = [SpeciesInfo("X", 4, props)]
    meta = TrajectoryMetadata(
        n_configurations=6, species_list=sp, box_l=[3.0, 3.0, 3.0]
    )
    chunk = TrajectoryChunkData(sp, 6)
    data = rng.normal(size=(6, 4, 3))
    chunk.add_data(data, 0, "X", "Positions")
    reader = ScriptInput(chunk, meta, "test_data")
    assert reader.metadata.n_configurations == 6
    out = list(reader.get_configurations_generator())
    assert len(out) == 1
    np.testing.assert_array_equal(out[0].get_data("X", "Positions"), data)


def test_chemfiles_reader_with_stub(tmp_path, rng, monkeypatch):
    """Drive the chemfiles frame->chunk logic with a stub chemfiles module.

    The real dependency is absent in CI images; the reader's chunking,
    species-row slicing, and velocity handling are exercised against a
    minimal fake implementing the used API surface (Trajectory.nsteps /
    read / set_topology, Frame.atoms/cell/positions/velocities).
    """
    import types

    import numpy as np

    from lammps_analysis_tpu.file_io import chemfiles_io
    # the migration doc promises file_io.ChemfilesRead (reference package
    # surface) — lock the export, importable without the optional dep
    from lammps_analysis_tpu.file_io import ChemfilesRead
    assert ChemfilesRead is chemfiles_io.ChemfilesRead

    n_frames, names = 7, ["O", "H", "H"]
    pos_all = rng.uniform(0, 5.0, size=(n_frames, 3, 3))
    vel_all = rng.normal(size=(n_frames, 3, 3))

    class FakeAtom:
        def __init__(self, name):
            self.name = name

    class FakeCell:
        lengths = (5.0, 5.0, 5.0)

    class FakeFrame:
        def __init__(self, k):
            self.atoms = [FakeAtom(n) for n in names]
            self.cell = FakeCell()
            self.positions = pos_all[k]
            self.velocities = vel_all[k]

        def has_velocities(self):
            return True

    class FakeTrajectory:
        def __init__(self, path):
            self.path = path
            self._cursor = 0
            self.nsteps = n_frames

        def set_topology(self, path):
            self.topology_set = path

        def read(self):
            frame = FakeFrame(self._cursor)
            self._cursor += 1
            return frame

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    fake = types.SimpleNamespace(Trajectory=FakeTrajectory)
    monkeypatch.setattr(chemfiles_io, "chemfiles", fake)
    monkeypatch.setattr(chemfiles_io, "CHEMFILES_AVAILABLE", True)

    reader = chemfiles_io.ChemfilesRead(
        tmp_path / "traj.trr", topol_file_path=str(tmp_path / "top.gro"),
        frames_per_chunk=3,
    )
    meta = reader.metadata
    assert meta.n_configurations == n_frames
    assert sorted(meta.species_names) == ["H", "O"]
    assert meta.box_l == [5.0, 5.0, 5.0]

    chunks = list(reader.get_configurations_generator())
    assert [c.chunk_size for c in chunks] == [3, 3, 1]
    # species-row slicing: H rows are atoms 1 and 2 of every frame
    h0 = chunks[0].get_data("H", "Positions")
    np.testing.assert_allclose(h0, pos_all[:3][:, [1, 2]])
    o_v = chunks[1].get_data("O", "Velocities")
    np.testing.assert_allclose(o_v, vel_all[3:6][:, [0]])

    # end-to-end: ingest through an Experiment
    import lammps_analysis_tpu as latpu

    project = latpu.Project(name="chem", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, temperature=300.0, units="si",
        simulation_data=reader,
    )
    assert exp.number_of_configurations == n_frames
    loaded = exp.load_matrix("Positions", ["O", "H"])
    np.testing.assert_allclose(loaded["O"], pos_all[:, [0]])
    np.testing.assert_allclose(loaded["H"], pos_all[:, [1, 2]])
    # reference load_matrix kwargs (experiment.py:554-597): select_slice
    # indexes the loaded arrays (time-leading layout here); path loads
    # explicit store paths verbatim
    sliced = exp.load_matrix("Positions", ["O"], select_slice=np.s_[2:5])
    np.testing.assert_allclose(sliced["O"], pos_all[2:5][:, [0]])
    by_path = exp.load_matrix(path=["H/Positions"])
    np.testing.assert_allclose(by_path["H/Positions"], pos_all[:, [1, 2]])


def _write_gro(path, n_mol=4, n_frames=3, box_nm=2.5, vel=True, rng=None):
    """Synthetic SPC-water .gro file (fixed-width per the GROMACS manual)."""
    rng = rng or np.random.default_rng(0)
    pos = rng.uniform(0, box_nm, (n_frames, n_mol * 3, 3))
    vels = rng.normal(scale=0.1, size=(n_frames, n_mol * 3, 3))
    names = []
    for m in range(n_mol):
        names += ["OW", "HW1", "HW2"]
    with open(path, "w") as f:
        for fr in range(n_frames):
            f.write(f"water box t= {10.0 * fr:.1f} step= {fr}\n")
            f.write(f"{n_mol * 3}\n")
            for a, name in enumerate(names):
                res = a // 3 + 1
                line = f"{res:5d}{'SOL':<5s}{name:>5s}{a + 1:5d}"
                line += "".join(f"{v:8.3f}" for v in pos[fr, a])
                if vel:
                    line += "".join(f"{v:8.4f}" for v in vels[fr, a])
                f.write(line + "\n")
            f.write(f"{box_nm:10.5f}{box_nm:10.5f}{box_nm:10.5f}\n")
    return pos, vels


def test_gro_reader_species_units_and_stream(tmp_path, rng):
    from lammps_analysis_tpu.file_io import GROFile

    path = tmp_path / "traj.gro"
    pos, vels = _write_gro(path, n_mol=4, n_frames=3, rng=rng)
    reader = GROFile(path, frames_per_chunk=2)
    meta = reader.metadata
    assert meta.n_configurations == 3
    assert meta.box_l == pytest.approx([25.0, 25.0, 25.0])
    assert meta.sample_rate == 10
    by_name = {s.name: s for s in meta.species_list}
    assert set(by_name) == {"O", "H"}  # OW -> O, HW -> H
    assert by_name["O"].n_particles == 4
    assert by_name["H"].n_particles == 8
    assert {p.name for p in by_name["O"].properties} == {
        "Positions", "Velocities",
    }
    chunks = list(reader.get_configurations_generator())
    assert [c.chunk_size for c in chunks] == [2, 1]
    got_o = np.concatenate(
        [c.get_data("O", "Positions") for c in chunks], axis=0
    )
    # nm -> Angstrom, fixed-width %8.3f round-trips to 1e-3 nm
    o_rows = [3 * m for m in range(4)]
    np.testing.assert_allclose(got_o, pos[:, o_rows] * 10.0, atol=1e-2)
    got_v = np.concatenate(
        [c.get_data("H", "Velocities") for c in chunks], axis=0
    )
    h_rows = [a for a in range(12) if a % 3]
    np.testing.assert_allclose(got_v, vels[:, h_rows] * 10.0, atol=1e-3)


def test_gro_ingestion_end_to_end(tmp_path, rng):
    """GROMACS water workflow without chemfiles: ingest -> store -> RDF."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.file_io import GROFile

    path = tmp_path / "w.gro"
    _write_gro(path, n_mol=6, n_frames=4, vel=False, rng=rng)
    project = latpu.Project(name="p", storage_path=tmp_path)
    exp = project.add_experiment(
        "w", timestep=0.002, temperature=300.0, units="real",
        simulation_data=GROFile(path),
    )
    assert exp.number_of_configurations == 4
    assert exp.species["O"].n_particles == 6
    res = exp.run.RadialDistributionFunction(
        number_of_configurations=2, number_of_bins=20, plot=False
    )
    assert len(res["O_O"]["y"]) == 20
