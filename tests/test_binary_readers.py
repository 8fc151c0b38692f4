"""DCD / TRR binary readers vs spec-literal byte fixtures.

No binary-trajectory library exists in this image (chemfiles, MDAnalysis,
mdtraj, ase all absent — the same fact that forces the native readers),
so the fixtures are built here with explicit ``struct.pack`` calls
straight from the published formats (CHARMM DCD record layout; GROMACS
``xdrfile_trr.c`` XDR wire layout), sharing no code with the readers
under test.
"""

import struct

import numpy as np
import pytest

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.file_io import DCDFile, TRRFile


# ------------------------------------------------------------------ builders
def rec(payload: bytes, bo: str) -> bytes:
    return (
        struct.pack(bo + "i", len(payload))
        + payload
        + struct.pack(bo + "i", len(payload))
    )


def build_dcd(
    pos, box=(12.0, 13.0, 14.0), bo="<", nsavc=5, with_cell=True,
    header_nset=None, fixed_atoms=0, flag_4d=0,
):
    """CHARMM-format DCD: 84-byte CORD header, title, natoms, frames."""
    n_frames, natoms, _ = pos.shape
    nset = n_frames if header_nset is None else header_nset
    hdr = (
        b"CORD"
        + struct.pack(bo + "3i", nset, 0, nsavc)  # icntrl[0:3]
        + struct.pack(bo + "5i", 0, 0, 0, 0, 0)  # icntrl[3:8]
        + struct.pack(bo + "i", fixed_atoms)  # icntrl[8] = NAMNF
        + struct.pack(bo + "f", 0.001)  # icntrl[9] = DELTA (f32, CHARMM)
        + struct.pack(bo + "i", 1 if with_cell else 0)  # icntrl[10]
        + struct.pack(bo + "i", flag_4d)  # icntrl[11]: CHARMM 4D flag
        + struct.pack(bo + "7i", 0, 0, 0, 0, 0, 0, 0)  # icntrl[12:19]
        + struct.pack(bo + "i", 24)  # icntrl[19]: CHARMM version
    )
    assert len(hdr) == 84
    out = [rec(hdr, bo)]
    out.append(rec(struct.pack(bo + "i", 1) + b"built by test".ljust(80), bo))
    out.append(rec(struct.pack(bo + "i", natoms), bo))
    for t in range(n_frames):
        if with_cell:
            xtlabc = (box[0], 0.0, box[1], 0.0, 0.0, box[2])
            out.append(rec(struct.pack(bo + "6d", *xtlabc), bo))
        for d in range(3):
            comp = np.asarray(pos[t, :, d], dtype=np.float32)
            if bo == ">":
                comp = comp.astype(">f4")
            out.append(rec(comp.tobytes(), bo))
    return b"".join(out)


def build_trr(
    x=None, v=None, f=None, box=(1.2, 1.3, 1.4), double=False, steps=None,
    box_matrix=None,
):
    """GROMACS TRR frames (XDR big-endian, xdrfile_trr.c layout)."""
    arrs = [a for a in (x, v, f) if a is not None]
    n_frames, natoms, _ = arrs[0].shape
    fsize = 8 if double else 4
    dt = ">f8" if double else ">f4"
    out = []
    for t in range(n_frames):
        box_size = 9 * fsize if box is not None else 0
        x_size = natoms * 3 * fsize if x is not None else 0
        v_size = natoms * 3 * fsize if v is not None else 0
        f_size = natoms * 3 * fsize if f is not None else 0
        step = t * 10 if steps is None else steps[t]
        hdr = (
            struct.pack(">i", 1993)
            + struct.pack(">i", 13)  # sizeof("GMX_trn_file")
            + struct.pack(">i", 12) + b"GMX_trn_file"  # XDR string
            + struct.pack(
                ">13i", 0, 0, box_size, 0, 0, 0, 0,
                x_size, v_size, f_size, natoms, step, 0,
            )
            + struct.pack(">2d" if double else ">2f", 0.002 * t, 0.0)
        )
        out.append(hdr)
        if box is not None:
            mat = (
                np.asarray(box_matrix, dtype=dt)
                if box_matrix is not None
                else np.diag(box).astype(dt)
            )
            out.append(mat.tobytes())
        for a in (x, v, f):
            if a is not None:
                out.append(np.asarray(a[t], dtype=dt).tobytes())
    return b"".join(out)


# ----------------------------------------------------------------------- DCD
@pytest.mark.parametrize("bo", ["<", ">"])
def test_dcd_roundtrip(tmp_path, rng, bo):
    pos = rng.uniform(0, 12, size=(4, 7, 3))
    path = tmp_path / "t.dcd"
    path.write_bytes(build_dcd(pos, bo=bo))
    reader = DCDFile(path)
    meta = reader.metadata
    assert meta.n_configurations == 4
    assert meta.sample_rate == 5
    np.testing.assert_allclose(meta.box_l, [12.0, 13.0, 14.0])
    chunks = list(reader.get_configurations_generator())
    got = np.concatenate(
        [c.get_data("X", "Positions") for c in chunks], axis=0
    )
    np.testing.assert_array_equal(got, pos.astype(np.float32).astype(np.float64))


def test_dcd_trusts_file_size_over_header(tmp_path, rng):
    pos = rng.uniform(0, 12, size=(3, 5, 3))
    path = tmp_path / "t.dcd"
    path.write_bytes(build_dcd(pos, header_nset=999))
    assert DCDFile(path).metadata.n_configurations == 3


def test_dcd_rejects_fixed_atoms(tmp_path, rng):
    pos = rng.uniform(0, 12, size=(2, 5, 3))
    path = tmp_path / "t.dcd"
    path.write_bytes(build_dcd(pos, fixed_atoms=2))
    with pytest.raises(ValueError, match="fixed-atom"):
        DCDFile(path).metadata


def test_dcd_rejects_charmm_4d(tmp_path, rng):
    """A CHARMM 4D file carries a per-frame 4th coordinate record, so
    frame_bytes would be wrong and frames would silently mis-parse —
    it must fail loudly like the NAMNF check (advisor r3)."""
    pos = rng.uniform(0, 12, size=(2, 5, 3))
    path = tmp_path / "t.dcd"
    path.write_bytes(build_dcd(pos, flag_4d=1))
    with pytest.raises(ValueError, match="4D"):
        DCDFile(path).metadata


def test_dcd_species_map_validation(tmp_path, rng):
    pos = rng.uniform(0, 12, size=(2, 6, 3))
    path = tmp_path / "t.dcd"
    path.write_bytes(build_dcd(pos))
    with pytest.raises(ValueError, match="every atom"):
        DCDFile(path, species={"Na": [0, 1]}).metadata
    with pytest.raises(ValueError, match="overlap"):
        DCDFile(path, species={"Na": [0, 1, 2], "Cl": [2, 3, 4, 5]}).metadata


def test_dcd_ingestion_end_to_end(tmp_path, rng):
    """A real binary file round-trips through add_data (VERDICT r2 #8)."""
    pos = rng.uniform(0, 12, size=(6, 8, 3))
    path = tmp_path / "t.dcd"
    path.write_bytes(build_dcd(pos))
    project = latpu.Project(name="p", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.001, units="real",
        simulation_data=DCDFile(
            path, species={"Na": range(0, 4), "Cl": range(4, 8)}
        ),
    )
    assert exp.number_of_configurations == 6
    na = exp.store.load(["Na/Positions"])["Na/Positions"]
    np.testing.assert_allclose(na, pos[:, :4], atol=1e-4)
    res = exp.run.RadialDistributionFunction(
        number_of_configurations=6, start=0, stop=5, plot=False
    )
    assert np.isfinite(np.array(res["Na_Cl"]["y"])).all()


def test_dcd_suffix_dispatch(tmp_path, rng):
    pos = rng.uniform(0, 12, size=(2, 4, 3))
    path = tmp_path / "t.dcd"
    path.write_bytes(build_dcd(pos))
    project = latpu.Project(name="p", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.001, units="real", simulation_data=str(path)
    )
    assert exp.number_of_configurations == 2
    assert "X" in exp.species


# ----------------------------------------------------------------------- TRR
@pytest.mark.parametrize("double", [False, True])
def test_trr_roundtrip(tmp_path, rng, double):
    x = rng.uniform(0, 1.2, size=(3, 5, 3))
    v = rng.normal(size=(3, 5, 3))
    f = rng.normal(size=(3, 5, 3))
    path = tmp_path / "t.trr"
    path.write_bytes(build_trr(x=x, v=v, f=f, double=double))
    reader = TRRFile(path)
    meta = reader.metadata
    assert meta.n_configurations == 3
    assert meta.sample_rate == 10
    np.testing.assert_allclose(meta.box_l, [12.0, 13.0, 14.0], rtol=1e-6)
    props = {p.name for sp in meta.species_list for p in sp.properties}
    assert props == {"Positions", "Velocities", "Forces"}
    chunks = list(reader.get_configurations_generator())
    cast = np.float64 if double else np.float32
    got_x = np.concatenate([c.get_data("X", "Positions") for c in chunks])
    np.testing.assert_allclose(got_x, x.astype(cast) * 10.0, rtol=1e-6)
    got_v = np.concatenate([c.get_data("X", "Velocities") for c in chunks])
    np.testing.assert_allclose(got_v, v.astype(cast) * 10.0, rtol=1e-6)
    got_f = np.concatenate([c.get_data("X", "Forces") for c in chunks])
    np.testing.assert_allclose(got_f, f.astype(cast) / 10.0, rtol=1e-6)


def test_trr_positions_only(tmp_path, rng):
    x = rng.uniform(0, 1.2, size=(2, 4, 3))
    path = tmp_path / "t.trr"
    path.write_bytes(build_trr(x=x))
    meta = TRRFile(path).metadata
    props = {p.name for sp in meta.species_list for p in sp.properties}
    assert props == {"Positions"}


def test_trr_rejects_triclinic_box(tmp_path, rng):
    """Non-zero off-diagonal box elements must raise instead of being
    silently reduced to the diagonal (advisor r3): downstream
    minimum-image analysis would be skewed."""
    x = rng.uniform(0, 1.2, size=(2, 4, 3))
    tri = [[1.2, 0.0, 0.0], [0.3, 1.3, 0.0], [0.0, 0.1, 1.4]]
    path = tmp_path / "t.trr"
    path.write_bytes(build_trr(x=x, box_matrix=tri))
    with pytest.raises(ValueError, match="triclinic"):
        TRRFile(path).metadata


def test_trr_bad_magic(tmp_path):
    path = tmp_path / "t.trr"
    path.write_bytes(struct.pack(">i", 1234) + b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        TRRFile(path).metadata


def test_trr_ingestion_end_to_end(tmp_path, rng):
    x = np.cumsum(rng.normal(scale=0.01, size=(50, 6, 3)), axis=0) + 0.6
    v = rng.normal(size=(50, 6, 3))
    path = tmp_path / "t.trr"
    path.write_bytes(build_trr(x=x, v=v))
    project = latpu.Project(name="p", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.002, units="si",
        simulation_data=TRRFile(path, species={"O": range(6)}),
    )
    assert exp.number_of_configurations == 50
    stored = exp.store.load(["O/Velocities"])["O/Velocities"]
    np.testing.assert_allclose(
        stored, (v.astype(np.float32) * 10.0), rtol=1e-4, atol=1e-4
    )
    res = exp.run.GreenKuboDiffusionCoefficients(
        data_range=16, correlation_time=8, plot=False
    )
    assert np.isfinite(res["O"]["diffusion_coefficient"][0])
