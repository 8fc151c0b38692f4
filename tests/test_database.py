"""Unit tests for the trajectory store and results DB.

Models the reference's database unit tests
(``CI/unit_tests/database/test_simulation_database.py``).
"""

import numpy as np
import pytest

from lammps_analysis_tpu.database import (
    PropertyInfo,
    ResultsDatabase,
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
    TrajectoryStore,
    join_path,
)

POS = PropertyInfo("Positions", 3)
VEL = PropertyInfo("Velocities", 3)


def _metadata(n_configs=10, n_na=4, n_cl=3):
    species = [
        SpeciesInfo("Na", n_na, [POS, VEL]),
        SpeciesInfo("Cl", n_cl, [POS]),
    ]
    return TrajectoryMetadata(
        n_configurations=n_configs,
        species_list=species,
        box_l=[10.0, 10.0, 10.0],
        sample_rate=5,
        temperature=300.0,
    )


def test_store_create_and_shapes(tmp_path):
    store = TrajectoryStore(tmp_path / "db.h5")
    store.initialize(_metadata())
    assert store.check_existence("Na/Positions")
    assert store.check_existence("Na/Velocities")
    assert store.check_existence("Cl/Positions")
    assert not store.check_existence("Cl/Velocities")
    assert store.get_data_size("Na/Positions") == (10, 4, 3)
    assert store.get_data_size("Cl/Positions") == (10, 3, 3)


def test_store_chunked_append_and_load(tmp_path, rng):
    meta = _metadata(n_configs=10)
    store = TrajectoryStore(tmp_path / "db.h5")
    store.initialize(meta)
    full = {
        ("Na", "Positions"): rng.normal(size=(10, 4, 3)),
        ("Na", "Velocities"): rng.normal(size=(10, 4, 3)),
        ("Cl", "Positions"): rng.normal(size=(10, 3, 3)),
    }
    for start in (0, 6):  # two unequal chunks
        size = 6 if start == 0 else 4
        chunk = TrajectoryChunkData(meta.species_list, size)
        for (sp, prop), arr in full.items():
            chunk.add_data(arr[start : start + size], 0, sp, prop)
        store.add_chunk(chunk)

    out = store.load(["Na/Positions", "Cl/Positions"])
    np.testing.assert_allclose(out["Na/Positions"], full[("Na", "Positions")])
    np.testing.assert_allclose(out["Cl/Positions"], full[("Cl", "Positions")])

    # frame index selection (sampled configurations)
    idx = np.array([1, 4, 7])
    out = store.load(["Na/Velocities"], frames=idx)
    np.testing.assert_allclose(out["Na/Velocities"], full[("Na", "Velocities")][idx])

    # slice + atom selection + scaling
    out = store.load(
        ["Na/Positions"], frames=slice(2, 5), atoms=np.array([0, 2]),
        scaling={"Na/Positions": 2.0},
    )
    np.testing.assert_allclose(
        out["Na/Positions"], 2.0 * full[("Na", "Positions")][2:5][:, [0, 2]]
    )


def test_store_resize_and_cursor(tmp_path):
    meta = _metadata(n_configs=5)
    store = TrajectoryStore(tmp_path / "db.h5")
    store.initialize(meta)
    assert store.get_cursor("Na/Positions") == 0
    chunk = TrajectoryChunkData(meta.species_list, 5)
    store.add_chunk(chunk)
    assert store.get_cursor("Na/Positions") == 5
    store.resize_datasets({"Na/Positions": 3})
    assert store.get_data_size("Na/Positions") == (8, 4, 3)
    # appending past the end autoresizes
    store.add_chunk(TrajectoryChunkData(meta.species_list, 5))
    assert store.get_data_size("Na/Positions")[0] >= 10


def test_results_db_cache_roundtrip(tmp_path):
    db = ResultsDatabase(tmp_path / "project.db")
    args = {"data_range": 100, "species": ["Na"], "tau_values": [0, 1, 2]}
    assert db.find_computation("exp1", "RDF", args, 0) is None
    db.store_computation(
        "exp1", "RDF", args, 0, {"Na_Na": {"x": [1, 2], "y": [0.5, 0.7]}}
    )
    comp = db.find_computation("exp1", "RDF", args, 0)
    assert comp is not None
    assert comp["Na_Na"]["y"] == [0.5, 0.7]
    assert comp[("Na", "Na")]["x"] == [1, 2]
    # different args -> miss; different version -> miss
    assert db.find_computation("exp1", "RDF", {**args, "data_range": 50}, 0) is None
    assert db.find_computation("exp1", "RDF", args, 1) is None


def test_results_db_version_bump_invalidates(tmp_path):
    db = ResultsDatabase(tmp_path / "project.db")
    db.ensure_experiment("e")
    assert db.experiment_version("e") == 0
    db.store_computation("e", "calc", {"a": 1}, 0, {"System": {"v": 1}})
    assert db.bump_experiment_version("e") == 1
    assert db.find_computation("e", "calc", {"a": 1}, db.experiment_version("e")) is None


def test_experiment_attributes(tmp_path):
    db = ResultsDatabase(tmp_path / "project.db")
    db.set_attribute("e1", "temperature", 1400.0)
    db.set_attribute("e1", "box_array", [10.0, 11.0, 12.0])
    db.set_attribute(
        "e1", "species",
        {"Na": {"n_particles": 500, "mass": 22.99, "charge": 1.0}},
    )
    assert db.get_attribute("e1", "temperature") == 1400.0
    assert db.get_attribute("e1", "box_array") == [10.0, 11.0, 12.0]
    assert db.get_attribute("e1", "species")["Na"]["n_particles"] == 500
    assert db.get_attribute("e1", "missing", default=7) == 7
    assert db.list_experiments() == ["e1"]


def test_chunk_equality(rng):
    sp = [SpeciesInfo("X", 2, [POS])]
    a = TrajectoryChunkData(sp, 3)
    b = TrajectoryChunkData(sp, 3)
    data = rng.normal(size=(3, 2, 3))
    a.add_data(data, 0, "X", "Positions")
    b.add_data(data, 0, "X", "Positions")
    assert a == b
    b.add_data(data + 1, 0, "X", "Positions")
    assert a != b


def test_store_concurrent_read_write(tmp_path, rng):
    """Prefetch-thread reads must not race main-thread appends.

    Regression: h5py refuses to open one file read-only and read-write at
    once, so an un-serialized background ``load`` racing ``add_chunk``
    crashed long streamed runs with "file is already open for read-only".
    The store now serializes all its opens on an internal lock.
    """
    import threading

    meta = _metadata(n_configs=400)
    store = TrajectoryStore(tmp_path / "db.h5")
    store.initialize(meta)
    errors = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                store.load(["Na/Positions"], frames=slice(0, 50))
                store.get_cursor("Na/Positions")
        except Exception as err:  # pragma: no cover - the regression
            errors.append(err)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for start in range(0, 400, 10):
            chunk = TrajectoryChunkData(meta.species_list, 10)
            chunk.add_data(rng.normal(size=(10, 4, 3)), 0, "Na", "Positions")
            chunk.add_data(rng.normal(size=(10, 4, 3)), 0, "Na", "Velocities")
            chunk.add_data(rng.normal(size=(10, 3, 3)), 0, "Cl", "Positions")
            store.add_chunk(chunk)
    finally:
        stop.set()
        t.join()
    assert not errors, errors
    assert store.get_cursor("Na/Positions") == 400


def test_store_dtype_follows_config(tmp_path, rng):
    """Explicit f32 stores persist and load f32 (halved I/O for streamed
    calculators); the default under the x64 test config stays f64."""
    meta = _metadata(n_configs=4)
    s32 = TrajectoryStore(tmp_path / "f32.h5", dtype="float32")
    s32.initialize(meta)
    chunk = TrajectoryChunkData(meta.species_list, 4)
    chunk.add_data(rng.normal(size=(4, 4, 3)), 0, "Na", "Positions")
    chunk.add_data(rng.normal(size=(4, 4, 3)), 0, "Na", "Velocities")
    chunk.add_data(rng.normal(size=(4, 3, 3)), 0, "Cl", "Positions")
    s32.add_chunk(chunk)
    out = s32.load(["Na/Positions"])["Na/Positions"]
    assert out.dtype == np.float32
    # explicit dtype request still upcasts
    out64 = s32.load(["Na/Positions"], dtype=np.float64)["Na/Positions"]
    assert out64.dtype == np.float64

    sdef = TrajectoryStore(tmp_path / "def.h5")
    sdef.initialize(meta)
    out = sdef.load(["Na/Positions"])["Na/Positions"]
    assert out.dtype == np.float64  # conftest enables x64


def test_store_drop_dataset(tmp_path):
    """drop() removes a dataset; later recompute recreates it."""
    from lammps_analysis_tpu.database.contracts import (
        SpeciesInfo,
        TrajectoryChunkData,
        TrajectoryMetadata,
    )
    from lammps_analysis_tpu.database.properties import PropertyInfo
    from lammps_analysis_tpu.database.trajectory_store import TrajectoryStore

    props = [PropertyInfo("Positions", 3)]
    sp = [SpeciesInfo("X", 4, props)]
    meta = TrajectoryMetadata(
        n_configurations=3, species_list=sp, box_l=[5.0] * 3, sample_rate=1
    )
    store = TrajectoryStore(tmp_path / "db.h5")
    store.initialize(meta)
    chunk = TrajectoryChunkData(sp, 3)
    chunk.add_data(np.zeros((3, 4, 3)), 0, "X", "Positions")
    store.add_chunk(chunk)
    assert store.check_existence("X/Positions")
    assert store.drop("X/Positions") is True
    assert not store.check_existence("X/Positions")
    assert store.drop("X/Positions") is False  # idempotent


def test_results_db_delete_computations(tmp_path):
    """delete_computations() invalidates the cache (exact args or all)."""
    from lammps_analysis_tpu.database.results_db import ResultsDatabase

    db = ResultsDatabase(tmp_path / "p.db")
    a1, a2 = {"x": 1}, {"x": 2}
    db.store_computation("e", "Calc", a1, 1, {"s": {"v": 1}})
    db.store_computation("e", "Calc", a2, 1, {"s": {"v": 2}})
    assert db.find_computation("e", "Calc", a1, 1) is not None
    assert db.delete_computations("e", "Calc", a1) == 1
    assert db.find_computation("e", "Calc", a1, 1) is None
    assert db.find_computation("e", "Calc", a2, 1) is not None
    assert db.delete_computations("e", "Calc") == 1  # remaining a2
    assert db.find_computation("e", "Calc", a2, 1) is None
