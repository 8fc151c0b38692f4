"""Molecule mapping tests: detection, COM reduction, molecular calculators.

Models the reference's molecular-mapping validation
(``CI/integration_tests/transformations/test_molecular_mapping_results.py``)
with synthetic rigid water trimers performing a random walk.
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
from lammps_analysis_tpu.graph.smiles import smiles_composition

POSITIONS = PropertyInfo("Positions", 3)


def make_water_experiment(tmp_path, rng, n_mol=8, n_frames=60, box=12.0,
                          step_std=0.05):
    """Rigid H2O trimers whose centers random-walk; returns exp + true COMs."""
    bond, angle = 0.95, np.deg2rad(104.5)
    masses = {"O": 15.999, "H": 1.008}
    centers0 = rng.uniform(2, box - 2, size=(n_mol, 3))
    walk = np.cumsum(
        rng.normal(scale=step_std, size=(n_frames, n_mol, 3)), axis=0
    )
    centers = centers0[None] + walk  # (T, M, 3) unwrapped O positions

    o_pos = centers
    v1 = np.array([np.sin(angle / 2), np.cos(angle / 2), 0.0]) * bond
    v2 = np.array([-np.sin(angle / 2), np.cos(angle / 2), 0.0]) * bond
    h1 = centers + v1
    h2 = centers + v2

    # true COM
    m_tot = masses["O"] + 2 * masses["H"]
    com_true = (
        masses["O"] * o_pos + masses["H"] * h1 + masses["H"] * h2
    ) / m_tot

    h_pos = np.concatenate([h1, h2], axis=1)  # (T, 2M, 3)
    sp = [
        SpeciesInfo("H", 2 * n_mol, [POSITIONS]),
        SpeciesInfo("O", n_mol, [POSITIONS]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    # store wrapped positions to exercise the auto-unwrap path
    chunk.add_data(h_pos - box * np.floor(h_pos / box), 0, "H", "Positions")
    chunk.add_data(o_pos - box * np.floor(o_pos / box), 0, "O", "Positions")

    project = latpu.Project(name="proj", storage_path=tmp_path)
    exp = project.add_experiment(
        "water", timestep=0.1, temperature=300.0, units="real",
        simulation_data=ScriptInput(chunk, meta, "water_data"),
    )
    return exp, com_true


def test_molecule_detection_and_com(tmp_path, rng):
    exp, com_true = make_water_experiment(tmp_path, rng)
    exp.run.MolecularMap(
        molecules=[
            latpu.Molecule(
                name="water", smiles="[H]O[H]", amount=8, cutoff=1.2
            )
        ]
    )
    assert "water" in exp.molecules
    mol = exp.molecules["water"]
    assert mol["n_particles"] == 8
    assert mol["composition"] == {"H": 2, "O": 1}
    assert len(mol["groups"]) == 8

    # COM trajectories must match the analytic COM up to molecule ordering
    # and a global unwrapping offset (integer box multiples per molecule)
    com = exp.load_matrix("Unwrapped_Positions", ["water"])["water"]
    assert com.shape == (60, 8, 3)
    deltas = com[:, :, None, :] - com_true[:, None, :, :]  # (T, M, M, 3)
    # displacement differences must vanish for the matched pairing
    disp = deltas - deltas[0:1]
    match_err = np.abs(disp).max(axis=(0, 3))  # (M, M)
    row_best = match_err.min(axis=1)
    assert row_best.max() < 1e-8

    # wrapped molecular positions exist for structural calculators
    assert exp.store.check_existence("water/Positions")


def test_molecular_diffusion_and_rdf(tmp_path, rng):
    exp, _ = make_water_experiment(tmp_path, rng, n_frames=500, n_mol=16)
    exp.run.MolecularMap(
        molecules=[
            latpu.Molecule(
                name="water", species_dict={"O": 1, "H": 2}, amount=16,
                cutoff=1.2,
            )
        ]
    )
    res = exp.run.EinsteinDiffusionCoefficients(
        data_range=50, correlation_time=10, molecules=True, plot=False
    )
    d = res["water"]["diffusion_coefficient"]
    # random-walk COM diffusion: step_std^2/(2 dt); real units: A^2/fs
    expected = 0.05**2 / (2 * 0.1) * 1e-20 / 1e-15
    assert abs(d - expected) / expected < 0.25

    rdf = exp.run.RadialDistributionFunction(
        molecules=True, number_of_configurations=50, plot=False
    )
    g = np.asarray(rdf["water_water"]["y"])
    assert np.isfinite(g).all()


def test_mapping_idempotent(tmp_path, rng):
    exp, _ = make_water_experiment(tmp_path, rng, n_frames=30)
    mol = [latpu.Molecule(name="water", species_dict={"O": 1, "H": 2},
                          amount=8, cutoff=1.2)]
    exp.run.MolecularMap(molecules=mol)
    cursor = exp.store.get_cursor("water/Unwrapped_Positions")
    exp.run.MolecularMap(molecules=mol)  # second run must be a no-op
    assert exp.store.get_cursor("water/Unwrapped_Positions") == cursor


def test_smiles_compositions():
    assert smiles_composition("[H]O[H]") == {"H": 2, "O": 1}
    assert smiles_composition("O") == {"O": 1, "H": 2}
    assert smiles_composition("C(=O)=O") == {"C": 1, "O": 2}
    assert smiles_composition("CCO") == {"C": 2, "O": 1, "H": 6}
    assert smiles_composition("c1ccccc1") == {"C": 6, "H": 6}
    assert smiles_composition("[Na+].[Cl-]") == {"Na": 1, "Cl": 1}


def test_bad_molecule_spec(tmp_path, rng):
    exp, _ = make_water_experiment(tmp_path, rng, n_frames=10)
    with pytest.raises(ValueError, match="needs species"):
        exp.run.MolecularMap(
            molecules=[
                latpu.Molecule(name="salt", species_dict={"Na": 1, "Cl": 1},
                               cutoff=2.0)
            ]
        )
    with pytest.raises(ValueError, match="No molecules matching"):
        exp.run.MolecularMap(
            molecules=[
                latpu.Molecule(name="dimer", species_dict={"O": 2},
                               cutoff=0.1)
            ]
        )


def test_smiles_graph():
    from lammps_analysis_tpu.graph.smiles import smiles_graph

    water = smiles_graph("O")
    assert water.number_of_nodes() == 3 and water.number_of_edges() == 2
    elems = sorted(d["element"] for _, d in water.nodes(data=True))
    assert elems == ["H", "H", "O"]
    # the degree-2 node must be the oxygen (H-O-H)
    center = [n for n in water if water.degree(n) == 2]
    assert [water.nodes[n]["element"] for n in center] == ["O"]

    ethanol = smiles_graph("CCO")  # C2H6O
    assert ethanol.number_of_nodes() == 9
    assert ethanol.number_of_edges() == 8


def test_isomorphism_distinguishes_same_composition():
    """Two H2O-composition clusters with different bonding must differ.

    The reference's adjacency-isomorphism test is NotImplementedError
    upstream (``molecular_graph.py:287-300``); this build implements it.
    """
    import numpy as np

    from lammps_analysis_tpu.graph.molecular_graph import (
        build_adjacency,
        cluster_graph,
        find_molecules,
        is_isomorphic_to_reference,
    )
    from lammps_analysis_tpu.graph.smiles import smiles_graph

    # cluster A: bent water H-O-H; cluster B: linear chain H-H-O
    pos = np.array([
        [0.0, 0.0, 0.0],     # O (A)
        [0.95, 0.0, 0.0],    # H (A) bonded to O
        [-0.3, 0.9, 0.0],    # H (A) bonded to O, far from other H
        [10.0, 0.0, 0.0],    # H (B)
        [10.95, 0.0, 0.0],   # H (B) bonded to previous H
        [11.9, 0.0, 0.0],    # O (B) bonded to second H only
    ])
    species = ["O", "H", "H", "H", "H", "O"]
    adj = build_adjacency(pos, None, cutoff=1.2)
    mols, ids = find_molecules(adj, species, return_atom_ids=True)
    assert len(mols) == 2
    ref = smiles_graph("O")
    verdicts = {}
    for mol, atom_ids in zip(mols, ids):
        g = cluster_graph(adj, atom_ids, species)
        verdicts[min(atom_ids)] = is_isomorphic_to_reference(g, ref)
    assert verdicts[0] is True    # bent water matches
    assert verdicts[3] is False   # H-H-O chain rejected


def test_isomorphism_accepts_real_water_triangle():
    """Proximity edges beyond the chemical bonds must not reject a cluster.

    Real water: O-H ~0.96 A and H-H ~1.51 A — BOTH inside the 1.7 A
    detection cutoff, so the distance graph of every genuine water
    molecule is a triangle while the SMILES graph is the H-O-H path. The
    validation is bond-monomorphism (all SMILES bonds present), not strict
    edge equality.
    """
    import numpy as np

    from lammps_analysis_tpu.graph.molecular_graph import (
        build_adjacency,
        cluster_graph,
        find_molecules,
        is_isomorphic_to_reference,
    )
    from lammps_analysis_tpu.graph.smiles import smiles_graph

    pos = np.array([
        [0.0, 0.0, 0.0],      # O
        [0.96, 0.0, 0.0],     # H
        [-0.24, 0.93, 0.0],   # H  (H-H distance ~1.52 A)
    ])
    species = ["O", "H", "H"]
    adj = build_adjacency(pos, None, cutoff=1.7)
    mols, ids = find_molecules(adj, species, return_atom_ids=True)
    assert len(mols) == 1
    g = cluster_graph(adj, ids[0], species)
    assert g.number_of_edges() == 3  # the triangle, incl. the H-H edge
    assert is_isomorphic_to_reference(g, smiles_graph("[H]O[H]")) is True
    # but a missing required bond still rejects: drop one O-H edge
    g2 = g.copy()
    o_node = [n for n in g2.nodes if g2.nodes[n]["element"] == "O"][0]
    h_node = [n for n in g2.nodes if g2.nodes[n]["element"] == "H"][0]
    g2.remove_edge(o_node, h_node)
    assert is_isomorphic_to_reference(g2, smiles_graph("[H]O[H]")) is False


def test_mapping_rejects_misbonded_cluster(tmp_path, rng):
    """End-to-end: MolecularMap drops a same-composition mis-bonded cluster."""
    box, n_frames = 20.0, 4
    # one real water + one H-H-O chain, both composition H2O
    o_pos = np.array([[2.0, 2.0, 2.0], [12.9, 2.0, 2.0]])
    h_pos = np.array([
        [2.95, 2.0, 2.0], [1.7, 2.9, 2.0],   # bonded to O[0]
        [11.0, 2.0, 2.0], [11.95, 2.0, 2.0],  # chain: H-H then H-O
    ])
    sp = [
        SpeciesInfo("H", 4, [POSITIONS]),
        SpeciesInfo("O", 2, [POSITIONS]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(np.repeat(h_pos[None], n_frames, 0), 0, "H", "Positions")
    chunk.add_data(np.repeat(o_pos[None], n_frames, 0), 0, "O", "Positions")
    project = latpu.Project(name="iso", storage_path=tmp_path)
    exp = project.add_experiment(
        "e", timestep=0.1, temperature=300.0, units="real",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    exp.run.MolecularMap(molecules=[
        latpu.Molecule(name="water", smiles="O", amount=1, cutoff=1.2)
    ])
    water = exp.molecules["water"]
    assert water["n_particles"] == 1  # the chain cluster was rejected


def test_mapping_unwrapped_only_store_and_bonded_cutoff(tmp_path, rng):
    """Regression: (a) a store holding ONLY Unwrapped_Positions maps fine
    (group detection falls back to unwrapped coords under minimum image);
    (b) a cutoff that also captures the intramolecular H-H pair (1.7 A on
    real water geometry) still accepts every molecule (bond monomorphism,
    not strict edge equality)."""
    UNW = PropertyInfo("Unwrapped_Positions", 3)
    n_mol, n_frames, box = 6, 20, 12.0
    bond, angle = 0.96, np.deg2rad(104.5)
    # well-separated grid centers: detection merges clusters within the
    # cutoff (correct behavior), which random placement can trigger
    grid = np.array(
        [[2.5 + 4.0 * (i % 3), 3.0 + 5.0 * (i // 3), 3.0] for i in range(n_mol)]
    )
    centers = grid[None] + np.cumsum(
        rng.normal(scale=0.03, size=(n_frames, n_mol, 3)), axis=0
    )
    v1 = np.array([np.sin(angle / 2), np.cos(angle / 2), 0.0]) * bond
    v2 = np.array([-np.sin(angle / 2), np.cos(angle / 2), 0.0]) * bond
    sp = [
        SpeciesInfo("O", n_mol, [UNW]),
        SpeciesInfo("H", 2 * n_mol, [UNW]),
    ]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(centers, 0, "O", "Unwrapped_Positions")
    chunk.add_data(
        np.concatenate([centers + v1, centers + v2], axis=1), 0,
        "H", "Unwrapped_Positions",
    )
    project = latpu.Project(name="unw", storage_path=tmp_path)
    exp = project.add_experiment(
        "w", timestep=0.1, temperature=300.0, units="real",
        simulation_data=ScriptInput(chunk, meta, "w0"),
    )
    # H-H distance ~1.52 A < 1.7: every cluster graph is a triangle
    exp.run.MolecularMap(
        molecules=[
            latpu.Molecule(name="water", smiles="[H]O[H]", amount=n_mol,
                           cutoff=1.7)
        ]
    )
    assert exp.molecules["water"]["n_particles"] == n_mol
    com = exp.load_matrix("Unwrapped_Positions", ["water"])["water"]
    assert com.shape == (n_frames, n_mol, 3)
