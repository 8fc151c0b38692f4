"""Molecular graph detection: cutoff adjacency -> connected components.

Re-design of ``mdsuite/graph_modules/molecular_graph.py:49-433``. The
reference builds the adjacency from a TF distance matrix, then decomposes
the graph with an O(N^2) Python BFS and checks isomorphism via networkx
against a pysmiles-built reference graph. Here:

* the adjacency comes from the same minimum-image distance criterion
  (JAX kernel, chunked);
* decomposition uses ``scipy.sparse.csgraph.connected_components`` — exact
  and O(N + E);
* molecule identification uses composition (exact per-species atom
  counts) as a fast pre-filter, then a full bond-graph isomorphism check
  (networkx VF2 with categorical element matching) against the
  SMILES-derived reference graph
  (:func:`lammps_analysis_tpu.graph.smiles.smiles_graph`) — so isomers or
  accidental clusters with the right atom counts but the wrong bonding are
  rejected. This goes beyond the reference, whose adjacency-graph
  isomorphism test raises ``NotImplementedError``
  (``molecular_graph.py:287-300``); its shipped checks are count +
  composition only (``:227-285``).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import connected_components

from ..ops.geometry import minimum_image

log = logging.getLogger(__name__)


def build_adjacency(
    positions: np.ndarray,
    box: np.ndarray | None,
    cutoff: float,
    chunk: int = 512,
) -> csr_matrix:
    """Sparse adjacency: pairs closer than ``cutoff`` under minimum image.

    ``positions`` is one configuration ``(N, 3)``; the pair scan runs in
    row chunks so the dense block never exceeds ``chunk x N``.
    """
    n = positions.shape[0]
    pos = jnp.asarray(positions)
    box_j = jnp.asarray(box) if box is not None else None
    rows, cols = [], []
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        r = pos[start:stop, None, :] - pos[None, :, :]
        if box_j is not None:
            r = minimum_image(r, box_j)
        d2 = np.asarray(jnp.sum(r * r, axis=-1))
        block_rows, block_cols = np.nonzero(
            (d2 < cutoff * cutoff) & (d2 > 0)
        )
        rows.append(block_rows + start)
        cols.append(block_cols)
    rows = np.concatenate(rows) if rows else np.array([], dtype=int)
    cols = np.concatenate(cols) if cols else np.array([], dtype=int)
    data = np.ones(len(rows), dtype=np.int8)
    return csr_matrix((data, (rows, cols)), shape=(n, n))


def find_molecules(
    adjacency: csr_matrix,
    species_of_atom: Sequence[str],
    return_atom_ids: bool = False,
):
    """Decompose the graph into per-molecule ``{species: [atom indices]}``.

    Atom indices are per-species (the index within that species' dataset),
    matching the reference's group bookkeeping
    (``molecular_graph.py:170-225`` + ``map_molecules.py``). With
    ``return_atom_ids`` also returns, per molecule, the GLOBAL atom indices
    into the concatenated layout (needed for bond-graph isomorphism).
    """
    n_components, labels = connected_components(adjacency, directed=False)
    species_of_atom = list(species_of_atom)
    # per-species running index of each atom in the global concatenation
    per_species_index = {}
    counters: Dict[str, int] = {}
    for i, sp in enumerate(species_of_atom):
        per_species_index[i] = counters.get(sp, 0)
        counters[sp] = per_species_index[i] + 1

    molecules: List[Dict[str, List[int]]] = [
        {} for _ in range(n_components)
    ]
    atom_ids: List[List[int]] = [[] for _ in range(n_components)]
    for atom, label in enumerate(labels):
        sp = species_of_atom[atom]
        molecules[label].setdefault(sp, []).append(per_species_index[atom])
        atom_ids[label].append(atom)
    if return_atom_ids:
        return molecules, atom_ids
    return molecules


def cluster_graph(
    adjacency: csr_matrix,
    atom_ids: Sequence[int],
    species_of_atom: Sequence[str],
):
    """Bond graph of one candidate cluster as a networkx Graph.

    Nodes are local indices with an ``element`` attribute (the species
    name); edges are the within-cutoff adjacency restricted to the cluster.
    """
    import networkx as nx

    atom_ids = np.asarray(atom_ids)
    sub = adjacency[atom_ids][:, atom_ids]
    g = nx.from_scipy_sparse_array(sub)
    for local, a in enumerate(atom_ids):
        g.nodes[local]["element"] = species_of_atom[a]
    return g


def is_isomorphic_to_reference(graph, reference_graph) -> bool:
    """Element-labelled bond-graph validation (networkx VF2 monomorphism).

    The capability the reference intends via pysmiles + networkx
    (``molecular_graph.py:287-300``, unimplemented upstream): under an
    element-preserving bijection of the atoms, every bond of the
    SMILES-derived reference graph must exist in the candidate cluster's
    distance-cutoff graph. MONOmorphism, not full isomorphism, because the
    cutoff graph legitimately contains extra proximity edges the chemical
    graph lacks — real water's H-H separation (~1.51 A) is inside the
    1.7 A O-H cutoff, so every genuine water cluster is a triangle and
    strict edge-set equality would reject all of them. Extra edges are
    allowed; missing bonds (isomers, accidental same-composition clusters)
    still reject.
    """
    from networkx.algorithms import isomorphism

    if graph.number_of_nodes() != reference_graph.number_of_nodes():
        return False
    matcher = isomorphism.GraphMatcher(
        graph,
        reference_graph,
        node_match=isomorphism.categorical_node_match("element", None),
    )
    # equal node counts + element node_match make the mapping a bijection,
    # so "subgraph" monomorphism degenerates to: all reference bonds exist
    return matcher.subgraph_is_monomorphic()


def composition_of(group: Dict[str, List[int]]) -> Tuple[Tuple[str, int], ...]:
    """Canonical composition key of a molecule group."""
    return tuple(sorted((sp, len(idx)) for sp, idx in group.items()))


def group_molecules_by_composition(
    molecules: List[Dict[str, List[int]]]
) -> Dict[Tuple[Tuple[str, int], ...], List[Dict[str, List[int]]]]:
    out: Dict[Tuple[Tuple[str, int], ...], List[Dict[str, List[int]]]] = {}
    for mol in molecules:
        out.setdefault(composition_of(mol), []).append(mol)
    return out
