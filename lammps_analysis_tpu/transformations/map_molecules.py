"""Molecule mapping: atoms -> molecule center-of-mass trajectories.

Re-design of ``mdsuite/transformations/map_molecules.py:43-292`` +
``graph_modules/molecular_graph.py``: detect molecules in a reference
configuration by bond-cutoff connectivity, then reduce each molecule's
constituent atoms to a mass-weighted COM trajectory stored as a new
"species" usable by every calculator (``molecules=True``).

TPU-first formulation of the reduction: the per-frame COM of all molecules
is one matmul ``W @ positions`` where ``W`` is the (n_molecules, n_atoms)
mass-weight matrix — MXU work batched over frames — instead of the
reference's per-molecule gather loop (``map_molecules.py:227-252``).
PBC-safety: the reduction runs on *unwrapped* positions (auto-derived if
absent), where molecule constituents are spatially continuous, so no
per-molecule image fixing is needed; with ``mol_pbc`` the COM trajectory is
wrapped back into the box afterwards (reference ``:284-292``).
"""

from __future__ import annotations

import logging
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.elements import mass_of
from ..database.contracts import SpeciesInfo, TrajectoryChunkData
from ..database.properties import PropertyInfo, mdsuite_properties as mp
from ..database.trajectory_store import join_path
from ..graph.molecular_graph import (
    build_adjacency,
    composition_of,
    find_molecules,
    group_molecules_by_composition,
)
from ..graph.smiles import smiles_composition
from ..ops.geometry import wrap_coordinates
from ..utils.molecule import Molecule

log = logging.getLogger(__name__)


class MolecularMap:
    """Detect molecules and write their COM trajectories into the store."""

    def __init__(self, molecules: List[Molecule] = None):
        self.molecules = molecules or []

    # -- entry point (run dispatcher calls this like any transformation) -----
    def run_transformation(self, experiment, species=None):
        if not self.molecules:
            raise ValueError("MolecularMap needs a list of Molecule definitions")
        for molecule in self.molecules:
            self._map_one(experiment, molecule)

    # ------------------------------------------------------------------ core
    def _composition(self, molecule: Molecule) -> Dict[str, int]:
        if molecule.species_dict:
            return dict(molecule.species_dict)
        if molecule.smiles:
            return smiles_composition(molecule.smiles)
        raise ValueError(
            f"Molecule {molecule.name!r} needs either smiles or species_dict"
        )

    def _map_one(self, experiment, molecule: Molecule):
        out_path = join_path(molecule.name, mp.unwrapped_positions.name)
        if experiment.store.check_existence(out_path):
            done = experiment.store.get_cursor(out_path)
            if done >= experiment.number_of_configurations:
                log.info("molecule %s already mapped; skipping", molecule.name)
                return

        composition = self._composition(molecule)
        species_names = [
            sp for sp in experiment.species
            if sp != "Observables" and sp in composition
        ]
        if sorted(species_names) != sorted(composition):
            missing = set(composition) - set(species_names)
            raise ValueError(
                f"Molecule {molecule.name!r} needs species {sorted(missing)} "
                "that are not in the experiment."
            )

        # ensure unwrapped positions exist for all constituent species
        from .registry import transformation_for_property

        for sp in species_names:
            if not experiment.store.check_existence(
                join_path(sp, mp.unwrapped_positions.name)
            ):
                producer = transformation_for_property(
                    mp.unwrapped_positions.name,
                    experiment=experiment, species=sp,
                )
                if producer is None:
                    raise ValueError(
                        f"Molecule mapping needs Unwrapped_Positions for "
                        f"{sp!r}, and the store holds no coordinate set "
                        "to derive them from."
                    )
                producer.run_transformation(experiment, [sp])

        groups = self._detect_groups(
            experiment, molecule, composition, species_names
        )
        n_mol = len(groups)
        if molecule.amount and n_mol != molecule.amount:
            log.warning(
                "Molecule %s: detected %d molecules, expected %d",
                molecule.name, n_mol, molecule.amount,
            )
        if n_mol == 0:
            raise ValueError(
                f"No molecules matching {molecule.name!r} "
                f"(composition {composition}) found at the reference "
                f"configuration with cutoff {molecule.cutoff}."
            )
        log.info("Molecule %s: %d molecules detected", molecule.name, n_mol)

        self._reduce_com(experiment, molecule, groups, species_names)
        self._register(experiment, molecule, groups, composition, n_mol)

    def _detect_groups(self, experiment, molecule, composition, species_names):
        """Connected components at the reference configuration."""
        ref_idx = molecule.reference_configuration_idx
        parts, species_of_atom = [], []
        for sp in species_names:
            # wrapped positions when stored; otherwise the unwrapped ones
            # (guaranteed present by _map_one) — the adjacency scan applies
            # minimum image either way, and bonded separations are far
            # below half a box, so both give the same bond graph
            path = join_path(sp, mp.positions.name)
            if not experiment.store.check_existence(path):
                path = join_path(sp, mp.unwrapped_positions.name)
            data = experiment.store.load(
                [path], frames=slice(ref_idx, ref_idx + 1)
            )[path]
            parts.append(data[0])
            species_of_atom.extend([sp] * data.shape[1])
        positions = np.concatenate(parts, axis=0)
        box = np.asarray(experiment.box_array)

        adjacency = build_adjacency(positions, box, molecule.cutoff)
        all_molecules, atom_ids = find_molecules(
            adjacency, species_of_atom, return_atom_ids=True
        )
        key = tuple(sorted(composition.items()))
        # composition as a fast pre-filter
        candidates = [
            (mol, ids)
            for mol, ids in zip(all_molecules, atom_ids)
            if composition_of(mol) == key
        ]
        if not molecule.smiles:
            # no reference bonding available (species_dict molecules)
            return [mol for mol, _ in candidates]
        # bond-graph isomorphism against the SMILES-derived reference graph
        # — rejects isomers / accidental clusters with matching counts
        from ..graph.molecular_graph import (
            cluster_graph,
            is_isomorphic_to_reference,
        )
        from ..graph.smiles import smiles_graph

        reference_graph = smiles_graph(molecule.smiles)
        accepted, rejected = [], 0
        for mol, ids in candidates:
            g = cluster_graph(adjacency, ids, species_of_atom)
            if is_isomorphic_to_reference(g, reference_graph):
                accepted.append(mol)
            else:
                rejected += 1
        if rejected:
            log.warning(
                "molecule %s: rejected %d same-composition cluster(s) whose "
                "bond graph is not isomorphic to the SMILES reference",
                molecule.name, rejected,
            )
        return accepted

    def _reduce_com(self, experiment, molecule, groups, species_names):
        """Stream frames; COM = weight-matrix @ PBC-corrected positions."""
        n_mol = len(groups)
        n_configs = experiment.number_of_configurations
        box = jnp.asarray(experiment.box_array)

        # concatenated atom layout across constituent species
        offsets = {}
        off = 0
        for sp in species_names:
            offsets[sp] = off
            off += experiment.species[sp].n_particles
        n_atoms = off

        weights = np.zeros((n_mol, n_atoms))
        for m, group in enumerate(groups):
            total_mass = 0.0
            for sp, indices in group.items():
                mass = experiment.species[sp].mass or mass_of(sp) or 1.0
                for i in indices:
                    weights[m, offsets[sp] + i] = mass
                    total_mass += mass
            weights[m] /= total_mass
        weights_j = jnp.asarray(weights)

        @jax.jit
        def com_batch(pos):  # (T, n_atoms, 3) UNWRAPPED positions
            # unwrapped atom trajectories are continuous, so the molecule
            # COM is a plain mass-weighted matmul over the atom axis.
            # HIGHEST precision: the TPU default silently runs f32 einsums
            # as bf16 passes; dtype follows the inputs (f64 under x64,
            # f32 otherwise — no forced-f64 warning in f32 processes)
            return jnp.einsum(
                "ma,tad->tmd", weights_j, pos,
                precision=jax.lax.Precision.HIGHEST,
            )

        # both the unwrapped COM trajectory (dynamics) and its wrapped image
        # (structural calculators) are stored — reference wraps/unwraps the
        # molecule trajectory after mapping (``map_molecules.py:284-292``)
        self._ensure_dataset(
            experiment, molecule.name, mp.unwrapped_positions.name, n_mol,
            n_configs,
        )
        self._ensure_dataset(
            experiment, molecule.name, mp.positions.name, n_mol, n_configs
        )
        paths = [
            join_path(sp, mp.unwrapped_positions.name) for sp in species_names
        ]
        batch_frames = max(
            1,
            min(
                n_configs,
                int(experiment.planner.budget_bytes // max(n_atoms * 3 * 8 * 6, 1)),
            ),
        )
        start = experiment.store.get_cursor(
            join_path(molecule.name, mp.unwrapped_positions.name)
        )
        prop_unwrapped = PropertyInfo(mp.unwrapped_positions.name, 3)
        prop_wrapped = PropertyInfo(mp.positions.name, 3)
        while start < n_configs:
            stop = min(start + batch_frames, n_configs)
            data = experiment.store.load(paths, frames=slice(start, stop))
            pos = np.concatenate([data[p] for p in paths], axis=1)
            com = np.asarray(com_batch(jnp.asarray(pos)))
            wrapped = np.asarray(wrap_coordinates(jnp.asarray(com), box))
            sp_info = SpeciesInfo(
                molecule.name, n_mol, [prop_unwrapped, prop_wrapped]
            )
            chunk = TrajectoryChunkData([sp_info], stop - start)
            chunk.add_data(com, 0, molecule.name, prop_unwrapped.name)
            chunk.add_data(wrapped, 0, molecule.name, prop_wrapped.name)
            experiment.store.add_chunk(chunk)
            start = stop

    @staticmethod
    def _ensure_dataset(experiment, group, prop_name, n_particles, n_configs):
        experiment.store.ensure_dataset(
            group, prop_name, n_configs, n_particles, 3
        )

    def _register(self, experiment, molecule, groups, composition, n_mol):
        """Record the molecule species + groups in the experiment DB."""
        mol_mass = sum(
            (experiment.species[sp].mass or mass_of(sp)) * count
            for sp, count in composition.items()
        )
        molecules = experiment.molecules
        molecules[molecule.name] = {
            "n_particles": n_mol,
            "mass": mol_mass,
            "composition": composition,
            "cutoff": molecule.cutoff,
            "groups": {
                str(m): {sp: list(idx) for sp, idx in group.items()}
                for m, group in enumerate(groups)
            },
            "properties": [
                {"name": mp.unwrapped_positions.name, "n_dims": 3},
                {"name": mp.positions.name, "n_dims": 3},
            ],
        }
        experiment.molecules = molecules
        experiment.refresh_property_groups()
