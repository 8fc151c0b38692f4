"""Minimal SMILES composition parser.

Replaces the reference's pysmiles dependency (not in this image; used at
``molecular_graph.py:345-371`` to build a reference graph) for the one thing
molecule mapping needs from a SMILES string: the element composition. The
parser handles bracket atoms (``[H]``, ``[Na+]``), the organic subset
(B, C, N, O, P, S, F, Cl, Br, I), branches, ring-bond digits, and implicit
hydrogens on organic-subset atoms via standard valences.
"""

from __future__ import annotations

import re
from typing import Dict

_ORGANIC = {"B": 3, "C": 4, "N": 3, "O": 2, "P": 3, "S": 2,
            "F": 1, "Cl": 1, "Br": 1, "I": 1}
_BOND_ORDER = {"-": 1, "=": 2, "#": 3, "$": 4, ":": 1, "/": 1, "\\": 1}

_TOKEN = re.compile(
    r"\[(?P<bracket>[^\]]+)\]"
    r"|(?P<organic>Cl|Br|B|C|N|O|P|S|F|I)"
    r"|(?P<aromatic>b|c|n|o|p|s)"
    r"|(?P<bond>[-=#$:/\\])"
    r"|(?P<branch>[()])"
    r"|(?P<ring>%\d{2}|\d)"
    r"|(?P<dot>\.)"
)

_BRACKET = re.compile(
    r"^(?P<isotope>\d+)?(?P<element>[A-Z][a-z]?|[a-z])"
    r"(?P<chiral>@{1,2})?(?P<hcount>H\d*)?(?P<charge>[+-]+\d*)?"
    r"(?P<class>:\d+)?$"
)


def smiles_composition(smiles: str) -> Dict[str, int]:
    """Element -> count for a SMILES string, including implicit hydrogens."""
    counts: Dict[str, int] = {}
    # track bond orders touching each organic atom for implicit-H counting
    open_atoms = []  # (element, explicit_valence_used) for organic atoms
    prev_atom = None  # index into atom list
    pending_bond = 1
    stack = []
    atoms = []  # list of [element, bonds_order_sum, organic?]
    ring_openings: Dict[str, tuple] = {}

    def add_bond(a, b, order):
        atoms[a][1] += order
        atoms[b][1] += order

    for m in _TOKEN.finditer(smiles):
        kind = m.lastgroup
        text = m.group()
        if kind == "bracket":
            bm = _BRACKET.match(m.group("bracket"))
            if not bm:
                raise ValueError(f"Cannot parse SMILES bracket atom {text!r}")
            element = bm.group("element").capitalize()
            counts[element] = counts.get(element, 0) + 1
            h = bm.group("hcount")
            if h:
                n_h = int(h[1:]) if len(h) > 1 else 1
                counts["H"] = counts.get("H", 0) + n_h
            atoms.append([element, 0, False])
            if prev_atom is not None:
                add_bond(prev_atom, len(atoms) - 1, pending_bond)
            prev_atom = len(atoms) - 1
            pending_bond = 1
        elif kind in ("organic", "aromatic"):
            element = text.capitalize() if kind == "aromatic" else text
            counts[element] = counts.get(element, 0) + 1
            # aromatic atoms carry one delocalised bond beyond their two
            # explicit ring bonds; charge it to the valence up front
            atoms.append([element, 1 if kind == "aromatic" else 0, True])
            if prev_atom is not None:
                add_bond(prev_atom, len(atoms) - 1, pending_bond)
            prev_atom = len(atoms) - 1
            pending_bond = 1
        elif kind == "bond":
            pending_bond = _BOND_ORDER[text]
        elif kind == "branch":
            if text == "(":
                stack.append(prev_atom)
            else:
                prev_atom = stack.pop()
        elif kind == "ring":
            key = text
            if key in ring_openings:
                other, order = ring_openings.pop(key)
                add_bond(prev_atom, other, max(order, pending_bond))
            else:
                ring_openings[key] = (prev_atom, pending_bond)
            pending_bond = 1
        elif kind == "dot":
            prev_atom = None
            pending_bond = 1

    # implicit hydrogens on organic-subset atoms
    for element, used, organic in atoms:
        if organic and element in _ORGANIC:
            missing = _ORGANIC[element] - used
            if missing > 0:
                counts["H"] = counts.get("H", 0) + missing
    return counts
