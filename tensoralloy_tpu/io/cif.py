"""Minimal CIF reader (P1 cells, as produced by ASE — the form the
reference's crystal fixtures use, `test_files/crystals/*.cif`)."""
from __future__ import annotations

import re
from typing import List

import numpy as np

from ..atoms import Structure
from ..elements import atomic_numbers


def cellpar_to_cell(a, b, c, alpha, beta, gamma) -> np.ndarray:
    """Standard crystallographic cell-parameter -> matrix conversion
    (a along x, b in the xy plane)."""
    alpha, beta, gamma = np.radians([alpha, beta, gamma])
    bx = b * np.cos(gamma)
    by = b * np.sin(gamma)
    cx = c * np.cos(beta)
    cy = c * (np.cos(alpha) - np.cos(beta) * np.cos(gamma)) / np.sin(gamma)
    cz = np.sqrt(max(c * c - cx * cx - cy * cy, 0.0))
    return np.array([[a, 0.0, 0.0], [bx, by, 0.0], [cx, cy, cz]])


def read_cif(path: str) -> Structure:
    with open(path) as fh:
        lines = fh.read().splitlines()

    values = {}
    loops: List[dict] = []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("_"):
            parts = line.split(None, 1)
            if len(parts) == 2:
                values[parts[0]] = parts[1].strip().strip('"\'')
        elif line.startswith("loop_"):
            headers = []
            i += 1
            while i < len(lines) and lines[i].strip().startswith("_"):
                headers.append(lines[i].strip())
                i += 1
            rows = []
            while i < len(lines):
                row = lines[i].strip()
                if not row or row.startswith(("_", "loop_", "data_")):
                    break
                rows.append(_split_cif_row(row))
                i += 1
            loops.append({"headers": headers, "rows": rows})
            continue
        i += 1

    cell = cellpar_to_cell(
        float(_num(values["_cell_length_a"])),
        float(_num(values["_cell_length_b"])),
        float(_num(values["_cell_length_c"])),
        float(_num(values["_cell_angle_alpha"])),
        float(_num(values["_cell_angle_beta"])),
        float(_num(values["_cell_angle_gamma"])))

    symbols, frac = [], []
    for loop in loops:
        heads = loop["headers"]
        if not any("_atom_site_fract_x" in h for h in heads):
            continue
        ix = heads.index("_atom_site_fract_x")
        iy = heads.index("_atom_site_fract_y")
        iz = heads.index("_atom_site_fract_z")
        if "_atom_site_type_symbol" in heads:
            isym = heads.index("_atom_site_type_symbol")
        else:
            isym = heads.index("_atom_site_label")
        for row in loop["rows"]:
            sym = re.match(r"[A-Z][a-z]?", row[isym]).group(0)
            if sym not in atomic_numbers:
                raise ValueError(f"unknown element {sym}")
            symbols.append(sym)
            frac.append([_num(row[ix]), _num(row[iy]), _num(row[iz])])
    frac = np.asarray(frac, dtype=np.float64)
    positions = frac @ cell
    return Structure.from_symbols(symbols, positions, cell,
                                  pbc=[True, True, True])


def _split_cif_row(row: str) -> List[str]:
    return re.findall(r"'[^']*'|\"[^\"]*\"|\S+", row)


def _num(token: str) -> float:
    token = str(token).strip().strip("'\"")
    token = re.sub(r"\(\d+\)$", "", token)  # drop uncertainty suffix
    return float(token)
