"""Miller-index slabs and surface energies.

The reference computes surface properties by exporting the potential
to LAMMPS; here the slab builder + the native calculator close the
loop in-process: `make_slab` cuts an (hkl) slab out of any bulk cell
by integer lattice algebra (no ASE), `surface_energy` relaxes it and
returns gamma = (E_slab - N e_bulk) / (2 A).

Conventions: Miller indices are w.r.t. the GIVEN cell (use the
conventional cubic cell for textbook fcc/bcc indices). The slab's
third cell vector carries the vacuum; the first two are the shortest
in-plane lattice vectors.
"""
from __future__ import annotations

from itertools import product
from math import gcd
from typing import Dict, Optional, Tuple

import numpy as np

from ..atoms import Structure

__all__ = ["make_slab", "surface_energy", "stacking_fault_energy"]


def _in_plane_basis(cell: np.ndarray, hkl: Tuple[int, int, int],
                    search: int = 3) -> Tuple[np.ndarray, np.ndarray,
                                              np.ndarray]:
    """Integer basis (u, v, w) of the bulk lattice with u, v in the
    (hkl) plane (u.hkl = v.hkl = 0), w advancing one plane stack
    (w.hkl = gcd(hkl)), all chosen shortest in Cartesian length and
    right-handed."""
    h = np.asarray(hkl, int)
    if not h.any():
        raise ValueError("Miller indices must not all be zero")
    g = gcd(gcd(abs(int(h[0])), abs(int(h[1]))), abs(int(h[2])))
    h = h // g
    cands = []
    for t in product(range(-search, search + 1), repeat=3):
        t = np.array(t, int)
        if not t.any():
            continue
        if int(t @ h) == 0:
            cands.append(t)
    cands.sort(key=lambda t: float(np.linalg.norm(t @ cell)))
    u = cands[0]
    v = None
    for t in cands[1:]:
        if np.linalg.norm(np.cross(u, t)) > 1e-9:
            v = t
            break
    if v is None:
        raise ValueError(f"no in-plane basis found for {tuple(hkl)}")
    # stacking vector: t.h == 1 (after gcd reduction one always exists
    # within the search range for small indices)
    best_w, best_len = None, np.inf
    for t in product(range(-search, search + 1), repeat=3):
        t = np.array(t, int)
        if int(t @ h) != 1:
            continue
        ln = float(np.linalg.norm(t @ cell))
        if ln < best_len:
            best_w, best_len = t, ln
    if best_w is None:
        raise ValueError(f"no stacking vector found for {tuple(hkl)}")
    m = np.stack([u, v, best_w])
    if np.linalg.det(m) < 0:
        m[1] = -m[1]
    return m[0], m[1], m[2]


def _fill_supercell(bulk: Structure, m: np.ndarray
                    ) -> Tuple[list, np.ndarray, np.ndarray]:
    """Populate the integer supercell `m` (rows: lattice combinations)
    of `bulk` -> (symbols, fractional positions in the NEW cell, new
    cell). Exact-count checked."""
    cell = np.asarray(bulk.cell, float)
    new_cell = m @ cell
    ncells = int(round(abs(np.linalg.det(m))))
    corners = np.array(list(product([0, 1], repeat=3))) @ m
    lo = corners.min(axis=0) - 1
    hi = corners.max(axis=0) + 1
    inv_new = np.linalg.inv(new_cell)
    frac_bulk = bulk.positions @ np.linalg.inv(cell)
    sym, pos = [], []
    for t in product(*(range(int(l), int(h) + 1)
                       for l, h in zip(lo, hi))):
        shift = np.asarray(t, float)
        for s_i, f in zip(bulk.symbols, frac_bulk):
            fn = (f + shift) @ cell @ inv_new
            fn_mod = fn - np.floor(fn + 1e-9)
            if np.all(fn_mod < 1.0 - 1e-9):
                # dedup exact-boundary images
                if any(np.allclose(fn_mod, q, atol=1e-6)
                       for q, s_q in zip(pos, sym) if s_q == s_i):
                    continue
                sym.append(s_i)
                pos.append(fn_mod)
    expected = ncells * len(bulk)
    if len(sym) != expected:
        raise RuntimeError(
            f"supercell filling found {len(sym)} atoms, "
            f"expected {expected}")
    return sym, np.asarray(pos), new_cell


def make_slab(bulk: Structure, miller: Tuple[int, int, int],
              layers: int = 6, vacuum: float = 12.0,
              search: int = 3) -> Structure:
    """Cut an (hkl) slab with `layers` repetitions of the minimal
    stacking period along the plane normal and `vacuum` A of empty
    space separating periodic replicas.

    The returned structure keeps pbc = (T, T, T); the vacuum gap makes
    the third direction non-interacting for any cutoff < vacuum.
    """
    cell = np.asarray(bulk.cell, float)
    u, v, w = _in_plane_basis(cell, miller, search=search)
    m = np.stack([u, v, w * layers])        # integer supercell matrix
    sym, frac, new_cell = _fill_supercell(bulk, m)
    pos = frac @ new_cell
    # vacuum: extend the third vector along the plane normal so the
    # PERPENDICULAR replica gap equals `vacuum`
    normal = np.cross(new_cell[0], new_cell[1])
    normal = normal / np.linalg.norm(normal)
    if normal @ new_cell[2] < 0:
        normal = -normal
    slab_cell = new_cell.copy()
    slab_cell[2] = new_cell[2] + vacuum * normal
    s = Structure.from_symbols(sym, pos, slab_cell, pbc=[True] * 3)
    s.info["miller"] = tuple(int(x) for x in miller)
    return s


def surface_energy(calc, bulk: Structure,
                   miller: Tuple[int, int, int], layers: int = 8,
                   vacuum: float = 12.0, relax: bool = True,
                   fmax: float = 0.02, steps: int = 300
                   ) -> Dict[str, float]:
    """gamma(hkl) = (E_slab - N e_bulk) / (2 A) with e_bulk from the
    SAME calculator on the given bulk cell (consistent reference), the
    slab optionally ion-relaxed. Returns eV/A^2 and J/m^2
    (1 eV/A^2 = 16.0218 J/m^2).
    """
    from .elastic import relax_positions
    e_bulk = calc.get_potential_energy(bulk) / len(bulk)
    slab = make_slab(bulk, miller, layers=layers, vacuum=vacuum)
    e_unrelaxed = calc.get_potential_energy(slab)
    if relax:
        slab = relax_positions(calc, slab, fmax=fmax, steps=steps)
        e_slab = calc.get_potential_energy(slab)
    else:
        e_slab = e_unrelaxed
    area = float(np.linalg.norm(np.cross(slab.cell[0], slab.cell[1])))
    gamma = (e_slab - len(slab) * e_bulk) / (2.0 * area)
    return {"gamma_ev_a2": float(gamma),
            "gamma_j_m2": float(gamma) * 16.02176634,
            "n_atoms": len(slab), "area_a2": area,
            "e_slab": float(e_slab),
            "e_unrelaxed": float(e_unrelaxed),
            "relaxation_ev": float(e_unrelaxed - e_slab)}


def _relax_normal(calc, s: Structure, normal: np.ndarray,
                  fmax: float = 0.02, steps: int = 200,
                  dt: float = 0.08) -> Structure:
    """FIRE-lite with forces PROJECTED on the plane normal — the
    standard constrained relaxation for gamma-surface points (in-plane
    motion would slide the fault away)."""
    s = s.copy()
    n = normal / np.linalg.norm(normal)
    v = np.zeros(len(s))
    a_scale = 0.1
    for _ in range(steps):
        f = np.asarray(calc.get_forces(s)) @ n
        if np.abs(f).max() < fmax:
            break
        power = float(f @ v)
        if power > 0:
            fn = np.linalg.norm(f) or 1.0
            v = (1 - a_scale) * v + a_scale * np.linalg.norm(v) * f / fn
        else:
            v[:] = 0.0
        v = v + dt * f
        s.positions = s.positions + dt * v[:, None] * n[None, :]
    return s


def stacking_fault_energy(calc, bulk: Structure,
                          miller: Tuple[int, int, int] = (1, 1, 1),
                          frac_shift: Tuple[float, float] = (1/3, 1/3),
                          layers: int = 8, relax: bool = True,
                          fmax: float = 0.02, steps: int = 200,
                          search: int = 3) -> Dict[str, float]:
    """Generalized stacking-fault energy by the tilted-cell method:
    the (hkl)-oriented supercell's third vector is sheared by
    `frac_shift` of the two in-plane lattice vectors, inserting exactly
    ONE fault per periodic image (no vacuum, no free surfaces). Atoms
    relax along the plane normal only (`relax=True`), the constrained
    mode a gamma-surface scan requires.

    For fcc (111) with the default shortest in-plane basis,
    `frac_shift=(1/3, 1/3)` is the intrinsic stacking fault
    (the Shockley-partial displacement). Returns gamma in eV/A^2,
    J/m^2 and mJ/m^2.
    """
    cell = np.asarray(bulk.cell, float)
    u, v, w = _in_plane_basis(cell, miller, search=search)
    m = np.stack([u, v, w * layers])
    sym, frac, perfect_cell = _fill_supercell(bulk, m)
    perfect = Structure.from_symbols(sym, frac @ perfect_cell,
                                     perfect_cell, pbc=[True] * 3)
    e_perfect = calc.get_potential_energy(perfect)
    # canonical ACUTE in-plane basis: whether the shortest-pair search
    # returned vectors at 60 or 120 degrees is arbitrary, but the
    # physical meaning of frac_shift must not be — e.g. (1/3, 1/3) of
    # the acute fcc(111) basis IS the Shockley-partial displacement
    b1 = perfect_cell[0]
    b2 = (perfect_cell[1] if b1 @ perfect_cell[1] >= -1e-9
          else perfect_cell[0] + perfect_cell[1])
    shift = frac_shift[0] * b1 + frac_shift[1] * b2
    faulted_cell = perfect_cell.copy()
    faulted_cell[2] = perfect_cell[2] + shift
    # atoms stay at their PERFECT Cartesian positions: only the
    # periodic boundary is sheared, so the slip discontinuity (the
    # fault) is localized at the cell boundary instead of being
    # smeared into a uniform shear strain
    faulted = Structure.from_symbols(sym, frac @ perfect_cell,
                                     faulted_cell, pbc=[True] * 3)
    e_unrelaxed = calc.get_potential_energy(faulted)
    normal = np.cross(perfect_cell[0], perfect_cell[1])
    if relax:
        faulted = _relax_normal(calc, faulted, normal,
                                fmax=fmax, steps=steps)
        e_fault = calc.get_potential_energy(faulted)
    else:
        e_fault = e_unrelaxed
    area = float(np.linalg.norm(normal))
    gamma = (e_fault - e_perfect) / area
    return {"gamma_ev_a2": float(gamma),
            "gamma_j_m2": float(gamma) * 16.02176634,
            "gamma_mj_m2": float(gamma) * 16021.76634,
            "n_atoms": len(perfect), "area_a2": area,
            "e_perfect": float(e_perfect),
            "e_unrelaxed": float(e_unrelaxed),
            "e_fault": float(e_fault)}
