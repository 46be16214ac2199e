"""Elastic-constant computation by finite homogeneous deformations
(reference `tensoralloy/analysis/elastic.py`, which fits Cij from
symmetry-reduced strain patterns; here the full 6x6 tensor is obtained
from central differences of the analytic stress — the model's stress is
itself exact autodiff, so no internal-relaxation fitting loop is
needed for the unrelaxed (clamped-ion) constants).
"""
from __future__ import annotations

import numpy as np

from ..atoms import Structure
from ..nn.fields import EV_ANGSTROM3_TO_GPA

_VOIGT_PAIRS = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]


def strain_matrix(voigt_index: int, magnitude: float) -> np.ndarray:
    """Symmetric strain tensor for one Voigt component."""
    eps = np.zeros((3, 3))
    a, b = _VOIGT_PAIRS[voigt_index]
    if a == b:
        eps[a, a] = magnitude
    else:
        eps[a, b] = eps[b, a] = magnitude / 2.0
    return eps


def apply_strain(structure: Structure, eps: np.ndarray) -> Structure:
    out = structure.copy()
    m = np.eye(3) + eps
    out.cell = structure.cell @ m.T
    out.positions = structure.positions @ m.T
    return out


def compute_elastic_tensor(calc, structure: Structure,
                           delta: float = 1e-3,
                           in_gpa: bool = True) -> np.ndarray:
    """Clamped-ion C_ij (Voigt 6x6) = d sigma_i / d eps_j."""
    c = np.zeros((6, 6))
    for j in range(6):
        sp = calc.get_stress(apply_strain(structure,
                                          strain_matrix(j, +delta)))
        sm = calc.get_stress(apply_strain(structure,
                                          strain_matrix(j, -delta)))
        c[:, j] = (np.asarray(sp) - np.asarray(sm)) / (2.0 * delta)
    c = 0.5 * (c + c.T)
    if in_gpa:
        c = c * EV_ANGSTROM3_TO_GPA
    return c


def cubic_constants(c: np.ndarray) -> dict:
    """{c11, c12, c44} averages for cubic symmetry."""
    return {"c11": float(np.mean([c[0, 0], c[1, 1], c[2, 2]])),
            "c12": float(np.mean([c[0, 1], c[0, 2], c[1, 2]])),
            "c44": float(np.mean([c[3, 3], c[4, 4], c[5, 5]]))}


def bulk_modulus_voigt(c: np.ndarray) -> float:
    return float((c[0, 0] + c[1, 1] + c[2, 2] +
                  2.0 * (c[0, 1] + c[0, 2] + c[1, 2])) / 9.0)


def shear_modulus_voigt(c: np.ndarray) -> float:
    return float(((c[0, 0] + c[1, 1] + c[2, 2]) -
                  (c[0, 1] + c[0, 2] + c[1, 2]) +
                  3.0 * (c[3, 3] + c[4, 4] + c[5, 5])) / 15.0)
