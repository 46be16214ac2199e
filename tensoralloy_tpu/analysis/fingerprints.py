"""Oganov-Valle structure fingerprints for dataset dedup (reference
`tensoralloy/analysis/fingerprints.py:18-534`).

F_AB(r) = sum_{i in A, j in B} delta(r - r_ij) V /
          (4 pi r_ij^2 dr N_A N_B) - 1

binned with Gaussian smearing; the distance between two structures is
the cosine distance between their concatenated per-pair-type
fingerprints (weighted by composition).
"""
from __future__ import annotations

from itertools import combinations_with_replacement
from typing import Dict, List, Tuple

import numpy as np

from ..atoms import Structure
from ..neighbor import neighbor_list


class StructureFingerprint:
    def __init__(self, structure: Structure, rmax: float = 6.0,
                 delta: float = 0.05, sigma: float = 0.02):
        self.structure = structure.ensure_cell()
        self.rmax = rmax
        self.delta = delta
        self.sigma = sigma
        self.grid = np.arange(delta, rmax, delta)
        self.fingerprints = self._compute()

    def _compute(self) -> Dict[Tuple[str, str], np.ndarray]:
        s = self.structure
        ii, jj, S, d, D = neighbor_list(s, self.rmax)
        syms = np.asarray(s.symbols)
        elements = sorted(set(s.symbols))
        counts = {e: int(np.sum(syms == e)) for e in elements}
        volume = s.volume
        out = {}
        for a, b in combinations_with_replacement(elements, 2):
            sel = (syms[ii] == a) & (syms[jj] == b)
            rij = d[sel]
            f = np.zeros_like(self.grid)
            if len(rij):
                # Gaussian-smeared delta at each pair distance
                w = volume / (4.0 * np.pi * rij ** 2 * self.delta *
                              counts[a] * counts[b])
                diff = self.grid[None, :] - rij[:, None]
                g = np.exp(-0.5 * (diff / self.sigma) ** 2) / \
                    (self.sigma * np.sqrt(2.0 * np.pi)) * self.delta
                f = np.sum(w[:, None] * g, axis=0)
            out[(a, b)] = f - 1.0
        return out

    def flat(self) -> np.ndarray:
        keys = sorted(self.fingerprints)
        return np.concatenate([self.fingerprints[k] for k in keys])


def cosine_distance(fp1: StructureFingerprint,
                    fp2: StructureFingerprint) -> float:
    """0 = identical environments, 1 = orthogonal."""
    a, b = fp1.flat(), fp2.flat()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom < 1e-300:
        return 1.0
    return float(0.5 * (1.0 - np.dot(a, b) / denom))


class FingerprintsComparator:
    """Pairwise similarity over many structures; used for dedup."""

    def __init__(self, structures: List[Structure], rmax: float = 6.0,
                 delta: float = 0.05, sigma: float = 0.02):
        self.fps = [StructureFingerprint(s, rmax, delta, sigma)
                    for s in structures]

    def distance_matrix(self) -> np.ndarray:
        n = len(self.fps)
        out = np.zeros((n, n))
        for i in range(n):
            for j in range(i + 1, n):
                out[i, j] = out[j, i] = cosine_distance(
                    self.fps[i], self.fps[j])
        return out

    def find_duplicates(self, threshold: float = 0.008
                        ) -> List[Tuple[int, int]]:
        d = self.distance_matrix()
        n = len(self.fps)
        return [(i, j) for i in range(n) for j in range(i + 1, n)
                if d[i, j] < threshold]
