"""Shared test fixtures and tolerant array assertions (reference
`tensoralloy/test_utils.py:19-124`)."""
from __future__ import annotations

import numpy as np

from .atoms import Structure
from .precision import get_float_policy


def assert_array_equal(a, b, err_msg=""):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                  err_msg=err_msg)


def assert_array_almost_equal(a, b, delta=None, err_msg=""):
    """Tolerance keyed to the active float policy (fp64: 1e-8,
    fp32: 1e-5) unless given explicitly."""
    if delta is None:
        delta = 1e-8 if get_float_policy().name == "high" else 1e-5
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=delta, err_msg=err_msg)


def make_pd3o2(seed: int = 611):
    """The canonical permutation fixture pair: Pd3O2 and Pd2O2Pd with
    identical geometry but permuted atom order."""
    rng = np.random.RandomState(seed)
    positions = rng.uniform(1.0, 4.0, size=(5, 3))
    cell = np.eye(3) * 8.0
    a = Structure.from_symbols(["Pd", "Pd", "Pd", "O", "O"], positions,
                               cell, pbc=[True] * 3)
    perm = [0, 3, 4, 1, 2]
    b = Structure.from_symbols([a.symbols[i] for i in perm],
                               positions[perm], cell, pbc=[True] * 3)
    return a, b, perm
