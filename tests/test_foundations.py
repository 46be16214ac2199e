"""Foundations: k-body terms, pairing, neighbor lists, VAP, extxyz."""
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.neighbor import neighbor_list, find_neighbor_size_of_atoms
from tensoralloy_tpu.utils import (get_kbody_terms,
                                   get_elements_from_kbody_term,
                                   szudzik_pairing, cantor_pairing)
from tensoralloy_tpu.vap import VirtualAtomMap
from collections import Counter


def test_kbody_terms_radial():
    all_terms, per_elem, elements = get_kbody_terms(["Mo", "Ni"])
    assert elements == ["Mo", "Ni"]
    assert per_elem["Mo"] == ["MoMo", "MoNi"]
    assert per_elem["Ni"] == ["NiNi", "NiMo"]
    assert all_terms == ["MoMo", "MoNi", "NiNi", "NiMo"]


def test_kbody_terms_angular():
    all_terms, per_elem, _ = get_kbody_terms(["Ni", "Mo"], angular=True)
    assert per_elem["Mo"] == ["MoMo", "MoNi", "MoMoMo", "MoMoNi", "MoNiNi"]
    assert per_elem["Ni"] == ["NiNi", "NiMo", "NiMoMo", "NiMoNi", "NiNiNi"]


def test_get_elements_from_kbody_term():
    assert get_elements_from_kbody_term("NiMo") == ["Ni", "Mo"]
    assert get_elements_from_kbody_term("NiNiMo") == ["Ni", "Ni", "Mo"]
    assert get_elements_from_kbody_term("HHeH") == ["H", "He", "H"]


def test_pairing_unique():
    rng = np.random.RandomState(0)
    x = rng.randint(-50, 50, size=1000)
    y = rng.randint(-50, 50, size=1000)
    z = szudzik_pairing(x, y)
    seen = {}
    for xi, yi, zi in zip(x, y, z):
        if zi in seen:
            assert seen[zi] == (xi, yi)
        seen[zi] = (xi, yi)
    assert cantor_pairing(3, 4) != cantor_pairing(4, 3)


def _brute_force_neighbors(s: Structure, rc: float):
    """Independent O(N^2 * images) oracle."""
    reps = 3
    out = []
    for i in range(len(s)):
        for j in range(len(s)):
            for n1 in range(-reps, reps + 1):
                for n2 in range(-reps, reps + 1):
                    for n3 in range(-reps, reps + 1):
                        S = np.array([n1, n2, n3], float)
                        if i == j and n1 == n2 == n3 == 0:
                            continue
                        d = np.linalg.norm(
                            s.positions[j] + S @ s.cell - s.positions[i])
                        if d < rc:
                            out.append((i, j, n1, n2, n3, d))
    return out


def test_neighbor_list_vs_bruteforce(ni_structures):
    s = ni_structures[0]
    rc = 4.6
    ii, jj, S, d, D = neighbor_list(s, rc)
    ref = _brute_force_neighbors(s, rc)
    assert len(ii) == len(ref)
    got = sorted(zip(ii.tolist(), jj.tolist(),
                     S[:, 0].astype(int).tolist(),
                     S[:, 1].astype(int).tolist(),
                     S[:, 2].astype(int).tolist(),
                     np.round(d, 9).tolist()))
    want = sorted((i, j, a, b, c, round(x, 9)) for i, j, a, b, c, x in ref)
    for g, w in zip(got, want):
        assert g[:5] == w[:5]
        assert abs(g[5] - w[5]) < 1e-8
    np.testing.assert_allclose(np.linalg.norm(D, axis=1), d, atol=1e-12)


def test_neighbor_list_molecule():
    pos = np.array([[0.0, 0, 0], [1.1, 0, 0], [5.0, 0, 0]])
    s = Structure.from_symbols(["C", "O", "H"], pos, cell=None)
    ii, jj, S, d, D = neighbor_list(s, 2.0)
    assert len(ii) == 2
    assert set(zip(ii.tolist(), jj.tolist())) == {(0, 1), (1, 0)}
    np.testing.assert_allclose(S, 0.0)


def test_neighbor_size(snap_ni):
    size = find_neighbor_size_of_atoms(snap_ni, 4.5, angular=True)
    ii, jj, _, _, _ = neighbor_list(snap_ni, 4.5)
    assert size.nij == len(ii)
    counts = np.bincount(ii, minlength=len(snap_ni))
    assert size.nijk == int(np.sum(counts * (counts - 1) // 2))
    assert size.nnl > 0


def test_vap_roundtrip():
    vap = VirtualAtomMap(Counter({"Ni": 4, "Mo": 3}),
                         ["Ni", "Mo", "Ni", "Mo"])
    assert vap.n_atoms_vap == 8
    arr = np.arange(12.0).reshape(4, 3)
    mapped = vap.map_positions(arr)
    assert mapped.shape == (8, 3)
    np.testing.assert_array_equal(vap.reverse_map(mapped), arr)
    assert vap.atom_masks.sum() == 4
    assert vap.atom_masks[0] == 0


def test_vap_element_blocks():
    vap = VirtualAtomMap(Counter({"Pd": 3, "O": 2}),
                         ["Pd", "O", "O", "Pd", "Pd"])
    # elements sorted: O block rows 1-2, Pd block rows 3-5
    assert vap.element_offsets == {"O": 1, "Pd": 3}
    syms = vap.vap_symbols
    assert syms == ["X", "O", "O", "Pd", "Pd", "Pd"]


def test_structure_supercell(snap_ni):
    sup = snap_ni.repeat((2, 2, 1))
    assert len(sup) == 4 * len(snap_ni)
    assert abs(sup.volume - 4 * snap_ni.volume) < 1e-8


def test_extxyz_labels(ni_structures):
    s = ni_structures[0]
    assert s.energy == pytest.approx(-5.40978447)
    assert s.stress.shape == (6,)
    assert s.forces.shape == (1, 3)
    np.testing.assert_array_equal(s.info["weights"], [0.0, 1.0, 0.5])
