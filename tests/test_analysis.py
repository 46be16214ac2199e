"""Analysis: phonons from the autodiff Hessian, fingerprints."""
from collections import Counter

import jax
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN
from tensoralloy_tpu.calculator import TensorAlloyCalculator


@pytest.fixture(scope="module")
def ni_calc():
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 1}), custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    return TensorAlloyCalculator(model, params)


@pytest.fixture(scope="module")
def ni_primitive():
    # fcc primitive cell near the zjw04 equilibrium (a ~ 3.52)
    a = 3.52
    cell = 0.5 * a * np.array([[0.0, 1.0, 1.0],
                               [1.0, 0.0, 1.0],
                               [1.0, 1.0, 0.0]])
    return Structure.from_symbols(["Ni"], [[0, 0, 0]], cell,
                                  pbc=[True] * 3)


def test_phonon_gamma_acoustic(ni_calc, ni_primitive):
    """Gamma point: three acoustic modes at ~0 THz (translational
    invariance of the potential)."""
    from tensoralloy_tpu.analysis.phonon import PhononCalculator
    ph = PhononCalculator(ni_calc, ni_primitive, supercell=(2, 2, 2))
    freqs = ph.gamma_frequencies()
    assert freqs.shape == (3,)
    np.testing.assert_allclose(freqs, 0.0, atol=0.2)


def test_phonon_dispersion_physical(ni_calc, ni_primitive):
    """Frequencies away from Gamma are positive and in the right range
    for fcc Ni (max ~ 9 THz experimentally at X)."""
    from tensoralloy_tpu.analysis.phonon import PhononCalculator
    ph = PhononCalculator(ni_calc, ni_primitive, supercell=(2, 2, 2))
    fx = ph.frequencies(np.array([0.5, 0.0, 0.5]))   # X point
    assert np.all(fx > 0.5)
    assert np.all(fx < 20.0)
    band = ph.band_structure(
        [("G", [0, 0, 0]), ("X", [0.5, 0.0, 0.5])], npoints=5)
    assert band["frequencies"].shape == (6, 3)
    assert band["distances"][-1] > 0


def test_fingerprints_dedup():
    from tensoralloy_tpu.analysis.fingerprints import (
        FingerprintsComparator, StructureFingerprint, cosine_distance)
    rng = np.random.RandomState(0)
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]]) * a0
    s1 = Structure.from_symbols(["Ni"] * 4, base, np.eye(3) * a0,
                                pbc=[True] * 3)
    s2 = s1.copy()
    s2.positions = s2.positions + 0.77          # rigid shift: identical
    s3 = s1.copy()
    s3.positions = s3.positions + rng.normal(0, 0.25, (4, 3))  # rattled
    fp1 = StructureFingerprint(s1)
    fp2 = StructureFingerprint(s2)
    fp3 = StructureFingerprint(s3)
    assert cosine_distance(fp1, fp2) < 1e-8
    assert cosine_distance(fp1, fp3) > 0.01
    comp = FingerprintsComparator([s1, s2, s3])
    dups = comp.find_duplicates(threshold=0.005)
    assert (0, 1) in dups and (0, 2) not in dups


def test_lammps_deck_generation(tmp_path):
    """Driver deck generation (binary execution gated on
    LAMMPS_COMMAND, reference `nn/eam/tests/test_eam_alloy_nn.py`
    pattern)."""
    import os
    from tensoralloy_tpu.analysis.lammps import (
        EnergyForceStress, write_lammps_data, lower_triangular_cell,
        get_lammps_command)
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]]) * a0
    s = Structure.from_symbols(["Ni"] * 4, base, np.eye(3) * a0,
                               pbc=[True] * 3)
    driver = EnergyForceStress(
        "eam/alloy", "* * MoNi.eam.alloy Ni",
        workdir=str(tmp_path))
    driver.write_deck(s)
    deck = (tmp_path / "in.lammps").read_text()
    assert "pair_style eam/alloy" in deck
    assert "units metal" in deck
    data = (tmp_path / "data.lammps").read_text()
    assert "4 atoms" in data and "1 atom types" in data

    # triclinic rotation preserves geometry
    cell = np.array([[3.0, 0, 0], [1.0, 3.0, 0], [0.5, 0.4, 3.0]])
    new_cell, rot = lower_triangular_cell(cell)
    assert abs(np.linalg.det(new_cell) - np.linalg.det(cell)) < 1e-10
    assert np.allclose(new_cell, np.tril(new_cell))
    np.testing.assert_allclose(cell @ rot, new_cell, atol=1e-12)

    if get_lammps_command() is None:
        pytest.skip("LAMMPS binary not available")
