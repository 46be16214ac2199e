"""Harmonic TST kinetics (analysis/kinetics.py).

Oracles: zjw04 Ni vacancy hop — formation energy in the published
window (~1.6-1.8 eV), migration barrier matching the pinned NEB value
(~0.86 eV), Vineyard attempt frequency at the phonon scale (the
Einstein frequency of Ni is ~6 THz; effective nu* for the fcc hop is
a handful of THz to a few tens), the saddle carrying exactly ONE
imaginary mode, and the minimum rejecting the saddle check.
"""
from collections import Counter

import jax
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN
from tensoralloy_tpu.calculator import TensorAlloyCalculator
from tensoralloy_tpu.dynamics import KB
from tensoralloy_tpu.analysis.kinetics import (
    mass_weighted_frequencies, vineyard_rate, vacancy_diffusivity)

A0 = 3.52


@pytest.fixture(scope="module")
def ni_calc():
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5],
                     [0, .5, .5]])
    bulk = Structure.from_symbols(["Ni"] * 4, base * A0,
                                  np.eye(3) * A0, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}),
                       custom_potentials="zjw04")
    return bulk, TensorAlloyCalculator(
        model, model.init_params(jax.random.PRNGKey(0)))


def test_mass_weighted_frequencies_einstein_oracle():
    """A diagonal spring Hessian k*I gives nu = sqrt(k/m)/2pi for
    every mode, exactly."""
    k, m = 3.0, 58.6934
    h = np.eye(6) * k
    nu = mass_weighted_frequencies(h, np.array([m, m]))
    expect = np.sqrt(k / m * 9.648533290731905e-3) / (2 * np.pi) * 1e3
    np.testing.assert_allclose(nu, expect, rtol=1e-12)


def test_vacancy_diffusivity_zjw04_ni(ni_calc):
    bulk, calc = ni_calc
    out = vacancy_diffusivity(calc, bulk, supercell=(2, 2, 2),
                              temperatures=(600.0, 1000.0))
    # zjw04 Ni: E_f ~1.6-1.8 eV, E_m ~0.8-1.0 (this supercell: 0.86)
    assert 1.4 < out["formation_energy"] < 1.9
    assert 0.6 < out["migration_energy"] < 1.1
    # Q = E_f + E_m vs Ni self-diffusion activation ~2.9 eV (window)
    assert 2.0 < out["activation_energy"] < 3.2
    # attempt frequency at the phonon scale
    assert 1.0 < out["nu_star_thz"] < 60.0
    # fcc nearest-neighbor jump distance
    assert out["jump_distance"] == pytest.approx(A0 / np.sqrt(2),
                                                 rel=0.05)
    assert out["neb"]["converged"]
    # Arrhenius consistency of the reported rates
    t1, t2 = out["temperatures"]
    k1, k2 = out["jump_rate_hz"]
    slope = np.log(k2 / k1) / (1 / t2 - 1 / t1)
    assert slope == pytest.approx(-out["migration_energy"] / KB,
                                  rel=1e-9)
    assert np.all(np.diff(out["d_vacancy_m2_s"]) > 0)


def test_vineyard_rejects_minimum_as_saddle(ni_calc):
    """Feeding a MINIMUM as the saddle must raise (no imaginary
    mode), not silently return a rate."""
    bulk, calc = ni_calc
    from tensoralloy_tpu.analysis.elastic import relax_positions
    sc = relax_positions(calc, bulk.repeat((2, 2, 2)), fmax=0.01)
    with pytest.raises(ValueError, match="imaginary"):
        vineyard_rate(calc, sc, sc)
