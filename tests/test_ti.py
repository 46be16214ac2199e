"""Frenkel-Ladd thermodynamic integration (analysis/ti.py).

Oracles:
1. Einstein -> Einstein: integrating from a k0 spring reference to a
   k1 spring "model" has the closed form dF = (3N kT / 2) ln(k1/k0);
   the TI machinery (LambdaMix inside the device MD, Gauss-Legendre
   quadrature, algebraic U_model recovery from the recorded mixed
   potential) must reproduce it within sampling error.
2. zjw04 Ni solid at 300 K: the TI absolute free energy must agree
   with the CLASSICAL harmonic free energy computed from the EXACT
   mode set of the same finite cell (a 2x2x2 q-mesh of the 2x2x2
   supercell), E0 + kT sum' ln(hbar w / kT) — the only gaps are the
   3 zero modes (Einstein COM) and anharmonicity, both small at
   300 K for a stiff fcc metal.
"""
from collections import Counter

import jax
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN
from tensoralloy_tpu.dynamics import KB
from tensoralloy_tpu.analysis.ti import (LambdaMix, frenkel_ladd,
                                         einstein_free_energy,
                                         HBAR_EV_FS)

A0 = 3.52


def _ni(reps=2):
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5],
                     [0, .5, .5]])
    frac = np.concatenate([base + [i, j, k] for i in range(reps)
                           for j in range(reps) for k in range(reps)])
    return Structure.from_symbols(["Ni"] * len(frac), frac * A0,
                                  np.eye(3) * A0 * reps,
                                  pbc=[True] * 3)


def _eam(s):
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    return model, model.init_params(jax.random.PRNGKey(0))


def test_einstein_to_einstein_analytic():
    """dF = (3N kT / 2) ln(k1 / k0), exactly."""
    s = _ni()
    model, params = _eam(s)
    fz = model.featurizer
    vap = fz.make_vap(s, Counter(s.symbols))
    n_vap = model.clone_for(Counter(s.symbols)).n_atoms_vap
    centers = np.zeros((n_vap, 3))
    centers[vap.local_to_vap] = s.positions
    masks = np.zeros(n_vap)
    masks[vap.local_to_vap] = 1.0
    k0, k1, temp = 1.5, 6.0, 300.0
    fake_model = LambdaMix(model, 0.0, centers, k1, masks)
    res = frenkel_ladd(fake_model, params, s, temp, k_spring=k0,
                       n_lambda=6, equil_steps=600, prod_steps=2000,
                       timestep=2.0, sample=10, seed=3,
                       com_correction=False)   # model NOT transl.-inv.
    n = len(s)
    df_exact = 1.5 * n * KB * temp * np.log(k1 / k0)
    assert res["delta_f"] == pytest.approx(df_exact, rel=0.05)
    # absolute F == analytic Einstein(k1)
    f1 = einstein_free_energy(n, s.masses, k1, temp)
    assert res["free_energy"] == pytest.approx(
        f1, abs=0.06 * abs(df_exact))
    # integrand for harmonic-harmonic TI: flat in the k-interpolated
    # sense, always finite and monotone here
    assert np.all(np.isfinite(res["du_mean"]))


def test_einstein_free_energy_formula():
    f = einstein_free_energy(2, np.array([10.0, 10.0]), 4.0, 500.0)
    w = np.sqrt(4.0 / 10.0 * 9.648533290731905e-3)
    kt = KB * 500.0
    assert f == pytest.approx(6 * kt * np.log(HBAR_EV_FS * w / kt),
                              rel=1e-12)


def test_frenkel_ladd_vs_classical_harmonic_ni():
    """zjw04 Ni, 32 atoms, 300 K: TI absolute F per atom agrees with
    E0/N + kT <ln(beta hbar w)> over the exact finite-cell mode set
    within a few meV/atom (anharmonicity + COM-mode difference)."""
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    from tensoralloy_tpu.analysis.phonon import PhononCalculator

    s = _ni()
    model, params = _eam(s)
    temp = 300.0

    res = frenkel_ladd(model, params, s, temp, n_lambda=6,
                       equil_steps=800, prod_steps=2500,
                       timestep=2.0, sample=10, seed=1)

    calc = TensorAlloyCalculator(model, params)
    e0 = calc.get_potential_energy(s) / len(s)
    prim = Structure.from_symbols(
        ["Ni"] * 4, np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5],
                              [0, .5, .5]]) * A0,
        np.eye(3) * A0, pbc=[True] * 3)
    ph = PhononCalculator(calc, prim, supercell=(2, 2, 2))
    freqs = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                f_q = np.asarray(ph.frequencies(
                    np.array([i / 2, j / 2, k / 2])))
                freqs.append(f_q)
    freqs = np.sort(np.concatenate(freqs))       # THz, 96 modes
    freqs = freqs[3:]                             # drop Gamma acoustic
    assert np.all(freqs > 0.1)
    kt = KB * temp
    w_fs = freqs * 2.0 * np.pi / 1000.0           # angular, 1/fs
    from tensoralloy_tpu.analysis.ti import free_com_term
    f_harm = (e0 * len(s)
              + kt * np.sum(np.log(HBAR_EV_FS * w_fs / kt))
              + free_com_term(float(s.masses.sum()), s.volume, temp)
              ) / len(s)

    assert res["free_energy_per_atom"] == pytest.approx(
        f_harm, abs=0.004)
    # the spring constant matched to the thermal cloud is physical
    assert 0.5 < res["k_spring"] < 20.0


def test_cli_compute_fe(tmp_path):
    """`compute fe` end-to-end (short settings): prints the integrand
    table and a finite absolute F."""
    import subprocess
    import sys
    from tensoralloy_tpu.io.model import save_model

    s = _ni()
    model, params = _eam(s)
    mpath = tmp_path / "ni.npz"
    save_model(str(mpath), model, jax.device_get(params))
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute", "fe",
         str(mpath), "Ni", "--supercell", "2", "2", "2",
         "--temp", "300", "--n-lambda", "3", "--equil-steps", "40",
         "--steps", "80", "--k-spring", "3.0"],
        capture_output=True, text=True, check=True)
    assert "spring constant k = 3.0000" in out.stdout
    f_at = float(out.stdout.split(" eV/atom")[0].split()[-1])
    # crude run, but must land near the cohesive-energy scale
    assert -6.0 < f_at < -3.0
