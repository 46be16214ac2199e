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


# ----------------------------------------------------------------------
# Symmetry-aware elastic fitting (reference `analysis/elastic.py:33-684`)
# ----------------------------------------------------------------------

def _upper_to_c(vals):
    c = np.zeros((6, 6))
    idx = 0
    for i in range(6):
        for j in range(i, 6):
            c[i, j] = vals[idx]
            idx += 1
    return np.triu(c) + np.triu(c, 1).T


def _linear_medium_stress_fn(c_voigt, reference):
    """Exact linear-elastic medium: sigma = C @ engineering strain."""
    from tensoralloy_tpu.analysis.elastic import voigt_strain

    def stress(s):
        u = voigt_strain(s, reference)
        eng = np.array([u[0], u[1], u[2], 2 * u[3], 2 * u[4], 2 * u[5]])
        return c_voigt @ eng
    return stress


@pytest.mark.parametrize("lattice,cell,cij", [
    ("cubic", np.eye(3) * 3.5, {"C11": 1.5, "C12": 0.8, "C44": 0.6}),
    ("tetragonal", np.diag([3.0, 3.0, 4.2]),
     {"C11": 1.5, "C33": 1.2, "C12": 0.7, "C13": 0.5, "C44": 0.4,
      "C66": 0.3}),
    ("orthorhombic", np.diag([3.0, 3.6, 4.2]),
     {"C11": 1.5, "C22": 1.4, "C33": 1.2, "C12": 0.7, "C13": 0.5,
      "C23": 0.45, "C44": 0.4, "C55": 0.35, "C66": 0.3}),
    ("hexagonal", np.array([[3.0, 0, 0],
                            [-1.5, 3.0 * np.sqrt(3) / 2, 0],
                            [0, 0, 4.8]]),
     {"C11": 1.5, "C33": 1.2, "C12": 0.7, "C13": 0.5, "C44": 0.4}),
])
def test_fit_elastic_tensor_exact_recovery(lattice, cell, cij):
    """A synthetic linear-elastic medium of each family is recovered
    exactly by the symmetry-reduced least-squares fit."""
    from tensoralloy_tpu.analysis import elastic as EL
    s = Structure.from_symbols(["Ni"], [[0, 0, 0]], cell, pbc=[True] * 3)
    assert EL.detect_lattice(s) == lattice

    c_true = np.zeros((6, 6))
    for name, slots in EL._CIJ_SLOTS[lattice]:
        for (i, j) in slots:
            sign = -1.0 if (lattice == "trigonal" and name == "C14"
                            and (i, j) == (1, 3)) else 1.0
            c_true[i, j] = sign * cij[name]
    c_true = np.triu(c_true) + np.triu(c_true, 1).T
    if lattice == "hexagonal":
        c_true[5, 5] = 0.5 * (c_true[0, 0] - c_true[0, 1])
    if lattice == "tetragonal":
        c_true[5, 5] = cij["C66"]

    fn = _linear_medium_stress_fn(c_true, s)
    c_fit, info = EL.fit_elastic_tensor(None, s, lattice=lattice,
                                        in_gpa=False, stress_fn=fn)
    assert info["lattice"] == lattice
    np.testing.assert_allclose(c_fit, c_true, atol=1e-10)


def test_fit_elastic_tensor_triclinic_recovery():
    from tensoralloy_tpu.analysis import elastic as EL
    rng = np.random.RandomState(0)
    vals = rng.uniform(0.2, 1.5, 21)
    c_true = _upper_to_c(vals)
    cell = np.array([[3.1, 0.2, 0.1], [0.3, 3.7, 0.2], [0.1, 0.4, 4.3]])
    s = Structure.from_symbols(["Ni"], [[0, 0, 0]], cell, pbc=[True] * 3)
    fn = _linear_medium_stress_fn(c_true, s)
    c_fit, _ = EL.fit_elastic_tensor(None, s, lattice="triclinic",
                                     in_gpa=False, stress_fn=fn)
    np.testing.assert_allclose(c_fit, c_true, atol=1e-9)


def test_fit_elastic_ni_matches_central_difference(ni_calc, ni_primitive):
    """Cubic Ni (zjw04): the symmetry-reduced fit agrees with the
    clamped-ion central-difference tensor (and relax_ions is a no-op
    for a one-atom basis)."""
    from tensoralloy_tpu.analysis.elastic import (
        compute_elastic_tensor, fit_elastic_tensor, cubic_constants)
    # conventional cubic cell (the primitive rhombohedron would need an
    # explicit lattice= override — metric-based detection)
    a = 3.52
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]])
    s = Structure.from_symbols(["Ni"] * 4, base * a, np.eye(3) * a,
                               pbc=[True] * 3)
    c_cd = compute_elastic_tensor(ni_calc, s)
    c_fit, info = fit_elastic_tensor(ni_calc, s, n=3, d=0.3)
    assert info["lattice"] == "cubic"
    k_cd = cubic_constants(c_cd)
    k_fit = cubic_constants(c_fit)
    for key in ("c11", "c12", "c44"):
        assert k_fit[key] == pytest.approx(k_cd[key], rel=0.05), key
    # fcc with a one-atom basis has no internal DOF: relaxed == clamped
    c_rel, _ = fit_elastic_tensor(ni_calc, s, n=3, d=0.3,
                                  relax_ions=True)
    np.testing.assert_allclose(c_rel, c_fit, rtol=0.02, atol=2.0)


def test_fingerprint_coordination_oracle():
    """Physics oracle for the Valle-Oganov normalization: integrating
    (F_AA + 1) * 4 pi r^2 * (N/V) * dr over a window around the first
    fcc shell recovers the coordination number 12."""
    from tensoralloy_tpu.analysis.fingerprints import StructureFingerprint
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]]) * a0
    s = Structure.from_symbols(["Ni"] * 4, base, np.eye(3) * a0,
                               pbc=[True] * 3)
    fp = StructureFingerprint(s, rmax=3.2, delta=0.02, sigma=0.02)
    f = fp.fingerprints[("Ni", "Ni")]
    r = fp.grid
    d1 = a0 / np.sqrt(2.0)  # first-shell distance 2.489
    window = (r > d1 - 0.3) & (r < d1 + 0.3)
    dens = 4.0 / s.volume
    n_neighbors = np.sum((f[window] + 1.0) * 4.0 * np.pi *
                         r[window] ** 2 * dens * fp.delta)
    # erf-box smearing deposits at the pair's own 1/(4 pi d^2); binned
    # r^2 variation keeps this within a few percent of 12
    assert n_neighbors == pytest.approx(12.0, rel=0.05)
    # each pair's smear weights sum to 1: widen sigma, count conserved
    fp2 = StructureFingerprint(s, rmax=3.2, delta=0.02, sigma=0.06)
    f2 = fp2.fingerprints[("Ni", "Ni")]
    n2 = np.sum((f2[window] + 1.0) * 4.0 * np.pi * r[window] ** 2 *
                dens * fp2.delta)
    assert n2 == pytest.approx(n_neighbors, rel=0.05)


def test_fingerprint_composition_weighting_and_looks_like():
    """Multi-element similarity uses w_AB = N_A N_B / sum (reference
    `get_similarity`); looks_like applies the dE gate first."""
    from tensoralloy_tpu.analysis.fingerprints import (
        FingerprintsComparator, StructureFingerprint, cosine_distance)
    rng = np.random.RandomState(3)
    a0 = 3.6
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]]) * a0
    s1 = Structure.from_symbols(["Mo", "Ni", "Ni", "Ni"], base,
                                np.eye(3) * a0, pbc=[True] * 3)
    s2 = s1.copy()
    s2.positions = base + rng.normal(0, 0.02, (4, 3))
    fp1, fp2 = StructureFingerprint(s1), StructureFingerprint(s2)
    assert set(fp1.fingerprints) == {("Mo", "Mo"), ("Mo", "Ni"),
                                     ("Ni", "Ni")}
    d_small = cosine_distance(fp1, fp2)
    assert 0 <= d_small < 0.1
    # energy gate: same geometry but energies differ by > dE
    s1.info["energy"] = 0.0
    s2.info["energy"] = 5.0
    comp = FingerprintsComparator([s1, s2], dE=1.0)
    assert not comp.looks_like(0, 1)
    s2.info["energy"] = 0.5
    comp = FingerprintsComparator([s1, s2], dE=1.0, cos_dist_max=0.1)
    assert comp.looks_like(0, 1)
    # per-atom fingerprints: every pair channel present
    ind = fp1.individual(0)
    assert set(ind) == set(fp1.fingerprints)


def test_fingerprint_molecule_0d():
    """Isolated molecules (no PBC): short-ranged fingerprint, no -1
    baseline subtraction (reference docstring contract)."""
    from tensoralloy_tpu.analysis.fingerprints import (
        StructureFingerprint, cosine_distance)
    pos = np.array([[0.0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    s = Structure.from_symbols(["O", "H", "H"], pos,
                               np.zeros((3, 3)), pbc=[False] * 3)
    fp = StructureFingerprint(s, rmax=3.0)
    f_oh = fp.fingerprints[("H", "O")]
    assert fp.dimensions == 0
    assert np.all(f_oh >= 0.0)          # no unity subtraction
    assert f_oh.max() > 0.0             # OH peak present
    assert cosine_distance(fp, fp) < 1e-12


def test_fit_elastic_non_canonical_orientations_fall_back_safely():
    """Reduced patterns assume a canonical unique axis (tetragonal: z,
    monoclinic: c). Cells in other settings must detect a superset
    family whose equation matrix is valid there, and still recover the
    true constants exactly."""
    from tensoralloy_tpu.analysis import elastic as EL

    # tetragonal with unique axis y (a == c != b): the z-unique
    # tetragonal matrix would misassign C33 -> orthorhombic fallback
    cell = np.diag([3.0, 4.2, 3.0])
    s = Structure.from_symbols(["Ni"], [[0, 0, 0]], cell, pbc=[True] * 3)
    assert EL.detect_lattice(s) == "orthorhombic"
    cz = np.zeros((6, 6))
    for name, val in (("C11", 1.5), ("C33", 1.2), ("C12", 0.7),
                      ("C13", 0.5), ("C44", 0.4), ("C66", 0.3)):
        for (i, j) in dict(EL._CIJ_SLOTS["tetragonal"])[name]:
            cz[i, j] = val
    cz = np.triu(cz) + np.triu(cz, 1).T
    p = [0, 2, 1, 3, 5, 4]            # swap y<->z in Voigt order
    c_true = cz[np.ix_(p, p)]
    fn = _linear_medium_stress_fn(c_true, s)
    c_fit, info = EL.fit_elastic_tensor(None, s, in_gpa=False,
                                        stress_fn=fn)
    assert info["lattice"] == "orthorhombic"
    np.testing.assert_allclose(c_fit, c_true, atol=1e-10)

    # monoclinic in the standard unique-axis-b setting (beta oblique):
    # couplings are C15/C25/C35/C46, not the unique-c C16/C26/C36/C45
    # pattern -> must fall back to the full triclinic fit
    beta = np.radians(100.0)
    cell_b = np.array([[3.1, 0, 0],
                       [0, 3.7, 0],
                       [4.3 * np.cos(beta), 0, 4.3 * np.sin(beta)]])
    sb = Structure.from_symbols(["Ni"], [[0, 0, 0]], cell_b,
                                pbc=[True] * 3)
    assert EL.detect_lattice(sb) == "triclinic"
    cm = np.zeros((6, 6))
    vals = {"C11": 1.5, "C22": 1.4, "C33": 1.2, "C12": 0.7,
            "C13": 0.5, "C23": 0.45, "C44": 0.4, "C55": 0.35,
            "C66": 0.3}
    for name, val in vals.items():
        i, j = int(name[1]) - 1, int(name[2]) - 1
        cm[i, j] = val
    for (i, j), val in {(0, 4): 0.2, (1, 4): 0.15, (2, 4): 0.1,
                        (3, 5): 0.05}.items():   # C15 C25 C35 C46
        cm[i, j] = val
    cm = np.triu(cm) + np.triu(cm, 1).T
    fnb = _linear_medium_stress_fn(cm, sb)
    c_fit_b, info_b = EL.fit_elastic_tensor(None, sb, in_gpa=False,
                                            stress_fn=fnb)
    assert info_b["lattice"] == "triclinic"
    np.testing.assert_allclose(c_fit_b, cm, atol=1e-9)

    # gamma-oblique (unique axis c) monoclinic still uses the reduced
    # 13-constant fit
    gamma = np.radians(105.0)
    cell_c = np.array([[3.1, 0, 0],
                       [3.7 * np.cos(gamma), 3.7 * np.sin(gamma), 0],
                       [0, 0, 4.3]])
    sc = Structure.from_symbols(["Ni"], [[0, 0, 0]], cell_c,
                                pbc=[True] * 3)
    assert EL.detect_lattice(sc) == "monoclinic"


def test_lammps_neb_deck_and_log_parsing(tmp_path):
    """NEB execution wrapper: final-coords file format and master-log
    barrier parsing (the binary-gated `calculate` uses exactly these;
    execution itself is exercised when $LAMMPS_COMMAND exists)."""
    import numpy as np
    from tensoralloy_tpu.analysis.lammps import NudgedElasticBand
    from tensoralloy_tpu.atoms import Structure

    s = Structure.from_symbols(["Ni"] * 2,
                               [[0, 0, 0], [1.76, 1.76, 0.0]],
                               np.eye(3) * 3.52, pbc=[True] * 3)
    drv = NudgedElasticBand("eam/alloy", "* * pot.eam.alloy Ni",
                            workdir=str(tmp_path))
    path = drv.write_final_coords(s)
    lines = open(path).read().splitlines()
    assert lines[0] == "2" and len(lines) == 3
    assert [float(x) for x in lines[2].split()[1:]] == [1.76, 1.76, 0.0]

    log = """Setting up regular NEB ...
Step MaxReplicaForce MaxAtomForce GradV0 GradV1 GradVc EBF EBR RDT RD1 PE1 RD2 PE2
0 1.2 0.5 0.1 0.1 0.2 0.99 0.88 2.5 0 -8.8 0.5 -8.2
100 0.001 0.0005 0.0 0.0 0.0 0.8612 0.8612 2.48 0 -8.86 0.5 -8.0
Climbing replica = 4
"""
    parsed = drv.parse_neb_log(log)
    assert parsed["EBF"] == 0.8612 and parsed["EBR"] == 0.8612
    assert parsed["RDT"] == 2.48


def test_relax_cell_recovers_a0(ni_calc):
    """Variable-cell FIRE: a compressed AND sheared fcc Ni cube must
    relax back to the cubic zjw04 equilibrium (a0 = 3.52, E = -4.45
    eV/atom) with the residual stress under the smax gate."""
    from tensoralloy_tpu.analysis.elastic import relax_cell
    from tensoralloy_tpu.nn.fields import EV_ANGSTROM3_TO_GPA
    a0 = 3.42
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    shear = np.array([[1.0, 0.02, 0.0],
                      [0.02, 1.0, 0.0],
                      [0.0, 0.0, 1.0]])
    cell = (np.eye(3) * a0) @ shear
    s = Structure.from_symbols(["Ni"] * 4, (base * a0) @ shear, cell,
                               pbc=[True] * 3)
    r = relax_cell(ni_calc, s, fmax=0.01, smax=0.02, steps=800)
    lengths = np.linalg.norm(r.cell, axis=1)
    np.testing.assert_allclose(lengths, 3.52, atol=0.01)
    # angles back to 90 deg: off-diagonal metric ~ 0
    metric = r.cell @ r.cell.T
    assert np.abs(metric - np.diag(np.diag(metric))).max() < 0.05
    e = ni_calc.get_potential_energy(r) / 4
    assert e == pytest.approx(-4.45, abs=0.005)
    s_gpa = np.abs(np.asarray(ni_calc.get_stress(r))
                   * EV_ANGSTROM3_TO_GPA).max()
    assert s_gpa < 0.02


def test_relax_cell_external_pressure(ni_calc):
    """Enthalpy relaxation: 10 GPa external pressure compresses the
    equilibrium lattice, and the internal stress balances -P."""
    from tensoralloy_tpu.analysis.elastic import relax_cell
    from tensoralloy_tpu.nn.fields import EV_ANGSTROM3_TO_GPA
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    s = Structure.from_symbols(["Ni"] * 4, base * a0, np.eye(3) * a0,
                               pbc=[True] * 3)
    r = relax_cell(ni_calc, s, fmax=0.01, smax=0.05, steps=800,
                   pressure=10.0)
    a = np.linalg.norm(r.cell, axis=1).mean()
    assert 3.40 < a < 3.50          # compressed below a0
    sv = np.asarray(ni_calc.get_stress(r)) * EV_ANGSTROM3_TO_GPA
    np.testing.assert_allclose(sv[:3], -10.0, atol=0.05)


def test_harmonic_thermo_einstein_oracle():
    """Single-frequency Einstein crystal: every quantity has a closed
    form. 3N modes at nu -> per-mode x = h nu / kT."""
    from tensoralloy_tpu.analysis.phonon import (harmonic_thermo,
                                                 THZ_TO_EV, KB_EV)
    nu = 5.0                    # THz
    n_modes = 96
    freqs = np.full(n_modes, nu)
    t = 300.0
    out = harmonic_thermo(freqs, [0.0, t])
    hv = nu * THZ_TO_EV
    x = hv / (KB_EV * t)
    n_b = 1.0 / np.expm1(x)
    assert out["zpe"] == pytest.approx(0.5 * n_modes * hv, rel=1e-12)
    # T = 0 row: F = U = ZPE, S = Cv = 0
    assert out["free_energy"][0] == out["zpe"]
    assert out["entropy"][0] == 0.0 and out["heat_capacity"][0] == 0.0
    f_exact = n_modes * (0.5 * hv + KB_EV * t * np.log(-np.expm1(-x)))
    s_exact = n_modes * KB_EV * (x * n_b - np.log(-np.expm1(-x)))
    u_exact = n_modes * hv * (0.5 + n_b)
    c_exact = n_modes * KB_EV * x * x * np.exp(x) * n_b * n_b
    assert out["free_energy"][1] == pytest.approx(f_exact, rel=1e-10)
    assert out["entropy"][1] == pytest.approx(s_exact, rel=1e-10)
    assert out["internal_energy"][1] == pytest.approx(u_exact, rel=1e-10)
    assert out["heat_capacity"][1] == pytest.approx(c_exact, rel=1e-10)
    # thermodynamic identity F = U - T S
    assert out["free_energy"][1] == pytest.approx(
        out["internal_energy"][1] - t * out["entropy"][1], rel=1e-10)


def test_phonon_thermal_properties_dulong_petit(ni_calc, ni_primitive):
    """zjw04 Ni harmonic thermodynamics: C_v approaches the classical
    3 kB/atom at high T, entropy grows monotonically, ZPE is a few
    tens of meV/atom."""
    from tensoralloy_tpu.analysis.phonon import PhononCalculator, KB_EV
    ph = PhononCalculator(ni_calc, ni_primitive, supercell=(2, 2, 2))
    out = ph.thermal_properties([100.0, 300.0, 2000.0],
                                qmesh=(4, 4, 4))
    n = len(ni_primitive)
    cv_kb = out["heat_capacity"] / n / KB_EV
    assert cv_kb[2] == pytest.approx(3.0, rel=0.02)   # Dulong-Petit
    assert cv_kb[0] < cv_kb[1] < cv_kb[2]             # quantum onset
    assert 10.0 < out["zpe"] / n * 1000 < 80.0        # meV/atom
    s = out["entropy"]
    assert 0.0 < s[0] < s[1] < s[2]
    # F decreases with T; U increases
    f, u = out["free_energy"], out["internal_energy"]
    assert f[0] > f[1] > f[2]
    assert u[0] < u[1] < u[2]


def test_quasi_harmonic_thermal_expansion(ni_calc, ni_primitive):
    """QHA on zjw04 Ni: the lattice expands with T at a physical rate
    (experimental alpha ~ 1.3e-5/K), the bulk modulus softens, and
    F(T) at the minimum decreases."""
    from tensoralloy_tpu.analysis.phonon import quasi_harmonic
    out = quasi_harmonic(ni_calc, ni_primitive, [0.0, 300.0, 600.0],
                         supercell=(2, 2, 2), qmesh=(4, 4, 4))
    v = out["volume"]
    assert v[0] < v[1] < v[2]                       # thermal expansion
    assert 0.4e-5 < out["alpha"][1] < 3e-5          # physical range
    b = out["bulk_modulus"]
    assert 140.0 < b[0] < 200.0                     # zjw04 B ~ 181
    assert b[0] > b[1] > b[2]                       # softening
    f = out["free_energy"]
    assert f[0] > f[1] > f[2]


def test_ideal_strength_zjw04_ni():
    """<100> uniaxial tension of zjw04 Ni with transverse relaxation:
    the small-strain secant reproduces the Young's modulus from the
    elastic constants, E<100> = (C11-C12)(C11+2C12)/(C11+C12), the
    stress rises to a peak in a physical window and falls past it."""
    import numpy as np
    from collections import Counter
    import jax
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    from tensoralloy_tpu.analysis.elastic import (ideal_strength,
                                                  fit_elastic_tensor)
    a0 = 3.52
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5],
                     [0, .5, .5]])
    s = Structure.from_symbols(["Ni"] * 4, base * a0, np.eye(3) * a0,
                               pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}),
                       custom_potentials="zjw04")
    calc = TensorAlloyCalculator(model,
                                 model.init_params(jax.random.PRNGKey(0)))
    res = ideal_strength(calc, s, axis=2, max_strain=0.7,
                         n_points=15)
    c, _ = fit_elastic_tensor(calc, s)
    c11, c12 = c[0, 0], c[0, 1]
    e100 = (c11 - c12) * (c11 + 2 * c12) / (c11 + c12)
    assert res["youngs_modulus_gpa"] == pytest.approx(e100, rel=0.25)
    # zjw04 Ni <100>: 31.9 GPa at eps = 0.45 (DFT ~26 at ~0.36 --
    # EAM hardens at large strain); generous physical window
    assert 10.0 < res["sigma_max_gpa"] < 45.0
    assert 0.2 < res["eps_at_max"] < 0.65
    st = res["stress_gpa"]
    i = int(np.argmax(st))
    assert 0 < i < len(st) - 1          # peak is interior (rose, fell)
    assert st[0] == pytest.approx(0.0, abs=0.3)


def test_cli_compute_dedup(tmp_path):
    """`compute dedup`: identical frames flagged, rattled distinct
    frames kept, pruned extxyz written."""
    import subprocess
    import sys
    import numpy as np
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.io.extxyz import write_extxyz, read_extxyz
    a0 = 3.52
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5],
                     [0, .5, .5]]) * a0
    perfect = Structure.from_symbols(["Ni"] * 4, base, np.eye(3) * a0,
                                     pbc=[True] * 3)
    rng = np.random.RandomState(0)
    rattled = perfect.copy()
    rattled.positions = rattled.positions + rng.normal(
        scale=0.25, size=(4, 3))
    frames = [perfect, perfect.copy(), rattled]
    src = tmp_path / "frames.extxyz"
    write_extxyz(str(src), frames)
    kept = tmp_path / "unique.extxyz"
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute",
         "dedup", str(src), "--threshold", "0.01",
         "--keep", str(kept)],
        capture_output=True, text=True, check=True)
    assert "near-duplicate pairs" in out.stdout
    assert "unique frames: 2" in out.stdout
    assert len(read_extxyz(str(kept))) == 2


def test_ideal_shear_strength_zjw04_ni():
    """(001)[100] simple shear of fcc Ni: the small-strain secant IS
    C44 (no internal modes in the conventional cell), and the stress
    peaks at the ideal shear strength in a physical window (DFT/EAM
    fcc metals: tau_max ~ mu/10, gamma ~ 0.1-0.35)."""
    import numpy as np
    from collections import Counter
    import jax
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    from tensoralloy_tpu.analysis.elastic import (ideal_shear_strength,
                                                  fit_elastic_tensor)
    a0 = 3.52
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5],
                     [0, .5, .5]])
    s = Structure.from_symbols(["Ni"] * 4, base * a0, np.eye(3) * a0,
                               pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}),
                       custom_potentials="zjw04")
    calc = TensorAlloyCalculator(model,
                                 model.init_params(jax.random.PRNGKey(0)))
    res = ideal_shear_strength(calc, s, plane_axis=2, shear_dir=0,
                               max_strain=0.45, n_points=10)
    c, _ = fit_elastic_tensor(calc, s)
    assert res["shear_modulus_gpa"] == pytest.approx(c[3, 3],
                                                     rel=0.2)
    assert 2.0 < res["tau_max_gpa"] < 25.0
    assert 0.05 < res["gamma_at_max"] < 0.45
