"""Miller-index slab builder + surface energies (analysis/surface.py).

Oracles: exact slab geometry (atom counts, interplanar spacings,
vacuum gap) and the robust fcc EAM surface-energy ordering
gamma(111) < gamma(100) < gamma(110) with zjw04-Ni magnitudes.
"""
from collections import Counter

import jax
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN
from tensoralloy_tpu.calculator import TensorAlloyCalculator
from tensoralloy_tpu.analysis.surface import make_slab, surface_energy

A0 = 3.52


@pytest.fixture(scope="module")
def ni_bulk():
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    return Structure.from_symbols(["Ni"] * 4, base * A0,
                                  np.eye(3) * A0, pbc=[True] * 3)


@pytest.fixture(scope="module")
def ni_calc_s():
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}),
                       custom_potentials="zjw04")
    return TensorAlloyCalculator(model,
                                 model.init_params(jax.random.PRNGKey(0)))


def test_slab_geometry_fcc(ni_bulk):
    """(100)/(110)/(111) slabs: atom counts follow the integer
    supercell volume, interplanar spacings match the textbook values,
    and the perpendicular replica gap equals the requested vacuum."""
    spacings = {(1, 0, 0): A0 / 2, (1, 1, 0): A0 / (2 * np.sqrt(2)),
                (1, 1, 1): A0 / np.sqrt(3)}
    for hkl, d_ref in spacings.items():
        slab = make_slab(ni_bulk, hkl, layers=6, vacuum=10.0)
        normal = np.cross(slab.cell[0], slab.cell[1])
        normal /= np.linalg.norm(normal)
        heights = np.sort(slab.positions @ normal)
        # distinct planes at the textbook spacing
        uniq = np.unique(np.round(heights, 6))
        gaps = np.diff(uniq)
        np.testing.assert_allclose(gaps, d_ref, atol=1e-6)
        # slab thickness: 6 stacking periods of >= 1 plane each
        assert len(uniq) >= 6
        # vacuum: replica gap along the normal
        period = abs(float(slab.cell[2] @ normal))
        thickness = uniq[-1] - uniq[0]
        assert period - (thickness + d_ref) == pytest.approx(
            10.0, abs=1e-6)
        # in-plane lattice vectors lie in the surface
        assert abs(slab.cell[0] @ normal) < 1e-9
        assert abs(slab.cell[1] @ normal) < 1e-9


def test_slab_rejects_zero_miller(ni_bulk):
    with pytest.raises(ValueError):
        make_slab(ni_bulk, (0, 0, 0))


def test_surface_energy_ordering_zjw04(ni_bulk, ni_calc_s):
    """zjw04 Ni: gamma(111) < gamma(100) < gamma(110), all in the
    published 1.6-2.1 J/m^2 window."""
    gammas = {}
    for hkl in [(1, 0, 0), (1, 1, 0), (1, 1, 1)]:
        r = surface_energy(ni_calc_s, ni_bulk, hkl, layers=8,
                           relax=True, steps=120)
        gammas[hkl] = r["gamma_j_m2"]
        # relaxation can only lower the energy
        assert r["relaxation_ev"] >= -1e-8
    assert gammas[(1, 1, 1)] < gammas[(1, 0, 0)] < gammas[(1, 1, 0)]
    for g in gammas.values():
        assert 1.5 < g < 2.3


def test_miller_equivalents_match(ni_bulk, ni_calc_s):
    """Cubic symmetry: (100) and (010) give the same surface energy."""
    r1 = surface_energy(ni_calc_s, ni_bulk, (1, 0, 0), layers=6,
                        relax=False)
    r2 = surface_energy(ni_calc_s, ni_bulk, (0, 1, 0), layers=6,
                        relax=False)
    assert r1["gamma_j_m2"] == pytest.approx(r2["gamma_j_m2"],
                                             rel=1e-8)


def test_stacking_fault_energy_fcc(ni_bulk, ni_calc_s):
    """Tilted-cell GSF: zero and full-lattice shifts are exactly
    invariant (gamma = 0), the intrinsic fault at the Shockley-partial
    displacement lands in the zjw04-Ni window, and the halfway point
    (unstable fault) lies above it."""
    from tensoralloy_tpu.analysis.surface import stacking_fault_energy
    r0 = stacking_fault_energy(ni_calc_s, ni_bulk, (1, 1, 1),
                               (0.0, 0.0), layers=8, relax=False)
    assert r0["gamma_mj_m2"] == pytest.approx(0.0, abs=1e-6)
    r_full = stacking_fault_energy(ni_calc_s, ni_bulk, (1, 1, 1),
                                   (1.0, 0.0), layers=8, relax=False)
    assert r_full["gamma_mj_m2"] == pytest.approx(0.0, abs=1e-6)
    r_isf = stacking_fault_energy(ni_calc_s, ni_bulk, (1, 1, 1),
                                  (1 / 3, 1 / 3), layers=8)
    assert 60.0 < r_isf["gamma_mj_m2"] < 200.0   # published ~125
    r_us = stacking_fault_energy(ni_calc_s, ni_bulk, (1, 1, 1),
                                 (1 / 6, 1 / 6), layers=8)
    assert r_us["gamma_mj_m2"] > r_isf["gamma_mj_m2"]
    # constrained relaxation can only lower the energy
    assert r_isf["e_fault"] <= r_isf["e_unrelaxed"] + 1e-10


def test_gamma_line_fcc_112_path(ni_bulk, ni_calc_s):
    """gamma(t) along the acute-basis (1,1) (= <112>) path: zero at
    both ends (t=1 is the b1+b2 lattice translation), gamma_us above
    gamma_isf, and the t=1/3 point matches the single-shot SFE call
    exactly (shared tilted-cell construction)."""
    from tensoralloy_tpu.analysis.surface import (gamma_line,
                                                  stacking_fault_energy)
    r = gamma_line(ni_calc_s, ni_bulk, (1, 1, 1), direction=(1, 1),
                   n_points=6, layers=8, relax=False)
    g = r["gamma_mj_m2"]
    assert g[0] == pytest.approx(0.0, abs=1e-6)
    assert g[-1] == pytest.approx(0.0, abs=1e-4)
    assert np.all(g[1:-1] > 0)
    assert "gamma_isf_mj_m2" not in r          # 1/3 not on a 6-grid
    r13 = gamma_line(ni_calc_s, ni_bulk, (1, 1, 1), direction=(1, 1),
                     n_points=13, layers=8, relax=False)
    assert "gamma_isf_mj_m2" in r13
    assert (r13["gamma_us_mj_m2"] > r13["gamma_isf_mj_m2"] > 0)
    one = stacking_fault_energy(ni_calc_s, ni_bulk, (1, 1, 1),
                                (1 / 3, 1 / 3), layers=8, relax=False)
    assert r13["gamma_isf_mj_m2"] == pytest.approx(
        one["gamma_mj_m2"], rel=1e-9)


def test_gamma_surface_grid_fcc(ni_bulk, ni_calc_s):
    """3x3 gamma-surface: origin exactly zero, all other points
    positive, and the fcc(111) mirror symmetry gamma(u,v)=gamma(v,u)
    of the acute basis holds to machine precision (unrelaxed)."""
    from tensoralloy_tpu.analysis.surface import gamma_surface
    r = gamma_surface(ni_calc_s, ni_bulk, (1, 1, 1), n_grid=(3, 3),
                      layers=8, relax=False)
    g = r["gamma_mj_m2"]
    assert g.shape == (3, 3)
    assert g[0, 0] == 0.0
    assert np.all(g.flatten()[1:] > 0)
    np.testing.assert_allclose(g, g.T, rtol=1e-7, atol=1e-6)
    assert r["gamma_max_mj_m2"] == pytest.approx(g.max())


def test_gamma_line_us_is_first_barrier(ni_bulk, ni_calc_s):
    """gamma_us is the first barrier (t ~ 1/6 on the fcc <112> path,
    zjw04 Ni published ~255-290 mJ/m^2), NOT the far run-on peak."""
    from tensoralloy_tpu.analysis.surface import gamma_line
    r = gamma_line(ni_calc_s, ni_bulk, (1, 1, 1), direction=(1, 1),
                   n_points=13, layers=8, relax=False)
    assert r["gamma_us_mj_m2"] < r["gamma_max_mj_m2"]
    assert 180 < r["gamma_us_mj_m2"] < 400
    i_us = int(np.argmin(np.abs(
        r["gamma_mj_m2"] - r["gamma_us_mj_m2"])))
    assert r["t"][i_us] < 0.35


def test_cli_sfe_line_and_grid(tmp_path, ni_bulk):
    """`compute sfe --line/--grid` write CSVs and print gamma_us."""
    import subprocess
    import sys
    from tensoralloy_tpu.io.model import save_model

    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    mpath = tmp_path / "ni.npz"
    save_model(str(mpath), model, jax.device_get(params))
    line_csv = tmp_path / "line.csv"
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute",
         "sfe", str(mpath), "Ni", "--line", "5", "--layers", "6",
         "--no-relax", "-o", str(line_csv)],
        capture_output=True, text=True, check=True)
    assert "gamma_us" in out.stdout
    rows = open(line_csv).readlines()
    assert rows[0].strip() == "t,gamma_mj_m2"
    assert len(rows) == 6
    grid_csv = tmp_path / "grid.csv"
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute",
         "sfe", str(mpath), "Ni", "--grid", "2", "2", "--layers", "6",
         "--no-relax", "-o", str(grid_csv)],
        capture_output=True, text=True, check=True)
    assert "gamma-surface 2x2" in out.stdout
    assert len(open(grid_csv).readlines()) == 5


def test_gb_mirror_100_is_perfect_crystal(ni_bulk, ni_calc_s):
    """Exactness oracle: fcc has a mirror symmetry through (100)
    atomic planes, so the plane-centered (100) 'bicrystal' IS the
    perfect crystal -- gamma = 0 to machine precision and the atom
    count matches the dedup arithmetic (2 layers shared)."""
    from tensoralloy_tpu.analysis.surface import grain_boundary_energy
    r = grain_boundary_energy(ni_calc_s, ni_bulk, (1, 0, 0), layers=6,
                              translations=[(0.0, 0.0)], relax=False)
    assert r["gamma_mj_m2"] == pytest.approx(0.0, abs=1e-6)


def test_gb_coherent_twin_111(ni_bulk, ni_calc_s):
    """The plane-centered (111) mirror bicrystal IS the coherent twin;
    zjw04 Ni: gamma_twin ~ gamma_isf / 2 (textbook fcc relation;
    measured 50.3 vs ISF 100.5 mJ/m^2)."""
    from tensoralloy_tpu.analysis.surface import (grain_boundary_energy,
                                                  stacking_fault_energy)
    r = grain_boundary_energy(ni_calc_s, ni_bulk, (1, 1, 1), layers=8,
                              translations=[(0.0, 0.0)])
    assert 20.0 < r["gamma_mj_m2"] < 90.0
    isf = stacking_fault_energy(ni_calc_s, ni_bulk, (1, 1, 1),
                                (1 / 3, 1 / 3), layers=8)
    ratio = r["gamma_mj_m2"] / isf["gamma_mj_m2"]
    assert 0.35 < ratio < 0.7


def test_gb_sigma5_tilt_energies(ni_bulk, ni_calc_s):
    """Sigma5 [001] symmetric tilt boundaries of zjw04 Ni land in the
    published EAM windows: (310) ~1.1-1.4, (210) ~1.1-1.6 J/m^2, both
    far above the twin and far below a free surface."""
    from tensoralloy_tpu.analysis.surface import grain_boundary_energy
    g310 = grain_boundary_energy(ni_calc_s, ni_bulk, (3, 1, 0),
                                 layers=8, min_dist=1.8)
    g210 = grain_boundary_energy(ni_calc_s, ni_bulk, (2, 1, 0),
                                 layers=8, min_dist=1.8)
    assert 0.9 < g310["gamma_j_m2"] < 1.5
    assert 0.9 < g210["gamma_j_m2"] < 1.7


def test_twist_gb_90deg_is_perfect_crystal(ni_bulk, ni_calc_s):
    """Exactness oracle: a 90-degree twist about [001] is the 4-fold
    symmetry of fcc -- the 'bicrystal' is the perfect crystal."""
    from tensoralloy_tpu.analysis.surface import twist_boundary_energy
    r = twist_boundary_energy(ni_calc_s, ni_bulk, (0, 0, 1), 90.0,
                              layers=4, translations=[(0.0, 0.0)],
                              relax=False)
    assert r["gamma_mj_m2"] == pytest.approx(0.0, abs=1e-6)


def test_twist_gb_sigma5_001(ni_bulk, ni_calc_s):
    """Sigma5 (001) twist (36.87 deg): zjw04 Ni lands in the published
    EAM window, below the Sigma5 tilts and far above the twin; the
    CSL cell is the exact sqrt(5) x sqrt(5) (10 atoms/plane, healthy
    interface distances)."""
    from tensoralloy_tpu.analysis.surface import (twist_boundary_energy,
                                                  make_twist_bicrystal)
    gb = make_twist_bicrystal(ni_bulk, (0, 0, 1), 36.8698976458,
                              layers=6)
    assert len(gb) == 240                      # 24 planes x 10 atoms
    inv = np.linalg.inv(gb.cell)
    fr = gb.positions @ inv
    d = fr[:, None, :] - fr[None, :, :]
    d -= np.round(d)
    r = np.linalg.norm(d @ gb.cell, axis=-1) + np.eye(len(gb)) * 10
    assert r.min() > 1.7                       # no fused sites
    res = twist_boundary_energy(ni_calc_s, ni_bulk, (0, 0, 1),
                                36.8698976458, layers=6)
    assert 0.6 < res["gamma_j_m2"] < 1.4


def test_twist_gb_rejects_axis_without_normal_stacking(ni_bulk):
    """(310) has no purely-normal stacking vector within the search
    range -- the builder must refuse rather than emit a broken cell."""
    from tensoralloy_tpu.analysis.surface import make_twist_bicrystal
    with pytest.raises(ValueError, match="purely-normal|CSL"):
        make_twist_bicrystal(ni_bulk, (3, 1, 0), 36.87, layers=4)


def test_cli_compute_gb(tmp_path):
    """`compute gb` end-to-end: the (111) mirror (coherent twin)
    through the real CLI."""
    import subprocess
    import sys
    from tensoralloy_tpu.io.model import save_model
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    mpath = tmp_path / "ni.npz"
    save_model(str(mpath), model, jax.device_get(params))
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute",
         "gb", str(mpath), "Ni", "1", "1", "1", "--layers", "6",
         "--no-relax"],
        capture_output=True, text=True, check=True)
    assert "symmetric tilt bicrystal" in out.stdout
    gamma = float(out.stdout.split("gamma_GB = ")[1].split()[0])
    assert 0.01 < gamma < 0.12        # unrelaxed twin, J/m^2
