"""Trajectory observables: RDF / MSD / VACF / diffusion.

Oracles are exact lattice geometry (fcc shell distances and
coordination numbers) and closed-form kinematics (ballistic MSD).
"""
from collections import Counter

import jax
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.analysis.trajectory import (
    diffusion_coefficient, mean_squared_displacement,
    radial_distribution, velocity_autocorrelation)


def _fcc(a0=3.52, reps=3, symbol="Ni"):
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, k] for i in range(reps)
                           for j in range(reps)
                           for k in range(reps)]) / reps
    cell = np.eye(3) * reps * a0
    return Structure.from_symbols([symbol] * len(frac), frac @ cell,
                                  cell, pbc=[True] * 3)


def test_rdf_fcc_shells_and_coordination():
    """Perfect fcc: first peak at a0/sqrt(2) with coordination 12,
    second at a0 with coordination 6."""
    a0 = 3.52
    s = _fcc(a0, reps=3)
    out = radial_distribution(s, rmax=5.2, nbins=260)
    r, g = out["r"], out["Ni-Ni"]
    dr = r[1] - r[0]
    peak1 = r[np.argmax(g)]
    assert peak1 == pytest.approx(a0 / np.sqrt(2), abs=2 * dr)
    # coordination numbers: integrate rho * g * 4 pi r^2 dr per shell
    rho = len(s) / s.volume
    shell = rho * g * 4 * np.pi * r ** 2 * dr
    n1 = shell[r < 0.5 * (a0 / np.sqrt(2) + a0)].sum()
    n2 = shell[(r >= 0.5 * (a0 / np.sqrt(2) + a0)) &
               (r < 0.5 * (a0 + a0 * np.sqrt(1.5)))].sum()
    assert n1 == pytest.approx(12.0, abs=0.01)
    assert n2 == pytest.approx(6.0, abs=0.01)
    # between shells the crystal g(r) is exactly zero
    gap = g[(r > 1.1 * a0 / np.sqrt(2)) & (r < 0.9 * a0)]
    assert np.all(gap == 0.0)


def test_rdf_partials_sum_and_species():
    """Two-species rock-salt-like ordering: cross and same-species
    partials pick out alternating shells; the total is the
    composition-weighted combination of the partials."""
    a0 = 4.0
    reps = 3
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5],
                     [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5],
                     [0.5, 0.5, 0.5]])
    symbols = ["Na", "Na", "Na", "Na", "Cl", "Cl", "Cl", "Cl"]
    frac = np.concatenate([base + [i, j, k] for i in range(reps)
                           for j in range(reps)
                           for k in range(reps)]) / reps
    cell = np.eye(3) * reps * a0
    s = Structure.from_symbols(symbols * reps ** 3, frac @ cell, cell,
                               pbc=[True] * 3)
    out = radial_distribution(s, rmax=5.0, nbins=250)
    r = out["r"]
    # nearest neighbor (a0/2) is strictly Na-Cl
    i_nn = np.argmin(np.abs(r - a0 / 2))
    window = slice(max(0, i_nn - 3), i_nn + 4)
    assert out["Cl-Na"][window].max() > 1.0
    assert out["Na-Na"][window].max() == 0.0
    assert out["Cl-Cl"][window].max() == 0.0
    # total = sum_ab (N_a N_b / N^2) g_ab  (unordered pairs counted
    # once in the output dict, so double the cross term)
    n = len(s)
    recon = (0.25 * out["Na-Na"] + 0.25 * out["Cl-Cl"]
             + 2 * 0.25 * out["Cl-Na"])
    np.testing.assert_allclose(recon, out["total"], atol=1e-3)


def test_rdf_rejects_bad_rmax():
    s = _fcc(3.52, reps=2)
    with pytest.raises(ValueError):
        radial_distribution(s, rmax=0.9 * s.cell[0, 0])


def test_msd_ballistic_and_diffusion():
    """Atoms on straight-line trajectories: MSD(t) = |v|^2 t^2 and
    VACF stays 1; a random walk gives a finite Einstein D."""
    rng = np.random.RandomState(0)
    v = rng.normal(size=(16, 3)) * 0.01
    t = np.arange(50)[:, None, None]
    pos = t * v[None]
    res = mean_squared_displacement(pos, timestep=2.0)
    # v is displacement PER FRAME; frames are 2 fs apart
    lags = res["t"] / 2.0
    expect = np.mean(np.sum(v * v, axis=-1)) * lags ** 2
    np.testing.assert_allclose(res["msd"], expect, rtol=1e-10)
    vel = np.broadcast_to(v, (50, 16, 3))
    vacf = velocity_autocorrelation(vel, timestep=2.0)
    np.testing.assert_allclose(vacf["vacf"], 1.0, atol=1e-12)
    # random walk: MSD ~ 6 D t with D = step_var / (2 dt) per axis
    steps = rng.normal(size=(4000, 64, 3)) * 0.1
    walk = np.cumsum(steps, axis=0)
    d = diffusion_coefficient(walk, timestep=1.0, fit_start=0.2)
    d_expect = 0.1 ** 2 / 2.0
    assert d == pytest.approx(d_expect, rel=0.2)


def test_md_trajectory_roundtrip():
    """record_trajectory=True returns unwrapped positions that feed
    the analysis directly; a hot crystal's RDF first peak broadens but
    stays at the fcc shell."""
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.dynamics import VelocityVerlet
    s = _fcc(3.52, reps=2)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    md = VelocityVerlet(model, params, s, timestep=2.0, skin=1.0,
                        chunk_size=10, seed=11,
                        target_temperature=300.0, friction=0.1)
    hist = md.run(100, record_trajectory=True)
    assert len(hist["positions"]) == 10
    assert hist["positions"][0].shape == (len(s), 3)
    frames = []
    for p, c in zip(hist["positions"], hist["cells"]):
        f = s.copy()
        f.positions, f.cell = p, c
        frames.append(f)
    out = radial_distribution(frames, rmax=3.4, nbins=170)
    peak = out["r"][np.argmax(out["Ni-Ni"])]
    assert peak == pytest.approx(3.52 / np.sqrt(2), abs=0.15)
    res = mean_squared_displacement(
        np.stack(hist["positions"]), timestep=20.0)
    assert np.all(res["msd"] >= 0) and res["msd"].max() < 1.0


def test_vibrational_dos_single_frequency():
    """Synthetic cosine velocities: the VDOS peaks at the driving
    frequency and is normalized to unit integral."""
    from tensoralloy_tpu.analysis.trajectory import vibrational_dos
    f0 = 0.008                      # 1/fs = 8 THz
    dt = 2.0
    t = np.arange(2000) * dt
    rng = np.random.RandomState(0)
    phase = rng.uniform(0, 2 * np.pi, size=(5, 3))
    v = np.cos(2 * np.pi * f0 * t)[:, None, None] \
        * np.cos(phase)[None] + np.sin(2 * np.pi * f0 * t)[
        :, None, None] * np.sin(phase)[None]
    out = vibrational_dos(v, timestep=dt)
    peak = out["freq_thz"][np.argmax(out["dos"])]
    assert peak == pytest.approx(8.0, abs=0.3)
    area = np.trapezoid(out["dos"], out["freq_thz"]) \
        if hasattr(np, "trapezoid") else np.trapz(out["dos"],
                                                  out["freq_thz"])
    assert area == pytest.approx(1.0, rel=1e-6)


def test_vibrational_dos_mass_weighting():
    """Two oscillator groups at different frequencies: mass weighting
    shifts spectral weight toward the heavy group's line in the mass
    ratio (equal velocity amplitudes)."""
    from tensoralloy_tpu.analysis.trajectory import vibrational_dos
    dt, n = 1.0, 4000
    t = np.arange(n) * dt
    v = np.zeros((n, 2, 3))
    v[:, 0, 0] = np.cos(2 * np.pi * 0.004 * t)     # 4 THz, mass 1
    v[:, 1, 0] = np.cos(2 * np.pi * 0.012 * t)     # 12 THz, mass 9
    out = vibrational_dos(v, timestep=dt, masses=np.array([1.0, 9.0]))
    f, d = out["freq_thz"], out["dos"]
    w_lo = d[(f > 2) & (f < 6)].sum()
    w_hi = d[(f > 10) & (f < 14)].sum()
    assert w_hi / w_lo == pytest.approx(9.0, rel=0.1)
    # unweighted: equal lines
    out_u = vibrational_dos(v, timestep=dt)
    f, d = out_u["freq_thz"], out_u["dos"]
    w_lo = d[(f > 2) & (f < 6)].sum()
    w_hi = d[(f > 10) & (f < 14)].sum()
    assert w_hi / w_lo == pytest.approx(1.0, rel=0.1)


def test_vibrational_dos_vs_harmonic_band(ni_eam=None):
    """MD-VDOS of a cold zjw04 Ni crystal lives inside the harmonic
    band: negligible spectral weight above 1.25x the exact q-mesh
    maximum frequency, dominant weight inside the band."""
    from collections import Counter
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.dynamics import VelocityVerlet
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    from tensoralloy_tpu.analysis.phonon import PhononCalculator
    from tensoralloy_tpu.analysis.trajectory import vibrational_dos
    s = _fcc(3.52, reps=2)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    prim = Structure.from_symbols(
        ["Ni"] * 4, np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5],
                              [0, .5, .5]]) * 3.52,
        np.eye(3) * 3.52, pbc=[True] * 3)
    ph = PhononCalculator(TensorAlloyCalculator(model, params), prim,
                          supercell=(2, 2, 2))
    grid, dd = ph.dos(qmesh=(4, 4, 4))
    nu_max = float(grid[dd > 1e-4 * dd.max()].max())
    md = VelocityVerlet(model, params, s, timestep=2.0, skin=1.0,
                        chunk_size=2, seed=3, temperature=150.0)
    hist = md.run(400, record_trajectory=True)
    vel = np.stack(hist["velocities"])
    out = vibrational_dos(vel, timestep=4.0,
                          masses=np.asarray(md.structure.masses))
    f, d = out["freq_thz"], out["dos"]
    in_band = d[f <= 1.1 * nu_max].sum()
    above = d[f > 1.25 * nu_max].sum()
    assert above < 0.1 * in_band
    peak = f[np.argmax(d)]
    assert 1.0 < peak < 1.1 * nu_max


def test_cli_md_traj_to_vdos(tmp_path):
    """`compute md --traj` carries velocities + frame interval through
    extxyz; `compute vdos` turns them into a spectrum whose peak sits
    in the phonon band."""
    import subprocess
    import sys
    from collections import Counter
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.io.model import save_model
    from tensoralloy_tpu.io.extxyz import read_extxyz

    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    mpath = tmp_path / "ni.npz"
    save_model(str(mpath), model, jax.device_get(params))
    traj = tmp_path / "traj.extxyz"
    subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute", "md",
         str(mpath), "Ni", "--supercell", "2", "2", "2",
         "--steps", "300", "--chunk-size", "3", "--timestep", "2.0",
         "--temp", "300", "--traj", str(traj),
         "-o", str(tmp_path / "f.extxyz")],
        capture_output=True, text=True, check=True)
    frames = read_extxyz(str(traj))
    assert "velocities" in frames[0].info
    assert np.asarray(frames[0].info["velocities"]).shape == (32, 3)
    out_csv = tmp_path / "vdos.csv"
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute",
         "vdos", str(traj), "-o", str(out_csv)],
        capture_output=True, text=True, check=True)
    assert "VDOS peak at" in out.stdout
    peak = float(out.stdout.split("VDOS peak at ")[1].split()[0])
    assert 1.0 < peak < 12.0           # inside the Ni phonon band
    assert open(out_csv).readline().strip() == "freq_thz,dos"
