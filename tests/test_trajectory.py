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
