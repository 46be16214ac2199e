"""Native NEB: vacancy migration barrier in zjw04 fcc Ni.

Reference parity target: the reference can only emit a LAMMPS replica
deck for NEB (`analysis/lammps/calcs.py`); here the whole band
relaxes on device. The test drives the climbing-image band on a
31-atom fcc Ni vacancy cell and checks physical invariants: forward
and reverse barriers agree (the hop is symmetric), the saddle is the
band maximum, and the barrier has the ~1 eV magnitude expected for Ni
vacancy migration with an EAM potential.
"""
from collections import Counter

import numpy as np
import pytest
import jax

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam.models import EamAlloyNN
from tensoralloy_tpu.calculator import TensorAlloyCalculator
from tensoralloy_tpu.analysis.elastic import relax_positions
from tensoralloy_tpu.neb import NEB, interpolate_band


def _fcc_vacancy_pair(a0=3.52, reps=2):
    """(initial, final) 2x2x2 fcc Ni cells with one vacancy; in the
    final frame the nearest neighbor has hopped into the vacancy."""
    base = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                     [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    frac = np.concatenate([base + np.array([i, j, k])
                           for i in range(reps)
                           for j in range(reps)
                           for k in range(reps)]) / reps
    cell = np.eye(3) * a0 * reps
    pos = frac @ cell
    vac_site = pos[0].copy()
    pos = pos[1:]                      # remove site 0 -> vacancy
    # migrating atom: nearest neighbor of the vacancy (minimum image)
    d = pos - vac_site
    f = d @ np.linalg.inv(cell)
    d = (f - np.round(f)) @ cell
    hop = int(np.argmin(np.linalg.norm(d, axis=1)))
    pos_final = pos.copy()
    pos_final[hop] = pos[hop] - d[hop]   # lands exactly on the site
    syms = ["Ni"] * len(pos)
    s_i = Structure.from_symbols(syms, pos, cell, pbc=[True] * 3)
    s_f = Structure.from_symbols(syms, pos_final, cell, pbc=[True] * 3)
    return s_i, s_f


def test_interpolate_band_minimum_image():
    s_i, s_f = _fcc_vacancy_pair()
    band = interpolate_band(s_i, s_f, 5)
    assert band.shape == (5, len(s_i), 3)
    np.testing.assert_allclose(band[0], s_i.positions, atol=1e-12)
    np.testing.assert_allclose(band[-1], s_f.positions, atol=1e-12)
    # the hop must take the short way: every per-image step is small
    steps = np.linalg.norm(np.diff(band, axis=0), axis=-1)
    assert steps.max() < 1.0


def test_neb_vacancy_migration_zjw04_ni():
    s_i, s_f = _fcc_vacancy_pair()
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter(s_i.symbols),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    calc = TensorAlloyCalculator(model, params)
    s_i = relax_positions(calc, s_i, fmax=0.02, steps=300)
    s_f = relax_positions(calc, s_f, fmax=0.02, steps=300)

    neb = NEB(model, params, s_i, s_f, n_images=7, k=5.0, climb=True,
              chunk_size=25)
    res = neb.run(fmax=0.08, max_steps=600)

    assert res["converged"], f"fmax stuck at {res['fmax']}"
    # symmetric hop: endpoints degenerate, barriers match
    assert abs(res["delta_e"]) < 0.02
    assert abs(res["barrier"] - res["reverse_barrier"]) < 0.05
    # Ni vacancy migration with EAM: ~1 eV (loose physical bracket)
    assert 0.4 < res["barrier"] < 2.0
    # saddle replica is the band maximum and climbing pinned it there
    e = res["energies"]
    assert np.argmax(e) == res["saddle_index"]
    saddle = neb.saddle_structure()
    assert len(saddle) == len(s_i)
