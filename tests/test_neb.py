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


def test_neb_runs_with_descriptor_nn():
    """The band evaluator must work for descriptor models (dense
    backend features batched through vmap), not just EAM."""
    from tensoralloy_tpu.nn.sf import SymmetryFunction
    from tensoralloy_tpu.nn.atomic import AtomicNN

    s_i, s_f = _fcc_vacancy_pair()
    fz = Featurizer(["Ni"], rcut=4.5)
    model = AtomicNN(fz, Counter(s_i.symbols),
                     SymmetryFunction(["Ni"]), hidden_sizes=[16],
                     minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(1))
    neb = NEB(model, params, s_i, s_f, n_images=5, chunk_size=5)
    res = neb.run(fmax=1e-9, max_steps=10)   # smoke: 10 FIRE steps
    assert res["n_steps"] == 10
    assert np.all(np.isfinite(res["energies"]))


def test_cli_compute_defect_vacancy_formation(tmp_path):
    """Native vacancy-formation verb: zjw04 Ni should give the known
    ~1.5-1.8 eV EAM vacancy formation energy."""
    import subprocess
    import sys
    from tensoralloy_tpu.io.model import save_model

    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 32}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    mpath = tmp_path / "ni.npz"
    save_model(str(mpath), model, jax.device_get(params))
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute",
         "defect", str(mpath), "Ni", "--supercell", "2", "2", "2"],
        capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines()
            if "vacancy formation energy" in l][0]
    e_f = float(line.split("=")[1].split()[0])
    assert 1.0 < e_f < 2.2


def test_cli_compute_latt(tmp_path):
    """Native lattice-constant verb: zjw04 Ni must recover its own
    a0 = 3.52 A and cohesive energy -4.45 eV/atom."""
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
         "latt", str(mpath), "Ni"],
        capture_output=True, text=True, check=True)
    a0 = float(out.stdout.split("a = ")[1].split()[0])
    e0 = float(out.stdout.split("E0 = ")[1].split()[0])
    assert a0 == pytest.approx(3.52, abs=0.01)
    assert e0 == pytest.approx(-4.45, abs=0.02)


def test_cli_compute_defect_interstitial(tmp_path):
    """Interstitial branch: a Ni self-interstitial at the octahedral
    site of a 2x2x2 supercell lands in the known EAM 3.5-6 eV window
    (well above the ~1.6 eV vacancy)."""
    import subprocess
    import sys
    from tensoralloy_tpu.io.model import save_model

    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 32}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    mpath = tmp_path / "ni.npz"
    save_model(str(mpath), model, jax.device_get(params))
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute",
         "defect", str(mpath), "Ni", "--supercell", "2", "2", "2",
         "--interstitial", "0.25", "0.25", "0.25"],
        capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines()
            if "interstitial formation energy" in l][0]
    e_f = float(line.split("=")[1].split()[0])
    assert 3.0 < e_f < 6.5


def test_neb_replica_sharding_parity():
    """Replica-axis sharding over a 4-device mesh (the reference's
    LAMMPS `-partition Mx1` analog, here a NamedSharding + XLA SPMD):
    bit-for-bit the math of the single-device band, and the band
    state actually lives on 4 devices."""
    s_i, s_f = _fcc_vacancy_pair()
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter(s_i.symbols),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))

    res = {}
    for shards in (1, 4):
        neb = NEB(model, params, s_i, s_f, n_images=8, k=5.0,
                  chunk_size=5, n_shards=shards)
        res[shards] = neb.run(fmax=1e-9, max_steps=10)
        if shards == 4:
            assert len(neb.last_sharding.device_set) == 4
    np.testing.assert_allclose(res[1]["energies"],
                               res[4]["energies"],
                               rtol=1e-10, atol=1e-10)
    assert res[1]["fmax"] == pytest.approx(res[4]["fmax"], rel=1e-8)


def test_neb_shard_validation():
    s_i, s_f = _fcc_vacancy_pair()
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter(s_i.symbols),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divisible"):
        NEB(model, params, s_i, s_f, n_images=7, n_shards=4)
    with pytest.raises(ValueError, match="devices"):
        NEB(model, params, s_i, s_f, n_images=64, n_shards=64)


def test_cli_defect_dipole(tmp_path):
    """--dipole reports the elastic dipole tensor: cubic-symmetric
    (isotropic P for the vacancy in fcc) with a NEGATIVE trace for a
    vacancy (lattice relaxes inward -> relaxation volume < 0 for
    zjw04 Ni)."""
    import re
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
         "defect", str(mpath), "Ni", "--supercell", "2", "2", "2",
         "--dipole"],
        capture_output=True, text=True, check=True)
    assert "elastic dipole tensor P (eV):" in out.stdout
    tr = float(re.search(r"tr\(P\)/3 = (\S+) eV", out.stdout).group(1))
    assert tr < 0.0
    rows = [l for l in out.stdout.splitlines() if l.startswith("  [")]
    vals = [[float(x) for x in r.strip("[] ").split()] for r in rows]
    v = np.asarray(vals)
    # cubic site symmetry: isotropic dipole, small off-diagonals
    assert np.allclose(v, np.eye(3) * v[0, 0], atol=0.05 * abs(tr))
