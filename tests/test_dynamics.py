"""Device-resident MD: NVE energy conservation with autodiff forces."""
from collections import Counter

import jax
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN
from tensoralloy_tpu.dynamics import (VelocityVerlet,
                                      maxwell_boltzmann_velocities, KB)


def test_maxwell_boltzmann():
    masses = np.full(500, 58.69)
    v = maxwell_boltzmann_velocities(masses, 300.0, seed=1)
    assert v.shape == (500, 3)
    # COM at rest
    np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=1e-12)
    # temperature within sampling noise
    from tensoralloy_tpu.dynamics import FORCE_TO_ACC
    ke = 0.5 * np.sum(masses[:, None] * v ** 2) / FORCE_TO_ACC
    t = 2 * ke / (3 * 500 * KB)
    assert t == pytest.approx(300.0, rel=0.15)


def test_nve_energy_conservation():
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, 0]
                           for i in range(2) for j in range(2)])
    s = Structure.from_symbols(
        ["Ni"] * len(frac), frac * a0,
        np.diag([2 * a0, 2 * a0, a0]), pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    md = VelocityVerlet(model, params, s, timestep=1.0, skin=1.0,
                        chunk_size=10, temperature=300.0, seed=3)
    t0 = md.temperature
    assert t0 == pytest.approx(300.0, rel=0.5)
    hist = md.run(40)
    tot = np.asarray(hist["total"])
    drift_mev_per_atom = abs(tot[-1] - tot[0]) / len(s) * 1000
    assert drift_mev_per_atom < 0.5
    # energy flowed from kinetic to potential (started at the minimum)
    assert hist["kinetic"][-1] < hist["kinetic"][0] * 1.5


def test_fast_and_autodiff_md_trajectories_match():
    """The scatter-free fast EFS drives EAM MD by default; the
    autodiff path stays available (fast_efs=False) and identical-seed
    NVE trajectories through both paths must agree to f64 tightness —
    a resumed run must not fork depending on which path built it."""
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, k] for i in range(2)
                           for j in range(2) for k in range(2)])
    s = Structure.from_symbols(["Ni"] * len(frac), frac * a0,
                               np.eye(3) * 2 * a0, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    md_fast = VelocityVerlet(model, params, s, timestep=1.0,
                             chunk_size=5, temperature=400.0, seed=5)
    assert md_fast._use_fast_efs
    md_auto = VelocityVerlet(model, params, s, timestep=1.0,
                             chunk_size=5, temperature=400.0, seed=5,
                             fast_efs=False)
    assert not md_auto._use_fast_efs
    h_f = md_fast.run(15, record_trajectory=True)
    h_a = md_auto.run(15, record_trajectory=True)
    np.testing.assert_allclose(np.asarray(h_f["positions"]),
                               np.asarray(h_a["positions"]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(h_f["potential"]),
                               np.asarray(h_a["potential"]),
                               rtol=1e-10)


def test_langevin_nvt_thermalizes():
    """BAOAB Langevin: starting from rest, the kinetic temperature
    must equilibrate to the target within sampling noise."""
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, k] for i in range(2)
                           for j in range(2) for k in range(2)]) / 2
    s = Structure.from_symbols(["Ni"] * len(frac),
                               frac @ (np.eye(3) * 2 * a0),
                               np.eye(3) * 2 * a0, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    md = VelocityVerlet(model, params, s, timestep=2.0, skin=1.0,
                        chunk_size=25, seed=5,
                        target_temperature=500.0, friction=0.1)
    hist = md.run(500)
    temps = np.asarray(hist["temperature"])
    # equilibration: mean of the second half near the target
    # (instantaneous T of 32 atoms fluctuates with sigma ~ 0.15 T)
    t_mean = temps[len(temps) // 2:].mean()
    assert 350.0 < t_mean < 650.0
    # energy is NOT conserved (thermostat pumps heat in from rest)
    assert hist["kinetic"][-1] > hist["kinetic"][0] + 0.1


def test_npt_berendsen_relaxes_pressure():
    """Isotropic Berendsen barostat: a compressed fcc Ni cell under
    NPT at P0 = 0 must expand toward the zero-pressure volume, with
    the instantaneous pressure magnitude decaying."""
    a0 = 3.40          # zjw04 equilibrium ~3.52 -> strong compression
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, k] for i in range(2)
                           for j in range(2) for k in range(2)]) / 2
    s = Structure.from_symbols(["Ni"] * len(frac),
                               frac @ (np.eye(3) * 2 * a0),
                               np.eye(3) * 2 * a0, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    md = VelocityVerlet(model, params, s, timestep=2.0, skin=1.0,
                        chunk_size=25, seed=7,
                        target_temperature=300.0, friction=0.1,
                        target_pressure=0.0, pressure_tau=500.0)
    v0 = abs(np.linalg.det(s.cell))
    hist = md.run(400)
    assert "pressure" in hist and "volume" in hist
    p = np.asarray(hist["pressure"])
    v = np.asarray(hist["volume"])
    # compression -> large positive initial pressure
    assert p[0] > 5.0
    # the barostat lets the cell expand...
    assert v[-1] > v0 * 1.02
    # ...and the pressure relaxes most of the way to the target
    assert abs(p[-1]) < 0.5 * p[0]
    # positions followed the cell (structure updated in place)
    assert abs(np.linalg.det(md.structure.cell)) == pytest.approx(
        v[-1], rel=1e-6)


def test_npt_anisotropic_relaxes_deviatoric_strain():
    """Full-tensor Berendsen: a cell strained +4% along x ONLY carries
    a deviatoric stress the scalar barostat cannot remove (it rescales
    isotropically); the anisotropic barostat must relax sigma_xx
    toward the target while y/z stay near their natural lengths."""
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, k] for i in range(2)
                           for j in range(2) for k in range(2)]) / 2
    cell = np.diag([2 * a0 * 1.04, 2 * a0, 2 * a0])
    s = Structure.from_symbols(["Ni"] * len(frac), frac @ cell, cell,
                               pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    md = VelocityVerlet(model, params, s, timestep=2.0, skin=1.0,
                        chunk_size=25, seed=11,
                        target_temperature=50.0, friction=0.1,
                        target_pressure=0.0, pressure_tau=200.0,
                        anisotropic=True)
    md.run(1500)
    c = np.asarray(md.structure.cell)
    lx, ly, lz = c[0, 0], c[1, 1], c[2, 2]
    # x relaxed most of the way back toward 2*a0; y/z moved far less
    assert abs(lx / (2 * a0) - 1.0) < 0.02, lx
    assert abs(ly / (2 * a0) - 1.0) < 0.02, ly
    assert abs(lz / (2 * a0) - 1.0) < 0.02, lz
    # and the anisotropy itself is gone (started at 4%)
    assert abs(lx - ly) / ly < 0.015
    # no systematic shear builds up from a diagonal start (the
    # symmetric mu responds to thermal shear-stress fluctuations at
    # the 1e-4 A level — that is physics, not drift)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-3 * a0


def test_npt_anisotropic_requires_target_pressure():
    s = Structure.from_symbols(["Ni"], [[0, 0, 0]],
                               np.eye(3) * 3.52, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": 1}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="anisotropic"):
        VelocityVerlet(model, params, s, anisotropic=True)


def test_npt_requires_full_pbc():
    s = Structure.from_symbols(["Ni"], [[0, 0, 0]],
                               np.eye(3) * 3.52,
                               pbc=[True, True, False])
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": 1}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        VelocityVerlet(model, params, s, target_pressure=0.0)


def test_langevin_requires_both_knobs():
    s = Structure.from_symbols(["Ni"], [[0, 0, 0]],
                               np.eye(3) * 3.52, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": 1}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        VelocityVerlet(model, params, s, target_temperature=300.0)


def test_cli_compute_md(tmp_path):
    """`compute md` verb: NVT run from a saved zjw04 Ni model writes
    the final frame + thermo CSV and reports a finite temperature."""
    import subprocess
    import sys
    from tensoralloy_tpu.io.model import save_model
    from tensoralloy_tpu.io.extxyz import read_extxyz

    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    mpath = tmp_path / "ni.npz"
    save_model(str(mpath), model, jax.device_get(params))
    out_xyz = tmp_path / "final.extxyz"
    thermo = tmp_path / "thermo.csv"
    out = subprocess.run(
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute", "md",
         str(mpath), "Ni", "--supercell", "2", "2", "2",
         "--steps", "40", "--chunk-size", "10", "--nvt", "400",
         "--timestep", "2.0", "-o", str(out_xyz),
         "--thermo", str(thermo)],
        capture_output=True, text=True, check=True)
    assert "NVT: 32 atoms" in out.stdout
    t_final = float(out.stdout.split("final T = ")[1].split()[0])
    assert 0.0 < t_final < 2000.0
    final = read_extxyz(str(out_xyz))[0]
    assert len(final) == 32
    header = open(thermo).readline().strip().split(",")
    assert "potential" in header and "temperature" in header
    assert len(open(thermo).readlines()) == 5  # header + 4 chunks


def test_cli_compute_md_npt_rejects_without_nvt(tmp_path):
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
        [sys.executable, "-m", "tensoralloy_tpu.cli", "compute", "md",
         str(mpath), "Ni", "--steps", "10", "--npt", "0.0"],
        capture_output=True, text=True)
    assert out.returncode != 0
    assert "--npt needs --nvt" in out.stderr


def test_md_save_load_state_bit_exact(tmp_path):
    """run(10); save; fresh integrator; load; run(10) == run(20)
    straight — bit-exact for Langevin NVT too (the RNG key is part of
    the state)."""
    s = _fcc(3.52, reps=2) if "_fcc" in dir() else None
    from collections import Counter as _C
    import numpy as _np
    base = _np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5],
                      [0, .5, .5]])
    frac = _np.concatenate([base + [i, j, k] for i in range(2)
                            for j in range(2) for k in range(2)])
    s = Structure.from_symbols(["Ni"] * 32, frac * 3.52,
                               _np.eye(3) * 7.04, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, _C({"Ni": 32}), custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))

    kw = dict(timestep=2.0, chunk_size=5, temperature=300.0, seed=7,
              target_temperature=300.0, friction=0.1)
    md_a = VelocityVerlet(model, params, s, **kw)
    md_a.run(20)

    md_b1 = VelocityVerlet(model, params, s, **kw)
    md_b1.run(10)
    state = tmp_path / "md_state.npz"
    md_b1.save_state(str(state))
    md_b2 = VelocityVerlet(model, params, s, **kw)
    md_b2.load_state(str(state))
    md_b2.run(10)

    np.testing.assert_array_equal(md_b2.structure.positions,
                                  md_a.structure.positions)
    np.testing.assert_array_equal(md_b2.velocities_vap,
                                  md_a.velocities_vap)

    # mismatched system rejected
    s3 = Structure.from_symbols(["Ni"], [[0, 0, 0]],
                                np.eye(3) * 3.52, pbc=[True] * 3)
    md_c = VelocityVerlet(model, params, s3)
    with pytest.raises(ValueError, match="does not match"):
        md_c.load_state(str(state))
