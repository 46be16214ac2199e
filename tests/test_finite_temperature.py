"""Finite-temperature model: heads, F = U - T S, forces from free
energy, training on the Be 4000K fixture."""
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoralloy_tpu.io.extxyz import read_extxyz
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
from tensoralloy_tpu.nn.finite_temperature import \
    TemperatureDependentAtomicNN
from tensoralloy_tpu.nn.fields import make_efs_fn

FIXTURE = "/root/reference/test_files/Be_liquid_4000K_TS.extxyz"


@pytest.fixture(scope="module")
def be_structure():
    s = read_extxyz(FIXTURE)[0]
    assert s.info["etemperature"] == pytest.approx(0.34469373)
    assert "eentropy" in s.info
    return s


def _make_model(n_atoms):
    fz = Featurizer(["Be"], rcut=4.5)
    grap = GenericRadialAtomicPotential(
        ["Be"], algorithm="pexp",
        parameters={"rl": [1.0, 2.0, 3.0], "pl": [2.0, 2.0, 2.0]},
        param_space_method="pair", moment_tensors=[0, 1, 2])
    model = TemperatureDependentAtomicNN(
        fz, Counter({"Be": n_atoms}), grap, layers=[16, 8],
        hidden_sizes=[8], minmax_scale=False,
        atomic_static_energy={"Be": -3.0})
    return fz, model


def test_td_heads_and_free_energy(be_structure):
    s = be_structure
    fz, model = _make_model(len(s))
    params = model.init_params(jax.random.PRNGKey(0))
    assert set(params["Be"]) == {"trunk", "head_u", "head_s"}
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    ops = model.energy_ops(params, feats)
    u, sS, f = (float(ops["energy"]), float(ops["eentropy"]),
                float(ops["free_energy"]))
    t = float(feats["etemperature"])
    assert f == pytest.approx(u - t * sS, abs=1e-9)
    # at T = 0, F == U and S contributes nothing to forces
    feats0 = dict(feats)
    feats0["etemperature"] = jnp.asarray(0.0)
    ops0 = model.energy_ops(params, feats0)
    assert float(ops0["free_energy"]) == pytest.approx(
        float(ops0["energy"]), abs=1e-12)


def test_td_forces_differentiate_free_energy(be_structure):
    s = be_structure
    fz, model = _make_model(len(s))
    params = model.init_params(jax.random.PRNGKey(1))
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    efs = jax.jit(make_efs_fn(model.variational_energy))
    out = efs(params, feats)
    forces = np.asarray(out["forces"])
    eps = 1e-5
    pos0 = np.asarray(feats["positions"])
    for row, alpha in [(1, 0), (50, 2)]:
        fp = dict(feats)
        pp = pos0.copy()
        pp[row, alpha] += eps
        fp["positions"] = jnp.asarray(pp)
        fplus = float(model.variational_energy(params, fp))
        pp[row, alpha] -= 2 * eps
        fp["positions"] = jnp.asarray(pp)
        fminus = float(model.variational_energy(params, fp))
        fd = -(fplus - fminus) / (2 * eps)
        # abs floor: central FD of an ~50 eV energy carries one-ULP
        # noise of ~1e-13/(2 eps) eV/A even in f64
        assert fd == pytest.approx(forces[row, alpha], rel=1e-5,
                                   abs=5e-8)
    # the plain energy (U) gradient differs from the F gradient
    gU = jax.grad(lambda p: model.energy(params, dict(feats, positions=p))
                  )(feats["positions"])
    assert not np.allclose(np.asarray(gU), -forces, atol=1e-8)


def test_td_training_and_calculator(be_structure, tmp_path):
    """Short training run on the Be fixture + export round-trip."""
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)
    from tensoralloy_tpu.transform.featurizer import batch_features
    from tensoralloy_tpu.io.model import save_model
    from tensoralloy_tpu.calculator import TensorAlloyCalculator

    s = be_structure
    fz, model = _make_model(len(s))
    vap = fz.make_vap(s, model.max_occurs)
    feats = fz.featurize(s, vap, dtype=np.float64)
    labels = {
        "energy": np.float64(s.energy),
        "n_atoms": np.float64(len(s)),
        "forces": vap.map_forces(s.forces),
        "stress": np.asarray(s.stress),
        "has_stress": np.float64(1.0),
        "weights": np.ones(3),
        "eentropy": np.float64(s.info["eentropy"]),
        "free_energy": np.float64(s.info.get("free_energy", s.energy)),
    }
    bf = batch_features([feats, feats])
    bl = batch_features([labels, labels])
    trainer = Trainer(
        model, L.LossParameters(
            energy=L.LossOptions(per_atom_loss=True),
            eentropy=L.LossOptions(method="ylogy", per_atom_loss=True),
            free_energy=L.LossOptions(per_atom_loss=True)),
        OptParameters(learning_rate=1e-3),
        TrainParameters(batch_size=2, train_steps=10, eval_steps=100),
        minimize_properties=("energy", "forces", "eentropy",
                             "free_energy"),
        n_devices=1)
    out = trainer.fit(bf, bl, verbose=False)
    assert int(out["state"]["step"]) == 10

    params = jax.device_get(out["state"]["ema_params"])
    path = str(tmp_path / "be_td.npz")
    save_model(path, model, params)
    calc = TensorAlloyCalculator(path)
    e = calc.get_potential_energy(s)
    f = calc.get_free_energy(s)
    ss = calc.get_electron_entropy(s)
    t = s.info["etemperature"]
    assert f == pytest.approx(e - t * ss, abs=1e-6)
    assert calc.get_forces(s).shape == (len(s), 3)


def test_benn_entropy_head(be_structure):
    """Be free-electron entropy: S = S0(T) * softplus(NN) with the
    fitted semi-analytic S0 (reference `special/beryllium.py`)."""
    from tensoralloy_tpu.nn.special import BeNN
    s = be_structure
    fz = Featurizer(["Be"], rcut=4.5)
    grap = GenericRadialAtomicPotential(
        ["Be"], algorithm="pexp",
        parameters={"rl": [1.0, 2.0], "pl": [2.0, 2.0]},
        param_space_method="pair", moment_tensors=[0, 1])
    model = BeNN(fz, Counter({"Be": len(s)}), grap, layers=[8, 4],
                 hidden_sizes=[4], minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(0))
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    ops = model.energy_ops(params, feats)
    t = float(feats["etemperature"])
    assert float(ops["free_energy"]) == pytest.approx(
        float(ops["energy"]) - t * float(ops["eentropy"]), abs=1e-9)
    # entropy head is positive-definite scaled S0 (softplus factor)
    heads = model._atomic_heads(params, feats)
    a, b, c, d = BeNN._A, BeNN._B, BeNN._C, BeNN._D
    ft = max(1.0 - d * t, 0.0) ** 2
    s0 = a * t * t * ft + b * t + c * (1 - ft)
    per_atom = np.asarray(heads["eentropy"])[1:]
    assert np.all(np.sign(per_atom) == np.sign(s0))
    # model roundtrips through the saved-model registry
    from tensoralloy_tpu.io.model import save_model, load_model
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "be.npz")
        save_model(path, model, jax.device_get(params))
        model2, params2, _ = load_model(path)
        assert type(model2).__name__ == "BeNN"
        ops2 = model2.energy_ops(params2, feats)
        assert float(ops2["energy"]) == pytest.approx(
            float(ops["energy"]), abs=1e-9)


def test_td_molecular_dynamics_conserves_free_energy(be_structure):
    """Two-temperature MD: at fixed electronic temperature the forces
    are -dF/dR, so the conserved quantity is F + KE (NOT U + KE when
    the entropy has spatial dependence)."""
    from tensoralloy_tpu.dynamics import VelocityVerlet
    s = be_structure.copy()
    fz, model = _make_model(len(s))
    params = model.init_params(jax.random.PRNGKey(2))
    # Be is light (9 amu) and the random-init PES is steep: 0.25 fs
    # (0.5 fs heats the fixture liquid into runaway within 40 steps)
    md = VelocityVerlet(model, params, s, timestep=0.25, skin=1.0,
                        chunk_size=10, temperature=300.0, seed=4)
    hist = md.run(40)
    tot = np.asarray(hist["total"])    # potential here IS F
    drift = abs(tot[-1] - tot[0]) / len(s) * 1000
    assert drift < 0.2                 # meV/atom over 10 fs
    # the electronic temperature actually matters: forces at T_e = 0
    # differ from the fixture's 0.34 eV electronic temperature
    from tensoralloy_tpu.nn.fields import make_efs_fn
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    efs = make_efs_fn(model.variational_energy)
    f_hot = np.asarray(efs(params, feats)["forces"])
    feats0 = dict(feats)
    feats0["etemperature"] = jnp.zeros_like(feats["etemperature"])
    f_cold = np.asarray(efs(params, feats0)["forces"])
    # random-init entropy heads have a tiny but strictly nonzero
    # spatial gradient — well above f64 noise, well below trained scale
    assert np.abs(f_hot - f_cold).max() > 1e-10
