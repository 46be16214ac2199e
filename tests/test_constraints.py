"""Constraint losses: elastic, rose, ediff, fc2, extra-db."""
import os
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN
from tensoralloy_tpu.nn import constraints as C

CRYSTALS = "/root/reference/test_files/crystals"


@pytest.fixture(scope="module")
def ni_model():
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": 4}), custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_get_crystal_from_fixture_toml():
    spec = C.get_crystal(os.path.join(CRYSTALS, "Ni.toml"))
    assert spec.name == "Ni"
    assert spec.bulk_modulus == 188
    assert len(spec.structure) == 1
    assert spec.supercell is not None and len(spec.supercell) == 32
    assert spec.fc2.shape == (32, 32, 3, 3)


def test_elastic_tensor_matches_fd(ni_model):
    """jacfwd-over-grad elastic tensor vs the finite-difference
    analysis-module path on the same zjw04 crystal."""
    model, params = ni_model
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    from tensoralloy_tpu.analysis.elastic import compute_elastic_tensor
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]]) * a0
    s = Structure.from_symbols(["Ni"] * 4, base, np.eye(3) * a0,
                               pbc=[True] * 3)
    feats = C._constant_features(model, s)
    c_ad = np.asarray(C.elastic_tensor(model, params, feats))
    calc = TensorAlloyCalculator(model, params)
    c_fd = compute_elastic_tensor(calc, s, delta=1e-4)
    np.testing.assert_allclose(c_ad, c_fd, atol=0.5)  # GPa


def test_elastic_constraint_loss_and_grad(ni_model, tmp_path):
    model, params = ni_model
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]]) * a0
    s = Structure.from_symbols(["Ni"] * 4, base, np.eye(3) * a0,
                               pbc=[True] * 3)
    spec = C.CrystalSpec(
        name="Ni", structure=s, bulk_modulus=188,
        elastic_constants=[C.ElasticConstant(1, 1, 247.0),
                           C.ElasticConstant(1, 2, 148.0),
                           C.ElasticConstant(4, 4, 125.0)])
    con = C.ElasticConstraint(model, [spec], weight=0.1)
    loss = con.loss(params)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: con.loss(p))(params)
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert gn > 0


def test_rose_constraint(ni_model):
    model, params = ni_model
    opts = C.RoseConstraintOptions(
        crystals=[os.path.join(CRYSTALS, "Ni.toml")],
        weight=1.0, beta=[0.005], xlo=0.94, xhi=1.02, dx=0.02)
    con = C.RoseConstraint(model, opts)
    assert len(con.entries) == 1
    loss = float(con.loss(params))
    assert np.isfinite(loss)
    g = jax.grad(lambda p: con.loss(p))(params)
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert gn > 0


def test_ediff_constraint(ni_model):
    model, params = ni_model
    a0 = 3.52
    fcc = Structure.from_symbols(
        ["Ni"] * 4,
        np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                  [0, 0.5, 0.5]]) * a0,
        np.eye(3) * a0, pbc=[True] * 3)
    bcc = Structure.from_symbols(
        ["Ni"] * 2, np.array([[0, 0, 0], [0.5, 0.5, 0.5]]) * 2.8,
        np.eye(3) * 2.8, pbc=[True] * 3)
    con = C.EnergyDifferenceConstraint(
        model, references=[C.CrystalSpec("fcc", fcc)],
        crystals=[C.CrystalSpec("bcc", bcc)], diffs=[0.05])
    loss = float(con.loss(params))
    assert np.isfinite(loss)
    # zjw04: check the residual equals the direct energy difference
    er = float(model.clone_for(Counter({"Ni": 4})).variational_energy(
        params, C._constant_features(
            model.clone_for(Counter({"Ni": 4})), fcc))) / 4
    et = float(model.clone_for(Counter({"Ni": 2})).variational_energy(
        params, C._constant_features(
            model.clone_for(Counter({"Ni": 2})), bcc))) / 2
    assert loss == pytest.approx(abs((et - er) - 0.05), abs=1e-8)


def test_fc2_constraint(ni_model):
    model, params = ni_model
    con = C.ForceConstantsConstraint(
        model, [os.path.join(CRYSTALS, "Ni.toml")], weight=1.0)
    assert len(con.entries) == 1
    loss = float(con.loss(params))
    assert np.isfinite(loss)


def test_extra_db_constraint(ni_model, tmp_path):
    from tensoralloy_tpu.io.sqlite import read_file
    db = read_file("/root/reference/test_files/datasets/Ni/Ni.extxyz",
                   db_path=str(tmp_path / "ni.db"))
    model, params = ni_model
    con = C.ExtraDatabaseConstraint(
        model, str(tmp_path / "ni.db"), weight=1.0,
        minimize=("energy", "forces"))
    loss = float(con.loss(params))
    assert np.isfinite(loss)


def test_constraint_training_no_nan(ni_model):
    """Gradient-step regression: training with elastic+rose constraints
    must stay finite (jnp.linalg.norm at exactly-zero equilibrium
    forces used to produce NaN gradients)."""
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)
    from tensoralloy_tpu.transform.featurizer import batch_features
    import jax.numpy as jnp

    model, params = ni_model
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]]) * a0
    eq = Structure.from_symbols(["Ni"] * 4, base, np.eye(3) * a0,
                                pbc=[True] * 3)
    spec = C.CrystalSpec(
        "Ni", eq, bulk_modulus=188,
        elastic_constants=[C.ElasticConstant(1, 1, 247.0)])
    elastic = C.ElasticConstraint(model, [spec], weight=0.1)
    rose = C.RoseConstraint(model, C.RoseConstraintOptions(
        crystals=[spec], weight=1.0, beta=[0.005], xlo=0.96, xhi=1.02,
        dx=0.02))

    rng = np.random.RandomState(0)
    fz = model.featurizer
    feats_list, labels_list = [], []
    sizes = []
    structs = []
    for _ in range(4):
        pos = base + rng.normal(0, 0.05, (4, 3))
        s = Structure.from_symbols(["Ni"] * 4, pos, np.eye(3) * a0,
                                   pbc=[True] * 3)
        structs.append(s)
        sizes.append(fz.neighbor_size(s).nij)
    nij_max = max(sizes)
    from collections import Counter
    for s in structs:
        vap = fz.make_vap(s, Counter({"Ni": 4}))
        feats_list.append(fz.featurize(s, vap, nij_max=nij_max))
        labels_list.append({
            "energy": np.float64(-22.0), "n_atoms": np.float64(4),
            "forces": np.zeros((5, 3)), "stress": np.zeros(6),
            "has_stress": np.float64(0), "weights": np.ones(3)})
    feats = batch_features(feats_list)
    labels = batch_features(labels_list)
    trainer = Trainer(model, L.LossParameters(),
                      OptParameters(learning_rate=1e-4),
                      TrainParameters(batch_size=4, train_steps=4,
                                      eval_steps=100, log_steps=100),
                      minimize_properties=("energy", "forces"),
                      n_devices=1, constraints=[elastic, rose])
    metrics_seen = []
    out = trainer.fit(feats, labels, verbose=False,
                      callback=lambda s, st, m: metrics_seen.append(
                          float(m["loss/total"])))
    assert all(np.isfinite(v) for v in metrics_seen), metrics_seen


def test_built_in_crystal_library():
    """Named crystals resolve from the bundled library (reference
    `nn/constraint/data.py:91-180` + `data/crystals/`)."""
    from collections import Counter as C
    from tensoralloy_tpu.nn.constraints import get_crystal
    ni = get_crystal("Ni")
    assert ni.phase == "fcc" and len(ni.structure) == 4
    assert ni.bulk_modulus == 188
    cij = {(e.vi, e.vj): e.value for e in ni.elastic_constants}
    assert cij[(1, 1)] == 276 and cij[(4, 4)] == 132

    be = get_crystal("Be/dft")
    assert len(be.structure) == 2 and be.bulk_modulus == 120

    ni3mo = get_crystal("Ni3Mo")
    assert dict(C(ni3mo.structure.symbols)) == {"Ni": 6, "Mo": 2}
    mo = get_crystal("Mo/dft")
    assert np.allclose(np.linalg.norm(mo.structure.cell[0]), 3.168)


def test_reference_format_elastic_toml():
    """The reference's flat-cNM TOML schema loads unmodified
    (`data/crystals/Ni3Mo_elastic_tensor.toml`)."""
    from tensoralloy_tpu.nn.constraints import get_crystal
    from tensoralloy_tpu.data.crystals import crystal_data_dir
    spec = get_crystal("Ni3Mo_elastic_tensor.toml",
                       base_dir=crystal_data_dir())
    assert spec.name == "Ni3Mo"
    cij = {(e.vi, e.vj): (e.value, e.weight)
           for e in spec.elastic_constants}
    assert cij[(1, 1)] == (385.0, 1.0)
    assert cij[(6, 6)] == (94.0, 0.0)   # [value, weight] form


def test_elastic_constraint_from_name():
    """An elastic constraint built from a name-only crystal list
    produces a finite, differentiable loss (VERDICT missing #4)."""
    from collections import Counter as C
    from tensoralloy_tpu.nn.constraints import ElasticConstraint
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, C({"Ni": 4}), custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    con = ElasticConstraint(model, ["Ni"], weight=0.1)
    val = float(con.loss(params))
    assert np.isfinite(val) and val >= 0
    g = jax.grad(lambda p: con.loss(p))(params)
    gn = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
