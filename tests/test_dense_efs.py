"""Transpose-assembled dense-descriptor EFS (`ops/dense.make_dense_efs_fn`)
parity vs the positions-autodiff path: the energy is differentiated
w.r.t. the dense pair/triple VECTORS and forces are assembled through
the featurizer's transpose tables (gather + row reduction) instead of
the gather-VJP scatter. Must match `make_efs_fn` exactly (f64 1e-10)
for radial GRAP and angular SF models, bucketed padding, skewed cells.
"""
import os
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.atomic import AtomicNN
from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
from tensoralloy_tpu.nn.sf import SymmetryFunction
from tensoralloy_tpu.nn.fields import make_efs_fn
from tensoralloy_tpu.ops.dense import make_dense_efs_fn, transpose_reduce


def _structure(seed=0, n=20):
    rng = np.random.RandomState(seed)
    cell = np.eye(3) * 8.5
    cell[1, 0] = 1.1
    frac = rng.uniform(0, 1, (n, 3))
    syms = ["Ni"] * (n // 2) + ["Mo"] * (n - n // 2)
    return Structure.from_symbols(syms, frac @ cell, cell,
                                  pbc=[True] * 3)


def _feats(fz, s, occurs):
    vap = fz.make_vap(s, occurs)
    f = fz.featurize(s, vap, layout="dense", dtype=np.float64,
                     transpose=True)
    f_seg = fz.featurize(s, vap, layout="segment", dtype=np.float64)
    both = dict(f_seg)
    both.update(f)
    return {k: jnp.asarray(v) for k, v in both.items()}


def _compare(model, feats, params):
    ref = jax.jit(make_efs_fn(model.variational_energy))(params, feats)
    new = jax.jit(make_dense_efs_fn(model.variational_energy))(params,
                                                               feats)
    np.testing.assert_allclose(float(new["energy"]),
                               float(ref["energy"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(new["forces"]),
                               np.asarray(ref["forces"]),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new["virial"]),
                               np.asarray(ref["virial"]),
                               rtol=1e-9, atol=1e-10)


def test_transpose_reduce_equals_scatter():
    rng = np.random.RandomState(0)
    s = _structure(1)
    fz = Featurizer(["Mo", "Ni"], rcut=4.5)
    vap = fz.make_vap(s)
    f = fz.featurize(s, vap, layout="dense", transpose=True)
    jd = f["pair_j_d"]
    g = rng.normal(size=jd.shape + (3,))
    g = g * f["pair_mask_d"][..., None]       # pads carry no cotangent
    want = np.zeros((vap.n_atoms_vap, 3))
    np.add.at(want, jd.reshape(-1),
              (g * f["pair_mask_d"][..., None]).reshape(-1, 3))
    # transpose_reduce is component-tuple-in, component-tuple-out
    got = np.stack([np.asarray(c) for c in transpose_reduce(
        tuple(jnp.asarray(g[..., a]) for a in range(3)),
        jnp.asarray(f["pair_trans_d"]),
        jnp.asarray(f["pair_trans_mask_d"]))], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_dense_efs_grap_radial():
    s = _structure(2)
    fz = Featurizer(["Mo", "Ni"], rcut=4.5)
    occurs = Counter(s.symbols)
    for e in occurs:
        occurs[e] += 2                         # bucketed padding rows
    desc = GenericRadialAtomicPotential(
        fz.elements, algorithm="pexp",
        parameters={"rl": [1.0, 2.0, 3.0], "pl": [4.0, 3.0, 2.0]},
        moment_tensors=[0, 1, 2], backend="dense")
    model = AtomicNN(fz, occurs, desc, hidden_sizes=[16],
                     minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(0))
    _compare(model, _feats(fz, s, occurs), params)


def test_dense_efs_sf_angular():
    s = _structure(3, n=14)
    fz = Featurizer(["Mo", "Ni"], rcut=4.5, angular=True)
    occurs = Counter(s.symbols)
    desc = SymmetryFunction(fz.elements, backend="dense")
    model = AtomicNN(fz, occurs, desc, hidden_sizes=[12],
                     minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(1))
    _compare(model, _feats(fz, s, occurs), params)


def _training_batch(fz, structs, occurs):
    """Featurize + batch a few structures with transpose tables and
    synthetic labels, mirroring `train/dataset.py`'s layout."""
    from tensoralloy_tpu.transform.featurizer import batch_features
    sizes = [fz.neighbor_size(s) for s in structs]
    nij = max(x.nij for x in sizes)
    nijk = max(x.nijk for x in sizes)
    nnl = max(x.nnl_tot for x in sizes)
    ntl = max(x.ntl for x in sizes)
    ttr = max(x.ttrans for x in sizes)
    rng = np.random.RandomState(7)
    fl, ll = [], []
    for s in structs:
        vap = fz.make_vap(s, occurs)
        f = fz.featurize(s, vap, nij_max=nij, nijk_max=nijk or None,
                         nnl_max=nnl or None, ntl_max=ntl or None,
                         dtype=np.float64, layout="dense",
                         transpose=True, ttrans_max=ttr or None)
        fl.append(f)
        ll.append({
            "energy": np.float64(rng.normal(-5.0 * len(s), 0.5)),
            "n_atoms": np.float64(len(s)),
            "forces": vap.map_forces(
                rng.normal(0, 0.5, (len(s), 3))).astype(np.float64),
            "stress": rng.normal(0, 0.01, 6).astype(np.float64),
            "has_stress": np.float64(1.0),
        })
    return batch_features(fl), batch_features(ll)


def _trainer(model, force_assembly):
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)
    return Trainer(model, L.LossParameters(),
                   OptParameters(learning_rate=1e-3),
                   TrainParameters(batch_size=3, train_steps=100,
                                   force_assembly=force_assembly),
                   minimize_properties=("energy", "forces", "stress"),
                   n_devices=1)


def test_training_force_assembly_parity():
    """total_loss value AND its parameter gradients must be identical
    (f64) between force_assembly='autodiff' and 'dense' — the whole
    optimizer trajectory is then identical too."""
    fz = Featurizer(["Mo", "Ni"], rcut=4.5, angular=True)
    occurs = Counter({"Mo": 8, "Ni": 8})
    structs = [_structure(seed, n=14) for seed in (10, 11, 12)]
    desc = SymmetryFunction(fz.elements, backend="dense")
    model = AtomicNN(fz, occurs, desc, hidden_sizes=[12],
                     minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(3))
    bf, bl = _training_batch(fz, structs, occurs)
    bf = {k: jnp.asarray(v) for k, v in bf.items()}
    bl = {k: jnp.asarray(v) for k, v in bl.items()}

    def loss_of(tr):
        def f(p):
            loss, _ = tr.total_loss(p, bf, bl, 0)
            return loss
        return jax.jit(jax.value_and_grad(f))

    tr_a = _trainer(model, "autodiff")
    tr_d = _trainer(model, "dense")
    assert tr_a._select_efs(bf) is tr_a.efs
    assert tr_d._select_efs(bf) is tr_d._dense_efs
    va, ga = loss_of(tr_a)(params)
    vd, gd = loss_of(tr_d)(params)
    np.testing.assert_allclose(float(vd), float(va), rtol=1e-10)
    jax.tree_util.tree_map(
        lambda a, d: np.testing.assert_allclose(
            np.asarray(d), np.asarray(a), rtol=1e-8, atol=1e-12),
        ga, gd)


def test_training_force_assembly_gating():
    """'auto' must NEVER route a segment-backend energy through the
    vector-fed path (its energy ignores the pair vectors — forces would
    silently be zero), and must fall back to autodiff when the features
    carry no transpose tables."""
    import pytest
    from tensoralloy_tpu.train.trainer import TrainParameters
    fz = Featurizer(["Mo", "Ni"], rcut=4.5)
    occurs = Counter({"Mo": 8, "Ni": 8})
    kw = dict(algorithm="pexp",
              parameters={"rl": [1.0, 2.5], "pl": [4.0, 2.0]},
              moment_tensors=[0, 1])
    m_seg = AtomicNN(fz, occurs,
                     GenericRadialAtomicPotential(fz.elements,
                                                  backend="segment", **kw),
                     hidden_sizes=[8], minmax_scale=False)
    m_dense = AtomicNN(fz, occurs,
                       GenericRadialAtomicPotential(fz.elements,
                                                    backend="dense", **kw),
                       hidden_sizes=[8], minmax_scale=False)
    feats_tr = {"pair_trans_d": np.zeros((2, 3, 4), np.int32)}
    feats_plain = {"pair_j_d": np.zeros((2, 3), np.int32)}

    tr = _trainer(m_seg, "auto")
    assert tr._dense_efs is None
    assert tr._select_efs(feats_tr) is tr.efs
    with pytest.raises(ValueError, match="segment"):
        _trainer(m_seg, "dense")._select_efs(feats_tr)

    tr = _trainer(m_dense, "auto")
    assert tr._select_efs(feats_tr) is tr._dense_efs
    assert tr._select_efs(feats_plain) is tr.efs
    with pytest.raises(KeyError, match="transpose"):
        _trainer(m_dense, "dense")._select_efs(feats_plain)
    with pytest.raises(ValueError, match="force_assembly"):
        TrainParameters(force_assembly="bogus")


def test_dataset_transpose_tables(tmp_path):
    """Dataset(transpose=True) emits the transpose tables (new cache
    signature) and the trainer's 'auto' resolves to the dense path."""
    from tensoralloy_tpu.io.sqlite import CoreDatabase
    from tensoralloy_tpu.train.dataset import Dataset
    db_path = str(tmp_path / "mini.db")
    db = CoreDatabase(db_path)
    rng = np.random.RandomState(0)
    for seed in range(4):
        s = _structure(seed, n=10)
        s.info["energy"] = float(rng.normal(-50.0, 1.0))
        s.info["forces"] = rng.normal(0, 0.5, (10, 3))
        db.write(s)
    fz = Featurizer(["Mo", "Ni"], rcut=4.5)
    ds0 = Dataset(db, fz, name="mini", test_size=1,
                  cache_dir=str(tmp_path), layout="dense")
    ds1 = Dataset(db, fz, name="mini", test_size=1,
                  cache_dir=str(tmp_path), layout="dense",
                  transpose=True)
    assert ds1.signature != ds0.signature and "-tr" in ds1.signature
    feats, _ = ds1.build(verbose=False)
    assert "pair_trans_d" in feats and "pair_trans_mask_d" in feats
    feats0, _ = ds0.build(verbose=False)
    assert "pair_trans_d" not in feats0


def test_manager_force_assembly_toml(tmp_path, monkeypatch):
    """`train.force_assembly = 'dense'` at the TOML surface: the
    manager makes the Dataset emit transpose tables, the run trains and
    exports end-to-end, and a fresh (non-existent) tfrecords_dir is
    created rather than crashing the cache write. A segment-layout
    pair_style must refuse the knob at construction."""
    import pytest
    from tensoralloy_tpu.io.sqlite import read_file
    from tensoralloy_tpu.train.manager import TrainingManager
    read_file("/root/reference/test_files/datasets/Ni/Ni.extxyz",
              db_path=str(tmp_path / "Ni.db"))
    monkeypatch.chdir(tmp_path)
    toml = tmp_path / "fa.toml"
    toml.write_text("""
precision = "medium"
pair_style = "atomic/grap"
rcut = 4.5
[dataset]
sqlite3 = "Ni.db"
name = "ni_fa"
test_size = 1
tfrecords_dir = "cache_subdir/not_yet_created"
[nn]
minimize = ['energy', 'forces']
[nn.atomic.grap]
moment_tensors = [0, 1]
[train]
model_dir = "m_fa"
train_steps = 3
eval_steps = 3
batch_size = 2
force_assembly = "dense"
""")
    mgr = TrainingManager(str(toml))
    assert mgr.dataset.transpose is True
    mgr.train_and_evaluate(verbose=False)
    # the non-existent nested tfrecords_dir was created for the cache
    assert any((tmp_path / "cache_subdir" / "not_yet_created").iterdir())
    path = mgr.export()
    assert os.path.exists(path)

    bad = tmp_path / "bad.toml"
    bad.write_text(toml.read_text().replace(
        'pair_style = "atomic/grap"', 'pair_style = "eam/alloy"'))
    with pytest.raises(ValueError, match="force_assembly"):
        TrainingManager(str(bad))


def test_calculator_uses_dense_efs_and_matches():
    """The calculator's dense-descriptor path now routes through the
    transpose assembly; results must match a segment-backend calculator
    on the same model weights."""
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    s = _structure(4)
    fz = Featurizer(["Mo", "Ni"], rcut=4.5)
    kw = dict(algorithm="pexp",
              parameters={"rl": [1.0, 2.5], "pl": [4.0, 2.0]},
              moment_tensors=[0, 1])
    d_dense = GenericRadialAtomicPotential(fz.elements, backend="dense",
                                           **kw)
    d_seg = GenericRadialAtomicPotential(fz.elements, backend="segment",
                                         **kw)
    m_dense = AtomicNN(fz, Counter(s.symbols), d_dense,
                       hidden_sizes=[8], minmax_scale=False)
    m_seg = AtomicNN(fz, Counter(s.symbols), d_seg,
                     hidden_sizes=[8], minmax_scale=False)
    params = m_dense.init_params(jax.random.PRNGKey(2))
    c_dense = TensorAlloyCalculator(m_dense, params)
    c_seg = TensorAlloyCalculator(m_seg, params)
    np.testing.assert_allclose(c_dense.get_potential_energy(s),
                               c_seg.get_potential_energy(s),
                               rtol=1e-10)
    np.testing.assert_allclose(c_dense.get_forces(s),
                               c_seg.get_forces(s),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(c_dense.get_stress(s),
                               c_seg.get_stress(s),
                               rtol=1e-8, atol=1e-10)
