"""Transpose-assembled dense-descriptor EFS (`ops/dense.make_dense_efs_fn`)
parity vs the positions-autodiff path: the energy is differentiated
w.r.t. the dense pair/triple VECTORS and forces are assembled through
the featurizer's transpose tables (gather + row reduction) instead of
the gather-VJP scatter. Must match `make_efs_fn` exactly (f64 1e-10)
for radial GRAP and angular SF models, bucketed padding, skewed cells.
"""
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
    got = transpose_reduce(jnp.asarray(g),
                           jnp.asarray(f["pair_trans_d"]),
                           jnp.asarray(f["pair_trans_mask_d"]))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


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
