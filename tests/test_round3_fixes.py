"""Round-3 fixes.

- Rematerialized pair-chunk EAM/ADP evaluation (`EamNN.energy_chunked`)
  is exact vs the monolithic path for energy, forces and stress — the
  mechanism that fits 128k+-atom inference on one chip (reference did
  128k atoms on an 11 GB GPU, `cpc_speed.py:36-74`).
- The device-resident dataset path honors a byte cap and falls back to
  host streaming instead of OOMing HBM at upload time
  (`TrainParameters.device_dataset_max_gb`).
- The whole-set min/max descriptor sweep chunks adaptively from a
  working-set estimate (a fixed 512-structure chunk OOMed a 16 GiB chip
  at binary Mo-Ni padding with GRAP moments 0-5).
- The threaded native neighbor list is deterministic across thread
  counts (two-pass count/prefix/write over atom ranges).
"""
import os
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import AdpNN, EamAlloyNN, EamFsNN
from tensoralloy_tpu.nn.fields import make_efs_fn


def _moni_structure(n_cell=2, a0=3.6, seed=0):
    rng = np.random.RandomState(seed)
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, k]
                           for i in range(n_cell)
                           for j in range(n_cell)
                           for k in range(n_cell)])
    pos = frac * a0 + rng.normal(scale=0.08, size=(len(frac), 3))
    symbols = ["Ni" if k % 3 else "Mo" for k in range(len(frac))]
    return Structure.from_symbols(symbols, pos, np.eye(3) * a0 * n_cell,
                                  pbc=[True] * 3)


@pytest.mark.parametrize("cls", [EamAlloyNN, EamFsNN, AdpNN])
def test_chunked_energy_matches_monolithic(cls):
    s = _moni_structure()
    fz = Featurizer(["Mo", "Ni"], rcut=6.0)
    vap = fz.make_vap(s)
    feats = {k: jnp.asarray(v)
             for k, v in fz.featurize(s, vap, dtype=np.float64).items()}
    model = cls(fz, Counter({"Mo": 11, "Ni": 21}))
    params = model.init_params(jax.random.PRNGKey(0))
    ref = jax.jit(make_efs_fn(model.energy))(params, feats)
    nij = feats["pair_i"].shape[0]
    # a chunk that does NOT divide nij exercises the padded tail block
    for chunk in (max(1, nij // 3 - 1), nij, 10 * nij):
        out = jax.jit(make_efs_fn(
            model.make_chunked_energy_fn(chunk)))(params, feats)
        np.testing.assert_allclose(out["energy"], ref["energy"],
                                   rtol=0, atol=1e-8)
        np.testing.assert_allclose(out["forces"], ref["forces"],
                                   rtol=0, atol=1e-8)
        np.testing.assert_allclose(out["stress"], ref["stress"],
                                   rtol=0, atol=1e-10)


def test_device_dataset_byte_cap_falls_back(capsys):
    """A padded set larger than the cap streams from the host (and
    still trains); results match the device-resident path bit-exactly
    is covered by test_round2_fixes — here we pin the fallback fires."""
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn.sf import SymmetryFunction
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (
        OptParameters, Trainer, TrainParameters)

    rng = np.random.RandomState(0)
    fz = Featurizer(["Ni"], rcut=4.0)
    max_occurs = Counter({"Ni": 6})
    flist, llist = [], []
    for k in range(8):
        pos = rng.uniform(0.8, 5.2, (6, 3))
        s = Structure.from_symbols(["Ni"] * 6, pos, np.eye(3) * 6.0,
                                   pbc=[True] * 3)
        vap = fz.make_vap(s, max_occurs)
        f = fz.featurize(s, vap, nij_max=256, nnl_max=64,
                         dtype=np.float64)
        flist.append(f)
        llist.append({
            "energy": np.float64(rng.uniform(-5, -4)),
            "n_atoms": np.float64(6),
            "forces": vap.map_forces(
                rng.normal(0, 0.1, (6, 3))).astype(np.float64),
            "stress": np.zeros(6, np.float64),
            "has_stress": np.float64(0.0),
            "weights": np.ones(3, np.float64),
            "eentropy": np.float64(0.0),
            "free_energy": np.float64(0.0)})
    feats = {k: np.stack([f[k] for f in flist]) for k in flist[0]}
    labels = {k: np.stack([l[k] for l in llist]) for k in llist[0]}
    model = AtomicNN(fz, Counter({"Ni": 6}), SymmetryFunction(["Ni"]),
                     hidden_sizes=[8])
    tp = TrainParameters(batch_size=4, train_steps=4, eval_steps=100,
                         device_dataset=True, device_dataset_max_gb=1e-9)
    tr = Trainer(model, L.LossParameters(),
                 OptParameters(learning_rate=1e-3), tp,
                 minimize_properties=("energy", "forces"), n_devices=1)
    out = tr.fit(feats, labels, None, None)
    assert np.isfinite(float(jax.device_get(
        out["state"]["step"])))
    captured = capsys.readouterr()
    assert "streaming batches from host" in captured.out


def test_norm_sweep_chunk_adapts():
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
    from tensoralloy_tpu.train.trainer import _norm_sweep_chunk

    fz = Featurizer(["Mo", "Ni"], rcut=6.0)
    grap = GenericRadialAtomicPotential(
        ["Mo", "Ni"], algorithm="pexp",
        parameters={"rl": list(np.linspace(1, 4, 16)),
                    "pl": list(np.linspace(5, 1.25, 16))},
        moment_tensors=[0, 1, 2, 3, 4, 5], backend="dense")
    model = AtomicNN(fz, Counter({"Mo": 160, "Ni": 125}), grap,
                     hidden_sizes=[16])
    # binary-SNAP-like dense padding: 285 vap rows x 91 neighbor slots
    feats = {"pair_j_d": np.zeros((10, 285, 91), np.int32),
             "pair_i": np.zeros((10, 25935), np.int32)}
    chunk = _norm_sweep_chunk(model, feats)
    # the moment-5 working set at this padding must chunk below the
    # old fixed 512 (which OOMed a 16 GiB chip on the full basis; the
    # compressed 56-column basis still needs chunking, ~2 GiB/chunk)
    assert 1 <= chunk < 256
    # tiny descriptors / tiny padding keep the fast large chunk
    small = {"pair_j_d": np.zeros((10, 12, 8), np.int32)}
    assert _norm_sweep_chunk(model, small) == 512


def test_native_neighbor_thread_determinism():
    from tensoralloy_tpu.native import native_neighbor_list
    rng = np.random.RandomState(7)
    pos = rng.uniform(0, 18, (600, 3))
    cell = np.eye(3) * 18.0
    old = os.environ.get("TA_NEIGH_THREADS")
    try:
        os.environ["TA_NEIGH_THREADS"] = "1"
        a = native_neighbor_list(pos, cell, [True] * 3, 5.0)
        os.environ["TA_NEIGH_THREADS"] = "5"
        b = native_neighbor_list(pos, cell, [True] * 3, 5.0)
    finally:
        if old is None:
            os.environ.pop("TA_NEIGH_THREADS", None)
        else:
            os.environ["TA_NEIGH_THREADS"] = old
    if a is None or b is None:
        pytest.skip("native library unavailable")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("algo", ["default", "sommerfeld"])
def test_td_chunked_matches_monolithic(algo):
    """Finite-temperature chunked evaluation (trunk + U/S heads) is
    exact vs the monolithic path for U/S/F totals and for the
    free-energy-differentiated forces/stress."""
    from tensoralloy_tpu.nn.finite_temperature import (
        TemperatureDependentAtomicNN)
    from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential

    s = _moni_structure()
    s.info["etemperature"] = 0.35
    fz = Featurizer(["Mo", "Ni"], rcut=5.0)
    vap = fz.make_vap(s)
    feats = {k: jnp.asarray(v)
             for k, v in fz.featurize(s, vap, dtype=np.float64).items()}
    desc = GenericRadialAtomicPotential(
        ["Mo", "Ni"], algorithm="pexp",
        parameters={"rl": [1.5, 2.5], "pl": [4.0, 2.0]},
        moment_tensors=[0, 1, 2], backend="dense")
    model = TemperatureDependentAtomicNN(
        fz, Counter({"Mo": 11, "Ni": 21}), desc, layers=[16, 8],
        eentropy_algo=algo, hidden_sizes=[16], minmax_scale=True)
    params = model.init_params(jax.random.PRNGKey(0))
    ops = jax.jit(model.energy_ops)(params, feats)
    ref = jax.jit(make_efs_fn(model.variational_energy))(params, feats)
    n_rows = feats["pair_j_d"].shape[0]
    for chunk in (7, n_rows, 4 * n_rows):   # non-dividing chunk too
        heads = jax.jit(lambda p, f: model.heads_chunked(p, f, chunk))(
            params, feats)
        for k in ("energy", "eentropy", "free_energy"):
            np.testing.assert_allclose(heads[k], ops[k],
                                       rtol=0, atol=1e-9)
        out = jax.jit(make_efs_fn(
            model.make_chunked_energy_fn(chunk)))(params, feats)
        np.testing.assert_allclose(out["energy"], ref["energy"],
                                   rtol=0, atol=1e-9)
        np.testing.assert_allclose(out["forces"], ref["forces"],
                                   rtol=0, atol=1e-9)
        np.testing.assert_allclose(out["stress"], ref["stress"],
                                   rtol=0, atol=1e-11)


@pytest.mark.parametrize("angular", [False, True])
def test_atomic_nn_chunked_matches_monolithic(angular):
    """Atom-chunked descriptor-NN evaluation (AtomicNN.energy_chunked)
    is exact vs the monolithic dense path for E/F/stress — the
    large-cell mechanism for the NN model family."""
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn.sf import SymmetryFunction
    from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential

    s = _moni_structure()
    fz = Featurizer(["Mo", "Ni"], rcut=5.0, acut=4.0, angular=angular)
    vap = fz.make_vap(s)
    feats = {k: jnp.asarray(v)
             for k, v in fz.featurize(s, vap, dtype=np.float64).items()}
    if angular:
        desc = SymmetryFunction(["Mo", "Ni"], backend="dense")
    else:
        desc = GenericRadialAtomicPotential(
            ["Mo", "Ni"], algorithm="pexp",
            parameters={"rl": [1.5, 2.5], "pl": [4.0, 2.0]},
            moment_tensors=[0, 1, 2, 3, 4, 5], backend="dense")
    model = AtomicNN(fz, Counter({"Mo": 11, "Ni": 21}), desc,
                     hidden_sizes=[16], minmax_scale=True)
    params = model.init_params(jax.random.PRNGKey(0))
    ref = jax.jit(make_efs_fn(model.energy))(params, feats)
    n_rows = feats["pair_j_d"].shape[0]
    for chunk in (7, n_rows, 4 * n_rows):   # non-dividing chunk too
        out = jax.jit(make_efs_fn(
            model.make_chunked_energy_fn(chunk)))(params, feats)
        np.testing.assert_allclose(out["energy"], ref["energy"],
                                   rtol=0, atol=1e-9)
        np.testing.assert_allclose(out["forces"], ref["forces"],
                                   rtol=0, atol=1e-9)
        np.testing.assert_allclose(out["stress"], ref["stress"],
                                   rtol=0, atol=1e-11)


def test_calculator_chunked_path_matches():
    """The calculator's large-cell path (chunked=True) returns the same
    E/F/S as the monolithic default, for both the EAM family and the
    dense descriptor-NN family, and auto mode stays monolithic for
    small cells (atomic_energies present)."""
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
    from tensoralloy_tpu.nn.atomic import AtomicNN

    s = _moni_structure()
    fz = Featurizer(["Mo", "Ni"], rcut=5.0)
    occ = Counter({"Mo": 11, "Ni": 21})
    for make in (
        lambda: EamAlloyNN(fz, occ),
        lambda: AtomicNN(
            fz, occ, GenericRadialAtomicPotential(
                ["Mo", "Ni"], algorithm="pexp",
                parameters={"rl": [1.5, 2.5], "pl": [4.0, 2.0]},
                moment_tensors=[0, 1, 2], backend="dense"),
            hidden_sizes=[16]),
    ):
        model = make()
        params = model.init_params(jax.random.PRNGKey(0))
        mono = TensorAlloyCalculator(model, params, chunked=False)
        auto = TensorAlloyCalculator(model, params)  # small => mono
        chun = TensorAlloyCalculator(model, params, chunked=True,
                                     chunk_size=13)
        r0 = mono.calculate(s)
        ra = auto.calculate(s)
        rc = chun.calculate(s)
        assert "atomic_energies" in ra          # auto took monolithic
        assert "atomic_energies" not in rc      # forced chunked
        np.testing.assert_allclose(rc["energy"], r0["energy"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(rc["forces"], r0["forces"],
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(rc["stress"], r0["stress"],
                                   rtol=0, atol=1e-7)
        np.testing.assert_allclose(ra["energy"], r0["energy"])
        with pytest.raises(ValueError):
            chun.get_atomic_energies(s)
