"""Round-2 correctness fixes.

- EAM pair sums masked at r < rcut on device: skinned-MD neighbor
  lists give identical energies to exact-rcut lists (reference
  `eam.py:300-362` setfl-table truncation semantics).
- total_pressure loss wired into the trainer (reference
  `nn/losses.py:459-504`).
- CUTOFFS registry exposes all five cutoff forms
  (reference `nn/cutoff.py:20-143`).
- Calculator result cache keyed by content, not identity.
"""
import os
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN


def _ni_structure(n_cell=2, a0=3.52, rattle=0.05, seed=0):
    rng = np.random.RandomState(seed)
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, k]
                           for i in range(n_cell)
                           for j in range(n_cell)
                           for k in range(n_cell)])
    pos = frac * a0 + rng.normal(scale=rattle, size=(len(frac), 3))
    return Structure.from_symbols(["Ni"] * len(frac), pos,
                                  np.eye(3) * a0 * n_cell,
                                  pbc=[True] * 3)


@pytest.mark.parametrize("skin", [0.5, 1.5])
def test_eam_energy_skin_invariant(skin):
    """Features built with a skinned (rcut+skin) neighbor list must give
    the same EAM energy/forces as the exact-rcut list: the model masks
    r < rcut on device."""
    s = _ni_structure()
    rcut = 4.5
    fz = Featurizer(["Ni"], rcut=rcut)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    vap = fz.make_vap(s, model.max_occurs)

    feats_exact = {k: jnp.asarray(v)
                   for k, v in fz.featurize(s, vap).items()}
    try:
        fz.rcut += skin
        feats_skin = {k: jnp.asarray(v)
                      for k, v in fz.featurize(s, vap).items()}
    finally:
        fz.rcut = rcut

    # sanity: the skinned list actually contains extra pairs
    assert feats_skin["pair_i"].shape[0] > feats_exact["pair_i"].shape[0]

    e_exact = float(model.energy(params, feats_exact))
    e_skin = float(model.energy(params, feats_skin))
    assert e_skin == pytest.approx(e_exact, abs=1e-8)

    from tensoralloy_tpu.nn.fields import make_efs_fn
    efs = make_efs_fn(model.energy)
    f_exact = np.asarray(efs(params, feats_exact)["forces"])
    f_skin = np.asarray(efs(params, feats_skin)["forces"])
    np.testing.assert_allclose(f_skin, f_exact, atol=1e-8)


def test_total_pressure_loss_trains():
    """`total_pressure` in nn.minimize adds a pressure branch to the
    total loss (was silently dropped; reference `losses.py:459-504`)."""
    from tensoralloy_tpu.nn.sf import SymmetryFunction
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)

    s = _ni_structure(n_cell=1)
    fz = Featurizer(["Ni"], rcut=4.5)
    model = AtomicNN(fz, Counter({"Ni": len(s)}), SymmetryFunction(["Ni"]),
                     hidden_sizes=[8], minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(0))
    vap = fz.make_vap(s, model.max_occurs)
    feats1 = fz.featurize(s, vap)
    B = 4
    feats = {k: jnp.stack([jnp.asarray(v)] * B) for k, v in feats1.items()}
    n_vap = model.n_atoms_vap
    labels = {
        "energy": jnp.zeros((B,)),
        "n_atoms": jnp.full((B,), float(len(s))),
        "forces": jnp.zeros((B, n_vap, 3)),
        "stress": jnp.full((B, 6), 0.01),
        "has_stress": jnp.ones((B,)),
        "weights": jnp.ones((B, 3)),
    }
    lp = L.LossParameters(
        total_pressure=L.LossOptions(weight=2.0))
    tr = Trainer(model, lp, OptParameters(learning_rate=1e-3),
                 TrainParameters(batch_size=B, train_steps=2),
                 minimize_properties=("energy", "total_pressure"),
                 n_devices=1)
    total, metrics = tr.total_loss(params, feats, labels, 0)
    assert "loss/total_pressure" in metrics
    assert "total_pressure/mae" in metrics
    assert np.isfinite(float(total))
    assert float(metrics["loss/total_pressure"]) > 0.0
    # the branch contributes: zero weight changes the total
    lp0 = L.LossParameters()
    tr0 = Trainer(model, lp0, OptParameters(learning_rate=1e-3),
                  TrainParameters(batch_size=B, train_steps=2),
                  minimize_properties=("energy",), n_devices=1)
    total0, _ = tr0.total_loss(params, feats, labels, 0)
    assert float(total) != pytest.approx(float(total0))
    # gradient flows through the pressure branch
    g = jax.grad(lambda p: tr.total_loss(p, feats, labels, 0)[0])(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_cutoffs_registry_complete():
    """All five reference cutoff forms are selectable and vanish at the
    cutoff radius (reference `nn/cutoff.py:20-143`)."""
    from tensoralloy_tpu.ops.cutoffs import CUTOFFS, apply_cutoff
    assert set(CUTOFFS) == {"cosine", "polynomial", "meam", "deepmd",
                            "tersoff"}
    rc = 5.0
    r = jnp.linspace(0.5, rc, 64)
    for name in CUTOFFS:
        v = np.asarray(apply_cutoff(name, r, rc))
        assert np.all(np.isfinite(v)), name
        assert v[-1] == pytest.approx(0.0, abs=1e-12), name
        # monotone non-increasing near the cutoff
        assert v[-1] <= v[-8] + 1e-12, name


def test_calculator_cache_content_keyed():
    """Mutating a Structure in place must invalidate the calculator's
    result cache (identity caching returned stale energies)."""
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    s = _ni_structure()
    fz = Featurizer(["Ni"], rcut=4.5)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    calc = TensorAlloyCalculator(model, params)
    e0 = calc.get_potential_energy(s)
    # second call with unchanged content: cached (same object)
    assert calc.get_potential_energy(s) == e0
    s.positions = s.positions + np.array([0.1, 0.0, 0.0])  # rigid shift
    e1 = calc.get_potential_energy(s)
    assert e1 == pytest.approx(e0, abs=1e-6)  # rigid shift: same energy
    s.positions[0] += np.array([0.3, 0.1, -0.2])           # real change
    e2 = calc.get_potential_energy(s)
    assert abs(e2 - e1) > 1e-6


def test_periodic_checkpoint_and_bitexact_resume(tmp_path):
    """Kill-and-resume: training interrupted after a periodic
    checkpoint continues to a final state bit-identical to an
    uninterrupted run (VERDICT missing #8; reference Estimator
    checkpointing `training.py:443-449`)."""
    from tensoralloy_tpu.nn.sf import SymmetryFunction
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)
    from tensoralloy_tpu.train.hooks import (CheckpointHook,
                                             latest_checkpoint)

    rng = np.random.RandomState(42)
    structs = [_ni_structure(n_cell=1, rattle=0.08, seed=i)
               for i in range(8)]
    fz = Featurizer(["Ni"], rcut=4.5)
    model = AtomicNN(fz, Counter({"Ni": 4}), SymmetryFunction(["Ni"]),
                     hidden_sizes=[8], minmax_scale=False)
    feats_list = [fz.featurize(s, fz.make_vap(s, model.max_occurs),
                               nij_max=256, nnl_max=64)
                  for s in structs]
    feats = {k: np.stack([f[k] for f in feats_list])
             for k in feats_list[0]}
    n_vap = model.n_atoms_vap
    n = len(structs)
    labels = {"energy": rng.normal(size=n).astype(np.float32),
              "n_atoms": np.full(n, 4.0, np.float32),
              "forces": rng.normal(
                  size=(n, n_vap, 3)).astype(np.float32) * 0.1,
              "stress": np.zeros((n, 6), np.float32),
              "has_stress": np.zeros(n, np.float32),
              "weights": np.ones((n, 3), np.float32)}

    def make_trainer(steps):
        return Trainer(model, L.LossParameters(),
                       OptParameters(learning_rate=1e-3),
                       TrainParameters(batch_size=4, train_steps=steps,
                                       eval_steps=100, seed=7),
                       minimize_properties=("energy", "forces"),
                       n_devices=1)

    # uninterrupted run: 10 steps, periodic ckpt every 4
    dir_a = str(tmp_path / "a")
    tr_a = make_trainer(10)
    hook = CheckpointHook(tr_a, dir_a, every_steps=4, keep=2)
    out_a = tr_a.fit(feats, labels, verbose=False,
                     callback=lambda s, st, m: hook.after_step(s, st, m))
    final_a = jax.device_get(out_a["state"])

    # keep-N rotation: only the last 2 of {4, 8} should remain... both
    # fit in keep=2; check the file set is exactly {ckpt-4, ckpt-8}
    import glob
    names = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(dir_a, "ckpt-*.npz")))
    assert names == ["ckpt-4.npz", "ckpt-8.npz"]

    # interrupted run: 8 steps (killed), then resume to 10
    dir_b = str(tmp_path / "b")
    tr_b = make_trainer(8)
    hook_b = CheckpointHook(tr_b, dir_b, every_steps=4, keep=2)
    tr_b.fit(feats, labels, verbose=False,
             callback=lambda s, st, m: hook_b.after_step(s, st, m))
    latest = latest_checkpoint(dir_b)
    assert latest and latest.endswith("ckpt-8.npz")

    tr_c = make_trainer(10)
    template = model.init_params(jax.random.PRNGKey(7))
    state_c = tr_c.restore_state(latest, template,
                                 use_ema_variables=False,
                                 restore_optimizer_variables=True,
                                 reset_global_step=False)
    assert int(state_c["step"]) == 8
    out_c = tr_c.fit(feats, labels, verbose=False,
                     initial_state=state_c)
    final_c = jax.device_get(out_c["state"])

    assert int(final_a["step"]) == int(final_c["step"]) == 10
    for tree in ("params", "ema_params"):
        la = jax.tree_util.tree_leaves(final_a[tree])
        lc = jax.tree_util.tree_leaves(final_c[tree])
        for xa, xc in zip(la, lc):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xc))


def test_dataset_signature_includes_acut():
    from tensoralloy_tpu.train.dataset import Dataset
    fz1 = Featurizer(["Ni"], rcut=4.5, angular=True, acut=4.0)
    fz2 = Featurizer(["Ni"], rcut=4.5, angular=True, acut=3.0)
    fz3 = Featurizer(["Ni"], rcut=4.5, angular=True, acut=4.0,
                     symmetric=False)

    class _FakeDB:
        elements = ["Ni"]
        max_occurs = Counter({"Ni": 4})

        def __len__(self):
            return 7

        def get_neighbor_sizes(self, *a, **k):
            from tensoralloy_tpu.neighbor import NeighborSize
            return NeighborSize(nij=10, nijk=10, nnl=4, ij2k=2)

    sigs = set()
    for fz, transpose in ((fz1, False), (fz2, False), (fz3, False),
                          (fz1, True)):
        ds = Dataset.__new__(Dataset)
        ds.name, ds.featurizer, ds.dtype = "t", fz, np.float32
        ds.db, ds.layout = _FakeDB(), "both"
        ds.transpose = transpose
        sigs.add(ds.signature)
    # acut, the symmetric flag, AND the transpose-table schema must all
    # invalidate the cache
    assert len(sigs) == 4


def test_device_dataset_path_bitexact():
    """The device-resident indexed fast path (single upload + on-device
    batch gather) is bit-identical to the host per-step path."""
    from tensoralloy_tpu.nn.sf import SymmetryFunction
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)
    rng = np.random.RandomState(1)
    structs = [_ni_structure(n_cell=1, rattle=0.06, seed=i)
               for i in range(6)]
    fz = Featurizer(["Ni"], rcut=4.5)
    model = AtomicNN(fz, Counter({"Ni": 4}), SymmetryFunction(["Ni"]),
                     hidden_sizes=[8], minmax_scale=False)
    feats_list = [fz.featurize(s, fz.make_vap(s, model.max_occurs),
                               nij_max=256, nnl_max=64)
                  for s in structs]
    feats = {k: np.stack([f[k] for f in feats_list])
             for k in feats_list[0]}
    n, n_vap = len(structs), model.n_atoms_vap
    labels = {"energy": rng.normal(size=n).astype(np.float32),
              "n_atoms": np.full(n, 4.0, np.float32),
              "forces": rng.normal(size=(n, n_vap, 3)).astype(
                  np.float32) * 0.1,
              "stress": np.zeros((n, 6), np.float32),
              "has_stress": np.zeros(n, np.float32),
              "weights": np.ones((n, 3), np.float32)}

    outs = {}
    for dev in (True, False):
        tr = Trainer(model, L.LossParameters(),
                     OptParameters(learning_rate=1e-3),
                     TrainParameters(batch_size=3, train_steps=6,
                                     seed=3, scan_steps=2,
                                     device_dataset=dev),
                     minimize_properties=("energy", "forces"),
                     n_devices=1)
        outs[dev] = jax.device_get(tr.fit(feats, labels,
                                          verbose=False)["state"])
    for a, b in zip(jax.tree_util.tree_leaves(outs[True]["params"]),
                    jax.tree_util.tree_leaves(outs[False]["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rij_fed_evaluation_mode():
    """rij-fed mode (reference use_computed_dists=False,
    `universal.py:265-276`): supplying displacement vectors reproduces
    the position-mode energy/forces/stress exactly — for EAM and for an
    angular symmetry-function model (triple vectors)."""
    from tensoralloy_tpu.nn.fields import make_efs_fn, make_rij_efs_fn
    from tensoralloy_tpu.nn.sf import SymmetryFunction
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.ops.pairs import pair_vectors

    s = _ni_structure(n_cell=2, rattle=0.08, seed=5)

    def check(model, params, fz, angular=False):
        vap = fz.make_vap(s, model.max_occurs)
        feats = {k: jnp.asarray(v)
                 for k, v in fz.featurize(s, vap).items()}
        ref = jax.jit(make_efs_fn(
            model.variational_energy))(params, feats)
        fed = dict(feats)
        fed["rij"] = pair_vectors(feats)
        if angular:
            pos, cell = feats["positions"], feats["cell"]
            ri = pos[feats["trip_i"]]
            fed["trip_rij"] = (pos[feats["trip_j"]] +
                               feats["trip_shift_j"] @ cell - ri)
            fed["trip_rik"] = (pos[feats["trip_k"]] +
                               feats["trip_shift_k"] @ cell - ri)
        out = jax.jit(make_rij_efs_fn(
            model.variational_energy))(params, fed)
        np.testing.assert_allclose(float(out["energy"]),
                                   float(ref["energy"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["forces"]),
                                   np.asarray(ref["forces"]),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(out["stress_voigt"]),
                                   np.asarray(ref["stress_voigt"]),
                                   atol=5e-6)
        assert out["pair_forces"].shape == fed["rij"].shape

    fz = Featurizer(["Ni"], rcut=5.0)
    model = EamAlloyNN(fz, Counter({"Ni": 32}),
                       custom_potentials="zjw04")
    check(model, model.init_params(jax.random.PRNGKey(0)), fz)

    fza = Featurizer(["Ni"], rcut=4.5, angular=True)
    sf = SymmetryFunction(["Ni"])
    m2 = AtomicNN(fza, Counter({"Ni": 32}), sf, hidden_sizes=[8],
                  minmax_scale=False)
    check(m2, m2.init_params(jax.random.PRNGKey(1)), fza, angular=True)


def test_kernel_initializer_registry():
    """Reference init_ops parity: truncated-normal variance scaling,
    uniform variants, constants (reference `nn/init_ops.py:20-130`)."""
    from tensoralloy_tpu.nn.layers import (sample_kernel,
                                           KERNEL_INITIALIZERS)
    key = jax.random.PRNGKey(0)
    for name in KERNEL_INITIALIZERS:
        w = sample_kernel(key, name, 64, 32, jnp.float32)
        assert w.shape == (64, 32)
        assert np.all(np.isfinite(np.asarray(w)))
    # he_normal is truncated at 2 sigma-equivalent
    w = np.asarray(sample_kernel(key, "he_normal", 4096, 64,
                                 jnp.float32))
    std = np.sqrt(2.0 / 4096)
    assert np.abs(w).max() <= 2.0 * std / 0.8796256610342398 + 1e-6
    assert w.std() == pytest.approx(std, rel=0.05)
    # uniform limit
    w = np.asarray(sample_kernel(key, "he_uniform", 4096, 64,
                                 jnp.float32))
    assert np.abs(w).max() <= np.sqrt(3 * 2.0 / 4096) + 1e-9
    # constants
    w = np.asarray(sample_kernel(key, "constant", 3, 3, jnp.float32,
                                 value=1.5))
    np.testing.assert_array_equal(w, np.full((3, 3), 1.5))
    with pytest.raises(ValueError):
        sample_kernel(key, "nosuch", 3, 3, jnp.float32)


def test_feature_layout_selection():
    """featurize(layout=...) emits only the requested layout; energies
    agree between a segment-backend model on 'segment' features and a
    dense-backend model on 'dense' features (memory fix: the unused
    layout doubled cache + HBM at SNAP scale)."""
    from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.calculator import model_feature_layout

    s = _ni_structure(n_cell=2, rattle=0.06, seed=9)
    fz = Featurizer(["Ni"], rcut=5.0)
    occurs = Counter({"Ni": len(s)})
    vap = fz.make_vap(s, occurs)
    seg_feats = fz.featurize(s, vap, layout="segment")
    den_feats = fz.featurize(s, vap, layout="dense")
    both = fz.featurize(s, vap, layout="both")
    assert "pair_i" in seg_feats and "pair_j_d" not in seg_feats
    assert "pair_j_d" in den_feats and "pair_i" not in den_feats
    assert "pair_i" in both and "pair_j_d" in both
    with pytest.raises(ValueError):
        fz.featurize(s, vap, layout="sparse")

    outs = {}
    for backend, feats in (("segment", seg_feats), ("dense", den_feats)):
        g = GenericRadialAtomicPotential(
            ["Ni"], algorithm="pexp",
            parameters={"rl": [1.5, 2.5, 3.5], "pl": [3.0, 2.0, 1.0]},
            moment_tensors=[0, 1], backend=backend)
        m = AtomicNN(fz, occurs, g, hidden_sizes=[8],
                     minmax_scale=False)
        expected = "segment" if backend == "segment" else "dense"
        assert model_feature_layout(m) == expected
        params = m.init_params(jax.random.PRNGKey(0))
        outs[backend] = float(m.energy(
            params, {k: jnp.asarray(v) for k, v in feats.items()}))
    assert outs["segment"] == pytest.approx(outs["dense"], rel=1e-6)

    # EAM consumes the segment layout
    model = EamAlloyNN(fz, occurs, custom_potentials="zjw04")
    assert model_feature_layout(model) == "segment"
    p = model.init_params(jax.random.PRNGKey(0))
    e = float(model.energy(
        p, {k: jnp.asarray(v) for k, v in seg_feats.items()}))
    assert np.isfinite(e)

    # angular: segment layout omits dense triple columns and vice versa
    fza = Featurizer(["Ni"], rcut=4.5, angular=True)
    vap_a = fza.make_vap(s, occurs)
    seg_a = fza.featurize(s, vap_a, layout="segment")
    den_a = fza.featurize(s, vap_a, layout="dense")
    assert "trip_i" in seg_a and "trip_j_d" not in seg_a
    assert "trip_j_d" in den_a and "trip_i" not in den_a
