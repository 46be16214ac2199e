"""Deep-ensemble calculator: vmapped multi-params inference equals the
member-by-member mean, disagreement channels behave (zero for identical
members, positive for different seeds), selection ranks by committee
force std, and architecture mismatch is rejected."""
from collections import Counter

import jax
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.atomic import AtomicNN
from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
from tensoralloy_tpu.calculator import TensorAlloyCalculator
from tensoralloy_tpu.ensemble import (EnsembleCalculator,
                                      select_by_uncertainty)


def _setup(n_members=3):
    rng = np.random.RandomState(2)
    s = Structure.from_symbols(
        ["Ni"] * 10 + ["Mo"] * 6, rng.uniform(0, 8.0, (16, 3)),
        np.eye(3) * 8.0, pbc=[True] * 3)
    fz = Featurizer(["Mo", "Ni"], rcut=4.5)
    desc = GenericRadialAtomicPotential(
        fz.elements, algorithm="pexp",
        parameters={"rl": [1.0, 2.0, 3.0], "pl": [4.0, 3.0, 2.0]},
        moment_tensors=[0, 1, 2], backend="dense")
    model = AtomicNN(fz, Counter(s.symbols), desc, hidden_sizes=[8],
                     minmax_scale=False)
    plist = [model.init_params(jax.random.PRNGKey(k))
             for k in range(n_members)]
    return s, model, plist


def test_ensemble_mean_equals_member_mean():
    s, model, plist = _setup()
    ens = EnsembleCalculator(model, plist)
    singles = [TensorAlloyCalculator(model, p) for p in plist]
    e_mean = np.mean([c.get_potential_energy(s) for c in singles])
    f_mean = np.mean([c.get_forces(s) for c in singles], axis=0)
    np.testing.assert_allclose(ens.get_potential_energy(s), e_mean,
                               rtol=1e-10)
    np.testing.assert_allclose(ens.get_forces(s), f_mean,
                               rtol=1e-8, atol=1e-12)
    assert ens.get_energy_std(s) > 0
    assert ens.get_max_force_std(s) > 0
    assert ens.get_forces_std(s).shape == (len(s),)
    np.testing.assert_allclose(
        ens.get_stress(s),
        np.mean([c.get_stress(s) for c in singles], axis=0),
        rtol=1e-8, atol=1e-14)


def test_identical_members_have_zero_std():
    s, model, plist = _setup()
    ens = EnsembleCalculator(model, [plist[0], plist[0]])
    assert ens.get_energy_std(s) < 1e-12
    assert ens.get_max_force_std(s) < 1e-12
    np.testing.assert_allclose(
        ens.get_potential_energy(s),
        TensorAlloyCalculator(model, plist[0]).get_potential_energy(s),
        rtol=1e-10)


def test_select_by_uncertainty_ranks_descending():
    s, model, plist = _setup()
    ens = EnsembleCalculator(model, plist)
    rng = np.random.RandomState(9)
    frames = [s]
    for k in range(3):
        f = s.copy()
        f.positions = s.positions + 0.3 * (k + 1) * rng.normal(
            size=s.positions.shape)
        frames.append(f)
    picked = select_by_uncertainty(ens, frames, n_select=2)
    assert len(picked) == 2
    scores = [ens.get_max_force_std(f) for f in frames]
    assert scores[picked[0]] >= scores[picked[1]] >= max(
        scores[i] for i in range(4) if i not in picked)


def test_cli_uncertainty_verb(tmp_path, capsys):
    from tensoralloy_tpu.io.model import save_model
    from tensoralloy_tpu.io.extxyz import write_extxyz
    from tensoralloy_tpu.cli.entry import main as cli_main
    s, model, plist = _setup()
    paths = []
    for k in range(2):
        p = str(tmp_path / f"m{k}.npz")
        save_model(p, model, jax.device_get(plist[k]))
        paths.append(p)
    rng = np.random.RandomState(1)
    frames = [s]
    for k in range(2):
        f = s.copy()
        f.positions = s.positions + 0.2 * rng.normal(
            size=s.positions.shape)
        frames.append(f)
    xyz = str(tmp_path / "frames.extxyz")
    write_extxyz(xyz, frames)
    rc = cli_main(["compute", "uncertainty", xyz] + paths + ["--top", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if not ln.startswith("#")]
    assert len(lines) == 2
    scores = [float(ln.split()[-1]) for ln in lines]
    assert scores[0] >= scores[1] > 0


def test_architecture_mismatch_rejected(tmp_path):
    from tensoralloy_tpu.io.model import save_model
    s, model, plist = _setup()
    fz2 = Featurizer(["Mo", "Ni"], rcut=5.0)
    desc2 = GenericRadialAtomicPotential(
        fz2.elements, algorithm="pexp",
        parameters={"rl": [1.0, 2.0, 3.0], "pl": [4.0, 3.0, 2.0]},
        moment_tensors=[0, 1, 2], backend="dense")
    model2 = AtomicNN(fz2, Counter(s.symbols), desc2, hidden_sizes=[8],
                      minmax_scale=False)
    p1 = str(tmp_path / "a.npz")
    p2 = str(tmp_path / "b.npz")
    save_model(p1, model, jax.device_get(plist[0]))
    save_model(p2, model2,
               jax.device_get(model2.init_params(jax.random.PRNGKey(5))))
    with pytest.raises(ValueError, match="featurizer"):
        EnsembleCalculator([p1, p2])
    ens = EnsembleCalculator([p1, p1])
    assert ens.n_members == 2
    assert abs(ens.get_energy_std(s)) < 1e-12


def test_active_learning_loop_end_to_end(tmp_path):
    """The full active-learning round-trip using only this framework:
    run MD with a committee member, record the trajectory, rank frames
    by committee force disagreement, and append the selected frames to
    a training database — the loop the reference's fixed-schedule
    tensordb sampling cannot close on its own."""
    from collections import Counter
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.dynamics import VelocityVerlet
    from tensoralloy_tpu.ensemble import (EnsembleCalculator,
                                          select_by_uncertainty)
    from tensoralloy_tpu.io.sqlite import connect

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
    # committee: zjw04 + two perturbed replicas (as-if different seeds)
    p0 = model.init_params(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    def jitter(p, key, scale):
        leaves, tree = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(tree, [
            l * (1.0 + scale * jax.random.normal(k, jnp.shape(l)))
            for l, k in zip(leaves, keys)])

    committee = [p0, jitter(p0, jax.random.PRNGKey(1), 0.02),
                 jitter(p0, jax.random.PRNGKey(2), 0.02)]
    # 1. explore: short NVT run with the first member
    md = VelocityVerlet(model, p0, s, timestep=2.0, skin=1.0,
                        chunk_size=10, seed=3,
                        target_temperature=800.0, friction=0.1)
    hist = md.run(50, record_trajectory=True)
    frames = []
    for p, c in zip(hist["positions"], hist["cells"]):
        f = s.copy()
        f.positions, f.cell = p, c
        frames.append(f)
    assert len(frames) == 5
    # 2. rank by committee disagreement
    calc = EnsembleCalculator(model, committee)
    picked = select_by_uncertainty(calc, frames, n_select=2)
    assert len(picked) == 2
    scores = [calc.get_max_force_std(f) for f in frames]
    assert all(np.isfinite(scores)) and max(scores) > 0
    assert scores[picked[0]] == max(scores)
    # 3. append the selected frames to a training database
    db_path = str(tmp_path / "al.db")
    db = connect(db_path)
    for i in picked:
        db.write(frames[i])
    db2 = connect(db_path)
    assert len(db2) == 2
    assert db2.elements == ["Ni"]
    got = db2.get(1)
    assert len(got) == len(s)


def test_ensemble_member_sharding_parity():
    """K=4 committee members sharded over a 4-device mesh: identical
    mean/std results to the single-device ensemble, with the stacked
    parameters actually living on 4 devices."""
    import jax
    s, model, plist = _setup(n_members=4)
    res = {}
    for shards in (1, 4):
        calc = EnsembleCalculator(model, plist, n_shards=shards)
        res[shards] = {
            "e": calc.get_potential_energy(s),
            "f": np.asarray(calc.get_forces(s)),
            "estd": calc.get_energy_std(s),
            "fstd": np.asarray(calc.get_forces_std(s)),
        }
        if shards == 4:
            leaf = jax.tree_util.tree_leaves(calc.params)[0]
            assert len(leaf.sharding.device_set) == 4
    assert res[1]["e"] == pytest.approx(res[4]["e"], abs=1e-10)
    np.testing.assert_allclose(res[1]["f"], res[4]["f"], atol=1e-10)
    assert res[1]["estd"] == pytest.approx(res[4]["estd"], abs=1e-10)
    np.testing.assert_allclose(res[1]["fstd"], res[4]["fstd"],
                               atol=1e-10)


def test_ensemble_shard_validation():
    s, model, plist = _setup(n_members=3)
    with pytest.raises(ValueError, match="divisible"):
        EnsembleCalculator(model, plist, n_shards=2)
