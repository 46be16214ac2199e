"""GRAP descriptors: brute-force oracle, legacy vs moment-tensor path
cross-check (mirrors `nn/atomic/tests/test_grap.py` strategy), NN
filters, and autodiff consistency."""
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoralloy_tpu.neighbor import neighbor_list
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.grap import (GenericRadialAtomicPotential,
                                     multiplicity_tensor)
from tensoralloy_tpu.nn.atomic import AtomicNN
from tensoralloy_tpu.nn.fields import make_efs_fn
from tensoralloy_tpu.utils import get_kbody_terms


def _fc(r, rc):
    return np.where(r < rc, 0.5 * (np.cos(np.pi * np.minimum(r / rc, 1.0))
                                   + 1.0), 0.0)


def _oracle_grap(s, rc, elements, eta, omega, max_moment, symmetric=False):
    """Brute-force numpy GRAP (sf algorithm, pair param space):
    per (atom, slot, k): P_d = sum_j H_k fc M_d; Q_m = sum_d mult * P_d^2."""
    _, per_elem, _ = get_kbody_terms(elements)
    ii, jj, S, d, D = neighbor_list(s, rc)
    n = len(s)
    syms = s.symbols
    K = len(eta)
    t = multiplicity_tensor(max_moment, symmetric)
    dim = t.shape[0]
    p = np.zeros((n, len(elements), K, dim))
    for q in range(len(ii)):
        i, j, r = ii[q], jj[q], d[q]
        u = D[q] / r
        slot = per_elem[syms[i]].index(syms[i] + syms[j])
        monos = [1.0]
        if max_moment >= 1:
            monos += [u[0], u[1], u[2]]
        if max_moment >= 2:
            monos += [u[a] * u[b] for a, b in
                      [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]]
        if max_moment >= 3:
            monos += [u[a] * u[b] * u[c] for a, b, c in
                      [(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, 1),
                       (0, 1, 2), (0, 2, 2), (1, 1, 1), (1, 1, 2),
                       (1, 2, 2), (2, 2, 2)]]
        for k in range(K):
            h = np.exp(-eta[k] * (r - omega[k]) ** 2 / rc ** 2) * _fc(r, rc)
            p[i, slot, k] += h * np.asarray(monos)
    q_t = np.einsum("iskd,dm->iskm", p ** 2, t)
    g0 = np.sign(p[..., 0]) * np.sqrt(q_t[..., 0] + 1e-16)
    return np.concatenate([g0[..., None], q_t[..., 1:]], axis=-1)


@pytest.mark.parametrize("max_moment,symmetric", [(0, False), (1, False),
                                                  (2, False), (2, True),
                                                  (3, False)])
def test_grap_vs_oracle(pd3o2, max_moment, symmetric):
    s = pd3o2[0]
    rc = 4.5
    eta = [0.5, 4.0]
    omega = [0.0, 1.0]
    fz = Featurizer(["Pd", "O"], rcut=rc)
    grap = GenericRadialAtomicPotential(
        ["Pd", "O"], algorithm="sf",
        parameters={"eta": eta, "omega": omega},
        param_space_method="pair", moment_tensors=list(range(max_moment + 1)),
        symmetric=symmetric)
    vap = fz.make_vap(s)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    g = np.asarray(grap.compute(feats, rc, rc, fz.n_radial_slots,
                                fz.n_angular_slots, False))
    g = g.reshape(vap.n_atoms_vap, fz.n_radial_slots, len(eta),
                  max_moment + 1)[vap.local_to_vap]
    oracle = _oracle_grap(s, rc, fz.elements, eta, omega, max_moment,
                          symmetric)
    np.testing.assert_allclose(g, oracle, atol=1e-10)


def test_grap_legacy_vs_moment_m0(pd3o2):
    """Moment-0 legacy and non-legacy G must agree up to the sqrt+sign
    transform: legacy g = sum(h), non-legacy g0 = sign(P0) sqrt(P0^2+eps)."""
    s = pd3o2[0]
    rc = 4.5
    kwargs = dict(algorithm="sf", parameters={"eta": [0.5], "omega": [0.0]},
                  param_space_method="pair", moment_tensors=[0])
    fz = Featurizer(["Pd", "O"], rcut=rc)
    vap = fz.make_vap(s)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    g_legacy = np.asarray(GenericRadialAtomicPotential(
        ["Pd", "O"], legacy_mode=True, **kwargs).compute(
        feats, rc, rc, fz.n_radial_slots, fz.n_angular_slots, False))
    g_new = np.asarray(GenericRadialAtomicPotential(
        ["Pd", "O"], legacy_mode=False, **kwargs).compute(
        feats, rc, rc, fz.n_radial_slots, fz.n_angular_slots, False))
    np.testing.assert_allclose(g_new, g_legacy, atol=1e-7)


def test_grap_permutation_invariance(pd3o2):
    a, b, _ = pd3o2
    rc = 4.5
    fz = Featurizer(["Pd", "O"], rcut=rc)
    grap = GenericRadialAtomicPotential(
        ["Pd", "O"], algorithm="pexp",
        parameters={"rl": [1.0, 2.0], "pl": [2.0, 2.0]},
        param_space_method="pair", moment_tensors=[0, 1, 2])
    out = []
    for s in (a, b):
        vap = fz.make_vap(s, Counter({"Pd": 3, "O": 2}))
        feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
        out.append(np.asarray(grap.compute(
            feats, rc, rc, fz.n_radial_slots, fz.n_angular_slots, False)))
    np.testing.assert_allclose(out[0], out[1], atol=1e-10)


def test_grap_nn_filters_forces(pd3o2):
    """NN radial filters: params flow through AtomicNN; forces match FD."""
    s = pd3o2[0]
    rc = 4.5
    fz = Featurizer(["Pd", "O"], rcut=rc)
    grap = GenericRadialAtomicPotential(
        ["Pd", "O"], algorithm="nn",
        parameters={"hidden_sizes": [8, 8], "num_filters": 4,
                    "h_abck_modifier": 2},
        moment_tensors=[0, 1, 2])
    model = AtomicNN(fz, Counter({"Pd": 3, "O": 2}), grap,
                     hidden_sizes=[8], minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(3))
    assert "descriptor" in params
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    efs = jax.jit(make_efs_fn(model.energy))
    out = efs(params, feats)
    forces = np.asarray(out["forces"])
    eps = 1e-6
    for row, alpha in [(1, 0), (3, 2), (5, 1)]:
        pos = np.asarray(feats["positions"]).copy()
        fp = dict(feats)
        pos[row, alpha] += eps
        fp["positions"] = jnp.asarray(pos)
        ep = float(model.energy(params, fp))
        pos[row, alpha] -= 2 * eps
        fp["positions"] = jnp.asarray(pos)
        em = float(model.energy(params, fp))
        assert abs(-(ep - em) / (2 * eps) - forces[row, alpha]) < 1e-6
    # filter params actually receive gradients
    grads = jax.grad(lambda p: model.energy(p, feats))(params)
    gnorm = sum(float(jnp.sum(jnp.abs(leaf))) for leaf in
                jax.tree_util.tree_leaves(grads["descriptor"]))
    assert gnorm > 0


@pytest.mark.parametrize("moments", [[0, 1, 2, 3, 4], [0, 1, 2, 3, 4, 5]])
def test_grap_high_moments_rotation_invariance(moments):
    """Moments 4-5 run the compressed unique-monomial basis with
    multinomial multiplicities (`moment_monomials`); the contracted
    descriptors must be exactly rotation-invariant and forces must
    co-rotate — the path the SNAP accuracy runs with
    moment_tensors=[0..5] rely on."""
    from scipy.spatial.transform import Rotation
    from tensoralloy_tpu.atoms import Structure

    rng = np.random.RandomState(7)
    n = 12
    cell = np.eye(3) * 7.0
    pos = rng.uniform(0.8, 6.0, size=(n, 3))
    syms = ["Ni"] * n
    s = Structure.from_symbols(syms, pos, cell, pbc=[True] * 3)

    fz = Featurizer(["Ni"], rcut=4.5)
    grap = GenericRadialAtomicPotential(
        ["Ni"], algorithm="pexp",
        parameters={"rl": [1.0, 2.0, 3.0], "pl": [4.0, 3.0, 2.0]},
        moment_tensors=moments)
    model = AtomicNN(fz, Counter(syms), grap, hidden_sizes=[8],
                     minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(0))
    efs = jax.jit(make_efs_fn(model.variational_energy))

    def run(structure):
        vap = fz.make_vap(structure, model.max_occurs)
        feats = {k: jnp.asarray(v)
                 for k, v in fz.featurize(structure, vap).items()}
        out = efs(params, feats)
        f = np.asarray(out["forces"])[vap.local_to_vap]
        return float(out["energy"]), f

    e0, f0 = run(s)
    rot = Rotation.from_euler("zyx", [31.0, -47.0, 13.0],
                              degrees=True).as_matrix()
    s_rot = Structure.from_symbols(syms, pos @ rot.T, cell @ rot.T,
                                   pbc=[True] * 3)
    e1, f1 = run(s_rot)
    assert e1 == pytest.approx(e0, abs=1e-9)
    np.testing.assert_allclose(f1, f0 @ rot.T, atol=1e-9)

    # permutation invariance through the VAP layout
    perm = rng.permutation(n)
    s_perm = Structure.from_symbols([syms[i] for i in perm], pos[perm],
                                    cell, pbc=[True] * 3)
    e2, f2 = run(s_perm)
    assert e2 == pytest.approx(e0, abs=1e-9)
    np.testing.assert_allclose(f2, f0[perm], atol=1e-9)
