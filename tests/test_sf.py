"""Symmetry-function descriptors vs an independent brute-force oracle,
permutation invariance, and autodiff force/stress consistency.

Mirrors the reference's oracle style (`nn/atomic/tests/test_sf.py`:
the oracle is built inside the test from the raw math, not from the
implementation under test).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from collections import Counter

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.neighbor import neighbor_list
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.sf import SymmetryFunction
from tensoralloy_tpu.nn.atomic import AtomicNN
from tensoralloy_tpu.nn.fields import make_efs_fn, make_hessian_fn


def _fc(r, rc):
    return np.where(r < rc, 0.5 * (np.cos(np.pi * np.minimum(r / rc, 1.0))
                                   + 1.0), 0.0)


def _oracle_g2(s: Structure, rc, elements, eta, omega):
    """Brute-force numpy G2 per (atom, kbody-term-slot, tau).

    Slot ordering follows the reference contract: for center element e
    the self term ee comes first, then e+other in sorted order."""
    from tensoralloy_tpu.utils import get_kbody_terms
    _, per_elem, _ = get_kbody_terms(elements)
    ii, jj, S, d, D = neighbor_list(s, rc)
    n = len(s)
    syms = s.symbols
    T = len(eta) * len(omega)
    grid = [(e, o) for e in eta for o in omega]
    out = np.zeros((n, len(elements), T))
    for p in range(len(ii)):
        i, j, r = ii[p], jj[p], d[p]
        sj = per_elem[syms[i]].index(syms[i] + syms[j])
        for t, (e, o) in enumerate(grid):
            out[i, sj, t] += np.exp(-e * (r - o) ** 2 / rc ** 2) * _fc(r, rc)
    return out


def _oracle_g4(s: Structure, rc, elements, beta, gamma, zeta):
    """Brute-force G4 over symmetric j<k triples."""
    ii, jj, S, d, D = neighbor_list(s, rc)
    n = len(s)
    syms = s.symbols
    grid = [(b, g, z) for b in beta for g in gamma for z in zeta]
    n_el = len(elements)
    pair_slots = {}
    slot = 0
    for j in range(n_el):
        for k in range(j, n_el):
            pair_slots[(j, k)] = slot
            pair_slots[(k, j)] = slot
            slot += 1
    out = np.zeros((n, slot, len(grid)))
    by_center = {}
    for p in range(len(ii)):
        by_center.setdefault(ii[p], []).append(p)
    for i, plist in by_center.items():
        for a in range(len(plist)):
            for b in range(a + 1, len(plist)):
                p, q = plist[a], plist[b]
                rij, rik = d[p], d[q]
                vj, vk = D[p], D[q]
                rjk = np.linalg.norm(vk - vj)
                if rij >= rc or rik >= rc:
                    continue
                cos_t = (rij**2 + rik**2 - rjk**2) / (2 * rij * rik)
                fc3 = _fc(rij, rc) * _fc(rik, rc) * _fc(rjk, rc)
                sl = pair_slots[(elements.index(syms[jj[p]]),
                                 elements.index(syms[jj[q]]))]
                for t, (be, ga, ze) in enumerate(grid):
                    v = (2.0**(1 - ze) * max(1 + ga * cos_t, 0.0)**ze *
                         np.exp(-be * (rij**2 + rik**2 + rjk**2) / rc**2) *
                         fc3)
                    out[i, sl, t] += v
    return out


@pytest.fixture()
def pd3o2_struct(pd3o2):
    return pd3o2[0]


def test_g2_vs_oracle(pd3o2_struct):
    s = pd3o2_struct
    rc = 4.5
    eta = [0.05, 4.0]
    omega = [0.0, 1.5]
    fz = Featurizer(["Pd", "O"], rcut=rc)
    sf = SymmetryFunction(["Pd", "O"], eta=eta, omega=omega)
    vap = fz.make_vap(s)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    g = np.asarray(sf.radial(feats, rc, fz.n_radial_slots))
    g = g.reshape(vap.n_atoms_vap, fz.n_radial_slots, -1)
    oracle = _oracle_g2(s, rc, fz.elements, eta, omega)
    got = g[vap.local_to_vap]   # local order
    np.testing.assert_allclose(got, oracle, atol=1e-10)


def test_g4_vs_oracle(pd3o2_struct):
    s = pd3o2_struct
    rc = 4.5
    beta, gamma, zeta = [0.005, 0.05], [1.0, -1.0], [1.0, 4.0]
    fz = Featurizer(["Pd", "O"], rcut=rc, angular=True)
    sf = SymmetryFunction(["Pd", "O"], beta=beta, gamma=gamma, zeta=zeta)
    vap = fz.make_vap(s)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    g = np.asarray(sf.angular(feats, rc, fz.n_angular_slots))
    g = g.reshape(vap.n_atoms_vap, fz.n_angular_slots, -1)
    oracle = _oracle_g4(s, rc, fz.elements, beta, gamma, zeta)
    got = g[vap.local_to_vap]
    np.testing.assert_allclose(got, oracle, atol=1e-10)


def test_permutation_invariance(pd3o2):
    """Pd3O2 and its permutation must give identical VAP descriptors."""
    a, b, perm = pd3o2
    rc = 4.5
    fz = Featurizer(["Pd", "O"], rcut=rc, angular=True)
    sf = SymmetryFunction(["Pd", "O"])
    max_occurs = Counter({"Pd": 3, "O": 2})
    out = []
    for s in (a, b):
        vap = fz.make_vap(s, max_occurs)
        feats = {k: jnp.asarray(v)
                 for k, v in fz.featurize(s, vap).items()}
        g = sf.compute(feats, rc, rc, fz.n_radial_slots,
                       fz.n_angular_slots, True)
        out.append(np.asarray(g))
    np.testing.assert_allclose(out[0], out[1], atol=1e-10)


def test_padding_invariance(pd3o2):
    """Extra pair/triple padding must not change descriptors."""
    s = pd3o2[0]
    rc = 4.5
    fz = Featurizer(["Pd", "O"], rcut=rc, angular=True)
    sf = SymmetryFunction(["Pd", "O"])
    vap = fz.make_vap(s)
    f1 = fz.featurize(s, vap)
    f2 = fz.featurize(s, vap, nij_max=f1["pair_i"].size + 37,
                      nijk_max=f1["trip_i"].size + 53)
    g1 = sf.compute({k: jnp.asarray(v) for k, v in f1.items()},
                    rc, rc, fz.n_radial_slots, fz.n_angular_slots, True)
    g2 = sf.compute({k: jnp.asarray(v) for k, v in f2.items()},
                    rc, rc, fz.n_radial_slots, fz.n_angular_slots, True)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-12)


def _make_model(elements, rc, angular=False):
    fz = Featurizer(elements, rcut=rc, angular=angular)
    sf = SymmetryFunction(elements)
    max_occurs = Counter({e: 3 for e in elements})
    model = AtomicNN(fz, max_occurs, sf, hidden_sizes=[8, 8],
                     minmax_scale=False)
    return fz, model


def test_forces_finite_difference(pd3o2):
    s = pd3o2[0]
    fz, model = _make_model(["Pd", "O"], 4.5)
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    params = model.init_params(jax.random.PRNGKey(0))
    efs = jax.jit(make_efs_fn(model.energy))
    out = efs(params, feats)
    forces = np.asarray(out["forces"])

    eps = 1e-6
    for row in [1, 3, 4]:
        for alpha in range(3):
            fp = dict(feats)
            pos = np.asarray(feats["positions"]).copy()
            pos[row, alpha] += eps
            fp["positions"] = jnp.asarray(pos)
            ep = model.energy(params, fp)
            pos2 = pos.copy()
            pos2[row, alpha] -= 2 * eps
            fp["positions"] = jnp.asarray(pos2)
            em = model.energy(params, fp)
            fd = -(ep - em) / (2 * eps)
            assert abs(fd - forces[row, alpha]) < 1e-6, (row, alpha)


def test_stress_finite_difference(snap_ni):
    s = snap_ni
    fz, model = _make_model(["Ni"], 4.5)
    max_occurs = Counter({"Ni": len(s)})
    model = AtomicNN(fz, max_occurs, model.descriptor, hidden_sizes=[8],
                     minmax_scale=False)
    vap = fz.make_vap(s, max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    params = model.init_params(jax.random.PRNGKey(1))
    efs = jax.jit(make_efs_fn(model.energy))
    out = efs(params, feats)
    virial = np.asarray(out["virial"])

    # dE/d eps_ab via symmetric strain of positions AND cell
    eps = 1e-6
    pos0 = np.asarray(feats["positions"])
    cell0 = np.asarray(feats["cell"])
    for a in range(3):
        for b in range(3):
            strain = np.zeros((3, 3))
            strain[a, b] = eps
            def e_at(k):
                m = np.eye(3) + k * strain
                fp = dict(feats)
                fp["positions"] = jnp.asarray(pos0 @ m.T)
                fp["cell"] = jnp.asarray(cell0 @ m.T)
                return float(model.energy(params, fp))
            fd = (e_at(1) - e_at(-1)) / (2 * eps)
            assert abs(fd - virial[a, b]) < 5e-5, (a, b, fd, virial[a, b])


def test_hessian_symmetry(pd3o2):
    s = pd3o2[0]
    fz, model = _make_model(["Pd", "O"], 4.5)
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    params = model.init_params(jax.random.PRNGKey(2))
    hess = make_hessian_fn(model.energy)(params, feats)
    h = vap.reverse_map_hessian(np.asarray(hess))
    np.testing.assert_allclose(h, h.T, atol=1e-8)


def test_acut_larger_than_rcut():
    """Angular cutoff larger than the radial one: triples come from the
    acut list, radial pairs filtered to rcut."""
    # square of atoms with 3.5 A sides: diagonals ~4.95, sides between
    # rcut (3.0) and acut (4.5)
    pos = np.array([[0.0, 0, 0], [3.5, 0, 0], [0, 3.5, 0],
                    [1.75, 1.75, 1.0]])
    s = Structure.from_symbols(["Pd", "Pd", "O", "O"], pos,
                               np.eye(3) * 20.0, pbc=[False] * 3)
    fz = Featurizer(["Pd", "O"], rcut=3.0, acut=4.5, angular=True)
    vap = fz.make_vap(s)
    feats = fz.featurize(s, vap)
    # radial pairs all within rcut
    pos = feats["positions"]
    vec = (pos[feats["pair_j"]] + feats["pair_shift"] @ feats["cell"]
           - pos[feats["pair_i"]])
    rij = np.linalg.norm(vec, axis=1)
    real = feats["pair_mask"] > 0
    assert np.all(rij[real] < 3.0)
    # triples exist beyond rcut (up to acut)
    tp = pos[feats["trip_j"]] + feats["trip_shift_j"] @ feats["cell"] \
        - pos[feats["trip_i"]]
    tr = np.linalg.norm(tp, axis=1)
    treal = feats["trip_mask"] > 0
    assert tr[treal].max() > 3.0
    assert tr[treal].max() < 4.5 + 1e-9


def test_calculator_with_angular_model(pd3o2):
    """Calculator path (bucketing, re-layout) with an angular SF
    model."""
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    s = pd3o2[0]
    fz = Featurizer(["Pd", "O"], rcut=4.5, angular=True)
    sf = SymmetryFunction(["Pd", "O"], eta=[0.5, 4.0])
    model = AtomicNN(fz, Counter({"Pd": 3, "O": 2}), sf,
                     hidden_sizes=[8], minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(0))
    calc = TensorAlloyCalculator(model, params)
    e = calc.get_potential_energy(s)
    assert np.isfinite(e)
    # permuted copy agrees through the calculator's angular path
    b = pd3o2[1]
    assert calc.get_potential_energy(b) == pytest.approx(e, abs=1e-9)
