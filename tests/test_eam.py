"""EAM family: zjw04 vs published LAMMPS tables (true oracle), EAM
energy vs brute-force numpy, FD forces, ADP, fs, setfl round-trip."""
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.neighbor import neighbor_list
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN, EamFsNN, AdpNN
from tensoralloy_tpu.nn.eam.potentials import Zjw04, available_potentials
from tensoralloy_tpu.nn.fields import make_efs_fn
from tensoralloy_tpu.io.lammps import (read_eam_alloy_setfl,
                                       write_eam_alloy_setfl, read_adp_setfl)

SETFL = "/root/reference/test_files/lammps/MoNi_Zhou04.eam.alloy"


@pytest.fixture(scope="module")
def moni_setfl():
    return read_eam_alloy_setfl(SETFL)


def test_zjw04_vs_published_tables(moni_setfl):
    """rho/phi/F must match the Zhou-2004 published setfl tables to
    machine precision for r > 2 A (below that the table generator
    applies an unphysical short-range ramp)."""
    d = moni_setfl
    z = Zjw04()
    params = {"zjw04": z.initial_params(["Mo", "Ni"])}
    sel = d.r_grid > 2.0
    r = jnp.asarray(d.r_grid[sel])
    for el in ["Mo", "Ni"]:
        np.testing.assert_allclose(np.asarray(z.rho(params, r, el)),
                                   d.rho[el][sel], atol=1e-10)
    for key in ["MoMo", "NiNi", "MoNi"]:
        np.testing.assert_allclose(np.asarray(z.phi(params, r, key)),
                                   d.phi[key][sel], atol=1e-10)
    # embedding over the cubic branches (rho < 1.15 rho_e); the file's
    # rho >= rho_0 tail for Ni uses the v2 generator's re-fitted
    # variant, not the published closed form the reference implements
    for el, rho_e in [("Mo", 29.354065), ("Ni", 27.562015)]:
        rho_sel = (d.rho_grid > 1.0) & (d.rho_grid < 1.14 * rho_e)
        rho = jnp.asarray(d.rho_grid[rho_sel])
        np.testing.assert_allclose(np.asarray(z.embed(params, rho, el)),
                                   d.frho[el][rho_sel], atol=1e-8)
    # Mo (rho_s == rho_e) matches over the e3 branch too
    rho_sel = d.rho_grid > 1.0
    rho = jnp.asarray(d.rho_grid[rho_sel])
    np.testing.assert_allclose(np.asarray(z.embed(params, rho, "Mo")),
                               d.frho["Mo"][rho_sel], atol=1e-8)


@pytest.fixture()
def moni_structure():
    """Small rattled Mo-Ni fcc cell."""
    rng = np.random.RandomState(7)
    a0 = 3.6
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, 0]
                           for i in range(2) for j in range(1)])
    pos = frac * a0 + rng.normal(scale=0.08, size=(len(frac), 3))
    symbols = ["Mo", "Ni", "Mo", "Ni", "Ni", "Mo", "Ni", "Ni"]
    cell = np.diag([2 * a0, a0, a0])
    return Structure.from_symbols(symbols, pos, cell, pbc=[True] * 3)


def _oracle_eam_energy(s, rc, params_fns):
    """Brute-force numpy EAM: neighbor list -> rho sums -> F + 1/2 phi."""
    rho_fn, phi_fn, embed_fn = params_fns
    ii, jj, S, d, D = neighbor_list(s, rc)
    syms = s.symbols
    n = len(s)
    rho = np.zeros(n)
    e_phi = np.zeros(n)
    for p in range(len(ii)):
        i, j, r = ii[p], jj[p], d[p]
        rho[i] += rho_fn(r, syms[j])
        e_phi[i] += 0.5 * phi_fn(r, syms[i], syms[j])
    return sum(embed_fn(rho[i], syms[i]) for i in range(n)) + e_phi.sum()


def test_eam_alloy_zjw04_vs_oracle(moni_structure):
    s = moni_structure
    rc = 6.0
    fz = Featurizer(["Mo", "Ni"], rcut=rc)
    model = EamAlloyNN(fz, Counter(s.symbols), custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    e = float(model.energy(params, feats))

    z = Zjw04()
    zp = {"zjw04": z.initial_params(["Mo", "Ni"])}
    oracle = _oracle_eam_energy(
        s, rc,
        (lambda r, el: float(z.rho(zp, jnp.asarray([r]), el)[0]),
         lambda r, a, b: float(z.phi(zp, jnp.asarray([r]),
                                     "".join(sorted([a, b])))[0]),
         lambda rho, el: float(z.embed(zp, jnp.asarray([rho]), el)[0])))
    assert e == pytest.approx(oracle, abs=1e-8)


def test_eam_alloy_zjw04_forces_stress(moni_structure):
    s = moni_structure
    rc = 6.0
    fz = Featurizer(["Mo", "Ni"], rcut=rc)
    model = EamAlloyNN(fz, Counter(s.symbols), custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    out = jax.jit(make_efs_fn(model.energy))(params, feats)
    forces = np.asarray(out["forces"])
    assert np.all(np.isfinite(forces))
    eps = 1e-6
    for row, alpha in [(1, 0), (4, 2)]:
        pos = np.asarray(feats["positions"]).copy()
        fp = dict(feats)
        pos[row, alpha] += eps
        fp["positions"] = jnp.asarray(pos)
        ep = float(model.energy(params, fp))
        pos[row, alpha] -= 2 * eps
        fp["positions"] = jnp.asarray(pos)
        em = float(model.energy(params, fp))
        assert abs(-(ep - em) / (2 * eps) - forces[row, alpha]) < 1e-5
    # virial vs strain FD
    virial = np.asarray(out["virial"])
    cell0 = np.asarray(feats["cell"])
    pos0 = np.asarray(feats["positions"])
    strain = np.zeros((3, 3))
    strain[0, 1] = eps
    def e_at(k):
        m = np.eye(3) + k * strain
        fp = dict(feats)
        fp["positions"] = jnp.asarray(pos0 @ m.T)
        fp["cell"] = jnp.asarray(cell0 @ m.T)
        return float(model.energy(params, fp))
    fd = (e_at(1) - e_at(-1)) / (2 * eps)
    assert abs(fd - virial[0, 1]) < 1e-4


def test_eam_nn_functions_train(moni_structure):
    """All-'nn' EAM: params get gradients, FD force check."""
    s = moni_structure
    fz = Featurizer(["Mo", "Ni"], rcut=5.0)
    model = EamAlloyNN(fz, Counter(s.symbols), custom_potentials=None,
                       hidden_sizes=[8, 8])
    params = model.init_params(jax.random.PRNGKey(1))
    assert set(params["nn"]) == {"Mo.rho", "Mo.embed", "Ni.rho", "Ni.embed",
                                "MoMo.phi", "MoNi.phi", "NiNi.phi"}
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    out = jax.jit(make_efs_fn(model.energy))(params, feats)
    forces = np.asarray(out["forces"])
    eps = 1e-6
    pos = np.asarray(feats["positions"]).copy()
    fp = dict(feats)
    pos[2, 1] += eps
    fp["positions"] = jnp.asarray(pos)
    ep = float(model.energy(params, fp))
    pos[2, 1] -= 2 * eps
    fp["positions"] = jnp.asarray(pos)
    em = float(model.energy(params, fp))
    assert abs(-(ep - em) / (2 * eps) - forces[2, 1]) < 1e-6
    grads = jax.grad(lambda p: model.energy(p, feats))(params)
    for k, g in grads["nn"].items():
        gn = sum(float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g))
        assert gn > 0, k


def test_eam_fs_mixed(moni_structure):
    """FS model with per-ordered-pair rho; mixed nn/analytic selection."""
    s = moni_structure
    fz = Featurizer(["Mo", "Ni"], rcut=5.0)
    model = EamFsNN(fz, Counter(s.symbols), hidden_sizes=[8])
    params = model.init_params(jax.random.PRNGKey(2))
    assert {"MoMo.rho", "MoNi.rho", "NiMo.rho", "NiNi.rho"} <= \
        set(params["nn"])
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    e = float(model.energy(params, feats))
    assert np.isfinite(e)
    # ordered rho matters: swapping MoNi/NiMo rho weights changes energy
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2["nn"] = dict(p2["nn"])
    p2["nn"]["MoNi.rho"], p2["nn"]["NiMo.rho"] = \
        p2["nn"]["NiMo.rho"], p2["nn"]["MoNi.rho"]
    e2 = float(model.energy(p2, feats))
    assert abs(e - e2) > 1e-10


def test_adp_energy_and_forces(moni_structure):
    s = moni_structure
    fz = Featurizer(["Mo", "Ni"], rcut=5.0)
    model = AdpNN(fz, Counter(s.symbols), hidden_sizes=[8])
    params = model.init_params(jax.random.PRNGKey(3))
    assert "MoNi.dipole" in params["nn"]
    assert "MoNi.quadrupole" in params["nn"]
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    out = jax.jit(make_efs_fn(model.energy))(params, feats)
    forces = np.asarray(out["forces"])
    eps = 1e-6
    pos = np.asarray(feats["positions"]).copy()
    fp = dict(feats)
    pos[3, 0] += eps
    fp["positions"] = jnp.asarray(pos)
    ep = float(model.energy(params, fp))
    pos[3, 0] -= 2 * eps
    fp["positions"] = jnp.asarray(pos)
    em = float(model.energy(params, fp))
    fd = -(ep - em) / (2 * eps)
    # untrained u/w on raw d-vectors give large magnitudes; compare
    # relatively
    assert fd == pytest.approx(forces[3, 0], rel=1e-6)


def _oracle_adp_extra(s, rc, u_fn, w_fn, per_term=True):
    """Brute-force ADP dipole+quadrupole energy."""
    ii, jj, S, d, D = neighbor_list(s, rc)
    syms = s.symbols
    n = len(s)
    terms = sorted({"".join(sorted([a, b]))
                    for a in set(syms) for b in set(syms)})
    mu = {}
    lam = {}
    for p in range(len(ii)):
        i, j, r = ii[p], jj[p], d[p]
        t = "".join(sorted([syms[i], syms[j]])) if per_term else "all"
        key = (i, t)
        mu.setdefault(key, np.zeros(3))
        lam.setdefault(key, np.zeros((3, 3)))
        mu[key] += u_fn(r, t if per_term else
                        "".join(sorted([syms[i], syms[j]]))) * D[p]
        lam[key] += w_fn(r, t if per_term else
                         "".join(sorted([syms[i], syms[j]]))) * \
            np.outer(D[p], D[p])
    total = 0.0
    for key in mu:
        m = mu[key]
        l = lam[key]
        nu = np.trace(l)
        total += 0.5 * np.sum(m ** 2) + 0.5 * np.sum(l ** 2) - nu ** 2 / 6.0
    return total


def test_adp_extra_vs_oracle(moni_structure):
    """ADP dipole/quadrupole sums vs brute-force, with simple analytic
    u/w injected through nn params set to reproducible linear forms."""
    s = moni_structure
    rc = 5.0
    fz = Featurizer(["Mo", "Ni"], rcut=rc)
    model = AdpNN(fz, Counter(s.symbols), hidden_sizes=[4])
    params = model.init_params(jax.random.PRNGKey(4))
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    vec, r, mask, ei, ej = model._pair_geometry(feats)
    adp = np.asarray(model._adp_energy(params, feats, vec, r, mask, ei, ej))

    def make_eval(key):
        def f(rr, term):
            mlp = params["nn"][f"{term}.{key}"]
            from tensoralloy_tpu.nn.layers import apply_dense_stack
            return float(apply_dense_stack(
                mlp, jnp.asarray([[rr]]), model.activation)[0, 0])
        return f

    oracle = _oracle_adp_extra(s, rc, make_eval("dipole"),
                               make_eval("quadrupole"), per_term=True)
    # map VAP atomic contributions back and sum
    assert np.sum(adp[1:]) == pytest.approx(oracle, abs=1e-8)


def test_setfl_export_roundtrip(tmp_path, moni_structure):
    """Export zjw04-based model to setfl; reading it back reproduces the
    analytic functions on the grid."""
    fz = Featurizer(["Mo", "Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Mo": 4, "Ni": 4}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "out.eam.alloy")
    data = model.export_to_setfl(path, params, nr=500, nrho=400,
                                 rho_max=80.0)
    back = read_eam_alloy_setfl(path)
    assert back.elements == ["Mo", "Ni"]
    np.testing.assert_allclose(back.frho["Mo"], data.frho["Mo"],
                               rtol=1e-12)
    sel = back.r_grid > 1.0
    np.testing.assert_allclose(back.phi["MoNi"][sel],
                               data.phi["MoNi"][sel], rtol=1e-6)
    # and vs the reference fixture's functions at shared radii
    ref = read_eam_alloy_setfl(SETFL)
    z = Zjw04()
    zp = {"zjw04": z.initial_params(["Mo", "Ni"])}
    r = jnp.asarray(back.r_grid[sel])
    np.testing.assert_allclose(back.rho["Ni"][sel],
                               np.asarray(z.rho(zp, r, "Ni")), atol=1e-10)


def test_adp_setfl_fixture_reads():
    d = read_adp_setfl("/root/reference/test_files/lammps/AlCu.adp")
    assert d.elements == ["Al", "Cu"]
    assert set(d.dipole) == {"AlAl", "AlCu", "CuCu"}
    assert d.frho["Al"].shape == (d.nrho,)
    assert np.all(np.isfinite(d.quadrupole["AlCu"]))


def test_spline_potential_from_published_tables():
    """spline@ potentials: Agrawal Be (alloy) and Mendelev Al-Fe (fs)
    tables become differentiable potentials; energies finite, forces
    match finite differences."""
    import jax.numpy as jnp
    from tensoralloy_tpu.nn.eam.potentials import resolve_potential
    from tensoralloy_tpu.atoms import Structure

    be = resolve_potential(
        "spline@/root/reference/test_files/lammps/Be_Agrawal.eam.alloy")
    r = jnp.linspace(1.5, 4.5, 50)
    assert np.all(np.isfinite(np.asarray(be.phi({}, r, "BeBe"))))
    assert np.all(np.isfinite(np.asarray(be.rho({}, r, "Be"))))
    # spline reproduces the table values at the knots
    d = be.data
    sel = slice(2000, 2200)
    np.testing.assert_allclose(
        np.asarray(be.rho({}, jnp.asarray(d.r_grid[sel]), "Be")),
        d.rho["Be"][sel], rtol=1e-10, atol=1e-12)

    # full EAM/fs model over the Mendelev Al-Fe table
    fz = Featurizer(["Al", "Fe"], rcut=6.5)
    name = ("spline@/root/reference/test_files/lammps/"
            "Mendelev_Al_Fe.fs.eam")
    model = EamFsNN(fz, Counter({"Al": 2, "Fe": 2}),
                    custom_potentials=name)
    params = model.init_params(jax.random.PRNGKey(0))
    a0 = 2.86
    s = Structure.from_symbols(
        ["Fe", "Al", "Fe", "Al"],
        np.array([[0, 0, 0], [0.5, 0.5, 0.5], [0.5, 0.5, 0],
                  [0, 0, 0.5]]) * a0 * np.array([1, 1, 2]),
        np.diag([a0, a0, 2 * a0]), pbc=[True] * 3)
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    e = float(model.energy(params, feats))
    assert np.isfinite(e)
    out = jax.jit(make_efs_fn(model.energy))(params, feats)
    forces = np.asarray(out["forces"])
    eps = 1e-5
    pos = np.asarray(feats["positions"]).copy()
    fp = dict(feats)
    pos[2, 0] += eps
    fp["positions"] = jnp.asarray(pos)
    ep = float(model.energy(params, fp))
    pos[2, 0] -= 2 * eps
    fp["positions"] = jnp.asarray(pos)
    em = float(model.energy(params, fp))
    assert -(ep - em) / (2 * eps) == pytest.approx(forces[2, 0],
                                                   rel=1e-4, abs=1e-6)


def test_spline_adp_potential():
    from tensoralloy_tpu.nn.eam.potentials import resolve_potential
    import jax.numpy as jnp
    adp = resolve_potential(
        "spline@/root/reference/test_files/lammps/AlCu.adp")
    r = jnp.linspace(1.5, 5.5, 20)
    for term in ("AlAl", "AlCu", "CuCu"):
        assert np.all(np.isfinite(np.asarray(adp.dipole({}, r, term))))
        assert np.all(np.isfinite(np.asarray(
            adp.quadrupole({}, r, term))))


def test_zjw04_variants():
    """zjw04xc blends smoothly into the base form away from the seams;
    uxc frees r_eq; xcp uses its own MoNi pair row."""
    from tensoralloy_tpu.nn.eam.potentials import (available_potentials,
                                                   Zjw04)
    z = Zjw04()
    xc = available_potentials["zjw04xc"]
    p0 = {"zjw04": z.initial_params(["Mo"])}
    p1 = {"zjw04xc": xc.initial_params(["Mo"])}
    rho = jnp.asarray([5.0, 15.0, 50.0])
    np.testing.assert_allclose(
        np.asarray(xc.embed(p1, rho, "Mo")),
        np.asarray(z.embed(p0, rho, "Mo")), atol=1e-4)
    # xc embed is smooth across the branch seams (finite gradient)
    g = jax.grad(lambda r: jnp.sum(xc.embed(p1, r, "Mo")))(
        jnp.asarray([0.85 * 29.354065, 1.15 * 29.354065]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert "Be" in xc.defaults
    assert available_potentials["zjw04uxc"].always_fixed == {}
    xcp = available_potentials["zjw04xcp"]
    r = jnp.asarray([2.5, 3.5])
    pp = {"zjw04xcp": xcp.initial_params(["Mo", "Ni", "MoNi"])}
    own = np.asarray(xcp.phi(pp, r, "MoNi"))
    mixed = np.asarray(xc.phi({"zjw04xc": xc.initial_params(
        ["Mo", "Ni"])}, r, "MoNi"))
    assert not np.allclose(own, mixed)


def test_msah11_vs_published_tables():
    """Al-Fe Mendelev-2011 analytic forms vs the published LAMMPS
    eam/fs table (true oracle): phi/rho/F to machine precision."""
    from tensoralloy_tpu.nn.eam.potentials import available_potentials
    from tensoralloy_tpu.io.lammps import read_eam_fs_setfl
    m = available_potentials["msah11"]
    d = read_eam_fs_setfl(
        "/root/reference/test_files/lammps/Mendelev_Al_Fe.fs.eam")
    sel = (d.r_grid > 1.8) & (d.r_grid < 6.0)
    r = jnp.asarray(d.r_grid[sel])
    for key in ("AlAl", "FeFe", "AlFe"):
        np.testing.assert_allclose(np.asarray(m.phi({}, r, key)),
                                   d.phi[key][sel], atol=1e-9)
        np.testing.assert_allclose(np.asarray(m.rho({}, r, key)),
                                   d.rho[key][sel], atol=1e-12)
    rho_sel = (d.rho_grid > 1.0) & (d.rho_grid < 100.0)
    rho = jnp.asarray(d.rho_grid[rho_sel])
    for el in ("Al", "Fe"):
        np.testing.assert_allclose(np.asarray(m.embed({}, rho, el)),
                                   d.frho[el][rho_sel], atol=1e-12)
    # full FS model with msah11 gives finite E/F on an Al-Fe cell
    fz = Featurizer(["Al", "Fe"], rcut=6.5)
    model = EamFsNN(fz, Counter({"Al": 2, "Fe": 2}),
                    custom_potentials="msah11")
    params = model.init_params(jax.random.PRNGKey(0))
    a0 = 2.88
    s = Structure.from_symbols(
        ["Fe", "Al", "Fe", "Al"],
        np.array([[0, 0, 0], [0.5, 0.5, 0.5], [0.5, 0.5, 0],
                  [0, 0, 0.5]]) * a0 * np.array([1, 1, 2]),
        np.diag([a0, a0, 2 * a0]), pbc=[True] * 3)
    vap = fz.make_vap(s, model.max_occurs)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    out = jax.jit(make_efs_fn(model.energy))(params, feats)
    assert np.isfinite(float(out["energy"]))
    assert np.all(np.isfinite(np.asarray(out["forces"])))


def test_fs_setfl_export_roundtrip(tmp_path):
    """EamFsNN export writes true LAMMPS eam/fs layout: per element, N
    ordered rho_{a<-b} columns (ADVICE r1: the alloy-layout export
    silently dropped cross densities). Round-trip vs the msah11
    analytic functions."""
    from tensoralloy_tpu.io.lammps import read_eam_fs_setfl
    from tensoralloy_tpu.nn.eam.potentials import available_potentials
    fz = Featurizer(["Al", "Fe"], rcut=6.0)
    model = EamFsNN(fz, Counter({"Al": 2, "Fe": 2}),
                    custom_potentials="msah11")
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "out.eam.fs")
    model.export_to_setfl(path, params, nr=600, nrho=400, rho_max=90.0)
    back = read_eam_fs_setfl(path)
    assert back.elements == ["Al", "Fe"]
    # every ORDERED pair present and matching the analytic rho
    m = available_potentials["msah11"]
    sel = (back.r_grid > 1.8) & (back.r_grid < 5.8)
    r = jnp.asarray(back.r_grid[sel])
    for key in ("AlAl", "AlFe", "FeAl", "FeFe"):
        np.testing.assert_allclose(back.rho[key][sel],
                                   np.asarray(m.rho({}, r, key)),
                                   atol=1e-9)
    # true fs layout: all four ordered tables present, and the file is
    # NOT alloy-shaped (self-densities differ between elements)
    assert set(back.rho) == {"AlAl", "AlFe", "FeAl", "FeFe"}
    assert not np.allclose(back.rho["AlAl"], back.rho["FeFe"])


def test_agrawal_be_vs_published_table():
    """Agrawal Be: phi is gauge-invariant and matches the published
    table; the (re-gauged) rho/F pair reproduces the same total energy
    as the spline-backed table potential on hcp Be."""
    from tensoralloy_tpu.nn.eam.potentials import available_potentials
    from tensoralloy_tpu.io.lammps import read_eam_alloy_setfl
    from tensoralloy_tpu.tensordb.sampler import make_phase_structure
    a = available_potentials["agrawal"]
    params = {"agrawal": a.initial_params(["Be"])}
    d = read_eam_alloy_setfl(
        "/root/reference/test_files/lammps/Be_Agrawal.eam.alloy")
    sel = (d.r_grid > 1.2) & (d.r_grid < 4.99)
    r = jnp.asarray(d.r_grid[sel])
    np.testing.assert_allclose(np.asarray(a.phi(params, r, "BeBe")),
                               d.phi["BeBe"][sel], atol=1e-6)
    s = make_phase_structure("Be", "hcp", 2.2866,
                             c_over_a=1.568).repeat((2, 2, 2))
    fz = Featurizer(["Be"], rcut=5.0)
    energies = []
    for name in ("agrawal",
                 "spline@/root/reference/test_files/lammps/"
                 "Be_Agrawal.eam.alloy"):
        m = EamAlloyNN(fz, Counter(s.symbols), custom_potentials=name)
        p = m.init_params(jax.random.PRNGKey(0))
        vap = fz.make_vap(s, m.max_occurs)
        feats = {k: jnp.asarray(v)
                 for k, v in fz.featurize(s, vap).items()}
        energies.append(float(m.energy(p, feats)) / len(s))
    assert energies[0] == pytest.approx(energies[1], abs=5e-3)


def test_mishinh_and_grimes():
    """MishinH embedding/ADP-polar terms and the Grimes Pu potential."""
    from tensoralloy_tpu.nn.eam.potentials import available_potentials
    from tensoralloy_tpu.io.extxyz import read_extxyz
    m = available_potentials["mishinh"]
    p = {"mishinh": m.initial_params(["H", "NiNi"])}
    rho = jnp.linspace(0.0, 2.0, 9)
    f = np.asarray(m.embed(p, rho, "H"))
    assert np.all(np.isfinite(f))
    assert f[0] == pytest.approx(0.0, abs=1e-6)   # F(0) = 0
    r = jnp.linspace(2.0, 5.0, 5)
    assert np.all(np.isfinite(np.asarray(m.dipole(p, r, "NiNi"))))
    # polar terms vanish beyond rc (psi cutoff)
    far = jnp.asarray([6.0])
    assert float(m.dipole(p, far, "NiNi")[0]) == pytest.approx(0.0)

    g = available_potentials["grimes"]
    s = read_extxyz("/root/reference/test_files/Pu4_60GPa.extxyz")[0]
    fz = Featurizer(["Pu"], rcut=6.0)
    model = EamAlloyNN(fz, Counter(s.symbols), custom_potentials="grimes")
    params = model.init_params(jax.random.PRNGKey(0))
    vap = fz.make_vap(s)
    feats = {k: jnp.asarray(v) for k, v in fz.featurize(s, vap).items()}
    out = jax.jit(make_efs_fn(model.energy))(params, feats)
    assert np.isfinite(float(out["energy"]))
    assert np.all(np.isfinite(np.asarray(out["forces"])))
    # parameters receive gradients (trainable empirical potential)
    grads = jax.grad(lambda pp: model.energy(pp, feats))(params)
    assert abs(float(grads["grimes"]["PuPu"]["D"])) > 0


def test_sutton90_vs_published_funcfl():
    """Sutton-Chen Ag vs the published DYNAMO funcfl table (true
    oracle): rho/phi/F at machine precision."""
    from tensoralloy_tpu.io.lammps import read_funcfl
    from tensoralloy_tpu.nn.eam.potentials import available_potentials
    d = read_funcfl("/root/reference/test_files/lammps/Ag.funcfl.eam")
    assert d.element == "Ag"
    s = available_potentials["sutton90"]
    p = {"sutton90": s.initial_params(["Ag", "AgAg"])}
    sel = (d.r_grid > 2.0) & (d.r_grid < 11.0)
    r = jnp.asarray(d.r_grid[sel])
    np.testing.assert_allclose(np.asarray(s.rho(p, r, "Ag")),
                               d.rho[sel], atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.phi(p, r, "AgAg")),
                               d.phi()[sel], atol=1e-12)
    rho_sel = d.rho_grid > 0.01
    rho = jnp.asarray(d.rho_grid[rho_sel])
    np.testing.assert_allclose(np.asarray(s.embed(p, rho, "Ag")),
                               d.frho[rho_sel], atol=1e-12)
