"""Parity against the reference's OWN exported frozen graphs.

The reference snapshot ships its frozen TF1 inference artifacts
`test_files/models/{Ni,Mo}.zhou04.pb` — the same fixtures its own
test strategy uses as calculator oracles
(`/root/reference/tensoralloy/tests/test_calculator.py:53-80`,
`tensoralloy/calculator.py:58-85,128-170`). We load them via
`tf.compat.v1`, feed them from OUR neighbor list + VAP (the feed
layout mirrors `tensoralloy/transformer/universal.py:46-113,851-895`:
1-based VAP ilist/jlist, integer shift `n1`, the 5-column
`g2.v2g_map` = [interaction, vap_i, nnl-slot, 0, mask]), and pin this
framework's zjw04 EamAlloyNN calculator against the graph's
energy/forces/stress outputs at machine precision.

This upgrades four rounds of "parity vs published LAMMPS tables" to
"parity vs the reference's own exported artifact": same potential,
same cutoff, same structures, two independent implementations.

Gated: skipped when TensorFlow is not importable (it is baked into
this image) or the reference fixtures are absent.
"""
import json
from collections import Counter

import numpy as np
import pytest

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.neighbor import neighbor_list
from tensoralloy_tpu.vap import VirtualAtomMap

tf = pytest.importorskip("tensorflow")

import os.path  # noqa: E402

NI_PB = "/root/reference/test_files/models/Ni.zhou04.pb"
MO_PB = "/root/reference/test_files/models/Mo.zhou04.pb"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(NI_PB) and os.path.exists(MO_PB)),
    reason="reference frozen-graph fixtures not present")

tf1 = tf.compat.v1


@pytest.fixture(scope="module", autouse=True)
def _graph_mode():
    # the frozen artifacts are TF1 GraphDefs; session mode only
    tf1.disable_eager_execution()
    yield


class FrozenGraph:
    """Loads a reference frozen graph and evaluates E/F/S for a
    Structure through the reference's placeholder contract."""

    def __init__(self, path):
        gd = tf1.GraphDef()
        with open(path, "rb") as fp:
            gd.ParseFromString(fp.read())
        g = tf1.Graph()
        with g.as_default():
            tf1.import_graph_def(gd, name="")
        self.sess = tf1.Session(graph=g)
        self.params = json.loads(
            self.sess.run(g.get_tensor_by_name("Transformer/params:0")))
        self.ops = json.loads(
            self.sess.run(g.get_tensor_by_name("Metadata/ops:0")))
        self.graph = g

    @property
    def rcut(self):
        return float(self.params["rcut"])

    @property
    def elements(self):
        return list(self.params["elements"])

    def _feed(self, s: Structure):
        vap = VirtualAtomMap(Counter(s.symbols), s.symbols)
        ilist, jlist, shift, _, _ = neighbor_list(s, self.rcut)
        nij = len(ilist)
        elements = self.elements
        kbody = {}
        for e in elements:
            terms = [e + e2 for e2 in [e] + [x for x in elements if x != e]]
            for i, t in enumerate(terms):
                kbody[t] = i
        sym = s.symbols
        tlist = np.array(
            [kbody[sym[i] + sym[j]] for i, j in zip(ilist, jlist)], np.int32)
        iv = vap.local_to_vap[ilist].astype(np.int32)
        jv = vap.local_to_vap[jlist].astype(np.int32)
        v2g = np.zeros((nij, 5), np.int32)
        v2g[:, 0] = tlist
        v2g[:, 1] = iv
        counters = {}
        for k in range(nij):
            key = (int(iv[k]), int(tlist[k]))
            inc = counters.get(key, 0)
            v2g[k, 2] = inc
            counters[key] = inc + 1
        v2g[:, 4] = 1
        return {
            "Placeholders/positions:0": vap.map_positions(s.positions),
            "Placeholders/cell:0": s.cell.astype(np.float64),
            "Placeholders/volume:0": np.float64(s.volume),
            "Placeholders/n_atoms_vap:0": np.int32(vap.n_atoms_vap),
            "Placeholders/nnl_max:0": np.int32(v2g[:, 2].max() + 1),
            "Placeholders/atom_masks:0": vap.atom_masks.astype(np.float64),
            "Placeholders/pulay_stress:0": np.float64(0.0),
            "Placeholders/etemperature:0": np.float64(0.0),
            "Placeholders/row_splits:0": np.array(
                [1] + [vap.max_occurs[e] for e in elements], np.int32),
            "Placeholders/g2.ilist:0": iv,
            "Placeholders/g2.jlist:0": jv,
            "Placeholders/g2.n1:0": shift.astype(np.float64),
            "Placeholders/g2.v2g_map:0": v2g,
        }, vap

    def efs(self, s: Structure):
        feed, vap = self._feed(s)
        e, f, st = self.sess.run(
            [self.ops["energy"], self.ops["forces"], self.ops["stress"]],
            feed_dict=feed)
        if f.shape[0] == vap.n_atoms_vap - 1:
            f = np.insert(f, 0, 0.0, axis=0)
        if f.shape[0] == vap.n_atoms_vap:
            f = f[vap.local_to_vap]
        return float(e), np.asarray(f), np.asarray(st)


@pytest.fixture(scope="module")
def ni_graph():
    return FrozenGraph(NI_PB)


@pytest.fixture(scope="module")
def mo_graph():
    return FrozenGraph(MO_PB)


def _our_calc(elements, rcut, symbols):
    import jax

    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.transform import Featurizer

    fz = Featurizer(elements, rcut=rcut)
    model = EamAlloyNN(fz, Counter(symbols), custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    return TensorAlloyCalculator(model, params)


def _fcc(element, a, reps, rattle=0.0, seed=0):
    cell1 = a * np.eye(3)
    base = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
    pos = []
    for i in range(reps):
        for j in range(reps):
            for k in range(reps):
                pos.extend((base + [i, j, k]) @ cell1)
    pos = np.asarray(pos)
    if rattle:
        pos = pos + np.random.RandomState(seed).uniform(
            -rattle, rattle, pos.shape)
    cell = reps * cell1
    return Structure.from_symbols([element] * len(pos), pos, cell,
                                  pbc=[True] * 3)


def _bcc(element, a, reps, rattle=0.0, seed=0):
    cell1 = a * np.eye(3)
    base = np.array([[0, 0, 0], [.5, .5, .5]])
    pos = []
    for i in range(reps):
        for j in range(reps):
            for k in range(reps):
                pos.extend((base + [i, j, k]) @ cell1)
    pos = np.asarray(pos)
    if rattle:
        pos = pos + np.random.RandomState(seed).uniform(
            -rattle, rattle, pos.shape)
    return Structure.from_symbols([element] * len(pos), pos, reps * cell1,
                                  pbc=[True] * 3)


def _pin(graph: FrozenGraph, s: Structure, calc=None):
    e_ref, f_ref, s_ref = graph.efs(s)
    calc = calc or _our_calc(graph.elements, graph.rcut, s.symbols)
    e = float(calc.get_potential_energy(s))
    f = np.asarray(calc.get_forces(s))
    st = np.asarray(calc.get_stress(s))
    n = len(s)
    # BASELINE gate is 1e-6 eV/atom and 1e-5 eV/A; both f64
    # implementations agree to ~1e-12, so pin well below the gate
    assert abs(e - e_ref) / n < 1e-9, (e, e_ref)
    np.testing.assert_allclose(f, f_ref, atol=1e-8)
    np.testing.assert_allclose(st, s_ref, atol=1e-10)
    return e, e_ref


def test_ni_pb_metadata(ni_graph):
    assert ni_graph.elements == ["Ni"]
    assert ni_graph.params["class"] == "UniversalTransformer"
    assert not ni_graph.params["angular"]


def test_ni_pb_bulk_rattled(ni_graph):
    s = _fcc("Ni", 3.52, 2, rattle=0.08, seed=1)
    e, e_ref = _pin(ni_graph, s)
    # sanity: cohesive scale, not a trivial zero
    assert -5.0 < e / len(s) < -4.0


def test_ni_pb_skewed_cell(ni_graph):
    s = _fcc("Ni", 3.52, 2, rattle=0.05, seed=2)
    m = np.eye(3) + np.array([[0.02, 0.04, 0.0],
                              [0.0, -0.03, 0.05],
                              [0.0, 0.0, 0.01]])
    s = Structure.from_symbols(s.symbols, s.positions @ m.T, s.cell @ m.T,
                               pbc=[True] * 3)
    _pin(ni_graph, s)


def test_ni_pb_surface_slab(ni_graph):
    # 2x2x3 fcc slab with 12 A vacuum along z (periodic cell, the
    # reference's frozen graphs assume periodic=True)
    s = _fcc("Ni", 3.52, 2, rattle=0.03, seed=3)
    reps_z = 3
    cell1 = 3.52 * np.eye(3)
    base = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
    pos = []
    for i in range(2):
        for j in range(2):
            for k in range(reps_z):
                pos.extend((base + [i, j, k]) @ cell1)
    pos = np.asarray(pos) + np.random.RandomState(4).uniform(
        -0.03, 0.03, (len(pos), 3))
    cell = np.diag([2 * 3.52, 2 * 3.52, reps_z * 3.52 + 12.0])
    s = Structure.from_symbols(["Ni"] * len(pos), pos, cell, pbc=[True] * 3)
    _pin(ni_graph, s)


def test_ni_pb_vacancy(ni_graph):
    s = _fcc("Ni", 3.52, 2, rattle=0.04, seed=5)
    keep = np.arange(len(s)) != 7
    s = Structure.from_symbols(
        [sym for i, sym in enumerate(s.symbols) if keep[i]],
        s.positions[keep], s.cell, pbc=[True] * 3)
    _pin(ni_graph, s)


def test_mo_pb_bulk_rattled(mo_graph):
    assert mo_graph.elements == ["Mo"]
    s = _bcc("Mo", 3.15, 3, rattle=0.08, seed=6)
    e, e_ref = _pin(mo_graph, s)
    assert -7.5 < e / len(s) < -6.0


def test_mo_pb_skewed_cell(mo_graph):
    s = _bcc("Mo", 3.15, 2, rattle=0.05, seed=7)
    m = np.eye(3) + np.array([[-0.02, 0.03, 0.01],
                              [0.0, 0.04, -0.02],
                              [0.0, 0.0, 0.03]])
    s = Structure.from_symbols(s.symbols, s.positions @ m.T, s.cell @ m.T,
                               pbc=[True] * 3)
    _pin(mo_graph, s)
