"""Pallas fused descriptor kernels vs the XLA segment-sum reference
(interpret mode on CPU; the same kernels compile for TPU)."""
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.sf import SymmetryFunction
from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
from tensoralloy_tpu.ops.cutoffs import cosine_cutoff
from tensoralloy_tpu.ops.pallas_kernels import (
    dense_from_flat, fused_g2_descriptor, fused_grap_descriptor)


@pytest.fixture()
def dense_inputs(pd3o2):
    s = pd3o2[0]
    rc = 4.5
    fz = Featurizer(["Pd", "O"], rcut=rc)
    vap = fz.make_vap(s)
    feats = fz.featurize(s, vap)
    # device-equivalent host geometry
    pos = feats["positions"]
    vec = (pos[feats["pair_j"]] + feats["pair_shift"] @ feats["cell"]
           - pos[feats["pair_i"]])
    rij = np.linalg.norm(vec, axis=1)
    rij_safe = np.where(feats["pair_mask"] > 0, rij, 1.0)
    unit = vec / rij_safe[:, None]
    fc = np.asarray(cosine_cutoff(rij_safe, rc)) * feats["pair_mask"]
    dense, nnl = dense_from_flat(
        feats["pair_i"],
        {"rij": rij_safe, "fc": fc, "islot": feats["pair_islot"],
         "unit": unit},
        n_rows=vap.n_atoms_vap)
    return s, rc, fz, vap, feats, dense, nnl


def test_fused_g2_matches_segment_sum(dense_inputs):
    s, rc, fz, vap, feats, dense, nnl = dense_inputs
    eta = [0.5, 4.0, 20.0]
    omega = [0.0, 1.0, 0.0]
    sf = SymmetryFunction(["Pd", "O"], eta=eta, omega=[0.0])
    # reference: grid = product(eta, omega) -> use matching flat lists
    ref = np.asarray(sf.radial(
        {k: jnp.asarray(v) for k, v in feats.items()}, rc,
        fz.n_radial_slots))
    got = np.asarray(fused_g2_descriptor(
        jnp.asarray(dense["rij"]), jnp.asarray(dense["islot"]),
        jnp.asarray(dense["fc"]),
        eta=np.asarray(sf.radial_grid[:, 0]),
        omega=np.asarray(sf.radial_grid[:, 1]),
        rc=rc, n_slots=fz.n_radial_slots, block=8, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("max_moment", [0, 2, 3])
def test_fused_grap_matches_segment_sum(dense_inputs, max_moment):
    s, rc, fz, vap, feats, dense, nnl = dense_inputs
    rl = [1.0, 2.0]
    plw = [2.0, 3.0]
    grap = GenericRadialAtomicPotential(
        ["Pd", "O"], algorithm="pexp",
        parameters={"rl": rl, "pl": plw}, param_space_method="pair",
        moment_tensors=list(range(max_moment + 1)))
    ref = np.asarray(grap.compute(
        {k: jnp.asarray(v) for k, v in feats.items()}, rc, rc,
        fz.n_radial_slots, fz.n_angular_slots, False))
    got = np.asarray(fused_grap_descriptor(
        jnp.asarray(dense["rij"]), jnp.asarray(dense["unit"]),
        jnp.asarray(dense["islot"]), jnp.asarray(dense["fc"]),
        rl=rl, plw=plw, rc=rc, n_slots=fz.n_radial_slots,
        max_moment=max_moment, block=8, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


def test_dense_from_flat_roundtrip():
    pair_i = np.array([0, 0, 2, 2, 2, 1])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    dense, nnl = dense_from_flat(pair_i, {"v": vals}, n_rows=3)
    assert nnl == 3
    np.testing.assert_allclose(dense["v"][0], [1, 2, 0])
    np.testing.assert_allclose(dense["v"][1], [6, 0, 0])
    np.testing.assert_allclose(dense["v"][2], [3, 4, 5])
