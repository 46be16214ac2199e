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
    # row-chunked evaluation (AtomicNN.energy_chunked) passes the
    # block's center rows separately; gathers always use full positions
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
