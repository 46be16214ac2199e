"""Device-side pair/triple geometry from flat feature arrays.

The analogue of the reference's in-graph distance computation
(`transformer/universal.py:448-474` safe-norm + PBC einsum), acting on
the flat pair layout produced by `transform.featurizer`.
"""
from __future__ import annotations

import jax.numpy as jnp


def safe_norm(vec, eps: float = 1e-14, axis: int = -1):
    """Norm with a smooth, NaN-free gradient at zero."""
    return jnp.sqrt(jnp.sum(jnp.square(vec), axis=axis) + eps)


def pair_vectors(features):
    """r_ij vectors [nij, 3]: R[j] + S @ cell - R[i].

    If the features carry an explicit "rij" array, it is returned
    verbatim — the rij-fed evaluation mode (reference
    `use_computed_dists=False`, `universal.py:265-276`): an external
    engine (e.g. a LAMMPS pair style) supplies the displacement vectors
    and differentiates the energy w.r.t. them instead of positions."""
    if "rij" in features:
        return features["rij"]
    pos = features["positions"]
    cell = features["cell"]
    ri = pos[features["pair_i"]]
    rj = pos[features["pair_j"]]
    return rj + features["pair_shift"] @ cell - ri


def pair_distances(features, eps: float = 1e-14):
    """(rij [nij], masked-safe rij) — padding entries give rij_safe = 1."""
    rij = safe_norm(pair_vectors(features), eps=eps)
    mask = features["pair_mask"]
    rij_safe = jnp.where(mask > 0, rij, 1.0)
    return rij, rij_safe


def triple_distances(features, eps: float = 1e-14):
    """(rij, rik, rjk) for each triple, padding-safe (=1 where masked).

    rij-fed mode: if "trip_rij"/"trip_rik" displacement arrays are
    present (external engine supplies triple geometry, reference
    `use_computed_dists=False`), distances derive from them and the
    positions/cell stay out of the graph."""
    mask = features["trip_mask"]

    def safe(r):
        return jnp.where(mask > 0, r, 1.0)

    if "trip_rij" in features:
        vj = features["trip_rij"]
        vk = features["trip_rik"]
        return (safe(safe_norm(vj, eps=eps)),
                safe(safe_norm(vk, eps=eps)),
                safe(safe_norm(vk - vj, eps=eps)))
    pos = features["positions"]
    cell = features["cell"]
    ri = pos[features["trip_i"]]
    rj = pos[features["trip_j"]] + features["trip_shift_j"] @ cell
    rk = pos[features["trip_k"]] + features["trip_shift_k"] @ cell

    def dist(a, b):
        return safe(safe_norm(b - a, eps=eps))

    return dist(ri, rj), dist(ri, rk), dist(rj, rk)
