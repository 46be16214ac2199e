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
    """r_ij vectors [nij, 3]: R[j] + S @ cell - R[i]."""
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
    """(rij, rik, rjk) for each triple, padding-safe (=1 where masked)."""
    pos = features["positions"]
    cell = features["cell"]
    ri = pos[features["trip_i"]]
    rj = pos[features["trip_j"]] + features["trip_shift_j"] @ cell
    rk = pos[features["trip_k"]] + features["trip_shift_k"] @ cell
    mask = features["trip_mask"]
    def dist(a, b):
        r = safe_norm(b - a, eps=eps)
        return jnp.where(mask > 0, r, 1.0)
    return dist(ri, rj), dist(ri, rk), dist(rj, rk)
