"""Dense per-atom neighbor layout: segment reductions as MXU matmuls.

The flat-pair `segment_sum` descriptor path materializes a
``[nij, K, D]`` (GRAP) or ``[nij, T]`` (G2/G4) intermediate in HBM and
reduces it with a scatter-add — memory-bound at SNAP-scale padding
(nij 12,384 / nijk 526,320 per structure, BASELINE.md).

Here flat per-pair values are scattered ONCE into a dense
``[n_rows, width]`` per-atom layout (``pair_col`` columns from the
featurizer), after which every descriptor reduction over neighbors is a
*batched matmul over the neighbor axis* — exactly the contraction shape
the MXU wants:

    G[a, s, t] = sum_j sel[a, j, s] v[a, j, t]  =  sel_d^T @ v_d

Replaces the reference's scatter-into-dense-g-tensor layout
(`transformer/universal.py:583-620`) with a compiler-friendly
formulation; autodiff-transparent (scatter-add -> gather in reverse).
"""
from __future__ import annotations

import jax.numpy as jnp


def dense_width(features, kind: str = "pair") -> int:
    """Static dense-row width carried by the `{kind}_ncols` array."""
    key = f"{kind}_ncols"
    if key not in features:
        raise KeyError(
            f"features lack '{key}' — re-featurize with this version "
            "(the dense/pallas descriptor backends need the dense-layout "
            "columns emitted by Featurizer.featurize)")
    return features[key].shape[-1]


def densify(values: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
            n_rows: int, width: int) -> jnp.ndarray:
    """Scatter flat entries into [n_rows, width, ...].

    `values` MUST be pre-masked (padding entries zero): padding rows/cols
    all alias slot (0, 0) and are scatter-ADDED, so zeros are a no-op.
    """
    flat = jnp.zeros((n_rows * width,) + values.shape[1:], values.dtype)
    flat = flat.at[rows * width + cols].add(values)
    return flat.reshape((n_rows, width) + values.shape[1:])


def slot_onehot(slot: jnp.ndarray, mask: jnp.ndarray,
                n_slots: int) -> jnp.ndarray:
    """[n, n_slots] masked one-hot of the k-body slot index."""
    eye = jnp.arange(n_slots)
    return (slot[:, None] == eye[None, :]).astype(mask.dtype) \
        * mask[:, None]


def contract_slots(sel_d: jnp.ndarray, v_d: jnp.ndarray) -> jnp.ndarray:
    """G[a, s, t] = sum_j sel_d[a, j, s] v_d[a, j, t] (batched matmul)."""
    return jnp.einsum("ajs,ajt->ast", sel_d, v_d,
                      preferred_element_type=v_d.dtype)
