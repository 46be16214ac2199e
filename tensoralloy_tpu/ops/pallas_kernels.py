"""Pallas TPU kernels for the hot descriptor reductions.

The default compute path uses flat pair arrays + XLA `segment_sum`
(fast, autodiff-transparent). These kernels cover the regime where that
path is memory-bound: the GRAP/SF pair-feature outer products
materialize a ``[nij, K(, D)]`` intermediate in HBM (e.g. 16M pairs x
8 filters x 20 moments x 4 B = 10 GB). Here pairs are laid out densely
per atom (``[n_atoms, nnl]``) and each grid step computes one atom
tile's features entirely in VMEM: distances -> filter bank -> cutoff ->
slot one-hot contraction, writing only the final ``[tile, S*T]`` block.

Kernels:
  * ``fused_g2_descriptor``  — Behler G2 radial features
  * ``fused_grap_descriptor``— GRAP filter x moment-tensor invariants

`dense_from_flat` converts the featurizer's flat pair arrays into the
dense layout on the host.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dense_from_flat(pair_i: np.ndarray, values: dict, n_rows: int,
                    nnl: int = 0) -> Tuple[dict, int]:
    """Reorder flat pair arrays into [n_rows, nnl] per-atom rows.

    `values` maps names to [P(, ...)] arrays; rows are indexed by the
    (VAP) center id in `pair_i`; column = per-atom neighbor counter.
    Padding entries keep value 0 in the accompanying 'mask'.
    """
    pair_i = np.asarray(pair_i)
    counts = np.bincount(pair_i, minlength=n_rows)
    if nnl <= 0:
        nnl = int(counts.max()) if len(counts) else 1
    # column index of each pair within its row
    order = np.argsort(pair_i, kind="stable")
    cols = np.zeros(len(pair_i), dtype=np.int64)
    sorted_i = pair_i[order]
    start = np.concatenate([[0], np.cumsum(counts)])[:-1]
    cols[order] = np.arange(len(pair_i)) - start[sorted_i]
    out = {}
    for name, arr in values.items():
        arr = np.asarray(arr)
        dense = np.zeros((n_rows, nnl) + arr.shape[1:], arr.dtype)
        dense[pair_i, cols] = arr
        out[name] = dense
    return out, nnl


# ----------------------------------------------------------------------
def _g2_kernel(rij_ref, islot_ref, fcmask_ref, out_ref, *, eta, omega,
               rc2, n_slots):
    """One atom tile: [blk, nnl] pair data -> [blk, n_slots*T]."""
    rij = rij_ref[:]                       # [blk, nnl]
    fc = fcmask_ref[:]
    islot = islot_ref[:]
    acc = []
    for s in range(n_slots):
        sel = jnp.where(islot == s, fc, 0.0)          # [blk, nnl]
        for k in range(len(eta)):
            z = (rij - omega[k]) ** 2 * (eta[k] / rc2)
            v = jnp.exp(-z) * sel
            acc.append(jnp.sum(v, axis=1))             # [blk]
    out_ref[:] = jnp.stack(acc, axis=1)


def fused_g2_descriptor(rij_dense, islot_dense, fcmask_dense,
                        eta, omega, rc: float, n_slots: int,
                        block: int = 256, interpret: bool = False):
    """Behler G2 on the dense layout.

    rij_dense / fcmask_dense: [n_rows, nnl] float; islot_dense int32.
    Returns [n_rows, n_slots * len(eta)] with column order
    (slot major, tau minor) matching `SymmetryFunction.radial`.
    """
    n_rows, nnl = rij_dense.shape
    t = len(eta)
    pad_rows = (-n_rows) % block
    if pad_rows:
        zpad = lambda a: jnp.pad(a, ((0, pad_rows), (0, 0)))
        rij_dense = zpad(rij_dense)
        islot_dense = zpad(islot_dense)
        fcmask_dense = zpad(fcmask_dense)
    padded = n_rows + pad_rows
    kernel = functools.partial(
        _g2_kernel, eta=tuple(float(x) for x in eta),
        omega=tuple(float(x) for x in omega), rc2=float(rc) ** 2,
        n_slots=n_slots)
    out = pl.pallas_call(
        kernel,
        grid=(padded // block,),
        in_specs=[
            pl.BlockSpec((block, nnl), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nnl), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nnl), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, n_slots * t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, n_slots * t),
                                       rij_dense.dtype),
        interpret=interpret,
    )(rij_dense, islot_dense, fcmask_dense)
    return out[:n_rows]


# ----------------------------------------------------------------------
def _grap_kernel(rij_ref, ux_ref, uy_ref, uz_ref, islot_ref, fcmask_ref,
                 out_ref, *, rl, plw, rc2, n_slots, moment_cols, t_dm):
    """GRAP pexp filters x compressed moment basis, one atom tile.

    out[a, s*K*(M+1) + k*(M+1) + m] with the same (slot, k, m) order as
    `GenericRadialAtomicPotential.compute`."""
    rij = rij_ref[:]
    fc = fcmask_ref[:]
    u = (ux_ref[:], uy_ref[:], uz_ref[:])
    k_filters = len(rl)
    n_moments = t_dm.shape[1]
    eps = 1e-16
    cols = []
    for s in range(n_slots):
        sel = jnp.where(islot_ref[:] == s, fc, 0.0)
        for k in range(k_filters):
            h = jnp.exp(-((rij / rl[k]) ** plw[k])) * sel  # [blk, nnl]
            # P_d = sum_j h * mono_d
            p_list = []
            for mono in moment_cols:
                if not mono:
                    p_list.append(jnp.sum(h, axis=1))
                else:
                    m = h
                    for ax in mono:
                        m = m * u[ax]
                    p_list.append(jnp.sum(m, axis=1))
            s2_list = [p * p for p in p_list]
            # contract with the static multiplicity table in python so
            # no array constant is captured by the kernel
            q_cols = []
            for mcol in range(n_moments):
                acc2 = None
                for d in range(len(p_list)):
                    w = float(t_dm[d, mcol])
                    if w == 0.0:
                        continue
                    term = s2_list[d] if w == 1.0 else s2_list[d] * w
                    acc2 = term if acc2 is None else acc2 + term
                q_cols.append(acc2 if acc2 is not None
                              else jnp.zeros_like(p_list[0]))
            g0 = jnp.sign(p_list[0]) * jnp.sqrt(q_cols[0] + eps)
            cols.append(g0[:, None])
            for qc in q_cols[1:]:
                cols.append(qc[:, None])
    out_ref[:] = jnp.concatenate(cols, axis=1)


def fused_grap_descriptor(rij_dense, unit_dense, islot_dense,
                          fcmask_dense, rl, plw, rc: float,
                          n_slots: int, max_moment: int,
                          symmetric: bool = False, block: int = 256,
                          interpret: bool = False):
    """GRAP (pexp filter bank) invariants on the dense layout.

    unit_dense: [n_rows, nnl, 3] unit vectors (zero at padding).
    Returns [n_rows, n_slots * K * (max_moment+1)].
    """
    from ..nn.grap import multiplicity_tensor, _AB, _ABC
    n_rows, nnl = rij_dense.shape
    moment_cols = [()]
    if max_moment >= 1:
        moment_cols += [(0,), (1,), (2,)]
    if max_moment >= 2:
        moment_cols += [tuple(ab) for ab in _AB]
    if max_moment >= 3:
        moment_cols += [tuple(abc) for abc in _ABC]
    t_dm = np.asarray(multiplicity_tensor(max_moment, symmetric),
                      dtype=np.dtype(rij_dense.dtype))
    k_filters = len(rl)
    out_cols = n_slots * k_filters * (max_moment + 1)

    pad_rows = (-n_rows) % block
    def zpad2(a):
        return jnp.pad(a, ((0, pad_rows), (0, 0))) if pad_rows else a
    rij_dense = zpad2(rij_dense)
    islot_dense = zpad2(islot_dense)
    fcmask_dense = zpad2(fcmask_dense)
    ux = zpad2(unit_dense[..., 0])
    uy = zpad2(unit_dense[..., 1])
    uz = zpad2(unit_dense[..., 2])
    padded = n_rows + pad_rows

    kernel = functools.partial(
        _grap_kernel, rl=tuple(float(x) for x in rl),
        plw=tuple(float(x) for x in plw), rc2=float(rc) ** 2,
        n_slots=n_slots, moment_cols=tuple(moment_cols), t_dm=t_dm)
    spec = lambda: pl.BlockSpec((block, nnl), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(padded // block,),
        in_specs=[spec(), spec(), spec(), spec(), spec(), spec()],
        out_specs=pl.BlockSpec((block, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, out_cols),
                                       rij_dense.dtype),
        interpret=interpret,
    )(rij_dense, ux, uy, uz, islot_dense, fcmask_dense)
    return out[:n_rows]
