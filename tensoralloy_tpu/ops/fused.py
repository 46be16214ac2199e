"""Fused Pallas TPU descriptor kernels, integrated + trainable.

These kernels consume the dense per-atom layout (`ops/dense.py`) and
compute each atom tile's descriptors entirely in VMEM: distances ->
filter bank -> cutoff -> slot selection -> moment products -> reduction,
writing only the final `[tile, out_cols]` block. Nothing proportional
to (pairs x filters x monomials) ever touches HBM — the regime where
the XLA paths are HBM-bandwidth-bound (SNAP-scale padding, BASELINE.md).

Every kernel carries a **custom VJP** whose backward pass is the dense
XLA formulation (rematerialized from the saved dense inputs), so the
fused forward is usable inside `jax.grad` — forces, stress, and
training all work through it.

Selected via `backend="pallas"` on `SymmetryFunction` /
`GenericRadialAtomicPotential` (TOML: `[nn.atomic.sf] backend` /
`[nn.atomic.grap] backend`). Off-TPU the kernels run in interpreter
mode (tests); on TPU they compile with Mosaic.

Reference math: G2/G4 `tensoralloy/nn/atomic/sf.py:79-215`, GRAP
moment contraction `grap.py:596-680`.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cutoffs import apply_cutoff
from .dense import dense_pair_geometry, dense_triple_geometry
from .generic import density_exp, morse, power_exp

_BLOCK = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(arrs, block):
    n = arrs[0].shape[0]
    pad = (-n) % block
    if pad == 0:
        return arrs, n
    return [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs], n


# ----------------------------------------------------------------------
# Dense input assembly (differentiable, XLA)
# ----------------------------------------------------------------------

def _dense_pairs(features, with_unit: bool = True):
    """-> (rij_d, [ux_d, uy_d, uz_d,] islotf_d, mask_d), each [A, N].

    Host-built dense layout + device gathers (no scatter; see
    `ops/dense.py`). The slot index is carried as float so the
    custom-VJP signature stays all-float (zero cotangents)."""
    rij, unit, islotf, mask = dense_pair_geometry(features)
    out = [rij]
    if with_unit:
        out += [unit[0], unit[1], unit[2]]   # (ux, uy, uz) tuple
    return out + [islotf, mask]


def _dense_triples(features):
    """-> (rij_d, rik_d, rjk_d, aslotf_d, mask_d), each [A, Nt]."""
    return list(dense_triple_geometry(features))


def _custom_vjp_op(pallas_impl, ref_impl, n_diff: int):
    """Wrap (pallas forward, XLA reference) into a differentiable op.

    The first `n_diff` arguments get real gradients (via jax.vjp of the
    reference implementation, rematerialized from saved inputs); the
    rest receive zeros.
    """

    @jax.custom_vjp
    def op(*args):
        return pallas_impl(*args)

    def fwd(*args):
        return pallas_impl(*args), args

    def bwd(res, gbar):
        def diff_part(*d_args):
            return ref_impl(*d_args, *res[n_diff:])
        _, vjp = jax.vjp(diff_part, *res[:n_diff])
        return vjp(gbar) + tuple(jnp.zeros_like(r) for r in res[n_diff:])

    op.defvjp(fwd, bwd)
    return op


# ----------------------------------------------------------------------
# Filter banks (pure jnp — usable inside kernels and reference impls)
# ----------------------------------------------------------------------

def _grap_filter(desc, k: int, r, rcut: float):
    row = {key: float(desc._grid[k, i])
           for i, key in enumerate(desc._grid_keys)}
    algo = desc.algorithm
    if algo == "sf":
        # reference grap-sf scales eta by rcut^2 (`grap.py` sf algo)
        return jnp.exp(-row["eta"] * jnp.square(r - row["omega"]) /
                       (rcut * rcut))
    if algo == "density":
        return density_exp(r, row["A"], row["beta"], row["re"])
    if algo == "morse":
        return morse(r, row["D"], row["gamma"], row["r0"])
    if algo == "pexp":
        return power_exp(r, row["rl"], row["pl"])
    raise ValueError(f"pallas backend does not support algorithm {algo!r}")


def _grap_filter_all(desc, r, rcut):
    """[..., K] filter values."""
    return jnp.stack([_grap_filter(desc, k, r, rcut)
                      for k in range(desc.n_filters)], axis=-1)


# NOTE: the filter-bank / G4 formulas in the kernel bodies below
# intentionally duplicate `GenericRadialAtomicPotential._filter_values`
# and `SymmetryFunction.angular_values`: a pallas kernel works on
# [block, N] tiles and cannot call the flat-[nij] class methods. Any
# change to the canonical math MUST be mirrored here — the
# backend-parity tests (tests/test_backends.py) are the tripwire.
def _moment_columns(max_moment: int):
    """Unique monomial tuples — shared with the XLA paths
    (`nn.grap.moment_monomials`): every backend now runs the same
    compressed basis with multinomial multiplicities."""
    from ..nn.grap import moment_monomials
    return moment_monomials(max_moment)


def _kernel_multiplicity(max_moment: int, symmetric: bool) -> np.ndarray:
    from ..nn.grap import multiplicity_tensor
    return np.asarray(multiplicity_tensor(max_moment, symmetric))


# ----------------------------------------------------------------------
# GRAP: fused filter x moment invariants
# ----------------------------------------------------------------------

def _grap_ref_dense(desc, rcut, n_slots, rij_d, ux, uy, uz, islotf,
                    mask_d):
    """Dense XLA formulation on [A, N] arrays (backward pass)."""
    a, n = rij_d.shape
    r = jnp.where(mask_d > 0, rij_d, 1.0)
    fc = apply_cutoff(desc.cutoff_function, r, rcut) * mask_d
    h = _grap_filter_all(desc, r, rcut) * fc[..., None]    # [A, N, K]
    from ..nn.grap import moment_basis_c
    m = moment_basis_c((ux, uy, uz), desc.max_moment)      # [A, N, D]
    k = desc.n_filters
    eye = jnp.arange(n_slots, dtype=islotf.dtype)
    sel = (islotf[..., None] == eye) * mask_d[..., None]   # [A, N, S]
    hs = (sel[..., None] * h[..., None, :]).reshape(a, n, n_slots * k)
    p = jnp.einsum("anx,and->axd", hs, m,
                   preferred_element_type=m.dtype)
    p = p.reshape(a * n_slots, k, m.shape[-1])
    return desc.invariants_from_p(p, a, n_slots)


def _grap_kernel(rij_ref, ux_ref, uy_ref, uz_ref, islot_ref, mask_ref,
                 w_ref, out_ref, m_ref, p_ref, *, desc, rcut, n_slots,
                 moment_cols):
    # VMEM discipline (learned on a real chip, twice): the original
    # per-(slot, filter, monomial) unroll produced ~900 bodies whose
    # live [blk, N] temporaries overflowed the Mosaic scoped-VMEM
    # stack; a flat python loop over the <=56 monomials still OOMed at
    # 160 MB because Mosaic does NOT reuse buffers across unrolled
    # iterations — every `hsel * m` [blk, N, K] temporary stayed
    # resident.  So the expensive 3D stream runs in ONE fori_loop
    # (a real loop = one reused buffer): the cheap 2D monomial
    # products are written once into the `m_ref` scratch table
    # ([blk, D, N], monomials on the SUBLANE axis so the loop can
    # dynamic-slice them), and the per-monomial [blk, K] projections
    # accumulate into `p_ref` ([blk, D, K]).
    mask = mask_ref[:]
    r = jnp.where(mask > 0, rij_ref[:], 1.0)
    fc = apply_cutoff(desc.cutoff_function, r, rcut)
    u = (ux_ref[:], uy_ref[:], uz_ref[:])
    eps = 1e-16
    k_f = desc.n_filters
    n_mono = len(moment_cols)
    h_all = _grap_filter_all(desc, r, rcut)                # [blk, N, K]
    for d, mono in enumerate(moment_cols):
        m = None
        for ax in mono:
            m = u[ax] if m is None else m * u[ax]
        if m is None:
            m = jnp.ones_like(r)
        m_ref[:, d, :] = m
    for s in range(n_slots):
        sel = jnp.where(islot_ref[:] == float(s), mask, 0.0) * fc
        hsel = h_all * sel[..., None]                      # [blk, N, K]

        def body(j, carry):
            m_j = m_ref[:, pl.ds(j, 1), :][:, 0, :]        # [blk, N]
            p_j = jnp.sum(hsel * m_j[..., None], axis=1)   # [blk, K]
            p_ref[:, pl.ds(j, 1), :] = p_j[:, None, :]
            return carry

        jax.lax.fori_loop(0, n_mono, body, 0)
        p0 = p_ref[:, 0, :]                                # [blk, K]
        s2 = jnp.square(p_ref[:, :, :])                    # [blk, D, K]
        for j, mcol in enumerate(desc.moment_tensors):  # honor gaps
            w = w_ref[:, j]                                # [D]
            acc = jnp.sum(s2 * w[None, :, None], axis=1)   # [blk, K]
            if mcol == 0:
                acc = jnp.sign(p0) * jnp.sqrt(acc + eps)
            # each [blk, K] accumulator lands in its own contiguous
            # column slab, (slot, moment, filter)-ordered: Mosaic's
            # layout inference rejects both the [blk, K, M] ->
            # [blk, K*M] shape cast and minor-axis concatenation, so
            # the (slot, filter, moment) order the dense path emits is
            # restored by a static column gather OUTSIDE the kernel
            # (see _grap_pallas).
            start = (s * len(desc.moment_tensors) + j) * k_f
            out_ref[:, start:start + k_f] = acc


def _grap_pallas(desc, rcut, n_slots, rij_d, ux, uy, uz, islotf, mask_d):
    a = rij_d.shape[0]
    n = rij_d.shape[1]
    moment_cols = tuple(_moment_columns(desc.max_moment))
    t_dm = _kernel_multiplicity(desc.max_moment, desc.symmetric)
    out_cols = n_slots * desc.n_filters * len(desc.moment_tensors)
    n_mono = len(moment_cols)
    # True VMEM footprint per block row, with MINOR-AXIS LANE PADDING
    # (a [*, K] minor pads K -> 128; ignoring it underestimated 8x and
    # OOMed the chip at 160 MB / 128 MB): h_all + hsel + the fori-loop
    # term ([blk, N, Kpad] x3), the monomial table ([blk, D, Npad]),
    # the projection scratch + its square + the per-moment weighted
    # temporaries ([blk, D, Kpad] x ~(2 + n_moments)).
    lane = lambda x: -(-x // 128) * 128
    kpad, npad = lane(desc.n_filters), lane(n)
    # the slot loop is python-unrolled, so its hsel/s2/moment
    # temporaries do NOT share buffers across slots — scale them
    per_row = 4 * (n * kpad + n_mono * npad + n_slots * (
        2 * n * kpad +
        (2 + len(desc.moment_tensors)) * n_mono * kpad))
    # kernel temporaries live on Mosaic's scoped-VMEM stack; ask for
    # the budget we actually need (the 16 MB default rejected the
    # m0-5 x 16-filter config at production padding) and size the row
    # block to keep ~2x headroom under it within total VMEM
    vmem_limit = 100 * 1024 * 1024
    block = _BLOCK
    while block > 8 and block * per_row > vmem_limit // 2:
        block //= 2
    (rij_d, ux, uy, uz, islotf, mask_d), nrows = _pad_rows(
        [rij_d, ux, uy, uz, islotf, mask_d], block)
    padded = rij_d.shape[0]
    # the multiplicity weights ride as a small broadcast INPUT (pallas
    # rejects array constants captured by the kernel closure)
    w_dm = jnp.asarray(t_dm[:, list(desc.moment_tensors)], rij_d.dtype)
    kernel = functools.partial(
        _grap_kernel, desc=desc, rcut=float(rcut), n_slots=n_slots,
        moment_cols=moment_cols)
    spec = pl.BlockSpec((block, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(padded // block,),
        in_specs=[spec] * 6 + [
            pl.BlockSpec(w_dm.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, out_cols), rij_d.dtype),
        scratch_shapes=[
            pltpu.VMEM((block, n_mono, n), rij_d.dtype),
            pltpu.VMEM((block, n_mono, desc.n_filters), rij_d.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=_interpret(),
    )(rij_d, ux, uy, uz, islotf, mask_d, w_dm)
    # kernel emits (slot, moment, filter) slabs; restore the dense
    # path's (slot, filter, moment) column order
    k_f, m_cnt = desc.n_filters, len(desc.moment_tensors)
    src = np.empty(out_cols, np.int32)
    for s in range(n_slots):
        for k in range(k_f):
            for m in range(m_cnt):
                src[(s * k_f + k) * m_cnt + m] = (s * m_cnt + m) * k_f + k
    return out[:nrows, src]


def fused_grap(desc, features, rcut: float, n_slots: int) -> jnp.ndarray:
    """GRAP invariants via the fused kernel; differentiable."""
    rij_d, ux, uy, uz, islotf, mask_d = _dense_pairs(features)
    op = _custom_vjp_op(
        functools.partial(_grap_pallas, desc, rcut, n_slots),
        functools.partial(_grap_ref_dense, desc, rcut, n_slots),
        n_diff=4)
    return op(rij_d, ux, uy, uz, islotf, mask_d)


# ----------------------------------------------------------------------
# Behler G2 (radial symmetry functions)
# ----------------------------------------------------------------------

def _g2_ref_dense(sf, rcut, n_slots, rij_d, islotf, mask_d):
    a, n = rij_d.shape
    r = jnp.where(mask_d > 0, rij_d, 1.0)
    fc = apply_cutoff(sf.cutoff_function, r, rcut) * mask_d
    dtype = rij_d.dtype
    eta = jnp.asarray(sf.radial_grid[:, 0], dtype)
    omega = jnp.asarray(sf.radial_grid[:, 1], dtype)
    z = jnp.square(r[..., None] - omega) / (rcut * rcut)
    v = jnp.exp(-eta * z) * fc[..., None]                  # [A, N, T2]
    eye = jnp.arange(n_slots, dtype=islotf.dtype)
    sel = (islotf[..., None] == eye) * mask_d[..., None]
    g = jnp.einsum("ans,ant->ast", sel, v,
                   preferred_element_type=dtype)
    return g.reshape(a, n_slots * sf.n_radial_params)


def _g2_kernel(rij_ref, islot_ref, mask_ref, out_ref, *, grid_rows,
               rc, cutoff_name, n_slots):
    mask = mask_ref[:]
    r = jnp.where(mask > 0, rij_ref[:], 1.0)
    fc = apply_cutoff(cutoff_name, r, rc) * mask
    # per-column slab stores: Mosaic's layout inference rejects
    # minor-axis concatenation of [blk, 1] vectors (same family as the
    # GRAP kernel's 3D->2D shape cast), so each reduced column is
    # written straight into the output ref
    c = 0
    for s in range(n_slots):
        sel = jnp.where(islot_ref[:] == float(s), fc, 0.0)
        for eta, omega in grid_rows:
            v = jnp.exp(-eta * jnp.square(r - omega) / (rc * rc)) * sel
            out_ref[:, c:c + 1] = jnp.sum(v, axis=1)[:, None]
            c += 1


def _g2_pallas(sf, rcut, n_slots, rij_d, islotf, mask_d):
    n = rij_d.shape[1]
    out_cols = n_slots * sf.n_radial_params
    (rij_d, islotf, mask_d), nrows = _pad_rows(
        [rij_d, islotf, mask_d], _BLOCK)
    padded = rij_d.shape[0]
    kernel = functools.partial(
        _g2_kernel,
        grid_rows=tuple((float(e), float(o)) for e, o in sf.radial_grid),
        rc=float(rcut), cutoff_name=sf.cutoff_function, n_slots=n_slots)
    spec = pl.BlockSpec((_BLOCK, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(padded // _BLOCK,),
        in_specs=[spec] * 3,
        out_specs=pl.BlockSpec((_BLOCK, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, out_cols), rij_d.dtype),
        interpret=_interpret(),
    )(rij_d, islotf, mask_d)
    return out[:nrows]


def fused_g2(sf, features, rcut: float, n_slots: int) -> jnp.ndarray:
    rij_d, islotf, mask_d = _dense_pairs(features, with_unit=False)
    op = _custom_vjp_op(
        functools.partial(_g2_pallas, sf, rcut, n_slots),
        functools.partial(_g2_ref_dense, sf, rcut, n_slots),
        n_diff=1)
    return op(rij_d, islotf, mask_d)


# ----------------------------------------------------------------------
# Behler G4 (angular symmetry functions) — THE nijk-scale kernel
# ----------------------------------------------------------------------

def _g4_values(grid_rows, cutoff_name, acut, rij, rik, rjk):
    """Per-triple G4 terms, one [..] array per parameter row."""
    rij2, rik2, rjk2 = rij * rij, rik * rik, rjk * rjk
    z = (rij2 + rik2 + rjk2) / (acut * acut)
    cos_theta = (rij2 + rik2 - rjk2) / (2.0 * rij * rik)
    fc3 = (apply_cutoff(cutoff_name, rij, acut) *
           apply_cutoff(cutoff_name, rik, acut) *
           apply_cutoff(cutoff_name, rjk, acut))
    out = []
    for beta, gamma, zeta in grid_rows:
        base = jnp.maximum(1.0 + gamma * cos_theta, 0.0)
        out.append(2.0 ** (1.0 - zeta) * base ** zeta *
                   jnp.exp(-beta * z) * fc3)
    return out


def _g4_ref_dense(sf, acut, n_slots, rij_d, rik_d, rjk_d, aslotf, mask_d):
    a, n = rij_d.shape
    safe = lambda x: jnp.where(mask_d > 0, x, 1.0)
    rows = tuple((float(b), float(g), float(z))
                 for b, g, z in sf.angular_grid)
    vals = _g4_values(rows, sf.cutoff_function, acut,
                      safe(rij_d), safe(rik_d), safe(rjk_d))
    v = jnp.stack(vals, axis=-1) * mask_d[..., None]       # [A, N, T4]
    eye = jnp.arange(n_slots, dtype=aslotf.dtype)
    sel = (aslotf[..., None] == eye) * mask_d[..., None]
    g = jnp.einsum("ans,ant->ast", sel, v,
                   preferred_element_type=v.dtype)
    return g.reshape(a, n_slots * sf.n_angular_params)


def _g4_kernel(rij_ref, rik_ref, rjk_ref, aslot_ref, mask_ref, out_ref,
               *, grid_rows, acut, cutoff_name, n_slots):
    mask = mask_ref[:]
    safe = lambda ref: jnp.where(mask > 0, ref[:], 1.0)
    vals = _g4_values(grid_rows, cutoff_name, acut,
                      safe(rij_ref), safe(rik_ref), safe(rjk_ref))
    # per-column slab stores (see _g2_kernel): no minor-axis concat
    c = 0
    for s in range(n_slots):
        sel = jnp.where(aslot_ref[:] == float(s), mask, 0.0)
        for v in vals:
            out_ref[:, c:c + 1] = jnp.sum(v * sel, axis=1)[:, None]
            c += 1


def _g4_pallas(sf, acut, n_slots, rij_d, rik_d, rjk_d, aslotf, mask_d):
    n = rij_d.shape[1]
    out_cols = n_slots * sf.n_angular_params
    # triple rows are wide (ntl can reach ~10^4): shrink the row block
    # so VMEM holds 5 inputs + temporaries
    block = _BLOCK
    while block > 8 and block * n * 4 * 8 > 8 * 1024 * 1024:
        block //= 2
    (rij_d, rik_d, rjk_d, aslotf, mask_d), nrows = _pad_rows(
        [rij_d, rik_d, rjk_d, aslotf, mask_d], block)
    padded = rij_d.shape[0]
    kernel = functools.partial(
        _g4_kernel,
        grid_rows=tuple((float(b), float(g), float(z))
                        for b, g, z in sf.angular_grid),
        acut=float(acut), cutoff_name=sf.cutoff_function, n_slots=n_slots)
    spec = pl.BlockSpec((block, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(padded // block,),
        in_specs=[spec] * 5,
        out_specs=pl.BlockSpec((block, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, out_cols), rij_d.dtype),
        interpret=_interpret(),
    )(rij_d, rik_d, rjk_d, aslotf, mask_d)
    return out[:nrows]


def fused_g4(sf, features, acut: float, n_slots: int) -> jnp.ndarray:
    rij_d, rik_d, rjk_d, aslotf, mask_d = _dense_triples(features)
    op = _custom_vjp_op(
        functools.partial(_g4_pallas, sf, acut, n_slots),
        functools.partial(_g4_ref_dense, sf, acut, n_slots),
        n_diff=3)
    return op(rij_d, rik_d, rjk_d, aslotf, mask_d)
