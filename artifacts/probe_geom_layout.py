"""Geometry-gather layout probe — can [A, 3, NNL] beat [A, NNL, 3]?

probe_efs_gap_r5 attributed 51% of the production 131k EAM fast pass
(0.0738 s) to the geometry stage (0.0377 s), which is almost exactly
the round-4 probe3 cost of the `pos[jd]` row gather alone: its
[A, NNL, 3] output lane-pads the 3-wide minor axis to 128 (~42x
physical bytes, ~8.5 GB for 200 MB logical -> 12.8 ms floor at the
665 GB/s copy anchor). The same tensor in [A, 3, NNL] order pays only
the sublane pad 3->8 (2.7x, ~540 MB -> ~0.9 ms floor).

Variants (each consumes the three components in sum(r*mask), marginal
k-scan timing like every probe in this series):
  A  production `gather_vec` (row gather [A,NNL,3], slice components)
  B  jnp.take(...).transpose(0,2,1) — does XLA fuse the transpose
     into the gather and emit [A,3,NNL] directly?
  C  lax.gather with offset_dims=(1,) — the [A,3,NNL] layout asked
     for EXPLICITLY in the gather's dimension numbers
  D  C feeding the full production geometry (norm + unit vectors),
     the drop-in replacement candidate

Parity of B/C vs A is asserted before timing. Output: one JSON dict.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/artifacts")

import numpy as np

OUT = {"probe": "geom_layout"}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from collections import Counter
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.ops.dense import (gather_vec,
                                           safe_norm_components,
                                           shift_dot_cell)
    from bench_inference import _marginal

    OUT["backend"] = jax.default_backend()
    OUT["loadavg"] = os.getloadavg()[0]
    n = int(os.environ.get("PROBE_N", "32"))

    a0 = 3.52
    base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]])
    rng = np.random.RandomState(0)
    frac = np.concatenate([base + [i, j, k] for i in range(n)
                           for j in range(n) for k in range(n)])
    pos_np = frac * a0 + rng.normal(0, 0.05, (len(frac), 3))
    s = Structure.from_symbols(["Ni"] * len(frac), pos_np,
                               np.eye(3) * a0 * n, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=6.0)
    vap = fz.make_vap(s)
    feats = fz.featurize(s, vap, dtype=np.float32, layout="dense",
                         nnl_bucket=lambda m: max(
                             32, 1 << (m - 1).bit_length()))
    d = {k: jnp.asarray(v) for k, v in feats.items()}
    jax.block_until_ready(list(d.values()))
    A, NNL = d["pair_j_d"].shape
    OUT["n_atoms"] = len(s)
    OUT["nnl"] = int(NNL)

    def gather_vec_t(pos, jd, simg, cell):
        """[A, 3, NNL]-layout equivalent of gather_vec (variant C)."""
        dtype = pos.dtype
        sv = shift_dot_cell(simg, cell, dtype)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        g = lax.gather(pos, jd[..., None], dn, slice_sizes=(1, 3))
        return tuple(g[:, a, :] + sv[a] - pos[:, a][:, None]
                     for a in range(3))

    def body_A(pos):
        v = gather_vec(pos, d["pair_j_d"], d["pair_simg_d"], d["cell"])
        return sum(jnp.vdot(vc, vc) for vc in v)

    def body_B(pos):
        sv = shift_dot_cell(d["pair_simg_d"], d["cell"], pos.dtype)
        g = jnp.take(pos, d["pair_j_d"], axis=0).transpose(0, 2, 1)
        v = tuple(g[:, a, :] + sv[a] - pos[:, a][:, None]
                  for a in range(3))
        return sum(jnp.vdot(vc, vc) for vc in v)

    def body_C(pos):
        v = gather_vec_t(pos, d["pair_j_d"], d["pair_simg_d"], d["cell"])
        return sum(jnp.vdot(vc, vc) for vc in v)

    def body_D(pos):
        v = gather_vec_t(pos, d["pair_j_d"], d["pair_simg_d"], d["cell"])
        r = safe_norm_components(v)
        mask = d["pair_mask_d"]
        r = jnp.where(mask > 0, r, 1.0)
        u = tuple(vc / r for vc in v)
        return (jnp.sum(r * mask)
                + sum(jnp.vdot(uc, uc) for uc in u))

    def body_D_base(pos):
        v = gather_vec(pos, d["pair_j_d"], d["pair_simg_d"], d["cell"])
        r = safe_norm_components(v)
        mask = d["pair_mask_d"]
        r = jnp.where(mask > 0, r, 1.0)
        u = tuple(vc / r for vc in v)
        return (jnp.sum(r * mask)
                + sum(jnp.vdot(uc, uc) for uc in u))

    # parity before timing
    pos = d["positions"]
    ref = float(jax.jit(body_A)(pos))
    for name, fn in (("B", body_B), ("C", body_C)):
        got = float(jax.jit(fn)(pos))
        rel = abs(got - ref) / max(abs(ref), 1e-30)
        OUT[f"parity_{name}_rel"] = rel
        if rel > 1e-5:
            OUT["fatal"] = f"variant {name} parity {rel}"
            print(json.dumps(OUT, indent=1))
            return

    def timed(fn):
        def run_k(k):
            def f(pos):
                def body(carry, _):
                    return fn(pos + carry * 1e-12) * 1e-20 + 0.0 * carry, None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
                return acc
            g = jax.jit(f)
            return lambda: float(g(pos))
        return _marginal(run_k, lo=1, hi=9)

    for name, fn in (("A_rowgather", body_A), ("B_transpose", body_B),
                     ("C_gather_t", body_C), ("D_geom_t", body_D),
                     ("D_geom_base", body_D_base)):
        t = timed(fn)
        OUT[name + "_s"] = round(t, 4)
        print(json.dumps({name: round(t, 4)}), file=sys.stderr,
              flush=True)

    OUT["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(OUT, indent=1))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        OUT["fatal"] = repr(e)[:500]
        print(json.dumps(OUT, indent=1))
        raise
