"""GRAP dense-descriptor layout probe — is the 137x-over-bound
forward the SAME minor-axis padding tax as the geometry gather?

The production dense path contracts `einsum('ajx,ajd->axd', hs, m)`
with filters K=16 and monomials D=20 on the LANE axis (pad to 128:
8x / 6.4x physical traffic — ~17 GB for ~2.4 GB logical at
131k/nnl-128, which is the measured 62 ms at the 665 GB/s anchor).
The transposed orientation puts NNL=128 on the lane axis (no pad) and
K/D on sublanes (16 -> exact, 20 -> 24): einsum('akn,adn->akd').

Variants at 131k atoms / nnl 128, pexp-16 m0-3 single element:
  F1  production model.descriptors (dense backend)
  F2  transposed-layout reimplementation (filters built as K stacked
      [A,N] maps, moment basis as D stacked [A,N] maps — no [.., K]-
      minor array ever exists), same invariants
Parity asserted before timing. Output: one JSON dict on stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/artifacts")

import numpy as np

OUT = {"probe": "grap_layout"}


def main():
    import jax
    import jax.numpy as jnp
    from collections import Counter
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn.grap import (GenericRadialAtomicPotential,
                                         moment_monomials)
    from tensoralloy_tpu.ops.cutoffs import apply_cutoff
    from tensoralloy_tpu.ops.dense import dense_pair_geometry
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
    rl = [1.0, 1.2, 1.4, 1.6, 1.8, 2.0, 2.2, 2.4, 2.6, 2.8, 3.0, 3.2,
          3.4, 3.6, 3.8, 4.0]
    pl = [5.0, 4.75, 4.5, 4.25, 4.0, 3.75, 3.5, 3.25, 3.0, 2.75, 2.5,
          2.25, 2.0, 1.75, 1.5, 1.25]
    grap = GenericRadialAtomicPotential(
        ["Ni"], algorithm="pexp", parameters={"rl": rl, "pl": pl},
        moment_tensors=[0, 1, 2, 3], backend="dense")
    model = AtomicNN(fz, Counter({"Ni": len(s)}), grap,
                     hidden_sizes=[128, 128], minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(0))

    vap = fz.make_vap(s)
    feats = fz.featurize(s, vap, dtype=np.float32, layout="dense",
                         nnl_bucket=lambda m: max(
                             32, 1 << (m - 1).bit_length()))
    d = {k: jnp.asarray(v) for k, v in feats.items()}
    jax.block_until_ready(list(d.values()))
    OUT["n_atoms"] = len(s)
    OUT["nnl"] = int(d["pair_j_d"].shape[1])
    rcut = 6.0

    rl_j = jnp.asarray(rl, jnp.float32)
    pl_j = jnp.asarray(pl, jnp.float32)

    def f_current(feats_d):
        return jnp.sum(model.descriptors(feats_d, params)
                       .astype(jnp.float32))

    def desc_transposed(feats_d):
        """[A, C, N]-oriented pexp m0-3: lane axis = NNL everywhere."""
        rij, unit, _, mask = dense_pair_geometry(feats_d)   # [A,N] + 3x[A,N]
        fc = apply_cutoff(grap.cutoff_function, rij, rcut) * mask
        # filters: K stacked [A, N] maps -> [A, K, N]
        # pexp: exp(-(r/rl)^pl) (ops/generic.power_exp), zipped grid
        hs = jnp.stack([jnp.exp(-((rij / rl_j[k]) ** pl_j[k])) * fc
                        for k in range(len(rl))], axis=1)
        # moment basis: D stacked [A, N] maps -> [A, D, N]
        ux, uy, uz = unit
        comps = (ux, uy, uz)
        cols = [jnp.ones_like(ux), ux, uy, uz]
        prods = {(a,): comps[a] for a in range(3)}
        for mono in moment_monomials(3):
            if len(mono) < 2:
                continue
            prods[mono] = prods[mono[:-1]] * comps[mono[-1]]
            cols.append(prods[mono])
        m = jnp.stack(cols, axis=1)                        # [A, D, N]
        p = jnp.einsum("akn,adn->akd", hs, m,
                       preferred_element_type=m.dtype)
        a = rij.shape[0]
        return grap.invariants_from_p(
            p.reshape(a, len(rl), m.shape[1]), a, 1)

    def f_transposed(feats_d):
        return jnp.sum(desc_transposed(feats_d).astype(jnp.float32))

    # parity (descriptor arrays, not just sums).  First chip run read
    # rel 3.5e-3 at DEFAULT matmul precision — consistent with XLA
    # lowering the lane-n einsum (contraction over the 128-wide lane
    # axis: matmul-shaped) onto the bf16 MXU while the production
    # lane-k einsum (K=16/D=20 minors) stays in f32 vector ops.  Pin
    # the hypothesis: compare at BOTH precisions; only a highest-
    # precision mismatch is a real bug.
    da = jax.jit(lambda f: model.descriptors(f, params))(d)
    db = jax.jit(desc_transposed)(d)
    rel = float(jnp.max(jnp.abs(da - db)) /
                jnp.maximum(jnp.max(jnp.abs(da)), 1e-30))
    OUT["parity_rel_default"] = rel
    del da, db
    with jax.default_matmul_precision("highest"):
        da = jax.jit(lambda f: model.descriptors(f, params))(d)
        db = jax.jit(desc_transposed)(d)
    rel_hi = float(jnp.max(jnp.abs(da - db)) /
                   jnp.maximum(jnp.max(jnp.abs(da)), 1e-30))
    OUT["parity_rel_highest"] = rel_hi
    if rel_hi > 1e-5:
        OUT["fatal"] = f"parity at highest precision {rel_hi}"
        print(json.dumps(OUT, indent=1))
        return
    del da, db

    def timed(fn):
        def run_k(k):
            def f(feats_d):
                def body(carry, _):
                    d2 = dict(feats_d)
                    d2["positions"] = feats_d["positions"] + carry * 1e-12
                    return fn(d2) * 1e-20 + 0.0 * carry, None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
                return acc
            g = jax.jit(f)
            return lambda: float(g(d))
        return _marginal(run_k, lo=1, hi=5)

    def f_transposed_hi(feats_d):
        # the honest flip candidate: serving requires f32-exact
        # descriptors, so if lane-n rides the MXU it must pay the
        # 3-pass f32 precision there.
        with jax.default_matmul_precision("highest"):
            return jnp.sum(desc_transposed(feats_d)
                           .astype(jnp.float32))

    for name, fn in (("F1_current", f_current),
                     ("F2_transposed", f_transposed),
                     ("F2_transposed_f32mxu", f_transposed_hi)):
        t = timed(fn)
        OUT[name + "_s"] = round(t, 4)
        print(json.dumps({name: round(t, 4)}), file=sys.stderr,
              flush=True)

    # the backward matters for full EFS: grad wrt positions via the
    # geometry (autodiff through each orientation)
    for name, fn in (("G1_current", f_current),
                     ("G2_transposed", f_transposed),
                     ("G2_transposed_f32mxu", f_transposed_hi)):
        def make_g(fn):
            def g(feats_d):
                def e(pos):
                    d2 = dict(feats_d)
                    d2["positions"] = pos
                    return fn(d2)
                gp = jax.grad(e)(feats_d["positions"])
                return jnp.vdot(gp, gp)
            return g
        t = timed(make_g(fn))
        OUT[name + "_grad_s"] = round(t, 4)
        print(json.dumps({name + "_grad": round(t, 4)}),
              file=sys.stderr, flush=True)

    OUT["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(OUT, indent=1))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        OUT["fatal"] = repr(e)[:500]
        print(json.dumps(OUT, indent=1))
        raise
