#!/usr/bin/env python
"""Stage-marginal timing of the EAM fast EFS pass at the 131k bench
shape — attributes the measured 0.603 s (bench_inference_r4: 60x the
~10 ms bandwidth bound) to its components.

Stages are cumulative prefixes of `nn/eam/fast_efs._make_pass` (zjw04
Ni alloy, the exact bench_inference model); each is timed with the
scan-carry marginal discipline (the carry perturbs positions and the
output consumes every stage product, so XLA can neither hoist nor
DCE).  Micro rows time single primitives at the same [n_vap, nnl]
shape.  Run ON CHIP; CPU numbers are meaningless here.

Usage: probe_fast_efs.py [n]   (default n=32 -> 131072 atoms)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench_inference import _marginal


def main(n=32):
    from collections import Counter
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.eam import EamAlloyNN
    from tensoralloy_tpu.nn.eam.fast_efs import (make_fast_efs_fn,
                                                 _val_and_deriv)
    from tensoralloy_tpu.ops.dense import gather_vec, \
        safe_norm_components

    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    rng = np.random.RandomState(0)
    frac = np.concatenate([base + [i, j, k] for i in range(n)
                           for j in range(n) for k in range(n)])
    pos = frac * a0 + rng.normal(0, 0.05, (len(frac), 3))
    s = Structure.from_symbols(["Ni"] * len(frac), pos,
                               np.eye(3) * a0 * n, pbc=[True] * 3)
    fz = Featurizer(["Ni"], rcut=6.0)
    model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                       custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    rcut = fz.rcut

    t0 = time.perf_counter()
    vap = fz.make_vap(s)
    feats = fz.featurize(s, vap,
                         pair_bucket=lambda m: 1 << (m - 1).bit_length(),
                         nnl_bucket=lambda m: max(
                             32, 1 << (m - 1).bit_length()),
                         dtype=np.float32, layout="dense")
    print(json.dumps({"featurize_s": round(time.perf_counter() - t0, 2),
                      "n_vap": int(feats["positions"].shape[0]),
                      "nnl": int(feats["pair_j_d"].shape[1])}),
          flush=True)
    dfeats = {k: jax.device_put(jnp.asarray(v)) for k, v in feats.items()}
    jax.block_until_ready(list(dfeats.values()))

    def stage_fn(stage):
        """Cumulative prefix of the fast pass; returns a scalar that
        consumes every product of the prefix."""
        def run(params, features):
            pos = features["positions"]
            cell = features["cell"]
            jd = features["pair_j_d"]
            mask = features["pair_mask_d"]
            am = features["atom_masks"]
            v = gather_vec(pos, jd, features["pair_simg_d"], cell)
            r = safe_norm_components(v)
            r = jnp.where(mask > 0, r, 1.0)
            mask2 = mask * (r < rcut).astype(mask.dtype)
            u = tuple(vc / r for vc in v)
            acc = sum(jnp.vdot(uc, uc) for uc in u) + jnp.sum(r * mask2)
            if stage == "geom":
                return acc
            rho_p, der_rho = _val_and_deriv(
                model._fn(params, "Ni", "rho", "rho"), r)
            phi_p, dphi = _val_and_deriv(
                model._fn(params, "NiNi", "phi", "phi"), r)
            acc = acc + jnp.sum((rho_p + der_rho + phi_p + dphi) * mask2)
            if stage == "pairfns":
                return acc
            rho_i = jnp.sum(rho_p * mask2, axis=1)
            phi_i = 0.5 * jnp.sum(phi_p * mask2, axis=1)
            embed_i, pullback = jax.vjp(
                lambda rho: model._embed_energy(params, rho), rho_i)
            g_rho = pullback(am)[0]
            acc = acc + jnp.sum((embed_i + phi_i) * am) + jnp.vdot(
                g_rho, g_rho)
            if stage == "accum":
                return acc
            am_j = am[jd]
            g_rho_j = g_rho[jd]
            w_self = (g_rho[:, None] * der_rho
                      + 0.5 * am[:, None] * dphi) * mask2
            w_rev = (g_rho_j * der_rho + 0.5 * am_j * dphi) * mask2
            w_tot = w_self + w_rev
            forces_c = [jnp.sum(w_tot * uc, axis=1) for uc in u]
            acc = acc + sum(jnp.vdot(fc, fc) for fc in forces_c)
            if stage == "forces":
                return acc
            ct_self = [w_self * uc for uc in u]
            virial = jnp.stack(
                [jnp.stack([jnp.vdot(ct_self[a], v[b])
                            for b in range(3)]) for a in range(3)])
            return acc + jnp.sum(virial)
        return run

    def timed_scalar(fn):
        def run_k(k):
            def f(p, d):
                def body(carry, _):
                    d2 = dict(d)
                    d2["positions"] = d["positions"] + carry * 1e-12
                    return fn(p, d2) * 1e-20 + carry * 0.0, None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
                return acc
            g = jax.jit(f)
            return lambda: float(g(params, dfeats))
        return _marginal(run_k, lo=1, hi=9)

    out = {}
    prev = 0.0
    for stage in ["geom", "pairfns", "accum", "forces", "full"]:
        t = timed_scalar(stage_fn(stage))
        out[f"stage_{stage}_s"] = round(t, 4)
        out[f"stage_{stage}_marginal_s"] = round(t - prev, 4)
        prev = t
        print(json.dumps({stage: round(t, 4)}), flush=True)

    # production path (dict outputs, exactly what bench measured)
    fast_fn = make_fast_efs_fn(model)
    def run_k(k):
        def f(p, d):
            def body(carry, _):
                d2 = dict(d)
                d2["positions"] = d["positions"] + carry * 1e-12
                o = fast_fn(p, d2)
                return (o["energy"] + 1e-30 * jnp.sum(o["forces"])
                        + 1e-30 * jnp.sum(o["stress"])), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return acc
        g = jax.jit(f)
        return lambda: float(g(params, dfeats))
    out["production_fast_efs_s"] = round(_marginal(run_k, lo=1, hi=9), 4)

    # ---- micro rows at the same shapes -------------------------------
    jd = dfeats["pair_j_d"]
    r_host = np.random.RandomState(1).uniform(
        1.5, 6.0, jd.shape).astype(np.float32)
    r_dev = jax.device_put(jnp.asarray(r_host))
    colv = jax.device_put(jnp.asarray(
        np.random.RandomState(2).normal(
            size=(dfeats["positions"].shape[0],)).astype(np.float32)))

    def micro(fn, name):
        def run_k(k):
            def f(x):
                def body(carry, _):
                    return jnp.sum(fn(x + carry * 1e-12)) * 1e-20, None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
                return acc
            g = jax.jit(f)
            return lambda: float(g(r_dev))
        out[name] = round(_marginal(run_k, lo=1, hi=9), 4)
        print(json.dumps({name: out[name]}), flush=True)

    micro(lambda x: jnp.sum(x * x, axis=1), "micro_rowsum_s")
    micro(lambda x: jnp.sum(colv[jd] * x), "micro_gather_s")
    micro(lambda x: jnp.sum(
        model._fn(params, "Ni", "rho", "rho")(x)), "micro_rho_s")
    micro(lambda x: jnp.sum(
        model._fn(params, "NiNi", "phi", "phi")(x)), "micro_phi_s")
    micro(lambda x: jnp.sum(sum(
        _val_and_deriv(model._fn(params, "NiNi", "phi", "phi"), x))),
        "micro_phi_vjp_s")

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
