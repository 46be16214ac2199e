"""Roofline attribution for the two large-cell inference paths — on
chip (VERDICT r4 item 4).

Part A — GRAP 131k (the 0.248 s row had NO stated bound): stage-split
the dense transpose-assembled EFS into cumulative programs
(descriptor forward -> +NN energy -> full E+F+S) and compute the
compulsory-traffic bound for the m0-3 pexp-16 config from the bytes
of the feature arrays each stage must read, against the measured
device-to-device copy anchor. Output rows state measured-vs-bound.

Part B — EAM 131k fast path post-row-gather (0.074 s vs the ~10 ms
bound): re-run the round-4 stage split (artifacts/probe_fast_efs.py,
whose gather_vec now rides the row-gather tables) so the remaining
7.4x has a per-stage home.

Output: JSON-lines on stdout, final line tagged "summary".
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/artifacts")

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def grap_split(n=32):
    import jax
    import jax.numpy as jnp
    from collections import Counter
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
    from tensoralloy_tpu.ops.dense import make_dense_efs_fn
    from bench_inference import _marginal
    import bench

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
    grap = GenericRadialAtomicPotential(
        ["Ni"], algorithm="pexp",
        parameters={"rl": [1.0, 1.2, 1.4, 1.6, 1.8, 2.0, 2.2, 2.4, 2.6,
                           2.8, 3.0, 3.2, 3.4, 3.6, 3.8, 4.0],
                    "pl": [5.0, 4.75, 4.5, 4.25, 4.0, 3.75, 3.5, 3.25,
                           3.0, 2.75, 2.5, 2.25, 2.0, 1.75, 1.5, 1.25]},
        moment_tensors=[0, 1, 2, 3], backend="dense")
    model = AtomicNN(fz, Counter({"Ni": len(s)}), grap,
                     hidden_sizes=[128, 128], minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(0))

    vap = fz.make_vap(s)
    feats = fz.featurize(s, vap,
                         nnl_bucket=lambda m: max(
                             32, 1 << (m - 1).bit_length()),
                         dtype=np.float32, layout="dense",
                         transpose=True)
    dfeats = {k: jax.device_put(jnp.asarray(v)) for k, v in feats.items()}
    jax.block_until_ready(list(dfeats.values()))
    shapes = {k: (list(np.asarray(v).shape), str(np.asarray(v).dtype))
              for k, v in feats.items()}
    emit(tag="grap_feats", n_atoms=len(s), shapes=shapes)

    def timed(fn):
        def run_k(k):
            def f(p, d):
                def body(carry, _):
                    d2 = dict(d)
                    d2["positions"] = d["positions"] + carry * 1e-12
                    return fn(p, d2) * 1e-20 + carry * 0.0, None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                      length=k)
                return acc
            g = jax.jit(f)
            return lambda: float(g(params, dfeats))
        return _marginal(run_k, lo=1, hi=5)

    def f_desc(p, d):
        return jnp.sum(model.descriptors(d, p).astype(jnp.float32))

    def f_energy(p, d):
        return model.energy(p, d).astype(jnp.float32)

    dense_efs = make_dense_efs_fn(model.variational_energy)

    def f_full(p, d):
        o = dense_efs(p, d)
        return (o["energy"] + 1e-10 * jnp.sum(o["forces"])
                + 1e-10 * jnp.sum(o["stress"])).astype(jnp.float32)

    rows = {}
    prev = 0.0
    for name, fn in [("desc", f_desc), ("energy", f_energy),
                     ("full", f_full)]:
        t = timed(fn)
        rows[name + "_s"] = round(t, 4)
        rows[name + "_marginal_s"] = round(t - prev, 4)
        prev = t
        emit(tag="grap_stage", stage=name, s=round(t, 4))

    # compulsory traffic: every pass must read the pair geometry
    # tables once (positions ride the gather tables); the full EFS
    # additionally reads the transpose tables and writes/reads the
    # per-pair cotangents once each way
    pair_keys = [k for k in feats
                 if k.startswith("pair_") and "_trans" not in k]
    trans_keys = [k for k in feats if "_trans" in k]
    pair_bytes = sum(np.asarray(feats[k]).nbytes for k in pair_keys)
    trans_bytes = sum(np.asarray(feats[k]).nbytes for k in trans_keys)
    n_vap = feats["positions"].shape[0]
    nnl = feats["pair_j_d"].shape[1]
    K = 16
    # desc: read pair tables + write [n_vap, K*n_moments-ish]
    # descriptors; backward re-reads them and streams per-pair
    # cotangents [n_vap, nnl] x K once down, once up
    desc_out_bytes = n_vap * K * 4 * 4      # 4 moment groups m0-3
    cot_bytes = n_vap * nnl * 4 * 3         # 3-component pair cotangent
    bw = bench.measure_peak_bandwidth()
    bound_desc = (pair_bytes + desc_out_bytes) / (bw * 1e9)
    bound_full = (2 * pair_bytes + 2 * desc_out_bytes + 2 * cot_bytes
                  + trans_bytes) / (bw * 1e9)
    emit(tag="grap_summary", n_atoms=len(s),
         pair_bytes_mb=round(pair_bytes / 1e6, 1),
         trans_bytes_mb=round(trans_bytes / 1e6, 1),
         copy_anchor_gbps=round(bw, 1),
         bound_desc_s=round(bound_desc, 4),
         bound_full_efs_s=round(bound_full, 4),
         measured_desc_s=rows["desc_s"],
         measured_full_s=rows["full_s"],
         desc_vs_bound=round(rows["desc_s"] / max(bound_desc, 1e-9), 1),
         full_vs_bound=round(rows["full_s"] / max(bound_full, 1e-9), 1),
         **rows)


def main():
    n = int(os.environ.get("PROBE_N", "32"))
    emit(tag="env", loadavg=os.getloadavg()[0], n=n)
    t0 = time.perf_counter()
    grap_split(n)
    emit(tag="grap_done", wall_s=round(time.perf_counter() - t0, 1))

    # Part B: the EAM fast-path stage split, post-row-gather
    import probe_fast_efs
    t0 = time.perf_counter()
    probe_fast_efs.main(n)
    emit(tag="eam_done", wall_s=round(time.perf_counter() - t0, 1))
    emit(tag="summary", ok=True, loadavg=os.getloadavg()[0])


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        emit(tag="summary", ok=False, fatal=repr(e)[:500])
        raise
