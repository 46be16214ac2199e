#!/usr/bin/env python
"""Probe 2: bisect the 0.74 s geom stage of the 131k EAM fast pass.

probe_fast_efs.py showed every primitive fast in isolation (gather
0.1 ms, rowsum ~0, phi 0.4 ms) but the composed geometry stage at
0.6-0.75 s.  These micros time the composites between those points:
the packed-shift decode (s32 div/mod by 9 — TPU has no integer
divide), the slice-operand gather, gather_vec as a whole, and the
norm/unit arithmetic on pre-made components.
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
    from tensoralloy_tpu.ops.dense import (gather_vec, decode_simg,
                                           shift_dot_cell,
                                           safe_norm_components)

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
    t0 = time.perf_counter()
    vap = fz.make_vap(s)
    feats = fz.featurize(s, vap,
                         pair_bucket=lambda m: 1 << (m - 1).bit_length(),
                         nnl_bucket=lambda m: max(
                             32, 1 << (m - 1).bit_length()),
                         dtype=np.float32, layout="dense")
    d = {k: jax.device_put(jnp.asarray(v)) for k, v in feats.items()}
    jax.block_until_ready(list(d.values()))
    print(json.dumps({"featurize_s": round(time.perf_counter() - t0, 2)}),
          flush=True)

    posd, cell = d["positions"], d["cell"]
    jd, simg, mask = d["pair_j_d"], d["pair_simg_d"], d["pair_mask_d"]
    shp = jd.shape
    r_rand = jax.device_put(jnp.asarray(np.random.RandomState(1).uniform(
        1.5, 6.0, shp).astype(np.float32)))
    v_rand = tuple(jax.device_put(jnp.asarray(
        np.random.RandomState(2 + a).normal(size=shp).astype(np.float32)))
        for a in range(3))

    out = {}

    def micro(name, fn, seed_arr):
        def run_k(k):
            def f(x):
                def body(carry, _):
                    return jnp.sum(fn(x + carry * 1e-12)) * 1e-20, None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                      length=k)
                return acc
            g = jax.jit(f)
            return lambda: float(g(seed_arr))
        out[name] = round(_marginal(run_k, lo=1, hi=9), 4)
        print(json.dumps({name: out[name]}), flush=True)

    f32 = jnp.float32
    # 1. the packed-shift decode alone (perturb via float add on a
    #    carried copy of r to keep the scan-carry contract; simg is
    #    closed over as a constant-free device arg through x's shape)
    micro("decode_simg",
          lambda x: sum(decode_simg(simg, f32)) * x[:1, :1], r_rand)
    micro("shift_dot_cell",
          lambda x: sum(shift_dot_cell(simg, cell, f32)) * x[:1, :1],
          r_rand)
    # 2. slice-operand gather (exactly gather_vec's per-component read)
    micro("slice_gather",
          lambda x: posd[:, 0][jd] * (1 + x[:1, :1] * 0), r_rand)
    # 3. gather_vec composite
    micro("gather_vec",
          lambda x: sum(gather_vec(posd + x[:1, :1] * 0, jd, simg,
                                   cell)), r_rand)
    # 4. norm + mask + unit on pre-made random components
    def norm_unit(x):
        v = (v_rand[0] + x * 1e-12, v_rand[1], v_rand[2])
        r = safe_norm_components(v)
        r = jnp.where(mask > 0, r, 1.0)
        m2 = mask * (r < 6.0).astype(r.dtype)
        u = tuple(vc / r for vc in v)
        return sum(jnp.vdot(uc, uc) for uc in u) + jnp.sum(r * m2)
    micro("norm_unit", norm_unit, r_rand)
    # 5. gather_vec + norm (the full geom minus nothing) for reference
    def geom(x):
        v = gather_vec(posd + x[:1, :1] * 0, jd, simg, cell)
        r = safe_norm_components(v)
        r = jnp.where(mask > 0, r, 1.0)
        m2 = mask * (r < 6.0).astype(r.dtype)
        u = tuple(vc / r for vc in v)
        return sum(jnp.vdot(uc, uc) for uc in u) + jnp.sum(r * m2)
    micro("geom_full", geom, r_rand)

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
