#!/usr/bin/env python
"""Probe 3: fix candidates for the gather_vec fusion pathology.

probe_fast_efs2 isolated the 131k EAM fast-pass cost to the COMPOSED
gather_vec (0.68 s) while each constituent (slice-operand gather
0.1 ms, packed-shift decode ~0, elementwise ~0) is fast alone — XLA
serializes the gather when it is fused with the surrounding
arithmetic.  Candidates:

  A. barrier: lax.optimization_barrier around the three raw gathers —
     the gather becomes its own (fast) kernel, arithmetic fuses after.
  B. rowgather: one pos[jd] row gather ([N, nnl, 3]) sliced into
     components afterwards.
  C. current gather_vec (control, expect ~0.68 s).

Each variant is then run through the FULL geom stage (norm + unit +
consumption) to confirm the win survives composition.  All device
arrays are passed as jit ARGUMENTS (closure capture embeds them as
literals and blows the remote-compile request over HTTP 413).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax

from bench_inference import _marginal


def main(n=32):
    from tensoralloy_tpu.atoms import Structure
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.ops.dense import (gather_vec, shift_dot_cell,
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

    args = (d["positions"], d["cell"], d["pair_j_d"], d["pair_simg_d"],
            d["pair_mask_d"])
    out = {}

    def timed(name, fn):
        def run_k(k):
            def f(pos, cell, jd, simg, mask):
                def body(carry, _):
                    return fn(pos + carry * 1e-12, cell, jd, simg,
                              mask) * 1e-20, None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                      length=k)
                return acc
            g = jax.jit(f)
            return lambda: float(g(*args))
        out[name] = round(_marginal(run_k, lo=1, hi=9), 4)
        print(json.dumps({name: out[name]}), flush=True)

    def gv_current(pos, cell, jd, simg):
        return gather_vec(pos, jd, simg, cell)

    def gv_barrier(pos, cell, jd, simg):
        g = lax.optimization_barrier(
            tuple(pos[:, a][jd] for a in range(3)))
        sv = shift_dot_cell(simg, cell, pos.dtype)
        return tuple(g[a] + sv[a] - pos[:, a][:, None] for a in range(3))

    def gv_rowgather(pos, cell, jd, simg):
        g = pos[jd]                                   # [A, N, 3]
        sv = shift_dot_cell(simg, cell, pos.dtype)
        return tuple(g[..., a] + sv[a] - pos[:, a][:, None]
                     for a in range(3))

    def consume(v):
        return sum(jnp.vdot(vc, vc) for vc in v)

    def geom(v, mask):
        r = safe_norm_components(v)
        r = jnp.where(mask > 0, r, 1.0)
        m2 = mask * (r < 6.0).astype(r.dtype)
        u = tuple(vc / r for vc in v)
        return sum(jnp.vdot(uc, uc) for uc in u) + jnp.sum(r * m2)

    timed("gv_current",
          lambda pos, cell, jd, simg, mask:
          consume(gv_current(pos, cell, jd, simg)))
    timed("gv_barrier",
          lambda pos, cell, jd, simg, mask:
          consume(gv_barrier(pos, cell, jd, simg)))
    timed("gv_rowgather",
          lambda pos, cell, jd, simg, mask:
          consume(gv_rowgather(pos, cell, jd, simg)))
    timed("geom_barrier",
          lambda pos, cell, jd, simg, mask:
          geom(gv_barrier(pos, cell, jd, simg), mask))
    timed("geom_rowgather",
          lambda pos, cell, jd, simg, mask:
          geom(gv_rowgather(pos, cell, jd, simg), mask))

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
