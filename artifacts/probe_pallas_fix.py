"""Chip probe: does the restructured pallas GRAP kernel compile and run
at production padding after the scoped-VMEM fix (ops/fused.py)?

BENCH r4 first attempt died inside the backend_matrix stage with a
Mosaic "kernel-vmem-stack-oom" in the old per-(slot,filter,monomial)
unrolled kernel.  This probe reproduces exactly that configuration
(snap-Mo GRAP m0-5 padding) on whatever backend is available and
prints one JSON line: parity vs the dense path + marginal timing.

Run: timeout 1200 python -u artifacts/probe_pallas_fix.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
from tensoralloy_tpu.ops import fused

out = {"probe": "pallas_fix", "ok": False}
try:
    backend = jax.default_backend()
    out["backend"] = backend
    rng = np.random.RandomState(0)
    # bench backend_matrix's exact flagship config: pexp-16, m0-5
    # (the configuration whose old unrolled kernel hit the Mosaic
    # scoped-VMEM stack OOM on chip in the first r4 bench attempt)
    a, n = 512, 64
    pexp = {"rl": [1.0, 1.2, 1.4, 1.6, 1.8, 2.0, 2.2, 2.4, 2.6,
                   2.8, 3.0, 3.2, 3.4, 3.6, 3.8, 4.0],
            "pl": [5.0, 4.75, 4.5, 4.25, 4.0, 3.75, 3.5, 3.25,
                   3.0, 2.75, 2.5, 2.25, 2.0, 1.75, 1.5, 1.25]}
    desc = GenericRadialAtomicPotential(
        ["Mo"], algorithm="pexp", parameters=pexp,
        moment_tensors=[0, 1, 2, 3, 4, 5], backend="pallas")
    rij = (rng.rand(a, n) * 5.0 + 0.8).astype(np.float32)
    unit = rng.randn(a, n, 3).astype(np.float32)
    unit /= np.linalg.norm(unit, axis=-1, keepdims=True)
    islot = np.zeros((a, n), np.float32)
    mask = (rng.rand(a, n) < 0.8).astype(np.float32)
    rcut, n_slots = 6.5, 1

    args = (rij, unit[..., 0], unit[..., 1], unit[..., 2], islot, mask)
    args = tuple(jnp.asarray(x) for x in args)

    def run_pallas():
        return fused._grap_pallas(desc, rcut, n_slots, *args)

    def run_dense():
        return fused._grap_ref_dense(desc, rcut, n_slots, *args)

    gp = jax.jit(run_pallas)().block_until_ready()
    gd = jax.jit(run_dense)().block_until_ready()
    gp_h, gd_h = np.asarray(gp), np.asarray(gd)
    denom = np.abs(gd_h).max() + 1e-12
    out["max_rel_err"] = float(np.abs(gp_h - gd_h).max() / denom)

    def t(f, reps=20):
        f()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        np.asarray(r)  # force host fetch: block_until_ready is a
        # no-op on the axon backend (see bench.py timing note)
        return (time.perf_counter() - t0) / reps * 1e3

    jp, jd = jax.jit(run_pallas), jax.jit(run_dense)
    out["pallas_ms"] = round(t(jp), 3)
    out["dense_ms"] = round(t(jd), 3)
    out["ok"] = bool(out["max_rel_err"] < 5e-4)
except Exception as exc:  # noqa: BLE001 — probe must always report
    out["reason"] = f"{type(exc).__name__}: {exc}"[:2000]
print(json.dumps(out))
