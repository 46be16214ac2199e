"""One-shot large-cell inference through the device-NL auto route —
the VERDICT-r4 item-5 re-bench.

The r4 131k rows paid 14-38 s of HOST featurization per single frame
(vs_baseline 1.92-4.81x against the reference's 71.6 s end-to-end).
The calculator now routes one-shot frames >= device_nl_auto_atoms
through the on-device neighbor builder with the O(1)-host density
census, so end-to-end = density census (ms) + device build + device
EFS + D2H.  Measured here through the PRODUCTION surface
(`TensorAlloyCalculator.calculate`), cold (first call: build+EFS
compile included) and warm (second frame, rattled positions — the
steady state of any scan/trajectory/screening workload).

Rows: EAM zjw04 fast path and GRAP m0-3 pexp-16 (the reference's own
benchmark family), each at 55k and 131k atoms.
vs_baseline = reference 71.6 s end-to-end scaled by n/128000
(`doc/papers/nn/figures/cpc_speed.py:36-40`).

Output: JSON-lines on stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def make_structure(n, rng):
    from tensoralloy_tpu.atoms import Structure
    a0 = 3.52
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    frac = np.concatenate([base + [i, j, k] for i in range(n)
                           for j in range(n) for k in range(n)])
    pos = frac * a0 + rng.normal(0, 0.05, (len(frac), 3))
    return Structure.from_symbols(["Ni"] * len(frac), pos,
                                  np.eye(3) * a0 * n, pbc=[True] * 3)


def bench_family(family, n_axis):
    import jax
    from collections import Counter
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.calculator import TensorAlloyCalculator

    rng = np.random.RandomState(0)
    s = make_structure(n_axis, rng)
    fz = Featurizer(["Ni"], rcut=6.0)
    if family == "eam":
        from tensoralloy_tpu.nn.eam import EamAlloyNN
        model = EamAlloyNN(fz, Counter({"Ni": len(s)}),
                           custom_potentials="zjw04")
    else:
        from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
        from tensoralloy_tpu.nn.atomic import AtomicNN
        grap = GenericRadialAtomicPotential(
            ["Ni"], algorithm="pexp",
            parameters={"rl": [1.0, 1.2, 1.4, 1.6, 1.8, 2.0, 2.2, 2.4,
                               2.6, 2.8, 3.0, 3.2, 3.4, 3.6, 3.8, 4.0],
                        "pl": [5.0, 4.75, 4.5, 4.25, 4.0, 3.75, 3.5,
                               3.25, 3.0, 2.75, 2.5, 2.25, 2.0, 1.75,
                               1.5, 1.25]},
            moment_tensors=[0, 1, 2, 3], backend="dense")
        model = AtomicNN(fz, Counter({"Ni": len(s)}), grap,
                         hidden_sizes=[128, 128], minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(0))
    calc = TensorAlloyCalculator(model, params)   # device_nl="auto"

    t0 = time.perf_counter()
    calc.calculate(s)
    cold = time.perf_counter() - t0

    warms = []
    for rep in range(3):
        s2 = s.copy()
        s2.positions = s.positions + rng.normal(
            0, 0.01, s.positions.shape)
        t0 = time.perf_counter()
        out = calc.calculate(s2)
        warms.append(time.perf_counter() - t0)
    warm = min(warms)
    assert np.all(np.isfinite(out["forces"]))

    baseline = 71.6 * len(s) / 128000.0
    emit(metric=f"oneshot_{family}_{len(s)}_atoms",
         unit="s end-to-end (structure -> E+F+S on host)",
         routed_device=bool(calc._nl_cache),
         cold_first_call_s=round(cold, 3),
         value=round(warm, 3),
         warm_calls_s=[round(x, 3) for x in warms],
         vs_baseline=round(baseline / warm, 2),
         vs_baseline_cold=round(baseline / cold, 2),
         loadavg=os.getloadavg()[0])


def main():
    emit(tag="env", loadavg=os.getloadavg()[0])
    axes = tuple(int(x) for x in os.environ.get(
        "ONESHOT_AXES", "24,32").split(","))   # 4*ax^3 atoms
    for family in ("eam", "grap"):
        for n_axis in axes:         # default: 55,296 and 131,072 atoms
            try:
                bench_family(family, n_axis)
            except Exception as e:
                emit(metric=f"oneshot_{family}_ax{n_axis}",
                     error=repr(e)[:300])
    emit(tag="summary", ok=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        emit(tag="summary", ok=False, fatal=repr(e)[:500])
        raise
