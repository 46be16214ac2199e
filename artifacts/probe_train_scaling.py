"""Stage-split the SNAP GRAP train step at bs 32/128/512 — on chip.

VERDICT r4 weak #1: BENCH_r04's bs sweep measured 4,960 -> 4,820 ->
3,033 structs/s (bs 32 -> 128 -> 512): throughput per structure
DEGRADES 1.6x with batch, falsifying the "latency-bound at small
batch" MFU story (a latency-bound step gets faster per structure with
batch). Something in the compiled step grows superlinearly with bs.

Method (the probe discipline that cracked the scatter and
gather-serialization problems): time CUMULATIVE programs at each
batch size, all as marginal K-vs-2 fused scans over pre-staged
device arrays (no input staging, no dispatch — identical to
bench.measure_train's timing):

  desc       vmapped descriptor forward only
  energy     + the atomic NN (full energy forward)
  efs        + position/cell backward (forces+virial)
  loss_grad  + parameter backward (grad of the full loss)
  full_step  + adam/EMA optimizer update (= the bench bs_sweep row)

Differences between consecutive rows attribute the per-structure
microseconds to a stage; whichever difference GROWS with bs is the
inversion's home. Each row also records XLA's own per-struct HLO
flops and pre-fusion bytes-accessed at that batch size: if bytes/
struct grows with bs, XLA materializes something at large shapes
that it fused at small ones.

Output: one JSON dict on stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = {"probe": "train_scaling",
       "sizes": [int(x) for x in os.environ.get(
           "PROBE_SIZES", "32,128,512").split(",")]}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from collections import Counter
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)
    from tensoralloy_tpu.parallel.mesh import replicate

    OUT["backend"] = jax.default_backend()
    OUT["loadavg"] = os.getloadavg()[0]

    snap = bench.make_snap_ni(32)
    mo = Counter({"Ni": 108})
    fz = Featurizer(["Ni"], rcut=6.0)
    feats, labels = bench.featurize_all(snap, fz, mo, transpose=True)

    pexp = {"rl": [1.0, 1.2, 1.4, 1.6, 1.8, 2.0, 2.2, 2.4, 2.6,
                   2.8, 3.0, 3.2, 3.4, 3.6, 3.8, 4.0],
            "pl": [5.0, 4.75, 4.5, 4.25, 4.0, 3.75, 3.5, 3.25,
                   3.0, 2.75, 2.5, 2.25, 2.0, 1.75, 1.5, 1.25]}

    def make_model():
        g = GenericRadialAtomicPotential(
            ["Ni"], algorithm="pexp", parameters=pexp,
            moment_tensors=[0, 1, 2, 3], backend="dense")
        return AtomicNN(fz, mo, g, hidden_sizes=[128, 128],
                        minmax_scale=False)

    n = len(labels["energy"])
    rng = np.random.RandomState(0)

    def stacked(k, bs):
        sel = rng.randint(0, n, size=(k, bs))
        bf = {key: jnp.asarray(v[sel]) for key, v in feats.items()}
        bl = {key: jnp.asarray(v[sel]) for key, v in labels.items()}
        return bf, bl

    def marginal_scan(body, k_hi, bs, needs_labels=False):
        """body(params, bf_i[, bl_i]) -> scalar; returns s/step at
        k_hi-vs-2 marginal, plus per-step HLO flops/bytes."""
        model = make_model()
        params = model.init_params(jax.random.PRNGKey(0)), model
        p, model = params

        results = {}
        hlo = {}
        for k in (2, k_hi):
            bf, bl = stacked(k, bs)

            @jax.jit
            def run(p, bf, bl):
                def step(c, i):
                    f = jax.tree.map(lambda x: x[i], bf)
                    lb = jax.tree.map(lambda x: x[i], bl)
                    return c + body(model, p, f, lb), None
                tot, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(k))
                return tot

            t = run(p, bf, bl)
            float(t)
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                float(run(p, bf, bl))
                best = min(best, time.perf_counter() - t0)
            results[k] = best
            if k == k_hi:
                comp = run.lower(p, bf, bl).compile()
                hlo["flops"] = bench._hlo_flops(comp)
                hlo["bytes"] = bench._hlo_bytes(comp)
        per_step = max((results[k_hi] - results[2]) / (k_hi - 2), 1e-9)
        return per_step, hlo

    # ---- stage bodies (cumulative) ----------------------------------
    def body_desc(model, p, f, lb):
        d = jax.vmap(lambda ff: model.descriptors(ff, p))(f)
        return jnp.sum(d.astype(jnp.float32)) * 1e-9

    def body_energy(model, p, f, lb):
        e = jax.vmap(lambda ff: model.energy(p, ff))(f)
        return jnp.sum(e) * 1e-9

    def make_body_efs(trainer):
        def body(model, p, f, lb):
            out = jax.vmap(lambda ff: trainer.efs(p, ff))(f)
            return (jnp.sum(out["energy"]) +
                    jnp.sum(out["forces"][..., 0])) * 1e-9
        return body

    def make_body_lossgrad(trainer):
        def body(model, p, f, lb):
            def lf(pp):
                loss, _ = trainer.total_loss(pp, f, lb, 0)
                return loss
            g = jax.grad(lf)(p)
            leaves = jax.tree.leaves(g)
            return sum(jnp.sum(x).astype(jnp.float32)
                       for x in leaves) * 1e-9
        return body

    for bs in OUT["sizes"]:
        k_hi = max(4, min(10, 2048 // bs))
        row = {"k_hi": k_hi}
        model0 = make_model()
        trainer = Trainer(
            model0, L.LossParameters(), OptParameters(learning_rate=1e-3),
            TrainParameters(batch_size=bs, train_steps=10000,
                            scan_steps=k_hi),
            minimize_properties=("energy", "forces"), n_devices=1)

        stages = [
            ("desc", body_desc),
            ("energy", body_energy),
            ("efs", make_body_efs(trainer)),
            ("loss_grad", make_body_lossgrad(trainer)),
        ]
        for name, body in stages:
            try:
                per_step, hlo = marginal_scan(body, k_hi, bs)
                row[name + "_us_per_struct"] = round(
                    per_step / bs * 1e6, 2)
                row[name + "_hlo_bytes_per_struct"] = round(
                    hlo["bytes"] / bs, 0)
                row[name + "_hlo_flops_per_struct"] = round(
                    hlo["flops"] / bs, 0)
            except Exception as e:
                row[name + "_error"] = repr(e)[:200]

        # full train step (= the bench bs_sweep row)
        try:
            per_step, fps, bps, _ = bench.measure_train(
                make_model(), feats, labels, batch_size=bs, k_hi=k_hi)
            row["full_step_us_per_struct"] = round(per_step / bs * 1e6, 2)
            row["full_step_structs_per_s"] = round(bs / per_step, 1)
            row["full_step_hlo_bytes_per_struct"] = round(
                bps * per_step / bs, 0)
        except Exception as e:
            row["full_step_error"] = repr(e)[:200]

        OUT[f"bs{bs}"] = row
        print(json.dumps({"partial": f"bs{bs}", **row}),
              file=sys.stderr, flush=True)

    # attribution: per-struct deltas between consecutive stages
    for bs in OUT["sizes"]:
        row = OUT.get(f"bs{bs}", {})
        names = ["desc", "energy", "efs", "loss_grad", "full_step"]
        deltas = {}
        prev = 0.0
        for nm in names:
            v = row.get(nm + "_us_per_struct")
            if v is None:
                continue
            deltas[nm] = round(v - prev, 2)
            prev = v
        row["stage_deltas_us_per_struct"] = deltas

    OUT["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(OUT, indent=1))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        OUT["fatal"] = repr(e)[:500]
        print(json.dumps(OUT, indent=1))
        raise
