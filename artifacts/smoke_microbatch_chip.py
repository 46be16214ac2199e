"""Chip smoke for train.microbatch_size: the gradient-accumulation
step has only ever executed on CPU (tests force the cpu platform);
BENCH_r05's new bs*_mb* rows will run it cold on the real chip.  This
runs the equivalence test's exact shape on the default (tpu) backend
at f32 and prints one JSON line — a compile failure here means the
bench rows would record error strings instead of numbers.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
OUT = {"smoke": "microbatch_chip"}

try:
    import numpy as np
    import jax
    from tensoralloy_tpu.io.sqlite import connect
    from tensoralloy_tpu.transform import Featurizer
    from tensoralloy_tpu.train.dataset import Dataset
    from tensoralloy_tpu.nn.atomic import AtomicNN
    from tensoralloy_tpu.nn.sf import SymmetryFunction as SF
    from tensoralloy_tpu.nn import losses as L
    from tensoralloy_tpu.train.trainer import (Trainer, OptParameters,
                                               TrainParameters)

    OUT["backend"] = jax.default_backend()
    OUT["loadavg"] = os.getloadavg()[0]
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "ethanol.db")
    shutil.copy("/root/reference/test_files/datasets/ethanol/"
                "ethanol.db", path)
    db = connect(path)
    fz = Featurizer(db.elements, rcut=5.0)
    ds = Dataset(db, fz, name="ethanol", test_size=2,
                 dtype=np.float32, cache_dir=tmp)
    feats, labels = ds.build()
    tf_, tl_, _, _ = ds.split(feats, labels)
    model = AtomicNN(fz, ds.max_occurs, SF(db.elements),
                     hidden_sizes=[8], minmax_scale=False)
    params0 = jax.device_get(model.init_params(jax.random.PRNGKey(7)))
    lp = L.LossParameters(energy=L.LossOptions(method="logcosh"),
                          forces=L.LossOptions(method="logcosh"))
    t0 = time.perf_counter()
    res = []
    for mb in (0, 2):
        trainer = Trainer(
            model, lp, OptParameters(learning_rate=1e-3),
            TrainParameters(batch_size=4, train_steps=8,
                            eval_steps=100, log_steps=1000, seed=123,
                            scan_steps=2, microbatch_size=mb),
            minimize_properties=("energy", "forces"), n_devices=1)
        out = trainer.fit(tf_, tl_, params=params0, verbose=False)
        assert int(out["state"]["step"]) == 8
        res.append(jax.device_get(out["state"]["params"]))
    rel = max(float(np.max(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)))
                    / (np.max(np.abs(np.asarray(a, np.float64)))
                       + 1e-30))
              for a, b in zip(jax.tree_util.tree_leaves(res[0]),
                              jax.tree_util.tree_leaves(res[1])))
    OUT["mb_vs_monolithic_rel"] = rel
    OUT["wall_s"] = round(time.perf_counter() - t0, 1)
    OUT["ok"] = bool(rel < 5e-5)   # f32 + bf16-MXU training numerics
except Exception as e:  # noqa: BLE001
    OUT["ok"] = False
    OUT["fatal"] = repr(e)[:500]
print(json.dumps(OUT, indent=1))
