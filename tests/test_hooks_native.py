"""Hooks (NaN guard, throughput, logging) + LAMMPS native export +
stop/percentile CLI paths."""
import json
import logging
import os
from collections import Counter

import jax
import numpy as np
import pytest

from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.grap import GenericRadialAtomicPotential
from tensoralloy_tpu.nn.atomic import AtomicNN
from tensoralloy_tpu.train import hooks as H


def test_nan_hook():
    hook = H.NanTensorHook(every_steps=1)
    hook.after_step(1, None, {"loss/total": 1.0})   # aligns boundary
    hook.after_step(2, None, {"loss/total": 1.0})
    with pytest.raises(FloatingPointError):
        hook.after_step(3, None, {"loss/total": float("nan")})


def test_hooks_fire_with_fused_scan_steps():
    """With scan_steps=k the trainer calls hooks only at steps k-1,
    2k-1, ... — interval hooks must still fire via boundary crossing
    (metrics.jsonl used to stay empty whenever k didn't divide
    every_steps)."""
    import json as _json
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        jsonl = d + "/m.jsonl"
        log = H.LoggingTensorHook(every_steps=100, jsonl_path=jsonl)
        for step in range(19, 1000, 20):   # fused k=20 callbacks
            log.after_step(step, None, {"loss/total": 1.0})
        log.end()
        rows = [_json.loads(ln) for ln in open(jsonl)]
        # one firing per crossed 100-step boundary
        assert [r["step"] for r in rows] == list(range(99, 1000, 100))


def test_logging_and_throughput_hooks(tmp_path, caplog):
    jsonl = str(tmp_path / "metrics.jsonl")
    log = H.LoggingTensorHook(every_steps=2, jsonl_path=jsonl)
    eps = H.ExamplesPerSecondHook(batch_size=8, every_steps=2)
    cb = H.compose_hooks([log, eps])
    with caplog.at_level(logging.INFO, logger="tensoralloy_tpu"):
        for step in range(5):
            cb(step, None, {"loss/total": 1.0 / (step + 1)})
    log.end()
    rows = [json.loads(ln) for ln in open(jsonl)]
    # boundary-crossing semantics: fires at the step that crosses each
    # every_steps boundary after the aligning first callback
    assert [r["step"] for r in rows] == [1, 3]
    assert any("examples/sec" in r.message for r in caplog.records)


def test_lammps_native_export(tmp_path):
    from tensoralloy_tpu.io.lammps_native import export_to_lammps_native
    fz = Featurizer(["Ni", "Mo"], rcut=6.0)
    grap = GenericRadialAtomicPotential(
        ["Ni", "Mo"], algorithm="pexp",
        parameters={"rl": [1.0, 2.0, 3.0], "pl": [2.0, 2.0, 2.0]},
        param_space_method="pair", moment_tensors=[0, 1, 2])
    model = AtomicNN(fz, Counter({"Ni": 4, "Mo": 2}), grap,
                     hidden_sizes=[16, 16], minmax_scale=False,
                     atomic_static_energy={"Ni": -5.0, "Mo": -10.0})
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "native.npz")
    data = export_to_lammps_native(model, params, path)
    with np.load(path) as z:
        assert int(z["nelt"]) == 2
        assert float(z["rmax"]) == 6.0
        assert int(z["max_moment"]) == 2
        assert int(z["descriptor::method"]) == 0      # pexp
        np.testing.assert_allclose(z["descriptor::rl"], [1.0, 2.0, 3.0])
        assert list(z["layer_sizes"]) == [16, 16, 1]
        # per-element weights for both elements, all layers
        for i in range(2):
            for j in range(3):
                assert f"weights_{i}_{j}" in z.files
        assert z["weights_0_0"].shape == (model.feature_dim, 16)
        # output bias = static energies present
        assert int(z["apply_output_bias"]) == 1
        assert f"biases_0_2" in z.files


def test_lammps_native_export_nn_filters(tmp_path):
    from tensoralloy_tpu.io.lammps_native import export_to_lammps_native
    fz = Featurizer(["Be"], rcut=5.0)
    grap = GenericRadialAtomicPotential(
        ["Be"], algorithm="nn",
        parameters={"hidden_sizes": [8, 8], "num_filters": 4},
        moment_tensors=[0, 1])
    model = AtomicNN(fz, Counter({"Be": 2}), grap, hidden_sizes=[8],
                     minmax_scale=False)
    params = model.init_params(jax.random.PRNGKey(1))
    path = str(tmp_path / "native_nn.npz")
    export_to_lammps_native(model, params, path)
    with np.load(path) as z:
        assert int(z["use_fnn"]) == 1
        assert int(z["fnn::num_filters"]) == 4
        assert "fnn::weights_0_0" in z.files


def test_best_checkpoint_hook(tmp_path):
    """ckpt-best.npz tracks the LOWEST eval metric: improvements save,
    regressions don't, and a crash-resume respects the recorded
    incumbent instead of overwriting it with a worse later model."""

    class FakeTrainer:
        def __init__(self):
            self.saved = []

        def save_checkpoint(self, path, state):
            self.saved.append((path, state))
            with open(path, "w") as fh:
                fh.write("x")

    d = str(tmp_path / "m")
    tr = FakeTrainer()
    hook = H.BestCheckpointHook(tr, d, metric="energy/mae/atom")
    hook.after_eval(100, "s100", {"energy/mae/atom": 0.5})
    hook.after_eval(200, "s200", {"energy/mae/atom": 0.3})
    hook.after_eval(300, "s300", {"energy/mae/atom": 0.4})   # worse: no save
    hook.after_eval(400, "s400", {"forces/mae": 0.1})        # missing: no save
    hook.after_eval(500, "s500", {"energy/mae/atom": float("nan")})
    assert [s for _, s in tr.saved] == ["s100", "s200"]
    rec = json.load(open(os.path.join(d, "best.json")))
    assert rec["step"] == 200 and rec["value"] == 0.3

    # resume: the incumbent 0.3 survives a new hook instance
    tr2 = FakeTrainer()
    hook2 = H.BestCheckpointHook(tr2, d, metric="energy/mae/atom")
    hook2.after_eval(600, "s600", {"energy/mae/atom": 0.35})  # not better
    assert tr2.saved == []
    hook2.after_eval(700, "s700", {"energy/mae/atom": 0.25})
    assert [s for _, s in tr2.saved] == ["s700"]

    # a different metric ignores the stale incumbent
    hook3 = H.BestCheckpointHook(FakeTrainer(), d, metric="forces/mae")
    assert hook3.best is None
