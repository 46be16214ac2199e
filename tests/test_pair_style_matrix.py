"""End-to-end pair_style dispatch matrix: every style the reference's
choices.toml allows must train a couple of steps, checkpoint, and
export through TrainingManager (`choices.toml:4-8`; ref
`train/training.py:282-299` dispatch)."""
import os

import numpy as np
import pytest

from tensoralloy_tpu.train.manager import TrainingManager


def _db(tmp_path):
    from tensoralloy_tpu.io.sqlite import read_file
    return read_file("/root/reference/test_files/datasets/Ni/Ni.extxyz",
                     db_path=str(tmp_path / "Ni.db"))


_EAM_SECTIONS = """
[nn.eam.rho]
NiNi = "nn"
[nn.eam.embed]
Ni = "nn"
[nn.eam.phi]
NiNi = "nn"
"""

_STYLES = {
    "atomic/sf": "",
    "atomic/sf/angular": "acut = 4.0\n",
    "atomic/grap": "[nn.atomic.grap]\nmoment_tensors = [0, 1]\n",
    "td/sf": "",
    "td/sf/angular": "acut = 4.0\n",   # finite-T + triple machinery
    "td/grap": "[nn.atomic.grap]\nmoment_tensors = [0]\n",
    "eam/alloy": "",
    "eam/fs": _EAM_SECTIONS,
    "eam/adp": "",
}


@pytest.mark.parametrize("style", sorted(_STYLES))
def test_pair_style_trains_and_exports(style, tmp_path, monkeypatch):
    _db(tmp_path)
    monkeypatch.chdir(tmp_path)
    tag = style.replace("/", "_")
    toml = tmp_path / f"{tag}.toml"
    toml.write_text(f"""
precision = "medium"
pair_style = "{style}"
rcut = 4.5
[dataset]
sqlite3 = "Ni.db"
name = "ni_{tag}"
test_size = 1
tfrecords_dir = "."
[nn]
minimize = ['energy', 'forces']
[train]
model_dir = "m_{tag}"
train_steps = 3
batch_size = 2
eval_steps = 3
{_STYLES[style]}
""")
    mgr = TrainingManager(str(toml))
    mgr.train_and_evaluate(verbose=False)
    assert os.path.exists(os.path.join(mgr.model_dir,
                                       "checkpoint.npz"))
    path = mgr.export()
    assert os.path.exists(path)
    # exported model must evaluate through the calculator
    from tensoralloy_tpu.calculator import TensorAlloyCalculator
    calc = TensorAlloyCalculator(path)
    s = next(iter(mgr.dataset.db))
    e = calc.get_potential_energy(s)
    assert np.isfinite(e)


def test_crash_auto_resume_is_default(tmp_path, monkeypatch):
    """An interrupted run (periodic ckpt step < train_steps) must
    resume by DEFAULT on rerun — a stalled production run used to
    silently restart from step 0 unless reset_global_step=false was
    set; a completed run still starts fresh."""
    _db(tmp_path)
    monkeypatch.chdir(tmp_path)
    toml = tmp_path / "r.toml"
    toml.write_text("""
precision = "medium"
pair_style = "atomic/sf"
rcut = 4.5
[dataset]
sqlite3 = "Ni.db"
name = "ni_resume"
test_size = 1
tfrecords_dir = "."
[nn]
minimize = ['energy']
[train]
model_dir = "m_resume"
train_steps = 4
batch_size = 2
eval_steps = 2
""")
    mgr = TrainingManager(str(toml))
    mgr.train_and_evaluate(verbose=False)
    # simulate a crash at step 2 of a longer (6-step) run: keep only
    # the step-2 periodic checkpoint
    os.remove(os.path.join("m_resume", "ckpt-4.npz"))
    toml.write_text(toml.read_text().replace("train_steps = 4",
                                             "train_steps = 6"))
    mgr2 = TrainingManager(str(toml))
    out = mgr2.train_and_evaluate(verbose=False)
    assert int(out["state"]["step"]) == 6
    # the resumed run continued from step 2, so only 4 more steps ran:
    # verify by the restored initial step recorded in the run
    assert os.path.exists(os.path.join("m_resume", "ckpt-6.npz"))
