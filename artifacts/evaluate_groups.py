"""Per-group train/test MAEs for a finished (or in-flight) run dir.

The SNAP databases tag every frame with a `source` like
"Mo.Elastic.12"; grouping the split by that prefix shows WHERE a
model's error lives (reference Table 2/3 reports only the overall
number, `doc/papers/nn/manuscript.tex:1234-1247`, so this is the
diagnosis layer underneath it — VERDICT r3 item 6 asks for the Mo
gap to be attributed to named causes, and per-group error is the
first split of that attribution).

Rebuilds the training-time split exactly (same TOML -> same seed ->
same `RandomState(seed).permutation(n)` over the db's id order,
`train/dataset.py:147-158`), loads the newest checkpoint's EMA
params, and reports energy/force/stress MAEs per group for BOTH
splits: a group that is bad on train too is a capacity/descriptor
problem; bad only on test is sampling/generalization.

Usage: python evaluate_groups.py [workdir] -> group_maes.json
"""
import sys
sys.path.insert(0, '/root/repo')
import glob
import json
import os

import numpy as np


def main(workdir: str = ".") -> dict:
    os.chdir(workdir)
    import jax
    from tensoralloy_tpu.train.manager import TrainingManager

    mgr = TrainingManager("input.toml")
    ds = mgr.dataset
    feats, labels = ds.build()
    tf_, tl_, ef_, el_ = ds.split(feats, labels)

    # group tag of every db row, in the same id order list(db) uses
    groups = []
    for s in ds.db:
        src = str(s.info.get("source", "ungrouped"))
        groups.append(".".join(src.split(".")[:-1]) or src)
    groups = np.asarray(groups)
    train_idx, test_idx = ds.split_indices(len(groups))
    tags = {"test": groups[test_idx], "train": groups[train_idx]}
    assert len(tags["test"]) == len(el_["energy"]), \
        (len(tags["test"]), len(el_["energy"]))

    trainer = mgr.trainer
    ckpts = sorted(glob.glob(os.path.join(mgr.model_dir, "ckpt-*.npz")),
                   key=lambda p: int(p.split("-")[-1].split(".")[0]))
    tmpl = mgr.model.init_params(jax.random.PRNGKey(0))
    params, ema, step = trainer.load_checkpoint(ckpts[-1], tmpl)
    print(f"checkpoint step {step}: {ckpts[-1]}")
    GPA = 160.21766208

    out = {"step": int(step), "splits": {}}
    for split, (sf_all, sl_all) in (("test", (ef_, el_)),
                                    ("train", (tf_, tl_))):
        t = tags[split]
        rows = {}
        for tag in sorted(set(t)) + ["overall"]:
            sel = (np.arange(len(t)) if tag == "overall"
                   else np.nonzero(t == tag)[0])
            sf = {k: v[sel] for k, v in sf_all.items()}
            sl = {k: v[sel] for k, v in sl_all.items()}
            ev = trainer.evaluate(ema, sf, sl)
            rows[tag] = {
                "n": int(len(sel)),
                "energy_meV_per_atom": 1000 * ev["energy/mae/atom"],
                "force_eV_A": ev["forces/mae"],
                "stress_GPa": GPA * ev.get("stress/mae", float("nan")),
            }
        out["splits"][split] = rows
        print(f"-- {split} --")
        for tag, r in rows.items():
            print(f"  {tag:18s} n={r['n']:3d} "
                  f"E {r['energy_meV_per_atom']:7.2f} meV/atom  "
                  f"F {r['force_eV_A']:6.3f} eV/A  "
                  f"S {r['stress_GPa']:6.3f} GPa")
    with open("group_maes.json", "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
