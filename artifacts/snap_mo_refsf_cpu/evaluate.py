"""Per-subset test MAEs for the binary Mo-Ni model.

Rebuilds the EXACT training-time test split (same TOML, same seed via
TrainingManager/Dataset), loads the newest checkpoint's EMA params,
and reports energy/force/stress MAEs overall and per element subset
(structures that are pure Mo vs pure Ni vs mixed) — the shape of the
reference's Table 3 (`manuscript.tex:1213-1228`). Stress reported in
GPa (1 eV/A^3 = 160.21766 GPa).
"""
import sys
sys.path.insert(0, '/root/repo')
import glob
import json
import os

import numpy as np


def main(workdir: str = "."):
    os.chdir(workdir)
    import jax
    from tensoralloy_tpu.train.manager import TrainingManager

    mgr = TrainingManager("input.toml")
    ds = mgr.dataset
    feats, labels = ds.build()
    tf_, tl_, ef_, el_ = ds.split(feats, labels)
    trainer = mgr.trainer
    ckpts = sorted(glob.glob(os.path.join(mgr.model_dir, "ckpt-*.npz")),
                   key=lambda p: int(p.split("-")[-1].split(".")[0]))
    tmpl = mgr.model.init_params(jax.random.PRNGKey(0))
    params, ema, step = trainer.load_checkpoint(ckpts[-1], tmpl)
    print(f"checkpoint step {step}: {ckpts[-1]}")

    # subset masks from the element content of each test structure
    eidx = np.asarray(mgr.model.vap_element_idx)
    def subset_of(i):
        m = np.asarray(ef_["atom_masks"][i]) > 0
        els = set(eidx[m])
        if els == {0}:
            return mgr.model.elements[0]
        if els == {1}:
            return mgr.model.elements[1]
        return "mixed"

    tags = [subset_of(i) for i in range(len(el_["energy"]))]
    GPA = 160.21766208

    rows = {}
    for tag in sorted(set(tags)) + ["overall"]:
        idx = [i for i, t in enumerate(tags)
               if tag == "overall" or t == tag]
        sf = {k: v[idx] for k, v in ef_.items()}
        sl = {k: v[idx] for k, v in el_.items()}
        ev = trainer.evaluate(ema, sf, sl)
        rows[tag] = {
            "n": len(idx),
            "energy_meV_per_atom": 1000 * ev["energy/mae/atom"],
            "force_eV_A": ev["forces/mae"],
            "stress_GPa": GPA * ev["stress/mae"],
        }
    print(json.dumps(rows, indent=1))
    with open("subset_maes.json", "w") as f:
        json.dump({"step": step, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
