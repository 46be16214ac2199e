#!/usr/bin/env python
"""Per-structure energy rMAE for a run dir (Ong's SNAP metric).

The ml-eam paper measures energies with the relative MAE
(`/root/reference/doc/papers/ml-eam/manuscript.tex:905-915`, citing
the SNAP papers):

    rMAE = (1/N) sum_i | (E_i - E_i^dft)/N_i  -  (E_eq - E_eq^dft)/N_eq |

i.e. the per-atom energy error with the EQUILIBRIUM structure's error
subtracted — a constant per-atom offset between the model's and DFT's
cohesive-energy zero does not count.  Our `evaluate` verb reports the
plain MAE; this script reports both, using the dataset's lowest
DFT-energy-per-atom structure as the equilibrium reference (the SNAP
sets contain the relaxed ground state).

Usage: compute_rmae.py <run_dir> [--ckpt path]
"""
import argparse
import glob
import json
import os
import re
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()
    ckpt = os.path.abspath(args.ckpt) if args.ckpt else None
    os.chdir(args.workdir)
    sys.path.insert(0, "/root/repo")

    import jax
    from tensoralloy_tpu.train.manager import TrainingManager

    mgr = TrainingManager("input.toml")
    ds = mgr.dataset
    feats, labels = ds.build()
    tf_, tl_, ef_, el_ = ds.split(feats, labels)
    train_idx, test_idx = ds.split_indices(len(labels["energy"]))

    if ckpt is None:
        cands = sorted(
            (p for p in glob.glob(os.path.join(mgr.model_dir,
                                               "ckpt-*.npz"))
             if re.search(r"ckpt-(\d+)\.npz$", p)),
            key=lambda p: int(p.split("-")[-1].split(".")[0]))
        ckpt = cands[-1]
    tmpl = mgr.model.init_params(jax.random.PRNGKey(0))
    params, ema, step = mgr.trainer.load_checkpoint(ckpt, tmpl)

    def per_atom_errors(sf, sl):
        n = len(sl["energy"])
        errs = np.zeros(n)
        natoms = np.asarray(sl["n_atoms"], float)
        bs = 16
        for lo in range(0, n, bs):
            sel = slice(lo, min(lo + bs, n))
            fb = {k: v[sel] for k, v in sf.items()}
            pred = mgr.trainer.batched_predictions(ema, fb)
            e = np.asarray(pred["energy"], float)
            errs[sel.start:sel.stop] = \
                (e - np.asarray(sl["energy"][sel], float)) \
                / natoms[sel]
        return errs, natoms

    err_tr, na_tr = per_atom_errors(tf_, tl_)
    err_te, na_te = per_atom_errors(ef_, el_)

    # equilibrium reference: lowest DFT energy/atom across the dataset
    epa_tr = np.asarray(tl_["energy"], float) / na_tr
    epa_te = np.asarray(el_["energy"], float) / na_te
    allepa = np.concatenate([epa_tr, epa_te])
    allerr = np.concatenate([err_tr, err_te])
    k = int(np.argmin(allepa))
    e_eq = allerr[k]
    where = "train" if k < len(epa_tr) else "test"

    out = {
        "step": int(step), "checkpoint": ckpt,
        "eq_ref": {"split": where, "dft_e_per_atom": float(allepa[k]),
                   "model_minus_dft_meV_per_atom": 1000 * float(e_eq)},
        "test": {"mae_meV_per_atom": 1000 * float(np.abs(err_te).mean()),
                 "rmae_meV_per_atom":
                     1000 * float(np.abs(err_te - e_eq).mean())},
        "train": {"mae_meV_per_atom": 1000 * float(np.abs(err_tr).mean()),
                  "rmae_meV_per_atom":
                      1000 * float(np.abs(err_tr - e_eq).mean())},
        "overall": {"mae_meV_per_atom":
                        1000 * float(np.abs(allerr).mean()),
                    "rmae_meV_per_atom":
                        1000 * float(np.abs(allerr - e_eq).mean())},
    }
    print(json.dumps(out, indent=1))
    with open("rmae.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
