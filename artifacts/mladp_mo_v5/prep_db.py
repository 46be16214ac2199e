"""Build the group-upweighted snap-Mo db for mladp_mo_v5.

VERDICT-r4 item 7's data-distribution hypothesis: the ML-ADP Mo
vacancy blind spot (E_v 5.06 vs DFT 2.51 eV) points at the training
distribution, not the descriptor. Upweight the structure groups that
carry defect/elastic physics in the per-structure label weights
([energy, forces, stress] columns, consumed by the trainer as
sample weights — train/trainer.py:291):

  Mo.Vacancy  x5  (n=24 of 284 — the blind-spot group)
  Mo.Elastic  x3  (n=67 — strain physics)

Split contract unchanged: the Dataset split hashes ids, not weights.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
from tensoralloy_tpu.io.sqlite import CoreDatabase

GROUP_W = {"Mo.Vacancy": 5.0, "Mo.Elastic": 3.0}

src = CoreDatabase("/root/repo/artifacts/snap_mo_refsf_cpu/snap-Mo.db")
dst = CoreDatabase("/root/repo/artifacts/mladp_mo_v5/snap-Mo-gw.db")
counts = {}
out = []
for s in src:
    group = ".".join(str(s.info.get("source", "")).split(".")[:-1])
    w = GROUP_W.get(group, 1.0)
    s.info["weights"] = np.array([w, w, 1.0])
    counts[group] = counts.get(group, 0) + 1
    out.append(s)
dst.write_many(out)
print("groups:", counts)
