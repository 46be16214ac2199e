#!/usr/bin/env python
"""Convert an EXPORTED model npz (inference layout, keys 'p/...') into a
warm-start CHECKPOINT npz (trainer layout: 'params/...' + 'ema/...').

Needed after the 08-19 sandbox restart wiped uncommitted ckpt-*.npz
files: the committed exported models carry the final EMA weights, which
is exactly the state the f32 re-adaptation runs fine-tune from
(ROUND4.md ablation E).  No optimizer state / step is written, so the
run restores fresh Adam moments with the schedule restarted — the same
semantics ablation E used (reset_global_step=true, fresh opt).

Usage: export_to_ckpt.py exported.npz out_ckpt.npz
"""
import sys

import numpy as np


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    with np.load(src, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files if k.startswith("p/")}
    if not flat:
        raise SystemExit(f"{src}: no 'p/...' keys — not an exported model")
    out = {}
    for k, v in flat.items():
        rest = k[len("p/"):]
        out["params/" + rest] = v
        out["ema/" + rest] = v
    out["step"] = np.asarray(0, np.int64)
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(flat)} tensors -> params+ema, step=0")


if __name__ == "__main__":
    main()
