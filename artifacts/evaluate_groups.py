"""Per-group train/test MAEs for a finished (or in-flight) run dir.

Thin shim over the package implementation — the logic was promoted to
`tensoralloy_tpu.train.evaluation.evaluate_run` (also the CLI verb
`python -m tensoralloy_tpu.cli evaluate <workdir>`) so the round-4
eval discipline (exact-f32 lowering, `Dataset.split_indices` as THE
split contract, per-source-group breakdown) is a tested first-class
surface rather than a side script. Kept because the round-4 queue
scripts and RESULTS docs reference this path.

Usage: python evaluate_groups.py [workdir] -> group_maes.json
"""
import sys

sys.path.insert(0, '/root/repo')

from tensoralloy_tpu.train.evaluation import evaluate_run  # noqa: E402


def main(workdir: str = ".") -> dict:
    return evaluate_run(workdir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
