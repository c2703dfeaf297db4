"""Compare sweep results side by side — the analysis half of the
reference's merge_results.sh (which concatenates result CSVs for offline
comparison).

    python -m qmann_tpu.bench.compare runs/sweep_m2_iwl0 runs/sweep_m3_iwl0

Reads each directory's summary.json (written by qmann_tpu.bench.sweep),
prints a per-task markdown table plus means, and exits 0.  Labels default
to the directory names.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def load_summary(path: str):
    with open(os.path.join(path, "summary.json")) as f:
        rows = json.load(f)
    return {(r["iwl"], r["task"]): r["err_test_avg"] for r in rows}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qmann_tpu.bench.compare")
    p.add_argument("dirs", nargs="+", help="sweep output directories")
    p.add_argument("--labels", default=None,
                   help="comma list overriding the column labels")
    args = p.parse_args(argv)

    labels = (args.labels.split(",") if args.labels
              else [os.path.basename(os.path.normpath(d)) for d in args.dirs])
    if len(labels) != len(args.dirs):
        p.error(f"--labels names {len(labels)} columns but "
                f"{len(args.dirs)} directories were given")
    results = [load_summary(d) for d in args.dirs]
    keys = sorted(set().union(*results))
    common = sorted(set(results[0]).intersection(*results[1:]))

    print("| iwl | task | " + " | ".join(labels) + " |")
    print("|---|---|" + "---|" * len(labels))
    for key in keys:
        cells = [f"{r[key]:.3f}" if key in r else "—" for r in results]
        print(f"| {key[0]} | {key[1]} | " + " | ".join(cells) + " |")
    # means are comparable only over tasks every column covers
    means = []
    for r in results:
        if common:
            means.append(f"{sum(r[k] for k in common) / len(common):.4f}")
        else:
            means.append("—")
    print(f"| | mean (n={len(common)} common) | " + " | ".join(means) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
