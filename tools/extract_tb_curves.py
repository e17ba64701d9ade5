"""Dump TensorBoard scalar curves from a training run dir to CSV.

Used to record the long-horizon convergence evidence (the reference's
de-facto integration test is full training runs; here the synthetic
convergence runs stand in — see configs/train_synthetic_convergence.yaml).
The CSV (tag, step, value rows) is small enough to commit next to
ROUND_NOTES.md so the curves are reviewable without TB.

Usage:
  python tools/extract_tb_curves.py out/convergence_s1 [--out curves.csv]
  python tools/extract_tb_curves.py out/convergence_s1 --summary
"""

import argparse
import csv
import os
import sys


def load_scalars(run_dir: str):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    tb_dir = os.path.join(run_dir, "tb")
    if not os.path.isdir(tb_dir):
        tb_dir = run_dir
    acc = EventAccumulator(tb_dir, size_guidance={"scalars": 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags()["scalars"]:
        out[tag] = [(ev.step, ev.value) for ev in acc.Scalars(tag)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None, help="CSV path (default: stdout)")
    ap.add_argument(
        "--summary",
        action="store_true",
        help="print first/best/last per tag instead of full curves",
    )
    args = ap.parse_args()

    scalars = load_scalars(args.run_dir)
    if not scalars:
        print(f"no scalars found under {args.run_dir}", file=sys.stderr)
        return 1

    if args.summary:
        w = max(len(t) for t in scalars)
        print(f"{'tag':<{w}}  n      first        best        last")
        for tag in sorted(scalars):
            vals = [v for _, v in scalars[tag]]
            lo, hi = min(vals), max(vals)
            # "best" direction is tag-dependent; print the extreme nearer the last value
            best = lo if abs(vals[-1] - lo) <= abs(vals[-1] - hi) else hi
            print(f"{tag:<{w}}  {len(vals):<5d}  {vals[0]:<11.5g} {best:<11.5g} {vals[-1]:<11.5g}")
        return 0

    rows = [
        (tag, step, value)
        for tag in sorted(scalars)
        for step, value in scalars[tag]
    ]
    f = open(args.out, "w", newline="") if args.out else sys.stdout
    try:
        wr = csv.writer(f)
        wr.writerow(["tag", "step", "value"])
        wr.writerows(rows)
    finally:
        if args.out:
            f.close()
            print(f"wrote {len(rows)} rows to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
