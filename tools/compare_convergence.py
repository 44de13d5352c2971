#!/usr/bin/env python
"""Tabulate paired training-run convergence from trainer logs.

Parses the `[epoch: E, iter: N, R it/s] l_pix: ...` progress lines and the
`# Validation # PSNR: ...` lines of two (or more) experiment logs and
prints aligned loss / val-PSNR columns — the round-4 bf16-vs-f32 evidence
table (VERDICT round-3 item 4).

    python tools/compare_convergence.py experiments/bf16_arm.log \
        experiments/f32_arm.log --to 8000
"""
import argparse
import re

ITER_RE = re.compile(
    r"iter:\s*([\d,]+),\s*([\d.]+) it/s\]\s*(.*)")
LOSS_RE = re.compile(r"(l_\w+):\s*([\d.eE+-]+)")
VAL_RE = re.compile(r"# Validation # PSNR: (\d+(?:\.\d+)?)")


def parse(path):
    losses, vals, rates = {}, {}, []
    last_iter = 0
    for line in open(path, errors="replace"):
        m = ITER_RE.search(line)
        if m:
            it = int(m.group(1).replace(",", ""))
            last_iter = it
            rates.append(float(m.group(2)))
            losses[it] = dict(LOSS_RE.findall(m.group(3)))
            continue
        v = VAL_RE.search(line)
        if v:
            vals[last_iter] = float(v.group(1))
    return losses, vals, rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--to", type=int, default=None,
                    help="compare up to this iteration")
    ap.add_argument("--key", default="l_pix")
    args = ap.parse_args()

    parsed = [parse(p) for p in args.logs]
    names = [p.split("/")[-1].replace(".log", "") for p in args.logs]

    its = sorted(set().union(*(set(l[0]) for l in parsed)))
    if args.to:
        its = [i for i in its if i <= args.to]
    print(f"{'iter':>8}  " + "  ".join(f"{n:>14}" for n in names)
          + "   (" + args.key + ")")
    for it in its:
        row = []
        for losses, _, _ in parsed:
            v = losses.get(it, {}).get(args.key)
            row.append(f"{float(v):14.5f}" if v else " " * 14)
        print(f"{it:8d}  " + "  ".join(row))

    print("\nval PSNR:")
    vits = sorted(set().union(*(set(l[1]) for l in parsed)))
    if args.to:
        vits = [i for i in vits if i <= args.to]
    print(f"{'iter':>8}  " + "  ".join(f"{n:>14}" for n in names))
    for it in vits:
        row = []
        for _, vals, _ in parsed:
            v = vals.get(it)
            row.append(f"{v:14.4f}" if v is not None else " " * 14)
        print(f"{it:8d}  " + "  ".join(row))

    for n, (_, _, rates) in zip(names, parsed):
        if rates:
            import statistics
            print(f"\n{n}: median {statistics.median(rates):.2f} it/s over "
                  f"{len(rates)} windows (max {max(rates):.2f})")


if __name__ == "__main__":
    main()
