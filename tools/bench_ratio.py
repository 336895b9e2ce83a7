#!/usr/bin/env python3
"""Compare a bench record against the rolling per-dim reference.

Usage: python3 tools/bench_ratio.py BENCH_DETAIL_rN.json [BENCH_REF.json]

BENCH_REF.json holds per-dim MEDIANS over the previous round's committed
same-session windows (round-17 verdict #5) — comparing a new record
against medians instead of a single prior window ends the per-round
single-window host-smear adjudication ritual. Prints a summary (median /
p90 ratio, counts) and the dims whose ratio exceeds 2x in either
direction, ready to paste into PLANS.md.
"""
import json
import statistics
import sys


def main() -> None:
    rec_path = sys.argv[1]
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_REF.json"
    rec = json.load(open(rec_path))
    ref = json.load(open(ref_path))
    rq, fq = rec["queries"], ref["queries"]
    ratios = {}
    for name, sec in sorted(rq.items()):
        base = fq.get(name)
        if base and base > 0 and sec is not None and sec >= 0:
            ratios[name] = sec / base
    vals = sorted(ratios.values())
    new_dims = sorted(set(rq) - set(fq))
    gone_dims = sorted(set(fq) - set(rq))
    print(f"record: {rec_path}  dims={len(rq)}  compared={len(ratios)}")
    print(f"ref:    {ref_path}  (medians over {ref.get('n_windows', '?')} "
          f"round-{ref.get('round', '?')} windows)")
    print(f"median ratio {statistics.median(vals):.3f}   "
          f"p90 {vals[int(0.9 * (len(vals) - 1))]:.3f}   "
          f"within 2x: {sum(1 for v in vals if 0.5 <= v <= 2.0)}/{len(vals)}")
    if new_dims:
        print(f"new dims (no reference yet): {', '.join(new_dims)}")
    if gone_dims:
        print(f"reference dims absent from record: {', '.join(gone_dims)}")
    outliers = {n: r for n, r in ratios.items() if r > 2.0 or r < 0.5}
    if outliers:
        print("\n| dim | ref median s | record s | ratio |")
        print("|---|---|---|---|")
        for n, r in sorted(outliers.items(), key=lambda kv: -kv[1]):
            print(f"| {n} | {fq[n]:.3f} | {rq[n]:.3f} | x{r:.2f} |")


if __name__ == "__main__":
    main()
