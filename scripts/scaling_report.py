#!/usr/bin/env python3
"""Generate SCALING.md from two BENCH_DETAIL.json runs at different SFs.

Usage:
    python3 scripts/scaling_report.py <detail_small.json> <detail_big.json> \
        <sf_small_label> <sf_big_label> <data_factor>

The data factor is the row-count multiplier between the two runs (10 for
sf0.1 -> sf1 via graft.GenScale). A query scaling linearly in data volume
on a fixed-core host shows time ratio <= data factor; ratios well below the
factor mean the query is bounded by a fixed-size structure (dims, buckets,
cells) rather than the corpus — the shapes that survive 100 TB. Ratios
meaningfully ABOVE the factor flag super-linear work and are listed first.
"""
import json
import sys
from collections import defaultdict


def family(name: str) -> str:
    return "".join(c for c in name.split("_")[0] if c.isalpha())


def main() -> None:
    small_p, big_p, lbl_s, lbl_b, factor = sys.argv[1:6]
    factor = float(factor)
    small = json.load(open(small_p))
    big = json.load(open(big_p))
    qs = small["queries"]
    qb = big["queries"]
    names = sorted(set(qs) & set(qb))

    rows = []
    for n in names:
        a, b = qs[n]["min"], qb[n]["min"]
        # sub-50ms at the small SF is timer noise; ratios there are meaningless
        ratio = (b / a) if a >= 0.05 else None
        rows.append((n, a, b, ratio))

    fam_small = defaultdict(float)
    fam_big = defaultdict(float)
    for n, a, b, _ in rows:
        fam_small[family(n)] += a
        fam_big[family(n)] += b

    tot_s = sum(a for _, a, _, _ in rows)
    tot_b = sum(b for _, _, b, _ in rows)

    print(f"# SCALING — measured {lbl_s} → {lbl_b} ({factor:g}× rows, same host, local[32])")
    print()
    print(f"Data: `graft.GenScale` multiplies the driver corpus {factor:g}× as")
    print("DISJOINT ingest shards (keys offset per copy, text Caesar-shifted,")
    print("embeddings rotated — see GenScale.scala's scaladoc), so every workload")
    print("family faces 10× the rows without accidental cross-copy quadratic")
    print("blowup — the shape a real multi-source corpus has. Both runs:")
    print("min-of-2 reps per query, 32 shuffle partitions, same JVM settings.")
    print()
    print(f"**Total: {tot_s:.1f}s → {tot_b:.1f}s = {tot_b/tot_s:.2f}× wall for {factor:g}× data**")
    print("on a fixed 32-thread host. Sub-linear totals mean the suite is")
    print("dominated by per-row scan work that the fixed cores absorb plus")
    print("fixed-size structures (dims, LSH cells, sketch states) that do not")
    print("grow with the corpus; at 1000 executors the per-row work spreads")
    print("while the fixed structures stay fixed.")
    print()
    print("## Per-family wall clock")
    print()
    print(f"| family | {lbl_s} (s) | {lbl_b} (s) | ratio | verdict at {factor:g}× |")
    print("|---|---|---|---|---|")
    for f in sorted(fam_small):
        a, b = fam_small[f], fam_big[f]
        r = b / a if a > 0 else float("nan")
        verdict = ("sub-linear" if r <= factor * 0.8
                   else "~linear" if r <= factor * 1.25 else "SUPER-LINEAR")
        print(f"| {f} | {a:.2f} | {b:.2f} | {r:.2f}× | {verdict} |")
    print()

    graded = [(n, a, b, r) for n, a, b, r in rows if r is not None]
    hot = sorted(graded, key=lambda t: -t[3])[:15]
    print(f"## Steepest per-query ratios (eligible: {lbl_s} min ≥ 50 ms)")
    print()
    print(f"| query | {lbl_s} (s) | {lbl_b} (s) | ratio |")
    print("|---|---|---|---|")
    for n, a, b, r in hot:
        print(f"| {n} | {a:.3f} | {b:.3f} | {r:.2f}× |")
    print()
    flat = sorted(graded, key=lambda t: t[3])[:10]
    print("## Flattest (fixed-structure-bound) queries")
    print()
    print(f"| query | {lbl_s} (s) | {lbl_b} (s) | ratio |")
    print("|---|---|---|---|")
    for n, a, b, r in flat:
        print(f"| {n} | {a:.3f} | {b:.3f} | {r:.2f}× |")


if __name__ == "__main__":
    main()
