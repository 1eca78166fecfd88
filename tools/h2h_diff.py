#!/usr/bin/env python3
"""Diff the per-query spark/duckdb ratio maps across head-to-head rounds.

r8 verdict "What's wrong" #1: the serial ratio drifted 0.83 (r6) -> 0.89
(r7) -> 1.00 (r8) with no per-query attribution. This tool reads every
BENCH_HEADTOHEAD_r*.json, computes per-query ratio = spark_s / duckdb_s,
and reports for the newest round vs a chosen base round:

- the engine-level totals and (r9+) the calib block, so host drift can
  be divided out per engine before any per-query story is told;
- the top-N ratio movers with their raw spark/duck times side by side,
  classified by which side moved (spark_slower, duck_faster, both,
  mix_shift for queries present in only one round).

Usage: python tools/h2h_diff.py [base_round] [top_n]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load() -> dict[int, dict]:
    out = {}
    for f in sorted(glob.glob(os.path.join(REPO, "BENCH_HEADTOHEAD_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        out[rnd] = json.load(open(f))
    return out


def main() -> None:
    rounds = load()
    if len(rounds) < 2:
        raise SystemExit("need at least two BENCH_HEADTOHEAD_r*.json files")
    newest = max(rounds)
    base = int(sys.argv[1]) if len(sys.argv) > 1 else sorted(rounds)[-2]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    a, b = rounds[base], rounds[newest]

    print(f"== engine totals (r{base} -> r{newest}) ==")
    for k in ("spark_total_s", "duckdb_total_s", "spark_batched_s", "duckdb_batched_s"):
        va, vb = a.get(k), b.get(k)
        print(f"{k:18s} {va:>8} -> {vb:>8}  ({round(vb / va, 3) if va else '-'}x)")
    sa = a["spark_total_s"] / a["duckdb_total_s"]
    sb = b["spark_total_s"] / b["duckdb_total_s"]
    print(f"serial ratio       {sa:.3f} -> {sb:.3f}")
    print(
        f"batched ratio      {a['spark_batched_s'] / a['duckdb_batched_s']:.3f}"
        f" -> {b['spark_batched_s'] / b['duckdb_batched_s']:.3f}"
    )
    for rnd, d in ((base, a), (newest, b)):
        if "calib" in d:
            print(f"calib r{rnd}: {json.dumps(d['calib'])}")

    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    # mix shift: how much of the total delta is registry composition
    mix_a = sum(qa[n]["spark"] for n in only_a), sum(qa[n]["duckdb"] for n in only_a)
    mix_b = sum(qb[n]["spark"] for n in only_b), sum(qb[n]["duckdb"] for n in only_b)
    print(
        f"\n== registry mix ==\ncommon {len(common)}; only-r{base} {len(only_a)} "
        f"(spark {mix_a[0]:.1f}s duck {mix_a[1]:.1f}s); only-r{newest} {len(only_b)} "
        f"(spark {mix_b[0]:.1f}s duck {mix_b[1]:.1f}s)"
    )
    common_tot_a = (
        sum(qa[n]["spark"] for n in common),
        sum(qa[n]["duckdb"] for n in common),
    )
    common_tot_b = (
        sum(qb[n]["spark"] for n in common),
        sum(qb[n]["duckdb"] for n in common),
    )
    print(
        f"common-set totals: spark {common_tot_a[0]:.1f} -> {common_tot_b[0]:.1f}s "
        f"({common_tot_b[0] / common_tot_a[0]:.3f}x), "
        f"duck {common_tot_a[1]:.1f} -> {common_tot_b[1]:.1f}s "
        f"({common_tot_b[1] / common_tot_a[1]:.3f}x); "
        f"common serial ratio {common_tot_a[0] / common_tot_a[1]:.3f} -> "
        f"{common_tot_b[0] / common_tot_b[1]:.3f}"
    )

    movers = []
    for n in common:
        ra = qa[n]["spark"] / max(qa[n]["duckdb"], 1e-4)
        rb = qb[n]["spark"] / max(qb[n]["duckdb"], 1e-4)
        # weight by absolute contribution to the spark total so floor-
        # noise ratio swings on 0.3 s queries don't crowd out real ones
        weight = abs(qb[n]["spark"] - qa[n]["spark"]) + abs(
            qb[n]["duckdb"] - qa[n]["duckdb"]
        )
        movers.append((weight, rb / ra if ra else 0.0, n, qa[n], qb[n]))
    movers.sort(reverse=True)
    print(f"\n== top {top_n} movers by absolute time delta (r{base} -> r{newest}) ==")
    print(f"{'query':42s} {'spark':>13s} {'duck':>13s} {'ratio':>13s} cause")
    for w, rr, n, va, vb in movers[:top_n]:
        ra = va["spark"] / max(va["duckdb"], 1e-4)
        rb = vb["spark"] / max(vb["duckdb"], 1e-4)
        ds = vb["spark"] / max(va["spark"], 1e-4)
        dd = vb["duckdb"] / max(va["duckdb"], 1e-4)
        cause = (
            "spark_slower" if ds > 1.2 and dd <= 1.2
            else "duck_faster" if dd < 0.8 and ds >= 0.8
            else "duck_slower" if dd > 1.2 and ds <= 1.2
            else "spark_faster" if ds < 0.8 and dd >= 0.8
            else "both/host"
        )
        print(
            f"{n:42s} {va['spark']:5.2f}->{vb['spark']:5.2f} "
            f"{va['duckdb']:5.2f}->{vb['duckdb']:5.2f} "
            f"{ra:5.2f}->{rb:5.2f}  {cause}"
        )


if __name__ == "__main__":
    main()
