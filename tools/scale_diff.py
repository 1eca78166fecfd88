"""Round-over-round regression gate for the sf0.1 -> sf1 scale probe.

SCALE.md (written by tools/sf1_scale.py) records, per query, the wall-clock
ratio between a 10x-replicated corpus and the base corpus. That ratio is the
scale signal: wall-clock moves +-15% with host load, but a query whose RATIO
grows round-over-round has a plan that got more super-linear — exactly the
class of regression BENCH_DIFF's absolute-seconds view cannot see.

This tool parses the ratio column out of two SCALE.md revisions (the
committed previous round vs the working tree) and writes SCALE_DIFF_r{N}.md:

- any row whose sf1/sf0.1 ratio grew by more than GROWTH_GATE (1.3x)
  round-over-round is flagged and MUST get a plan note before the round
  closes (mirrors BENCH_DIFF's >1.3x wall-clock discipline);
- new rows (queries that joined the probe suite) and removed rows are listed;
- exits 1 if any flagged row lacks an explanation entry in the NOTES dict
  below, so CI/driver runs fail loudly instead of silently accepting a
  scale regression.

Usage: python tools/scale_diff.py <round-number> [old-git-ref]
       (default old ref: the last commit that touched SCALE.md before HEAD's
        working-tree version, i.e. `git log -1 --format=%H -- SCALE.md`)
"""
from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

GROWTH_GATE = 1.3
FLOOR_SECONDS = 2.0

# Explanations for flagged rows. A row flagged by the gate must have an entry
# here (keyed by query name) or the tool exits 1. Keep these honest: each one
# should say why the ratio moved and why that is (or is not) a plan problem.
NOTES: dict[str, str] = {
    # r8 close flags (second same-day probe after waves 84/85 landed —
    # the ref is the morning's r8 SCALE.md, so these diff two probes an
    # hour apart; the bench calibration measured the host's scan side
    # 1.5x slower in the afternoon window, see BENCH_DIFF_r08.md):
    "bpe_encode_token_stats": (
        "re-probe min-of-2: 6.63s/7.92s -> 1.19x, matching the morning "
        "1.26 and the earlier 1.18 re-probe; the flagged 1.84 was a "
        "single-pass sample."
    ),
    "distinct_counts_by_flag": (
        "re-probe min-of-2: 0.83s/4.26s -> 5.1x. The small half sits on "
        "the sub-second scheduling floor, so the ratio swings 3.4-5.1 "
        "with denominator noise; the big half is stable (~4.2s) and "
        "sub-linear."
    ),
    "embedding_lsh_t80_prune_audit": (
        "re-probe min-of-2: 1.42s/11.55s -> 8.1x (flagged 12.4 was a "
        "single-pass sample). The big half moved ~8.6 -> 11.6s between "
        "the two same-day probes — in line with the measured afternoon "
        "scan-side host slowdown (bench calibration scan_post 0.140 -> "
        "0.211s); still below the 10x data ratio."
    ),
    "pq_encode_distortion": (
        "re-probe min-of-2: 2.30s/2.46s -> 1.07x, matching the morning "
        "0.79 floor band; the flagged 4.39 paired a fast small sample "
        "with a slow big one."
    ),
    "latest_event_per_user_type": (
        "re-probe min-of-2: 1.04s/1.98s -> 1.9x. Both halves inside the "
        "2s floor band (window-dedup over events, untouched plan); the "
        "flagged 3.48 paired floor-noise halves."
    ),
    "q7_volume_shipping": (
        "re-probe min-of-2: 1.89s/2.26s -> 1.2x, matching the r7 1.04 "
        "within the floor band; plan untouched since r1."
    ),
    # r8 flags: nineteen rows, ALL re-probed min-of-2 on the same 10x
    # corpus in one warm JVM (R8_NOTES.md). The pattern is uniform and it
    # is a DENOMINATOR effect: small-half (sf0.1) walls dropped 30-60%
    # round-over-round across untouched plan-stable queries (q21 2.67 ->
    # 0.92s, filtered_rate 2.52 -> 0.72s, spearman 7.83 -> 3.96s), while
    # every big-half min-of-2 wall sits AT OR BELOW its r7 value except
    # two mild band movers noted below. A faster denominator on a
    # floor-dominated 1-3s small half inflates the ratio without any
    # plan getting more super-linear; the scale signal (big-half wall)
    # is flat. Max ratio 8.1 on 10x data — every row still sub-linear.
    "customer_order_fanin": (
        "re-probe min-of-2: 1.91s/5.04s -> 2.64x. Big half 4.45 -> 5.04s "
        "(+13%, single-pass band); small half 2.92 -> 1.91s. Plan "
        "untouched since r1."
    ),
    "dq_lineitem_battery": (
        "re-probe min-of-2: 1.70s/5.56s -> 3.27x. Big half unchanged "
        "(5.90 -> 5.56s); small half 2.20 -> 1.70s. Plan untouched."
    ),
    "dup_cluster_canonical_docs": (
        "re-probe min-of-2: 11.05s/23.21s -> 2.1x (the flagged 2.8 paired "
        "a 31.8s single-pass big half). Big half 19.7 -> 23.2s (+18%) is "
        "the largest real big-side move this round — iterative closure, "
        "watch next round; still 2.1x on 10x data."
    ),
    "embedding_near_dup_pairs": (
        "BOUNDED DEMO (vec_id < 2048): both halves are the same "
        "fixed-cost floor; re-probe 5.09s/4.34s -> 0.85x. Ratio noise "
        "around 1.0 is expected — the big corpus contributes nothing "
        "beyond the cap."
    ),
    "filtered_rate_by_priority": (
        "re-probe min-of-2: 0.72s/5.72s -> 7.9x. Big half unchanged "
        "(6.07 -> 5.72s); the r7 small half was 2.52s vs 0.72-0.96s now — "
        "the entire ratio move is the faster denominator on a "
        "floor-dominated scan-agg. Plan untouched since r1."
    ),
    "median_price_by_priority": (
        "re-probe min-of-2: 0.81s/1.89s -> 2.3x. Both halves inside the "
        "2s scheduling floor; r7 walls 1.97/1.88s — small half sped up, "
        "big half unchanged."
    ),
    "minhash_lsh_candidate_pairs": (
        "QUERY CHANGED in r8: reshaped from the candidate-pair frame to "
        "the INVARIANT-BAND row (adds a shingle-set-fingerprint groupBy "
        "+ dup-pair anti-join for the recall claim). re-probe min-of-2 "
        "3.14s/6.02s -> 1.9x on 10x data — new baseline for the new "
        "shape, comfortably sub-linear."
    ),
    "near_dup_jaccard_pairs": (
        "re-probe min-of-2: 2.90s/14.29s -> 4.9x. Big half at its r7 "
        "value (15.04 -> 14.29s); small half 6.38 -> 2.90s. The inverted-"
        "index pair work is df-cap bounded; sum(df^2) growth tracks the "
        "corpus as before."
    ),
    "ppjoin_near_dup_pairs": (
        "re-probe min-of-2: 4.41s/19.35s -> 4.4x. Big half flat "
        "(30.5 -> 31.1s single-pass, 19.4s min-of-2 — the r7 number was "
        "a single sample); small half 9.2 -> 7.1s. Prefix-filter bound "
        "intact."
    ),
    "q10_returned_items": (
        "re-probe min-of-2: 0.58s/1.10s -> 1.9x. Both halves floor-"
        "dominated (<2.5s); r7 walls 2.47/2.03s — uniform small-side "
        "speedup, big half unchanged."
    ),
    "q18_large_volume_customers": (
        "re-probe min-of-2: 0.86s/4.50s -> 5.2x. Big half unchanged "
        "(4.99 -> 4.50s); small half 2.09 -> 0.86s. Plan untouched "
        "since r1."
    ),
    "q21_blocked_suppliers": (
        "re-probe min-of-2: 0.92s/4.87s -> 5.3x. Big half unchanged "
        "(5.34 -> 4.87s); small half 2.67 -> 0.92s. Plan untouched "
        "since r1."
    ),
    "q5_revenue_by_nation": (
        "re-probe min-of-2: 0.90s/1.05s -> 1.2x — matches the r7 1.3x; "
        "the flagged 1.91 paired a fast small half with a slow big "
        "sample. Floor-dominated both halves."
    ),
    "q8_market_share": (
        "re-probe min-of-2: 0.98s/1.60s -> 1.6x. Floor-dominated; r7 "
        "walls 2.91/2.42s — both halves sped up, small more."
    ),
    "q9_profit_by_nation_year": (
        "re-probe min-of-2: 0.89s/1.48s -> 1.7x. Same floor story; big "
        "half 3.52 -> 1.48s is FASTER than r7."
    ),
    "running_event_count": (
        "re-probe min-of-2: 0.33s/1.77s -> 5.4x. Both halves under 2.1s "
        "(cumulative window over events); big half unchanged "
        "(2.04 -> 1.77-2.09s), small 0.95 -> 0.33s."
    ),
    "semantic_near_dup_pairs": (
        "BOUNDED DEMO (vec_id < 2048): fixed-cost floor both halves; "
        "re-probe 4.80s/4.17s -> 0.87x, same as r7's 0.78 within noise."
    ),
    "spearman_quantity_price": (
        "re-probe min-of-2: 3.96s/32.06s -> 8.1x — the highest ratio in "
        "the table but the big half is BELOW r7 (33.9 -> 32.1s); the "
        "move is the small half (7.83 -> 3.96s). Rank correlation "
        "double-sorts 6M rows at sf1; 8.1x on 10x data stays "
        "sub-linear."
    ),
    "user_session_stats": (
        "re-probe min-of-2: 1.40s/3.96s -> 2.8x. Big half 2.95 -> 3.42s "
        "(+16%, band); small half 1.54 -> 0.93s. Session windowing over "
        "events, per-user partitions."
    ),
    # r6 flags, both resolved by a targeted min-of-3 warm re-probe on a
    # fresh 10x corpus (R6_NOTES.md): the ratio moved because ONE HALF of a
    # single-sample probe caught a cold/GC outlier, not because a plan
    # changed — no code touching either query changed between the probes.
    "semantic_near_dup_k_scaled": (
        "re-probe: small 2.18s / big 5.36s warm -> ratio ~2.5 reproducible "
        "(the prior 1.83 was the optimistic single sample; the 11.0s big "
        "half was a cold outlier). 2.5x on 10x data — sub-linear, k-scaling "
        "contract intact."
    ),
    "blocking_recall_audit": (
        "re-probe: small 6.78s / big 2.40s -> ratio ~0.35, matching the "
        "prior 0.33; the flagged 0.44 paired a slow small half with a slow "
        "big half. Strongly SUB-linear either way (df-cap gates prune "
        "harder at sf1)."
    ),
    # r7 flags. Nine of ten resolved by a targeted min-of-2 idle-host
    # re-probe on a fresh 10x corpus (/tmp/reprobe_r7.log, recorded in
    # R7_NOTES.md): the single-pass suite ratios paired optimistic small
    # halves (the preloading daemon + warm caches sped the sf0.1 side)
    # with pessimistic big halves. The tenth (als) is a REAL query change.
    "als_brand_recs": (
        "QUERY CHANGED in r7: promoted from factor-similarity rows to the "
        "invariant-band form (ALS fit + full user x brand grid scoring for "
        "the observed-vs-unobserved preference gap). The grid is 25 x "
        "users, so scoring grows linearly with users; min-of-2 re-probe "
        "9.5s/55.0s -> 5.8x on 10x data — sub-linear, new baseline for "
        "the new shape."
    ),
    "containment_dup_pairs": (
        "re-probe min-of-2: 3.98s/13.70s -> 3.4x, at the r6 baseline "
        "(2.76-3.4 band); the flagged 5.66 was a single-pass artifact."
    ),
    "dedup_capture_recapture": (
        "re-probe min-of-2: 7.59s/23.47s -> 3.1x, within the r6 2.83 "
        "band; single-pass artifact."
    ),
    "er_blocking_part_pairs": (
        "re-probe min-of-2: 5.00s/15.02s -> 3.0x, at the r6 3.11 "
        "baseline; the flagged 5.81 was a single-pass artifact."
    ),
    "item_item_cosine_recs": (
        "re-probe min-of-2: 3.75s/19.57s -> 5.22x, EXACTLY the r6 ratio; "
        "the flagged 6.97 was a single-pass artifact. Sub-linear (dense "
        "co-occurrence join tracks distinct (cust, brand) cells)."
    ),
    "ivf_pq_ann_topk_vec0": (
        "re-probe min-of-2: 3.39s/3.06s -> 0.9x — both halves sit on the "
        "2-4s analysis/scheduling floor; ratio noise at this magnitude, "
        "not a plan change (plan untouched in r7 bar the shared session "
        "conf)."
    ),
    "minhash_estimate_error_audit": (
        "re-probe min-of-2: 4.72s/17.94s -> 3.8x, below the r6 4.68; "
        "single-pass artifact."
    ),
    "pq_adc_topk_vec0": (
        "re-probe min-of-2: 2.75s/2.87s -> 1.05x — floor-bound both "
        "halves, same story as ivf_pq_ann_topk_vec0."
    ),
    "q3_unshipped_revenue_topk": (
        "re-probe min-of-2: 1.13s/3.88s -> floor-dominated small half "
        "(1-2s) makes this ratio swing 1.5-3.4 across probes; big-half "
        "wall clock is stable (~4-4.6s) and linear-ish. Not a plan "
        "change (query untouched since r1)."
    ),
    "sorted_neighborhood_pairs": (
        "re-probe min-of-2: 1.19s/3.68s -> 3.1x, at the r6 3.0 baseline; "
        "single-pass artifact."
    ),
}

ROW_RE = re.compile(r"^\|\s*([a-z0-9_]+)\s*\|\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|\s*$")


def parse_ratios(text: str) -> dict[str, tuple[float, float, float]]:
    out: dict[str, tuple[float, float, float]] = {}
    for line in text.splitlines():
        m = ROW_RE.match(line.strip())
        if m:
            out[m.group(1)] = (float(m.group(2)), float(m.group(3)), float(m.group(4)))
    return out


def main() -> int:
    here = Path(__file__).resolve().parent.parent
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    if len(sys.argv) > 2:
        ref = sys.argv[2]
    else:
        ref = subprocess.check_output(
            ["git", "log", "-1", "--format=%H", "--", "SCALE.md"], cwd=here, text=True
        ).strip()
    old_text = subprocess.check_output(["git", "show", f"{ref}:SCALE.md"], cwd=here, text=True)
    new_text = (here / "SCALE.md").read_text()

    old = parse_ratios(old_text)
    new = parse_ratios(new_text)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    rows = []
    flagged = []
    for q in common:
        o, n = old[q][2], new[q][2]
        growth = n / o if o else float("inf")
        rows.append((q, o, n, growth))
        # Gate on ratio growth; exempt rows whose sf1 wall-clock is under
        # FLOOR_SECONDS in both revisions — those sit on the documented
        # ~0.5-1s per-query JVM scheduling floor, where a 0.2s wobble can
        # double the ratio without any plan change.
        old_sf1, new_sf1 = old[q][1], new[q][1]
        if growth > GROWTH_GATE and max(old_sf1, new_sf1) >= FLOOR_SECONDS:
            flagged.append((q, o, n, growth))
    rows.sort(key=lambda r: -r[3])

    lines = [
        f"# SCALE_DIFF — round {rnd}",
        "",
        f"Ratio-column diff of SCALE.md (sf1/sf0.1 wall-clock ratio per query)",
        f"vs the committed previous revision (`{ref[:12]}`). The ratio is",
        "host-load-insensitive: both scales run back-to-back on the same host,",
        "so a growing ratio means the plan got MORE super-linear — the scale",
        f"regression signal. Gate: growth > {GROWTH_GATE}x on any row whose",
        f"sf1 wall-clock clears the {FLOOR_SECONDS}s scheduling-floor noise band.",
        "",
        f"Common rows: {len(common)}; added: {len(added)}; removed: {len(removed)}.",
        "",
        "## Flagged rows (ratio grew > 1.3x round-over-round)",
        "",
    ]
    if not flagged:
        lines.append("None. No query's scaling behavior regressed this round.")
    else:
        lines.append("| query | old ratio | new ratio | growth | note |")
        lines.append("|---|---|---|---|---|")
        missing = []
        for q, o, n, g in flagged:
            note = NOTES.get(q)
            if note is None:
                missing.append(q)
                note = "**UNEXPLAINED — add a plan note to tools/scale_diff.py NOTES**"
            lines.append(f"| {q} | {o} | {n} | {g:.2f}x | {note} |")
    lines += ["", "## Biggest movers (top 10 by growth, informational)", ""]
    lines.append("| query | old ratio | new ratio | growth |")
    lines.append("|---|---|---|---|")
    for q, o, n, g in rows[:10]:
        lines.append(f"| {q} | {o} | {n} | {g:.2f}x |")
    lines += ["", "## Biggest improvements (top 5 by shrink)", ""]
    lines.append("| query | old ratio | new ratio | shrink |")
    lines.append("|---|---|---|---|")
    for q, o, n, g in sorted(rows, key=lambda r: r[3])[:5]:
        lines.append(f"| {q} | {o} | {n} | {g:.2f}x |")
    if added:
        lines += ["", "## Rows added to the probe suite", ""]
        for q in added:
            lines.append(f"- `{q}` (ratio {new[q][2]})")
    if removed:
        lines += ["", "## Rows removed from the probe suite", ""]
        for q in removed:
            lines.append(f"- `{q}` (was ratio {old[q][2]})")
    lines.append("")

    out_path = here / f"SCALE_DIFF_r{rnd:02d}.md"
    out_path.write_text("\n".join(lines))
    print(f"wrote {out_path}")
    unexplained = [q for q, *_ in flagged if q not in NOTES]
    if unexplained:
        print(f"UNEXPLAINED scale regressions: {unexplained}", file=sys.stderr)
        return 1
    print(f"flagged={len(flagged)} (all explained)" if flagged else "no scale regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
