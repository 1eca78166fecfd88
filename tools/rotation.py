#!/usr/bin/env python3
"""Cut the next driver-rotation window (r8 verdict items 1 + 6).

The external driver hash-verifies the FIRST 50 registered queries each
round; plans/rotation_history.json declares that window and
plans/registry.py orders registration from its highest-numbered entry.

Selection rule (in priority order, mechanical — this tool IS the rule):
  1. the flagship anchor (``entry()`` runs it; always slot 0);
  2. every oracled query NEVER hash-verified in any CORRECTNESS_r*.json
     (burndown debt — zero since r8, but any new wave lands here first),
     name-sorted;
  3. re-verification lap: remaining slots go to the STALEST-verified
     names, ordered by (last-verified round ASC, name ASC), so external
     verification age shrinks monotonically across rounds.

Usage:
    python tools/rotation.py <round>          # preview (prints the window)
    python tools/rotation.py <round> --write  # update rotation_history.json

``--write`` records, alongside the window list the registry consumes:
``last_verified`` (per-name last hash-verified round at cut time, the
aging ledger) and a ``selection`` note naming rule counts. The pin test
(tests/test_oracle_parity.py::test_driver_window_spans_all_modules)
recomputes this selection independently and fails if the committed
artifact or the live registration order drifts from the rule.
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
HIST = os.path.join(
    REPO, "clinical_data_platform_spark", "plans", "rotation_history.json"
)
WINDOW = 50


def last_verified_map(repo: str = REPO) -> dict[str, int]:
    """name -> highest round whose CORRECTNESS file hash-verified it."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name, v in json.load(open(f)).items():
            if isinstance(v, dict) and v.get("hash_match"):
                last[name] = max(rnd, last.get(name, 0))
    return last


def select_window(
    names: list[str], anchor: str, last: dict[str, int], size: int = WINDOW
) -> list[str]:
    never = sorted(n for n in names if n not in last and n != anchor)
    stale = sorted(
        (n for n in names if n in last and n != anchor),
        key=lambda n: (last[n], n),
    )
    window = [anchor] + never + stale
    if len(window) < size:
        raise SystemExit(f"registry too small for a {size}-slot window")
    return window[:size]


def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        raise SystemExit(__doc__)
    rnd = sys.argv[1]
    write = "--write" in sys.argv[2:]

    sys.path.insert(0, REPO)
    from clinical_data_platform_spark.plans import QUERIES
    from clinical_data_platform_spark.plans.registry import ORACLES

    hist = json.load(open(HIST))
    anchor = hist["anchor"]
    last = last_verified_map()
    names = sorted(ORACLES)  # every oracled query is window-eligible
    window = select_window(names, anchor, last)

    never = [n for n in window[1:] if n not in last]
    ages = sorted(last.get(n, 0) for n in window[1:] if n in last)
    print(f"window {rnd}: anchor + {len(never)} never-verified + "
          f"{len(window) - 1 - len(never)} stalest (last-verified rounds "
          f"{ages[0] if ages else '-'}..{ages[-1] if ages else '-'})")
    for n in window:
        print(f"  {n}  (last r{last.get(n, 0) or '-'})")

    if write:
        hist["windows"][rnd] = window
        hist["changed_this_round"] = []
        hist["last_verified"] = {n: last.get(n, 0) for n in sorted(QUERIES)}
        hist["selection"] = (
            f"r{rnd}: mechanical rule in tools/rotation.py — anchor, then "
            f"never-hash-verified ({len(never)}: {', '.join(never) or 'none'}), "
            f"then stalest-verified by (last_verified, name). last_verified "
            f"is the aging ledger at cut time (0 = never)."
        )
        json.dump(hist, open(HIST, "w"), indent=1)
        open(HIST, "a").write("\n")
        print(f"wrote windows[{rnd}] to {HIST}")


if __name__ == "__main__":
    main()
