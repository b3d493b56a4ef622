#!/usr/bin/env python3
"""One-command gate-ledger tier report.

Prints how many registry queries are (0) never driver-checked,
(1) changed-since-green (their transitive module fingerprint differs from
the one recorded at their last green CORRECTNESS row), or (2) current-green,
the composition of the PROJECTED next gate window (the driver checks the
first ~GATE_WINDOW rows of the derived order — so this is what the next
round's CORRECTNESS file should contain if no cone is touched), plus the
head of that order. Run it before editing anything: an unexpected tier-1
jump means an edit landed inside the fingerprint cone
(see k_means_in_mapreduce_spark/gate_ledger.py).

Usage: stale_report.py [HEAD] [--window N] [--json]
  HEAD        how many leading rows of the derived order to list (default 20)
  --window N  projected driver window size for the composition summary
              (default 50 — the size observed in every CORRECTNESS_r7..r9)
  --json      emit one machine-readable JSON object instead of text, so a
              driver-sim can assert the projected window mechanically
              (tiers, full projected window with per-query tier/round/
              oracle flags, first row past the window)
"""
import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_in_mapreduce_spark import gate_ledger as gl  # noqa: E402
from k_means_in_mapreduce_spark import registry  # noqa: E402

TIER_NAMES = {0: "never-checked", 1: "changed-since-green", 2: "current-green"}

# every driver round since the window stabilized (r7, r8, r9) gated exactly
# this many queries; the summary is a projection, not a driver contract
GATE_WINDOW = 50


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("head", nargs="?", type=int, default=20)
    ap.add_argument("--window", type=int, default=GATE_WINDOW)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    entries = gl.load_ledger().get("queries", {})
    # ordered_queries(), not raw derive_order(): the driver gates the
    # former, which leads with gate_ledger.PRIORITY_OVERRIDE entries —
    # projecting from the bare derived order would silently disagree with
    # the actual window whenever the override list is populated
    order = list(registry.ordered_queries())
    tiers = collections.Counter()
    info = {}
    for name in order:
        t, rnd = gl.query_tier(name, registry.QUERIES, entries)
        tiers[t] += 1
        info[name] = (t, rnd)
    total = len(order)
    window = order[: args.window]

    if args.json:
        print(
            json.dumps(
                {
                    "total": total,
                    "tiers": {
                        TIER_NAMES[t]: tiers.get(t, 0) for t in (0, 1, 2)
                    },
                    "window_size": len(window),
                    "window": [
                        {
                            "name": n,
                            "tier": TIER_NAMES[info[n][0]],
                            "last_green_round": info[n][1],
                            "oracle": n in registry.ORACLES,
                        }
                        for n in window
                    ],
                    "first_past_window": (
                        order[len(window)] if len(order) > len(window) else None
                    ),
                }
            )
        )
        return

    for t in (0, 1, 2):
        print(f"{TIER_NAMES[t]:>20}: {tiers.get(t, 0):3d} / {total}")

    comp = collections.Counter(
        (info[n][0], n not in registry.ORACLES) for n in window
    )
    parts = [
        f"{cnt} {TIER_NAMES[t]}{' no-oracle (rows-only)' if noora else ''}"
        for (t, noora), cnt in sorted(comp.items())
    ]
    print(
        f"\nprojected next gate window (first {len(window)} of driver "
        f"order): " + ", ".join(parts)
    )
    if len(order) > len(window):
        print(f"  first row past the window: {order[len(window)]}")

    print(f"\ngate-window head (next {args.head} in derived order):")
    for name in order[: args.head]:
        t, rnd = info[name]
        mark = "  (no-oracle)" if name not in registry.ORACLES else ""
        print(
            f"  [{TIER_NAMES[t]:>19} r{rnd if rnd is not None else '-'}] "
            f"{name}{mark}"
        )


if __name__ == "__main__":
    main()
