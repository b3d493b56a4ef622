#!/usr/bin/env python3
"""One-command gate-ledger tier report.

Prints how many registry queries are (0) never driver-checked,
(1) changed-since-green (their transitive module fingerprint differs from
the one recorded at their last green CORRECTNESS row), or (2) current-green,
plus the head of the derived gate-window order — the rows the driver's
bounded per-round window will check next. Run it before editing anything:
an unexpected tier-1 jump means an edit landed inside the fingerprint cone
(see k_means_in_mapreduce_spark/gate_ledger.py).
"""
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_in_mapreduce_spark import gate_ledger as gl  # noqa: E402
from k_means_in_mapreduce_spark import registry  # noqa: E402

TIER_NAMES = {0: "never-checked", 1: "changed-since-green", 2: "current-green"}


def main() -> None:
    head = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    entries = gl.load_ledger().get("queries", {})
    order = gl.derive_order(registry.QUERIES)
    tiers = collections.Counter()
    info = {}
    for name in order:
        t, rnd = gl.query_tier(name, registry.QUERIES, entries)
        tiers[t] += 1
        info[name] = (t, rnd)
    total = len(order)
    for t in (0, 1, 2):
        print(f"{TIER_NAMES[t]:>20}: {tiers.get(t, 0):3d} / {total}")
    print(f"\ngate-window head (next {head} in derived order):")
    for name in order[:head]:
        t, rnd = info[name]
        print(f"  [{TIER_NAMES[t]:>19} r{rnd if rnd is not None else '-'}] {name}")


if __name__ == "__main__":
    main()
