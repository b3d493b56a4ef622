"""Round-over-round bench comparison: per-query ratios + headline deltas.

Usage:
    python tools/bench_diff.py [OLD.json] [NEW.json]

With no arguments, compares the two newest ``.benchmarks/*_sf0.1.json``
snapshots. Accepts either a raw bench snapshot (``BENCH_RESULT.json`` /
``.benchmarks/*``) or a driver artifact (``BENCH_r{N}.json``, which wraps
the snapshot under ``"parsed"`` — possibly with a truncated ``queries``
summary, in which case only the overlapping rows are compared).

The key output is the MEDIAN warm ratio across the shared query rows of
sizable runtime (>= MIN_SEC in either run; sub-MIN_SEC rows are timer
noise and synthetic ``_kmeans_*`` grid rows are reported separately):
this repo's queries are code-stable across most rounds, so a median far
from 1.0 means the BOX was slower/faster, not the code — individual-row
swings should be read against that baseline before chasing a
"regression" (the r6→r8 MinHash swings were exactly this). The
"box-adjusted new headline" divides the new headline by that median so
cross-round headline deltas cancel the box factor.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# rows slower than this many seconds in EITHER run are worth naming in
# the ranked output; faster rows are pure noise at sf0.1
MIN_SEC = 0.05


def load_snapshot(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    # driver artifact wrapper: {"n":..., "tail":..., "parsed": {...}}
    # (a failed driver parse records "parsed": null — and the file itself
    # may be any JSON value, so type-check before membership tests)
    if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    if not isinstance(doc, dict) or "queries" not in doc:
        raise SystemExit(f"{path}: no usable bench snapshot inside")
    return doc


def newest_two() -> tuple[str, str]:
    snaps = sorted(glob.glob(os.path.join(REPO, ".benchmarks", "*_sf0.1.json")))
    if len(snaps) < 2:
        raise SystemExit("need two .benchmarks/*_sf0.1.json snapshots")
    return snaps[-2], snaps[-1]


def contention_signals(doc: dict) -> dict:
    """In-snapshot contention evidence summary (fields recorded since
    r16 by bench.py): the median/min rep gap per headline path plus the
    at-run-time host-load fractions. A gap well above ~1.2x on any path,
    or a sizable steal fraction, says "adjudicate against value_min and
    the MANIFEST sibling annotations before reading the median headline
    as a code signal". Returns {} for pre-r16 snapshots, which carry
    neither field."""
    out: dict = {}
    gaps = {}
    for label, med_key, min_key in (
        ("arrow", "value", "value_min"),
        ("expr", "value_expr", "value_min_expr"),
        ("mllib", "value_mllib", "value_min_mllib"),
    ):
        med, mn = doc.get(med_key), doc.get(min_key)
        if med is not None and mn is not None and mn > 0:
            gaps[label] = round(med / mn, 3)
    if gaps:
        out["median_over_min"] = gaps
    hl = doc.get("host_load") or {}
    for phase in ("kmeans_grid", "run"):
        frac = (hl.get(phase) or {}).get("steal_frac")
        if frac is not None:
            out[f"{phase}_steal_frac"] = frac
    # the run's own two-arm verdict (recorded since r18): carried so the
    # diff view shows the self-flag next to the raw evidence, matching
    # the manifest rows and the trend table's '?suspect' marker
    if doc.get("contention_suspect") is not None:
        out["contention_suspect"] = doc["contention_suspect"]
    return out


def diff(old: dict, new: dict) -> dict:
    qo, qn = old["queries"], new["queries"]
    shared = [
        k
        for k in qn
        if k in qo and qo[k] > 0 and qn[k] > 0  # -1 marks an errored row
    ]
    # bench.py injects synthetic "_kmeans_*" grid rows alongside the real
    # query rows; keep them out of the query-only median (it is read as
    # the box baseline) and report them on their own line instead
    qshared = [k for k in shared if not k.startswith("_")]
    grid = {k: qn[k] / qo[k] for k in shared if k.startswith("_")}
    # grid rows with no computable ratio — present on one side only (a
    # rename, or truncated out of a driver artifact) or errored (-1):
    # surfaced on the grid line as =n/a / =err so a broken grid bench is
    # visible instead of silently vanishing from every output section
    grid_bad = {}
    for k in sorted(set(qo) | set(qn)):
        if not k.startswith("_") or k in grid:
            continue
        vals = [v for v in (qo.get(k), qn.get(k)) if v is not None]
        grid_bad[k] = "err" if any(v < 0 for v in vals) else "n/a"
    ratios = {k: qn[k] / qo[k] for k in qshared}
    sizable = {k: r for k, r in ratios.items() if max(qo[k], qn[k]) >= MIN_SEC}
    ranked = sorted(sizable.items(), key=lambda kv: -kv[1])
    # the box-baseline median uses the same noise model as the rankings:
    # sub-MIN_SEC rows are timer noise, and on a truncated/tiny-sf
    # snapshot they would dominate an all-rows median that the output
    # tells users to treat as the code-attributable divisor
    med_src = sizable if sizable else ratios
    med = statistics.median(med_src.values()) if med_src else float("nan")
    # when NO shared row is sizable, the median comes from pure timer
    # noise — still printed (it is all the data there is) but flagged so
    # the box-adjusted headline is not read as a reliable code signal
    med_from_noise = not sizable and bool(ratios)
    headline_old, headline_new = old.get("value"), new.get("value")
    # box-adjusted view: divide the new headline by the median query
    # ratio, so "the box was uniformly 1.24x slower" cancels out and the
    # residual delta is attributable to code
    adj = (
        round(headline_new / med, 4)
        if headline_new is not None and med == med and med > 0
        else None
    )
    return {
        "headline": {
            "old": headline_old,
            "new": headline_new,
            "new_box_adjusted": adj,
            "metric": new.get("metric"),
        },
        # min-of-reps companion headline + in-snapshot evidence (r16+
        # snapshots only; both degrade to None/{} on older files)
        "headline_min": {
            "old": old.get("value_min"),
            "new": new.get("value_min"),
        },
        "contention_old": contention_signals(old),
        "contention_new": contention_signals(new),
        "median_warm_ratio": round(med, 3),
        "median_from_noise_fallback": med_from_noise,
        "grid_ratios": {k: round(r, 3) for k, r in sorted(grid.items())},
        "grid_unratioed": grid_bad,
        "n_shared": len(qshared),
        # membership lists are query-only too: a grid row present in one
        # snapshot but truncated out of the other is not an added/removed
        # QUERY; one-sided/errored grid rows surface via grid_unratioed
        "added": sorted(k for k in set(qn) - set(qo) if not k.startswith("_")),
        "removed": sorted(k for k in set(qo) - set(qn) if not k.startswith("_")),
        "errored_new": sorted(
            k for k, v in qn.items() if v < 0 and not k.startswith("_")
        ),
        # a query errored only in the OLD run is excluded from `shared`
        # (no computable ratio) yet is in neither added nor removed — name
        # it so its "recovery" timing is read without an old baseline
        "errored_old": sorted(
            k for k, v in qo.items() if v < 0 and not k.startswith("_")
        ),
        "slowest_growth": [(k, round(r, 2)) for k, r in ranked[:8]],
        "best_improvement": [(k, round(r, 2)) for k, r in ranked[-8:][::-1]],
        "total_warm": (old.get("total_query_sec"), new.get("total_query_sec")),
        "total_cold": (
            old.get("total_query_sec_cold"),
            new.get("total_query_sec_cold"),
        ),
    }


def main(argv: list[str]) -> int:
    if len(argv) == 2:
        old_path, new_path = argv
    elif not argv:
        old_path, new_path = newest_two()
    else:
        print(__doc__, file=sys.stderr)
        return 2
    old, new = load_snapshot(old_path), load_snapshot(new_path)
    d = diff(old, new)
    print(f"old: {old_path}\nnew: {new_path}")
    h = d["headline"]
    print(f"headline {h['metric']}: {h['old']} -> {h['new']}")
    hm = d["headline_min"]
    if hm["old"] is not None or hm["new"] is not None:
        # pre-r16 snapshots have no value_min: render '-' not 'None'
        hm_old = hm["old"] if hm["old"] is not None else "-"
        hm_new = hm["new"] if hm["new"] is not None else "-"
        print(
            f"  min-of-reps headline: {hm_old} -> {hm_new}"
            "  (contention-robust companion; a median far above its min "
            "is box noise, not code)"
        )
    for side, sig in (("old", d["contention_old"]), ("new", d["contention_new"])):
        if sig:
            gaps = sig.get("median_over_min", {})
            gap_s = ", ".join(f"{k} {v}x" for k, v in gaps.items())
            steal = {
                k: v for k, v in sig.items() if k.endswith("_steal_frac")
            }
            steal_s = ", ".join(f"{k}={v}" for k, v in steal.items())
            suspect = sig.get("contention_suspect")
            suspect_s = (
                "" if suspect is None else f"; self-flag ?suspect={suspect}"
            )
            print(
                f"  in-snapshot evidence ({side}): median/min {gap_s}"
                + (f"; {steal_s}" if steal_s else "")
                + suspect_s
            )
    noise_tag = (
        "  [UNRELIABLE: median from sub-MIN_SEC noise rows — no sizable "
        "shared row]"
        if d["median_from_noise_fallback"]
        else ""
    )
    if h.get("new_box_adjusted") is not None:
        print(
            f"  box-adjusted new headline: {h['new_box_adjusted']}"
            "  (new / median query ratio; compare THIS to old)" + noise_tag
        )
    print(
        f"median warm ratio new/old over the sizable subset of "
        f"{d['n_shared']} shared query rows: {d['median_warm_ratio']}"
        "  (far from 1.0 on code-stable rounds = box speed, not code)"
        + noise_tag
    )
    if d["grid_ratios"] or d["grid_unratioed"]:
        entries = [f"{k}={r}" for k, r in d["grid_ratios"].items()] + [
            f"{k}={tag}" for k, tag in d["grid_unratioed"].items()
        ]
        print(
            "k-means grid ratios (reported separately, excluded from median): "
            + ", ".join(entries)
        )
    print(f"total warm: {d['total_warm'][0]} -> {d['total_warm'][1]}")
    print(f"total cold: {d['total_cold'][0]} -> {d['total_cold'][1]}")
    if d["errored_new"]:
        print(f"ERRORED in new: {d['errored_new']}")
    if d["errored_old"]:
        print(
            f"errored in OLD (ratio unavailable for these): {d['errored_old']}"
        )

    def _capped(rows):
        # a driver artifact's compact line truncates `queries` to the
        # slowest few rows, so added/removed can legitimately be ~100
        # names — cap the listing, the count is the signal
        head = ", ".join(rows[:10])
        more = f" (+{len(rows) - 10} more)" if len(rows) > 10 else ""
        return f"{len(rows)}: {head}{more}"

    if d["added"]:
        print(f"added rows {_capped(d['added'])}")
    if d["removed"]:
        print(f"removed rows {_capped(d['removed'])}")
    print("slowest growth (new/old):")
    for k, r in d["slowest_growth"]:
        print(f"  {r:>6.2f}x  {k}")
    print("best improvement (new/old):")
    for k, r in d["best_improvement"]:
        print(f"  {r:>6.2f}x  {k}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main(sys.argv[1:]))
    except BrokenPipeError:
        # downstream `| head` closed the pipe — normal CLI usage
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        raise SystemExit(0)
