"""tools/bench_diff.py: round-over-round snapshot comparison (no Spark)."""

import json
import os
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)

import bench_diff  # noqa: E402


def _snap(queries, **extra):
    return {
        "metric": "kmeans_sec_per_iteration_n100k_arrow",
        "value": extra.pop("value", 0.3),
        "queries": queries,
        "total_query_sec": sum(v for v in queries.values() if v > 0),
        **extra,
    }


def test_diff_median_ratio_and_rankings():
    old = _snap({"a": 1.0, "b": 2.0, "c": 0.5, "tiny": 0.01}, value=0.25)
    new = _snap({"a": 2.0, "b": 2.0, "c": 0.25, "tiny": 0.04}, value=0.30)
    d = bench_diff.diff(old, new)
    # tiny (4.0x but sub-MIN_SEC in both runs) is timer noise: excluded
    # from the box-baseline median AND the rankings, so the median is
    # over [0.5, 1.0, 2.0] = 1.0, not dragged to 1.5 by noise
    assert d["median_warm_ratio"] == 1.0
    assert d["n_shared"] == 4
    ranked = [k for k, _ in d["slowest_growth"]]
    assert ranked[0] == "a" and "tiny" not in ranked
    assert d["best_improvement"][0][0] == "c"
    assert d["headline"] == {
        "old": 0.25, "new": 0.30,
        "new_box_adjusted": round(0.30 / 1.0, 4),
        "metric": "kmeans_sec_per_iteration_n100k_arrow",
    }


def test_diff_all_tiny_rows_fall_back_to_all_rows_median():
    # when EVERY shared row is sub-MIN_SEC (tiny-sf snapshot) the median
    # falls back to all rows rather than NaN — but is FLAGGED as noise so
    # the box-adjusted headline is not misread as a code signal (ADVICE r9)
    old = _snap({"a": 0.01, "b": 0.02})
    new = _snap({"a": 0.02, "b": 0.02})
    d = bench_diff.diff(old, new)
    assert d["median_warm_ratio"] == 1.5
    assert d["median_from_noise_fallback"] is True
    # a sizable shared row keeps the flag off
    sane = bench_diff.diff(_snap({"a": 1.0}), _snap({"a": 1.0}))
    assert sane["median_from_noise_fallback"] is False


def test_diff_keeps_kmeans_grid_rows_out_of_the_query_median():
    # bench.py injects synthetic "_kmeans_*" grid rows; they must not
    # shift the query-only median, appear in rankings, or count as shared
    old = _snap({"a": 1.0, "b": 1.0, "_kmeans_100k_per_iter_arrow": 0.1})
    new = _snap({"a": 2.0, "b": 2.0, "_kmeans_100k_per_iter_arrow": 1.0})
    d = bench_diff.diff(old, new)
    assert d["median_warm_ratio"] == 2.0  # NOT dragged to 10x by the grid row
    assert d["n_shared"] == 2
    assert d["grid_ratios"] == {"_kmeans_100k_per_iter_arrow": 10.0}
    assert all(not k.startswith("_") for k, _ in d["slowest_growth"])
    # grid rows present on one side only (e.g. truncated driver artifact)
    # must not surface as added/removed/errored QUERY rows — but DO
    # surface on the grid line as n/a (one-sided) / err (negative), so a
    # renamed or newly-errored grid bench is visible (ADVICE r9)
    old2 = _snap({"a": 1.0, "_kmeans_400k_per_iter_arrow": 0.5})
    new2 = _snap({"a": 1.0, "_kmeans_grid_new": 0.5, "_kmeans_broken": -1.0})
    d2 = bench_diff.diff(old2, new2)
    assert d2["added"] == [] and d2["removed"] == [] and d2["errored_new"] == []
    assert d2["grid_unratioed"] == {
        "_kmeans_400k_per_iter_arrow": "n/a",
        "_kmeans_broken": "err",
        "_kmeans_grid_new": "n/a",
    }
    # a grid row errored (-1) on one side but present in both is err too
    d3 = bench_diff.diff(
        _snap({"_kmeans_g": 0.5}), _snap({"_kmeans_g": -1.0})
    )
    assert d3["grid_unratioed"] == {"_kmeans_g": "err"}
    assert d["grid_unratioed"] == {}  # both-sides-positive: ratio only


def test_diff_excludes_errored_rows_and_reports_membership():
    old = _snap({"a": 1.0, "gone": 0.2, "was_broken": -1.0})
    new = _snap({"a": 1.0, "fresh": 0.2, "broken": -1.0, "was_broken": 2.0})
    d = bench_diff.diff(old, new)
    assert d["n_shared"] == 1  # only 'a'; -1 marks an errored row
    assert d["errored_new"] == ["broken"]
    # errored only in OLD: shared-excluded and in neither added/removed —
    # must still be NAMED so its ratio-less "recovery" is visible
    assert d["errored_old"] == ["was_broken"]
    assert d["added"] == ["broken", "fresh"]
    assert d["removed"] == ["gone"]


def test_load_snapshot_unwraps_driver_artifact(tmp_path):
    raw = _snap({"a": 1.0})
    plain = tmp_path / "plain.json"
    plain.write_text(json.dumps(raw))
    wrapped = tmp_path / "BENCH_rXX.json"
    wrapped.write_text(json.dumps({"n": 1, "tail": "...", "parsed": raw}))
    assert bench_diff.load_snapshot(str(plain))["queries"] == {"a": 1.0}
    assert bench_diff.load_snapshot(str(wrapped))["queries"] == {"a": 1.0}
    null_parsed = tmp_path / "null.json"
    null_parsed.write_text(json.dumps({"parsed": None}))
    with pytest.raises(SystemExit):
        bench_diff.load_snapshot(str(null_parsed))
    # a file holding ANY non-dict JSON (e.g. bare null) must hit the same
    # clean SystemExit, not a TypeError on the membership test
    for content in ("null", "[1, 2]", '"text"'):
        bad = tmp_path / "bad.json"
        bad.write_text(content)
        with pytest.raises(SystemExit):
            bench_diff.load_snapshot(str(bad))


def test_diff_surfaces_min_headline_and_contention_signals():
    """r16: diff() carries the min-of-reps companion headline and an
    in-snapshot evidence summary (median/min gap per path + recorded
    steal fractions) so a gate comparison shows contention mechanically;
    pre-r16 snapshots without the fields degrade to None/{} untouched."""
    old = _snap({"a": 1.0})  # pre-r16 shape: no value_min / host_load
    new = _snap(
        {"a": 1.0},
        value_min=0.25,
        value_expr=1.0,
        value_min_expr=0.5,
        host_load={"kmeans_grid": {"steal_frac": 0.04},
                   "run": {"steal_frac": 0.01}},
    )
    new["value"] = 0.3
    d = bench_diff.diff(old, new)
    assert d["headline_min"] == {"old": None, "new": 0.25}
    assert d["contention_old"] == {}
    sig = d["contention_new"]
    # 0.3/0.25 and 1.0/0.5: the expr gap flags the contended path
    assert sig["median_over_min"] == {"arrow": 1.2, "expr": 2.0}
    assert sig["kmeans_grid_steal_frac"] == 0.04
    assert sig["run_steal_frac"] == 0.01
    # a zero/negative recorded min never divides: path simply omitted
    degen = bench_diff.contention_signals({"value": 0.3, "value_min": 0.0})
    assert degen == {}
    # r18+ snapshots carry their own two-arm verdict; the signal summary
    # lifts it (False = "evaluated, clean" survives; absent stays absent)
    flagged = bench_diff.contention_signals(
        {"value": 0.36, "value_min": 0.3, "contention_suspect": True})
    assert flagged["contention_suspect"] is True
    clean = bench_diff.contention_signals(
        {"value": 0.36, "value_min": 0.35, "contention_suspect": False})
    assert clean["contention_suspect"] is False
    assert "contention_suspect" not in sig  # pre-r18 shape: no key


def test_bench_value_min_and_host_load_fields():
    """VERDICT r15 item 3 + ADVICE r15: bench.py reports a
    contention-robust ``value_min`` (min-of-reps / iterations — the
    statistic a noisy-neighbor box cannot inflate) NEXT TO the median
    ``value`` (unchanged, for trend comparability), plus at-run-time
    host-load evidence so a contention call can rest on data recorded
    during the run, not only post-hoc sibling comparison."""
    sys.path.insert(0, os.path.dirname(TOOLS))
    import bench

    # min-of-reps / iterations; an iterations=0 report never divides by 0
    assert bench.iter_min({"spread": [1.5, 2.0, 9.9], "iterations": 5}) == 0.3
    assert bench.iter_min({"spread": [0.4], "iterations": 0}) == 0.4

    # live sample: read_host_load() is documented best-effort for
    # foreign platforms (macOS / steal-less kernels, ADVICE r16) — but
    # on Linux /proc/stat and getloadavg are always present, so a
    # regression that silently returns {} must FAIL here, not pass
    # behind a fully-conditional guard (ADVICE r17)
    s1 = bench.read_host_load()
    if sys.platform == "linux":
        assert "loadavg" in s1 and "cpu_jiffies" in s1
    if "loadavg" in s1:
        assert len(s1["loadavg"]) == 3
    if "cpu_jiffies" in s1:
        assert s1["cpu_jiffies"]["idle"] >= 0
        if "steal" in s1["cpu_jiffies"]:
            assert s1["cpu_jiffies"]["steal"] >= 0

    # delta math on synthetic samples: fractions derived from the split
    before = {
        "loadavg": [1.0, 1.0, 1.0],
        "cpu_jiffies": {"user": 100, "idle": 100, "iowait": 0, "steal": 0},
    }
    after = {
        "loadavg": [2.0, 1.0, 1.0],
        "cpu_jiffies": {"user": 160, "idle": 120, "iowait": 10, "steal": 10},
    }
    d = bench.host_load_delta(before, after)
    assert d["jiffies"] == {"user": 60, "idle": 20, "iowait": 10, "steal": 10}
    assert d["busy_frac"] == 0.7
    assert d["iowait_frac"] == 0.1 and d["steal_frac"] == 0.1
    assert d["loadavg_start"] == [1.0, 1.0, 1.0]
    # foreign-platform samples degrade to an empty block, not a crash
    assert bench.host_load_delta({}, {}) == {}

    # guest/guest_nice are folded into user/nice by the kernel, so the
    # fraction denominator must exclude them (ADVICE r16: double-counting
    # inflated total and deflated busy/steal fractions on nested-VM hosts)
    g_before = {"cpu_jiffies": {"user": 100, "nice": 0, "idle": 100,
                                "steal": 0, "guest": 50, "guest_nice": 0}}
    g_after = {"cpu_jiffies": {"user": 180, "nice": 0, "idle": 100,
                               "steal": 20, "guest": 90, "guest_nice": 0}}
    g = bench.host_load_delta(g_before, g_after)
    # total = user 80 + steal 20 = 100 (guest's 40 NOT added on top)
    assert g["busy_frac"] == 1.0 and g["steal_frac"] == 0.2
    # ...and the raw emitted delta drops guest/guest_nice entirely, so a
    # downstream reader summing the dict cannot re-introduce the
    # double-count the fractions already exclude (ADVICE r17)
    assert "guest" not in g["jiffies"] and "guest_nice" not in g["jiffies"]
    assert sum(g["jiffies"].values()) == 100

    # the tracked full-result artifact carries the new fields, so a
    # reader of BENCH_RESULT.json ALONE can adjudicate a spiky headline
    # (ADVICE r15: the committed headline had no in-file contention cue)
    with open(os.path.join(os.path.dirname(TOOLS), "BENCH_RESULT.json")) as fh:
        res = json.load(fh)
    for k in ("value_min", "value_min_expr", "value_min_mllib",
              "host_load", "contention_evidence", "contention_suspect"):
        assert k in res, k
    assert res["value_min"] <= res["value"]
    assert "run" in res["host_load"]


def test_contention_suspect_two_trigger_arms():
    """VERDICT r17 item 3: bench.py turns the contention evidence rounds
    14-17 adjudicated by hand into a one-field verdict in the JSON tail,
    computed only from fields the bench already records. Pin both arms,
    both quiet paths, and the no-evidence None."""
    sys.path.insert(0, os.path.dirname(TOOLS))
    import bench

    clean_load = {"loadavg_start": [1.75, 2.41, 2.15]}

    # arm A: headline median > 15% above its own min-of-reps — the
    # r12/r13/r15 spike signature (they read 50-100% here)
    assert bench.contention_suspect(0.594, 0.30, clean_load) is True
    # the clean r16-r17 band (1-9% gap, quiet loadavg) stays False —
    # including the r17 gate reading, which sat below BOTH thresholds
    # and needed a same-tree rerun to convict (the flag is a suspicion
    # for the egregious cases, not the full adjudication)
    assert bench.contention_suspect(0.449, 0.408, clean_load) is False
    # the gap is measured against the MIN, as the prose says: a median
    # 16% above its min fires (under the old /median denominator this
    # read 13.8% and silently did NOT — ADVICE r18)
    assert bench.contention_suspect(0.58, 0.50, clean_load) is True
    # and exactly 15% of the min does not (strict >)
    assert bench.contention_suspect(0.575, 0.50, clean_load) is False

    # arm B: 1-min loadavg already ~2x this process's pre-grid share
    # BEFORE the kmeans grid starts — someone else is on the box
    hot_start = {"loadavg_start": [9.5, 4.0, 2.0]}
    assert bench.contention_suspect(0.341, 0.317, hot_start) is True
    # boundary: exactly at the threshold does not fire
    at = {"loadavg_start": [bench.CONTENTION_LOADAVG_START, 1.0, 1.0]}
    assert bench.contention_suspect(0.341, 0.317, at) is False

    # either arm alone suffices when the other's inputs are absent
    assert bench.contention_suspect(0.594, 0.30, {}) is True
    assert bench.contention_suspect(None, None, hot_start) is True

    # no evaluable evidence (non-Linux: no min, no loadavg) -> None,
    # never a clean-bill False; degenerate zero min never divides
    assert bench.contention_suspect(None, None, {}) is None
    assert bench.contention_suspect(0.3, 0.0, None) is None


def test_cli_survives_closed_stdout_pipe():
    """`bench_diff | head -1` must exit 0, not BrokenPipeError-spam."""
    proc = subprocess.run(
        f"{sys.executable} {TOOLS}/bench_diff.py | head -1",
        shell=True, capture_output=True, text=True,
        cwd=os.path.dirname(TOOLS),
    )
    assert proc.returncode == 0
    assert "Traceback" not in proc.stderr
