"""tools/bench_trend.py: cross-round snapshot manifest + chained-median trend
(no Spark). Unit-tests the round attribution and median chaining on
synthetic snapshots, plus a live smoke over the real repo history."""

import json
import os
import re
import subprocess
import sys

TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
sys.path.insert(0, TOOLS)

import bench_diff  # noqa: E402
import bench_trend  # noqa: E402

REPO = os.path.dirname(TOOLS)


def test_round_after_tracks_driver_commits_from_full_history():
    # driver "round N:" commits advance the closed-round counter even when
    # they touch no .benchmarks file; local commits inherit the last one
    seq = [
        ("c1", "initial scaffold"),
        ("c2", "round 1: verdict/advice"),
        ("c3", "add an operator"),
        ("c4", "round 2: verdict/advice"),
        ("c5", "round 3: end-of-round snapshot (282 turns)"),
        ("c6", "record a local bench"),
    ]
    closed = bench_trend.round_after(seq)
    assert closed["c1"] == 0  # before any driver round closed
    assert closed["c2"] == 1  # the round-1 commit itself
    assert closed["c3"] == 1  # local work during round 2
    assert closed["c5"] == 3  # any "round N:" subject counts
    assert closed["c6"] == 3  # local work during round 4


def _snap_file(tmp_path, name, queries, value):
    doc = {
        "metric": "m",
        "value": value,
        "queries": queries,
        "total_query_sec": sum(queries.values()),
    }
    bdir = tmp_path / ".benchmarks"
    bdir.mkdir(exist_ok=True)
    (bdir / name).write_text(json.dumps(doc))
    return {"file": f".benchmarks/{name}", "sf": 0.1, "round": 1,
            "kind": "local", "metric": "m", "headline": value}


def test_trend_chains_pairwise_medians_into_cumulative_box_factor(
    tmp_path, monkeypatch
):
    # three snapshots: box slows 2x between #1 and #2 (all rows double),
    # then holds; the chained cum factor must reach 2.0 and stay, and the
    # box-adjusted headline must cancel the slowdown (1.0 -> ~1.05 -> ...)
    e1 = _snap_file(tmp_path, "bench_1_sf0.1.json", {"a": 1.0, "b": 2.0}, 1.0)
    e2 = _snap_file(tmp_path, "bench_2_sf0.1.json", {"a": 2.0, "b": 4.0}, 2.1)
    e3 = _snap_file(tmp_path, "bench_3_sf0.1.json", {"a": 2.0, "b": 4.0}, 2.0)
    monkeypatch.setattr(bench_trend, "REPO", str(tmp_path))
    # trend consumes the parsed doc enrich() caches on each entry
    rows = bench_trend.trend(bench_trend.enrich([e1, e2, e3]), sf=0.1)
    assert [r["cum_box_factor"] for r in rows] == [1.0, 2.0, 2.0]
    assert rows[0]["headline_box_adjusted"] == 1.0
    assert rows[1]["headline_box_adjusted"] == round(2.1 / 2.0, 4)
    assert rows[2]["headline_box_adjusted"] == 1.0
    assert "median_vs_prev" not in rows[0]  # first snapshot has no pair
    assert rows[1]["median_vs_prev"] == 2.0
    # other-sf and unreadable entries are excluded from the tier
    e_other = dict(e1, sf=0.01)
    enriched = bench_trend.enrich([e_other, dict(e2), dict(e3)])
    assert len(bench_trend.trend(enriched, sf=0.1)) == 2
    # an entry enrich() could not parse never reaches the chain
    (tmp_path / ".benchmarks" / "bench_bad_sf0.1.json").write_text("{trunc")
    e_bad = {"file": ".benchmarks/bench_bad_sf0.1.json", "sf": 0.1,
             "round": 1, "kind": "local"}
    enriched_bad = bench_trend.enrich([dict(e1), e_bad, dict(e2)])
    assert enriched_bad[1].get("unparseable") is True
    assert len(bench_trend.trend(enriched_bad, sf=0.1)) == 2


def test_trend_enriches_raw_entries_defensively(tmp_path, monkeypatch):
    # trend() on raw snapshot_history()-shaped entries (no _doc) must
    # enrich them itself rather than return an empty result
    e1 = _snap_file(tmp_path, "bench_1_sf0.1.json", {"a": 1.0, "b": 2.0}, 1.0)
    e2 = _snap_file(tmp_path, "bench_2_sf0.1.json", {"a": 2.0, "b": 4.0}, 2.0)
    monkeypatch.setattr(bench_trend, "REPO", str(tmp_path))
    rows = bench_trend.trend([e1, e2], sf=0.1)  # never passed through enrich
    assert [r["cum_box_factor"] for r in rows] == [1.0, 2.0]
    # entries already marked missing/unparseable are not re-probed
    e_missing = {"file": ".benchmarks/gone_sf0.1.json", "sf": 0.1,
                 "round": 1, "kind": "local", "missing": True}
    assert len(bench_trend.trend([e1, e_missing, e2], sf=0.1)) == 2


def test_trend_defensive_enrich_is_tier_scoped_and_side_effect_free(
    tmp_path, monkeypatch
):
    # ADVICE r13: (1) raw entries outside the requested sf tier must not
    # be read/parsed at all; (2) trend() must not mutate caller entries
    e1 = _snap_file(tmp_path, "bench_1_sf0.1.json", {"a": 1.0, "b": 2.0}, 1.0)
    e2 = _snap_file(tmp_path, "bench_2_sf0.1.json", {"a": 2.0, "b": 4.0}, 2.0)
    # off-tier entry pointing at a file that does not exist: with the sf
    # filter applied before enrich, it is never probed (no "missing" mark)
    e_off = {"file": ".benchmarks/never_there_sf0.01.json", "sf": 0.01,
             "round": 1, "kind": "local"}
    monkeypatch.setattr(bench_trend, "REPO", str(tmp_path))
    rows = bench_trend.trend([e1, e_off, e2], sf=0.1)
    assert [r["cum_box_factor"] for r in rows] == [1.0, 2.0]
    assert "missing" not in e_off and "_doc" not in e_off
    # the defensively-enriched tier entries are copies: the caller's
    # objects stay exactly as passed (no _doc / headline side effects)
    assert "_doc" not in e1 and "_doc" not in e2


def test_contention_outlier_annotation_flows_to_rows_and_manifest_fields(
    tmp_path, monkeypatch
):
    # a snapshot listed in CONTENTION_OUTLIERS gets the note attached by
    # enrich() (-> MANIFEST) and carried onto its trend row (hermetic:
    # live-repo annotation pinning lives in
    # test_live_contention_annotations_pinned, per ADVICE r14)
    e1 = _snap_file(tmp_path, "bench_1_sf0.1.json", {"a": 1.0}, 1.0)
    e2 = _snap_file(tmp_path, "bench_odd_sf0.1.json", {"a": 1.0}, 9.9)
    monkeypatch.setattr(bench_trend, "REPO", str(tmp_path))
    monkeypatch.setitem(
        bench_trend.CONTENTION_OUTLIERS,
        ".benchmarks/bench_odd_sf0.1.json",
        "box spike",
    )
    enriched = bench_trend.enrich([e1, e2])
    assert enriched[1]["contention_outlier"] == "box spike"
    rows = bench_trend.trend(enriched, sf=0.1)
    assert "contention_outlier" not in rows[0]
    assert rows[1]["contention_outlier"] == "box spike"


def test_trend_carries_min_headline_and_steal_evidence(tmp_path, monkeypatch):
    # r16 snapshots record value_min + host_load (bench.py); enrich()
    # lifts them onto the manifest entry and trend() onto the row, so a
    # spiked median is adjudicable from the trend output in place
    e1 = _snap_file(tmp_path, "bench_1_sf0.1.json", {"a": 1.0}, 1.0)
    snap = tmp_path / ".benchmarks" / "bench_1_sf0.1.json"
    doc = json.loads(snap.read_text())
    doc["value_min"] = 0.9
    doc["host_load"] = {"run": {"steal_frac": 0.03}}
    # r18+ snapshots also carry bench.py's own two-arm verdict; False is
    # evidence ("evaluated, clean") and must survive the lift — only
    # absent/null (pre-r18 / no evaluable arm) stays off the entry
    doc["contention_suspect"] = False
    snap.write_text(json.dumps(doc))
    monkeypatch.setattr(bench_trend, "REPO", str(tmp_path))
    enriched = bench_trend.enrich([e1])
    assert enriched[0]["headline_min"] == 0.9
    assert enriched[0]["run_steal_frac"] == 0.03
    assert enriched[0]["contention_suspect"] is False
    rows = bench_trend.trend(enriched, sf=0.1)
    assert rows[0]["headline_min"] == 0.9
    assert rows[0]["run_steal_frac"] == 0.03
    assert rows[0]["contention_suspect"] is False
    # pre-r16 snapshots: the fields are simply absent, never None-filled
    e2 = _snap_file(tmp_path, "bench_2_sf0.1.json", {"a": 1.0}, 1.0)
    rows2 = bench_trend.trend(bench_trend.enrich([e2]), sf=0.1)
    assert "headline_min" not in rows2[0]
    assert "run_steal_frac" not in rows2[0]
    assert "contention_suspect" not in rows2[0]


def test_live_contention_annotations_pinned():
    """The real annotated outliers stay adjudicable: every known outlier
    key is present in CONTENTION_OUTLIERS, names an actual archived
    snapshot, and the tracked MANIFEST.json carries the exact evidence
    string — so a manifest rebuild (or a table edit) can't silently drop
    an annotation or its rationale (VERDICT r14 item 6; keys were pinned
    in r13, this pins the strings end-to-end). Keys are repo-relative
    paths matching manifest entries verbatim (ADVICE r14 closed in r16:
    path keying replaced the basename keying + flat-layout precondition
    this test used to pin)."""
    known = [
        # r12 gate, 400k spike
        ".benchmarks/bench_20260814_225501_sf0.1.json",
        # r13 gate, 100k arrow 0.594
        ".benchmarks/bench_20260815_000622_sf0.1.json",
        # r15 local, arrow 0.409/expr 2.342
        ".benchmarks/bench_20260815_025541_sf0.1.json",
        # r15 driver-gate, arrow 0.57, judge-confirmed contention
        ".benchmarks/bench_20260815_072140_sf0.1.json",
    ]
    for path in known:
        assert path in bench_trend.CONTENTION_OUTLIERS, path
    for path, note in bench_trend.CONTENTION_OUTLIERS.items():
        # a typo'd path would silently annotate nothing
        assert os.path.exists(os.path.join(REPO, path)), path
        # evidence must be substantive (a band/sibling comparison), not a bare flag
        assert len(note) > 40 and "vs" in note, path
    with open(os.path.join(REPO, ".benchmarks", "MANIFEST.json")) as fh:
        manifest = json.load(fh)
    by_path = {s["file"]: s for s in manifest["snapshots"]}
    for path, note in bench_trend.CONTENTION_OUTLIERS.items():
        assert by_path[path].get("contention_outlier") == note, path
    # and no manifest entry claims an annotation the table doesn't define
    for path, s in by_path.items():
        if "contention_outlier" in s:
            assert bench_trend.CONTENTION_OUTLIERS.get(path) == s[
                "contention_outlier"
            ], path


def test_readme_snapshot_ids_name_archived_snapshots():
    """ADVICE r15: contention prose lives in three places (the table, the
    generated manifest, README maintenance notes) and only the first two
    were pinned to each other — a README snapshot ID could drift to a run
    that never existed. Mechanical floor: every bench_YYYYMMDD_HHMMSS ID
    the README cites must name an actually archived snapshot file."""
    import re

    with open(os.path.join(REPO, "README.md")) as fh:
        readme = fh.read()
    ids = set(re.findall(r"bench_\d{8}_\d{6}", readme))
    assert ids, "README no longer cites any snapshot IDs - update this test"
    archived = {re.sub(r"_sf[0-9.]+\.json$", "", f)
                for f in os.listdir(os.path.join(REPO, ".benchmarks"))}
    for snap_id in sorted(ids):
        assert snap_id in archived, (
            f"README cites {snap_id} but no such snapshot is archived"
        )


def test_live_trend_and_manifest_round_attribution():
    """Smoke over the real repo: every snapshot gets a round and a kind,
    driver-gate rows only come from `round N:` commits, and the trend's
    cum factor stays positive (a chain of valid medians)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "bench_trend.py"),
         "--json", "--no-manifest"],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    doc = json.loads(proc.stdout)
    assert doc["sf"] == 0.1
    rows = doc["trend"]
    assert len(rows) >= 2  # repo history has many sf0.1 snapshots
    for r in rows:
        assert r["kind"] in ("driver-gate", "local")
        assert isinstance(r["round"], int) and r["round"] >= 1
        assert r["cum_box_factor"] > 0
    # rounds never decrease along the (chronological) trend
    rounds = [r["round"] for r in rows]
    assert rounds == sorted(rounds)
    # the piped run also passes --no-manifest so a plain pytest run never
    # rewrites the tracked MANIFEST.json; the BrokenPipeError exit path is
    # still what this invocation exercises
    proc2 = subprocess.run(
        f"{sys.executable} {os.path.join(TOOLS, 'bench_trend.py')}"
        " --no-manifest | head -3",
        shell=True, capture_output=True, text=True, cwd=REPO,
    )
    assert proc2.returncode == 0 and "Traceback" not in proc2.stderr


def test_live_trend_table_keeps_min_steal_columns_before_filename():
    """ADVICE r16: min/steal render in fixed-width slots BEFORE the
    filename ('-' for pre-r16 rows) — never as variable-width trailing
    text that breaks the column grid after the longest field."""
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "bench_trend.py"),
         "--no-manifest"],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    lines = proc.stdout.splitlines()
    header = next(ln for ln in lines if "med/prev" in ln)
    assert header.index("min") < header.index("steal") < header.index("file")
    data = [ln for ln in lines
            if re.match(r"^\s+r\d+ ", ln) and ".json" in ln]
    assert len(data) >= 2
    saw_dash = saw_value = False
    for ln in data:
        toks = ln.split()
        # the filename token is the one ending .json; only the fixed
        # markers ('!contention', '?suspect') may trail it (ADVICE r19:
        # a missing token must fail the assertion, not StopIteration)
        fi = next(
            (i for i, t in enumerate(toks) if t.endswith(".json")), None
        )
        assert fi is not None, f"no filename token in row: {ln}"
        assert all(t in ("!contention", "?suspect") for t in toks[fi + 1:])
        min_tok = toks[fi - 2]
        saw_dash |= min_tok == "-"
        saw_value |= min_tok != "-"
    # which eras the rendered rows must show is driven by the history
    # itself, not hardcoded (ADVICE r17: a fresh clone/fork whose
    # .benchmarks archive spans only one era must still pass): pre-r16
    # snapshots lack value_min -> '-', r16+ record it -> a number.
    # Enumerate candidates via snapshot_history() — the SAME source the
    # rows come from — not a directory glob: an untracked local bench
    # archive sits in .benchmarks/ but never becomes a row, so a glob
    # could demand an era the table rightly omits (ADVICE r18). Parse
    # each candidate with bench_diff.load_snapshot, mirroring enrich():
    # it unwraps the {"parsed": ...} driver-artifact wrapper and rejects
    # docs lacking "queries", so a future archived file in either shape
    # is classified exactly as the rendered rows classify it (ADVICE r19)
    expect_dash = expect_value = False
    for e in bench_trend.snapshot_history():
        if e.get("sf") != 0.1:
            continue  # the table under test renders the sf0.1 tier
        try:
            doc = bench_diff.load_snapshot(os.path.join(REPO, e["file"]))
        except (SystemExit, ValueError, OSError):
            continue  # unparseable/deleted files never become table rows
        if doc.get("value_min") is None:
            expect_dash = True
        else:
            expect_value = True
    assert saw_dash == expect_dash and saw_value == expect_value


def test_format_row_renders_self_flag_and_outlier_markers():
    """ADVICE r18: a run that flagged ITSELF (contention_suspect true in
    its JSON tail) must be visible in the default human table, parallel
    to the hand-curated '!contention' marker — previously only the
    --json rows and MANIFEST.json carried the self-flag. Pinned on
    synthetic rows via format_row (no git-history walk)."""
    base = {"round": 18, "kind": "driver-gate", "headline": 0.374,
            "cum_box_factor": 1.0, "file": "bench_x_sf0.1.json"}
    # self-flag alone -> ' ?suspect' trails the filename
    assert bench_trend.format_row(
        {**base, "contention_suspect": True}).endswith(
        "bench_x_sf0.1.json ?suspect")
    # hand-curated outlier alone -> existing '!contention', no suspect
    assert bench_trend.format_row(
        {**base, "contention_outlier": "note"}).endswith(
        "bench_x_sf0.1.json !contention")
    # both markers render when both apply (independent evidence tracks)
    assert bench_trend.format_row(
        {**base, "contention_outlier": "note",
         "contention_suspect": True}).endswith(
        "bench_x_sf0.1.json !contention ?suspect")
    # an explicit False self-verdict (clean gate) renders NO marker, and
    # pre-r18 rows without the field don't either
    assert bench_trend.format_row(
        {**base, "contention_suspect": False}).endswith(".json")
    assert bench_trend.format_row(base).endswith(".json")
