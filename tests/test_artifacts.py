"""Artifact build-once machinery: meta freshness, and the cross-process
build lock (two processes sharing an sf_dir must not race overlapping
overwrite writes into the same data dir — ADVICE r5)."""

from __future__ import annotations

import fcntl
import json
import os
import threading
import time

from k_means_in_mapreduce_spark import artifacts as A


class _FakeWrite:
    """Stands in for DataFrame.write.mode('overwrite').parquet(path)."""

    def __init__(self, log):
        self.log = log

    def mode(self, _m):
        return self

    def parquet(self, path):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "_SUCCESS"), "w"):
            pass
        self.log.append(path)


class _FakeDF:
    def __init__(self, log):
        self.write = _FakeWrite(log)


def _commit_artifact(root, want):
    data = os.path.join(root, "data")
    os.makedirs(data, exist_ok=True)
    with open(os.path.join(data, "_SUCCESS"), "w"):
        pass
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(want, fh)


def test_meta_is_requires_success_marker_and_exact_meta(tmp_path):
    root = str(tmp_path)
    data = os.path.join(root, "data")
    meta = os.path.join(root, "meta.json")
    want = {"fingerprint": "f", "code": "c", "p": 1}
    assert not A._meta_is(meta, data, want)  # nothing on disk
    _commit_artifact(root, want)
    assert A._meta_is(meta, data, want)
    assert not A._meta_is(meta, data, {**want, "p": 2})  # param mismatch
    os.remove(os.path.join(data, "_SUCCESS"))
    assert not A._meta_is(meta, data, want)  # torn data commit


def test_locked_rebuild_waits_for_concurrent_builder(tmp_path):
    """The flock loser blocks until the holder releases; if the holder
    committed exactly the wanted meta, the loser serves it WITHOUT
    rebuilding (build() must not run)."""
    root = str(tmp_path)
    data = os.path.join(root, "data")
    meta = os.path.join(root, "meta.json")
    want = {"fingerprint": "f", "code": "c"}
    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, ".build.lock")
    # flock conflicts apply between separate open file descriptions even
    # within one process, so a thread faithfully models a second process
    holder_fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    fcntl.flock(holder_fd, fcntl.LOCK_EX)

    def other_process():
        time.sleep(0.6)
        _commit_artifact(root, want)
        os.close(holder_fd)  # releases the flock

    t = threading.Thread(target=other_process)
    t.start()

    def build():  # pragma: no cover - the assertion is that it never runs
        raise AssertionError("build ran despite a concurrent identical build")

    t0 = time.monotonic()
    A._locked_rebuild(root, data, meta, want, build)
    t.join()
    assert time.monotonic() - t0 >= 0.5  # actually waited for the holder
    assert A._meta_is(meta, data, want)


def test_locked_rebuild_ignores_leftover_lock_file(tmp_path):
    """A lock FILE left by a crashed builder holds no flock (the kernel
    released it with the process) — acquisition is immediate, no
    staleness heuristic involved."""
    root = str(tmp_path)
    data = os.path.join(root, "data")
    meta = os.path.join(root, "meta.json")
    want = {"fingerprint": "f2", "code": "c2"}
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, ".build.lock"), "w"):
        pass  # leftover file, nobody holds the flock

    built = []
    t0 = time.monotonic()
    A._locked_rebuild(root, data, meta, want, lambda: _FakeDF(built))
    assert time.monotonic() - t0 < 2.0  # no dead-wait
    assert built == [data]
    assert A._meta_is(meta, data, want)


def _race_worker(root, idx, log_path):
    """Subprocess body for the cross-process race test (module-level so
    multiprocessing can pickle it)."""
    import json
    import os
    import time

    from k_means_in_mapreduce_spark import artifacts as A

    data = os.path.join(root, "data")
    meta = os.path.join(root, "meta.json")
    want = {"fingerprint": "f", "code": "c"}

    class W:
        def mode(self, _m):
            return self

        def parquet(self, path):
            # torn-write detector: mark in-progress, linger, then commit.
            # If two builders overlap, the second sees the first's marker.
            flag = os.path.join(path, "_IN_PROGRESS")
            os.makedirs(path, exist_ok=True)
            overlapped = os.path.exists(flag)
            with open(flag, "w"):
                pass
            time.sleep(0.5)
            with open(os.path.join(path, "_SUCCESS"), "w"):
                pass
            os.remove(flag)
            with open(log_path, "a") as fh:
                fh.write(json.dumps({"idx": idx, "overlapped": overlapped}) + "\n")

    class D:
        write = W()

    A._locked_rebuild(root, data, meta, want, lambda: D())


def test_locked_rebuild_excludes_concurrent_processes(tmp_path):
    """Two real OS processes racing the same stale artifact: exactly one
    must build (the flock holder); the loser serves the winner's commit.
    No overlapping writes into data_dir."""
    import json
    import multiprocessing as mp

    root = str(tmp_path / "art")
    log_path = str(tmp_path / "log.jsonl")
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_race_worker, args=(root, i, log_path))
        for i in range(2)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0
    builds = [json.loads(ln) for ln in open(log_path)]
    assert len(builds) == 1, builds  # loser must NOT rebuild
    assert not builds[0]["overlapped"]
    want = {"fingerprint": "f", "code": "c"}
    assert A._meta_is(
        str(tmp_path / "art" / "meta.json"),
        str(tmp_path / "art" / "data"),
        want,
    )


def test_locked_rebuild_replaces_mismatched_meta(tmp_path):
    """A stale (different-code) artifact is rebuilt under the lock and the
    meta re-committed atomically."""
    root = str(tmp_path)
    data = os.path.join(root, "data")
    meta = os.path.join(root, "meta.json")
    _commit_artifact(root, {"fingerprint": "old", "code": "old"})
    want = {"fingerprint": "new", "code": "new"}

    built = []
    A._locked_rebuild(root, data, meta, want, lambda: _FakeDF(built))
    assert built == [data]
    assert A._meta_is(meta, data, want)


def test_clear_artifact_cache_matches_known_names_and_exact_tag(tmp_path):
    """bench.clear_artifact_cache must only delete scratch entries of the
    known name families carrying EXACTLY the requested sf_dir's tag
    (ADVICE r6: bare endswith(tag) also cleared a different sf_dir whose
    sanitized tag had this tag as a suffix)."""
    import bench
    from k_means_in_mapreduce_spark.artifacts import scratch_tag

    sf_dir = "/bench_test_zone/data/sf1"
    tag = scratch_tag(sf_dir)
    tmp = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)), ".tmp")
    os.makedirs(tmp, exist_ok=True)

    doomed = [
        f"art_pairs--{tag}",            # artifact family
        f"bkt_orders--{tag}.fingerprint",  # bucketed-copy marker
        f"ivf_index--{tag}",            # fixed name, exact tag
        f"centroids_text--{tag}",
    ]
    survivors = [
        f"unrelated--{tag}",            # not a scratch family name
        f"ivf_indexx--{tag}",           # fixed name must match exactly
        # a DIFFERENT sf_dir (/other/bench_test_zone/data/sf1) whose tag
        # has ours as a suffix, behind a fixed-name entry: the old
        # endswith(tag) deleted this
        "centroids_text--_other" + tag,
        f"art_pairs--{tag}_trailing",   # tag must terminate the entry
        f"art_pairs{tag}",              # pre-delimiter legacy naming
    ]
    try:
        for name in doomed + survivors:
            if name.endswith(".fingerprint"):
                with open(os.path.join(tmp, name), "w"):
                    pass
            else:
                os.makedirs(os.path.join(tmp, name), exist_ok=True)

        removed = bench.clear_artifact_cache(sf_dir)

        assert removed == len(doomed)
        for name in doomed:
            assert not os.path.exists(os.path.join(tmp, name)), name
        for name in survivors:
            assert os.path.exists(os.path.join(tmp, name)), name
    finally:
        import shutil

        for name in doomed + survivors:
            full = os.path.join(tmp, name)
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            elif os.path.exists(full):
                os.remove(full)


def test_scratch_entry_pattern_covers_every_scratch_call_site():
    """Tripwire (r7 review): bench.scratch_entry_pattern hardcodes the
    scratch-name families; a NEW `_scratch(sf_dir, ...)` family added in
    any package module without extending the pattern would silently stop
    being cleared before bench runs — the 'cold' column for its consumer
    query would then time a warm parquet serve. Walk every call site's
    AST and require the pattern to match a concrete sample entry name."""
    import ast

    import bench

    pkg_root = os.path.dirname(os.path.abspath(A.__file__))
    tag = "_sample_tag"
    pat = bench.scratch_entry_pattern(tag)

    def sample_name(node):
        # literal: "ivf_index"; f-string: f"art_{name}" -> "art_sample"
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            return node.value
        if isinstance(node, ast.JoinedStr):
            parts = []
            for v in node.values:
                if isinstance(v, ast.Constant):
                    parts.append(str(v.value))
                else:
                    parts.append("sample")
            return "".join(parts)
        return None

    call_sites = []
    for dirpath, dirs, files in os.walk(pkg_root):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for fn in files:
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            with open(full, encoding="utf-8") as fh:
                tree = ast.parse(fh.read())
            def _is_scratch_func(func):
                # bare name `_scratch(...)` or attribute form like
                # `artifacts._scratch(...)` — both are real call sites;
                # matching only ast.Name would let the attribute form
                # silently bypass this tripwire (ADVICE r7 low)
                if isinstance(func, ast.Name):
                    return func.id == "_scratch"
                if isinstance(func, ast.Attribute):
                    return func.attr == "_scratch"
                return False

            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and _is_scratch_func(node.func)
                    and len(node.args) >= 2
                ):
                    name = sample_name(node.args[1])
                    assert name is not None, (
                        f"{full}:{node.lineno}: _scratch name is not a "
                        "string literal/f-string — the bench tripwire "
                        "can't derive a sample; use a literal or extend "
                        "this test"
                    )
                    call_sites.append((full, node.lineno, name))

    assert call_sites, "no _scratch call sites found — walker broken?"
    for full, lineno, name in call_sites:
        entry = f"{name}--{tag}"  # artifacts._scratch's on-disk naming
        assert pat.match(entry), (
            f"{full}:{lineno}: scratch family {name!r} is NOT covered by "
            "bench.scratch_entry_pattern — extend the pattern or the "
            "bench cold column silently degrades to warm for it"
        )
        # bucketed-table markers persist as <entry>.fingerprint files
        assert pat.match(entry + ".fingerprint"), (full, lineno, name)


def test_scratch_entry_pattern_adversarial_suffix_dirs():
    """Property (VERDICT r7 #6): scratch_entry_pattern against adversarial
    sf_dir pairs where one path is a path-suffix of the other (/data/sf1
    vs /other/data/sf1 — their sanitized tags share a suffix).

    With artifacts._scratch's ``--`` name/tag delimiter, NO family —
    fixed or variable — matches across tags in either direction: the tag
    alphabet excludes '-' and so does the art_/bkt_ name wildcard, so the
    delimiter pins the tag boundary exactly. (Before the delimiter, an
    art_/bkt_ entry tagged with the longer tag matched the shorter tag's
    pattern — the wildcard absorbed the extra path prefix; the r8 version
    of this test pinned that residual as the red/green target.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import bench
    from k_means_in_mapreduce_spark.artifacts import scratch_tag

    FIXED = (
        "ivf_index", "centroids_text", "orders_csv", "events_json",
        "orders_part", "lineitem_orc", "orders_corrupt_csv", "points_text",
    )
    seg = st.text(alphabet="abxz059.-", min_size=1, max_size=8)

    @settings(max_examples=100, deadline=None)
    @given(
        inner=st.lists(seg, min_size=1, max_size=3),
        extra=st.lists(seg, min_size=1, max_size=2),
    )
    def run(inner, extra):
        a = "/" + "/".join(inner)
        b = "/" + "/".join(extra) + a  # b's path ends with a's FULL path
        tag_a, tag_b = scratch_tag(a), scratch_tag(b)
        assert tag_b.endswith(tag_a) and tag_b != tag_a
        assert "-" not in tag_a  # the delimiter's load-bearing guarantee
        pat_a, pat_b = (
            bench.scratch_entry_pattern(tag_a),
            bench.scratch_entry_pattern(tag_b),
        )

        for fam in FIXED:
            # own tag always matches (dir + bucket marker forms)
            assert pat_a.match(f"{fam}--{tag_a}")
            assert pat_a.match(f"{fam}--{tag_a}.fingerprint")
            # fixed names never cross tags, in either direction
            assert not pat_a.match(f"{fam}--{tag_b}")
            assert not pat_b.match(f"{fam}--{tag_a}")

        # variable families: own tag matches; neither direction crosses —
        # including the pre-delimiter residual direction (longer tag's
        # entry vs shorter tag's pattern), now dead because the wildcard
        # can't absorb past the '--'
        assert pat_a.match(f"art_pairs--{tag_a}")
        assert pat_a.match(f"bkt_orders--{tag_a}.fingerprint")
        assert not pat_b.match(f"art_pairs--{tag_a}")
        assert not pat_b.match(f"bkt_orders--{tag_a}")
        assert not pat_a.match(f"art_pairs--{tag_b}")
        assert not pat_a.match(f"bkt_orders--{tag_b}.fingerprint")

        # pre-delimiter legacy entries never match (orphaned on rename,
        # swept once manually when the delimiter landed)
        assert not pat_a.match(f"art_pairs{tag_a}")
        assert not pat_a.match(f"ivf_index{tag_a}")

        # string-suffix WITHOUT the path boundary (/zdata/sf1 vs
        # /data/sf1 style): still no cross-match
        c = "/" + "".join(extra) + inner[0]  # first segment glued, no '/'
        tag_c = scratch_tag(c)
        if tag_c != tag_a and not tag_c.endswith(tag_a):
            assert not pat_a.match(f"art_pairs--{tag_c}")

    run()


# ---------------------------------------------------------------------------
# source_fingerprint: memoized behind an O(1) shallow stat signature (r22).
# These tests pin the regeneration-rebuilds guarantee through the memo: a
# rewritten file, an overwrite-recreated directory, and a rewritten
# _SUCCESS marker must all change the fingerprint; an unchanged source must
# be served from the memo WITHOUT a recursive walk.
# ---------------------------------------------------------------------------
def test_source_fingerprint_memo_skips_walk_when_unchanged(tmp_path, monkeypatch):
    d = tmp_path / "table.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"aaa")
    (d / "_SUCCESS").write_bytes(b"")
    fp1 = A.source_fingerprint(str(d))

    walks = []
    real_walk = os.walk
    monkeypatch.setattr(os, "walk", lambda *a, **k: walks.append(a) or real_walk(*a, **k))
    assert A.source_fingerprint(str(d)) == fp1
    assert walks == []  # memo hit: no recursive listing


def test_source_fingerprint_changes_on_file_rewrite(tmp_path):
    f = tmp_path / "embeddings.parquet"
    f.write_bytes(b"v1")
    fp1 = A.source_fingerprint(str(f))
    f.write_bytes(b"v2-longer")  # size + mtime change
    assert A.source_fingerprint(str(f)) != fp1


def test_source_fingerprint_changes_on_dir_regeneration(tmp_path):
    import shutil

    d = tmp_path / "cells"
    d.mkdir()
    (d / "part-0").write_bytes(b"old")
    (d / "_SUCCESS").write_bytes(b"")
    fp1 = A.source_fingerprint(str(d))
    # Spark mode('overwrite') deletes and recreates the directory
    shutil.rmtree(d)
    d.mkdir()
    (d / "part-0").write_bytes(b"new!")
    (d / "_SUCCESS").write_bytes(b"")
    assert A.source_fingerprint(str(d)) != fp1


def test_source_fingerprint_changes_on_success_rewrite(tmp_path):
    """An in-place recommit that only rewrites _SUCCESS (dir entry count
    unchanged) must still invalidate the shallow signature."""
    d = tmp_path / "data"
    d.mkdir()
    p = d / "part-0"
    p.write_bytes(b"x" * 8)
    (d / "_SUCCESS").write_bytes(b"")
    fp1 = A.source_fingerprint(str(d))
    # rewrite the data file IN PLACE with different mtime, then recommit
    # _SUCCESS (what a writer that reuses the directory would do)
    os.utime(p, ns=(1, 1))
    (d / "_SUCCESS").write_bytes(b"")
    os.utime(d / "_SUCCESS", ns=(2, 2))
    assert A.source_fingerprint(str(d)) != fp1


def test_session_df_memo_capped(tmp_path):
    class _S:  # weakref-able stand-in for a SparkSession
        pass

    s = _S()
    memo: dict = {}
    for i in range(3 * A._MEMO_CAP):
        A.session_df_memo(memo, ("k", i), s, lambda i=i: f"df{i}")
    assert len(memo) <= A._MEMO_CAP
    # newest entries survive
    assert ("k", 3 * A._MEMO_CAP - 1) in memo
