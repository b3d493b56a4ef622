"""Artifact build-once machinery: meta freshness, and the cross-process
build lock (two processes sharing an sf_dir must not race overlapping
overwrite writes into the same data dir — ADVICE r5)."""

from __future__ import annotations

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
    """The O_EXCL loser polls until the holder releases; if the holder
    committed exactly the wanted meta, the loser serves it WITHOUT
    rebuilding (build() must not run)."""
    root = str(tmp_path)
    data = os.path.join(root, "data")
    meta = os.path.join(root, "meta.json")
    want = {"fingerprint": "f", "code": "c"}
    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, ".build.lock")
    with open(lock, "w"):
        pass  # simulate another process holding the build lock

    def other_process():
        time.sleep(0.6)
        _commit_artifact(root, want)
        os.remove(lock)

    t = threading.Thread(target=other_process)
    t.start()

    def build():  # pragma: no cover - the assertion is that it never runs
        raise AssertionError("build ran despite a concurrent identical build")

    t0 = time.monotonic()
    A._locked_rebuild(root, data, meta, want, build)
    t.join()
    assert time.monotonic() - t0 >= 0.5  # actually waited for the holder
    assert A._meta_is(meta, data, want)
    assert not os.path.exists(lock)


def test_locked_rebuild_steals_stale_lock(tmp_path, monkeypatch):
    """A lock file whose holder died (old mtime, nobody releasing) must be
    stolen, not dead-waited."""
    root = str(tmp_path)
    data = os.path.join(root, "data")
    meta = os.path.join(root, "meta.json")
    want = {"fingerprint": "f2", "code": "c2"}
    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, ".build.lock")
    with open(lock, "w"):
        pass
    old = time.time() - 3600
    os.utime(lock, (old, old))
    monkeypatch.setattr(A, "_LOCK_STALE_SEC", 5.0)

    built = []
    A._locked_rebuild(root, data, meta, want, lambda: _FakeDF(built))
    assert built == [data]
    assert A._meta_is(meta, data, want)
    assert not os.path.exists(lock)


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
