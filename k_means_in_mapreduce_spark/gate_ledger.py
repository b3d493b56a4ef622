"""Gate-window ledger: which query was last green WHEN, and has its code
changed since.

Round 4 post-mortem (VERDICT r4, "gate-window staleness"): a shared reader
(``sources/tables.py``) changed AFTER seven events-path queries' last green
CORRECTNESS row, and the hand-maintained priority list did not notice. The
fix is to *derive* the gate-window ordering instead of hand-writing it:

- ``GATE_LEDGER.json`` (repo root, committed) records for every query the
  last round it was driver-checked and an md5 fingerprint of the query's
  defining module PLUS its transitive intra-package imports, taken at the
  moment the round's CORRECTNESS file was incorporated (i.e. before any
  new-round edits).
- ``ordered_queries()`` leads with (a) queries with no ledger row (never
  checked), (b) queries whose current fingerprint differs from the
  at-green fingerprint (code under them changed), (c) everything else by
  ascending last-checked round — so the driver's bounded ~50-query window
  always spends its budget on the rows most likely to be stale.

``tools/update_gate_ledger.py`` incorporates new CORRECTNESS_r*.json files;
run it at the START of a round, before editing any query module, so the
recorded fingerprints equal the fingerprints at gate time (the driver
commits CORRECTNESS right after the gate, with no edits in between).
Forgetting to run it is fail-safe: fingerprints stay stale, MORE queries
rank as "changed since green", and the window over-re-checks rather than
under-re-checks.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
from functools import lru_cache

PACKAGE = "k_means_in_mapreduce_spark"
PKG_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(PKG_DIR)
LEDGER_PATH = os.path.join(REPO_ROOT, "GATE_LEDGER.json")


def _module_file(dotted: str) -> str | None:
    """Map a package-internal dotted module name to its source file."""
    rel = dotted.split(".")
    if rel[0] != PACKAGE:
        return None
    base = os.path.join(PKG_DIR, *rel[1:])
    for cand in (base + ".py", os.path.join(base, "__init__.py")):
        if os.path.isfile(cand):
            return cand
    return None


def _resolve_relative(module: str, node_module: str | None, level: int) -> str:
    """Resolve a ``from ..x import y`` inside ``module`` to a dotted name.

    Inside a package's ``__init__.py``, level=1 refers to the package
    itself (not its parent), so one fewer component is stripped.
    """
    parts = module.split(".")
    f = _module_file(module)
    is_pkg = bool(f) and os.path.basename(f) == "__init__.py"
    strip = max(0, level - 1 if is_pkg else level)
    base = parts[: len(parts) - strip] if strip else parts
    if node_module:
        base = base + node_module.split(".")
    return ".".join(base)


@lru_cache(maxsize=None)
def _direct_imports(dotted: str) -> tuple[str, ...]:
    """Package-internal modules imported by ``dotted`` (non-recursive).

    ``from .ops import similarity`` also yields ``<pkg>.ops.similarity``
    when the imported names are themselves modules — that is how
    ``sources/__init__.py`` pulls in ``tables.py``/``filesources.py``.
    """
    path = _module_file(dotted)
    if path is None:
        return ()
    try:
        tree = ast.parse(open(path, encoding="utf-8").read())
    except SyntaxError:
        return ()
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.split(".")[0] == PACKAGE:
                    out.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            target = _resolve_relative(dotted, node.module, node.level)
            if target.split(".")[0] != PACKAGE:
                continue
            if _module_file(target):
                out.add(target)
            for a in node.names:
                sub = f"{target}.{a.name}"
                if _module_file(sub):
                    out.add(sub)
    return tuple(sorted(m for m in out if _module_file(m)))


def transitive_files(dotted: str) -> list[str]:
    """All source files the module's behavior can depend on, recursively."""
    seen: set[str] = set()
    stack = [dotted]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(_direct_imports(m))
    files = {f for m in seen if (f := _module_file(m))}
    return sorted(files)


@lru_cache(maxsize=None)
def _file_md5(path: str) -> str:
    with open(path, "rb") as fh:
        return hashlib.md5(fh.read()).hexdigest()


def module_fingerprint(dotted: str) -> str:
    """md5 over (relpath, content-md5) of the module + its transitive
    intra-package imports — changes when any code under the query does."""
    parts = [
        f"{os.path.relpath(f, PKG_DIR)}:{_file_md5(f)}"
        for f in transitive_files(dotted)
    ]
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def load_ledger() -> dict:
    if not os.path.isfile(LEDGER_PATH):
        return {"rounds_seen": [], "queries": {}}
    with open(LEDGER_PATH, encoding="utf-8") as fh:
        return json.load(fh)


def save_ledger(ledger: dict) -> None:
    with open(LEDGER_PATH, "w", encoding="utf-8") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
        fh.write("\n")


def _row_checked(row: dict) -> bool:
    """A CORRECTNESS row counts as 'checked' if the oracle compare fully
    passed, or the driver ran the weaker rows-only check (no_oracle)."""
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return bool(
        row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
    )


def incorporate_correctness(ledger: dict, repo_root: str = REPO_ROOT) -> list[str]:
    """Fold any not-yet-seen CORRECTNESS_r*.json into the ledger, stamping
    each green query with the CURRENT module fingerprint (call this before
    editing code in a new round). Returns the rounds incorporated."""
    import importlib

    registry = importlib.import_module(f"{PACKAGE}.registry")
    seen = set(ledger.get("rounds_seen", []))
    added: list[str] = []
    for name in sorted(os.listdir(repo_root)):
        if not (name.startswith("CORRECTNESS_r") and name.endswith(".json")):
            continue
        if name in seen:
            continue
        with open(os.path.join(repo_root, name), encoding="utf-8") as fh:
            rows = json.load(fh)
        rnd = int(name[len("CORRECTNESS_r") : -len(".json")])
        for qname, row in rows.items():
            if qname not in registry.QUERIES or not _row_checked(row):
                continue
            fn = registry.QUERIES[qname]
            ledger["queries"][qname] = {
                "last_checked_round": rnd,
                "fingerprint": module_fingerprint(fn.__module__),
                "module": fn.__module__,
            }
        seen.add(name)
        added.append(name)
    ledger["rounds_seen"] = sorted(seen)
    return added


def derive_order(registry_queries: dict) -> list[str]:
    """Gate-window ordering: never-checked, changed-since-green, then
    oldest-green first; registration order breaks ties."""
    ledger = load_ledger()
    entries = ledger.get("queries", {})
    reg_pos = {n: i for i, n in enumerate(registry_queries)}

    def rank(name: str) -> tuple:
        row = entries.get(name)
        if row is None:
            return (0, 0, reg_pos[name])  # never driver-checked
        fn = registry_queries[name]
        if module_fingerprint(fn.__module__) != row.get("fingerprint"):
            return (1, 0, reg_pos[name])  # code changed since last check
        return (2, row.get("last_checked_round", 0), reg_pos[name])

    return sorted(registry_queries, key=rank)
