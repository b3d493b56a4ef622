"""Exactly-once streaming sink: epoch-manifest idempotent parquet writes.

Structured Streaming's ``foreachBatch`` gives at-least-once delivery: after
a crash between "batch written" and "offsets committed", the SAME epoch is
replayed into the sink. A transactional sink must therefore make the write
idempotent per epoch. This module implements the standard two-phase layout
a lakehouse table format (Delta/Iceberg/Hudi) performs internally, using
only parquet + an atomic manifest rename — the pattern a deployment uses
when those formats aren't on the classpath:

1. write the batch to ``<root>/epoch=<id>/`` (overwrite — a torn previous
   attempt of the SAME epoch is clobbered, never appended to);
2. atomically record the epoch as committed (``os.replace`` of a manifest
   entry — rename is the only atomic primitive a filesystem guarantees);
3. on replay, a committed epoch is SKIPPED before any write.

Readers consume ``committed_epochs() -> read committed dirs only``, so a
torn uncommitted directory is invisible — the same snapshot-isolation
contract a table-format manifest provides.

At scale the manifest lives next to the table on the object store and the
epoch directory becomes a partition; the per-epoch overwrite stays safe
because epoch ids are monotonically assigned by the checkpoint.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class EpochCommittedParquetSink:
    """Idempotent per-epoch parquet sink for ``foreachBatch``."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)
        self.replayed_epochs: list[int] = []  # observability for tests/logs

    def _entry(self, epoch_id: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch-{epoch_id}.json")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._entry(epoch_id))

    def committed_epochs(self) -> list[int]:
        return sorted(
            int(f[len("epoch-") : -len(".json")])
            for f in os.listdir(self.manifest_dir)
            if f.startswith("epoch-") and f.endswith(".json")
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        """The ``foreachBatch`` function: skip-if-committed, write, commit."""
        if self.is_committed(epoch_id):
            # replay after a crash-between-write-and-offset-commit: the
            # data is already durable — skipping is what makes the sink
            # exactly-once instead of at-least-once
            self.replayed_epochs.append(epoch_id)
            return
        path = os.path.join(self.root, f"epoch={epoch_id}")
        batch_df.write.mode("overwrite").parquet(path)
        # row count from the WRITTEN files' footers (metadata-only scan) —
        # a batch_df.count() before the write would execute the upstream
        # micro-batch lineage twice per epoch
        n_rows = batch_df.sparkSession.read.parquet(path).count()
        tmp = self._entry(epoch_id) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"epoch": epoch_id, "n_rows": n_rows, "path": path}, fh)
        os.replace(tmp, self._entry(epoch_id))  # atomic commit point

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Snapshot view: union of committed epoch directories ONLY —
        a torn uncommitted write is never visible to readers."""
        epochs = self.committed_epochs()
        if not epochs:
            raise ValueError("no committed epochs")
        paths = [os.path.join(self.root, f"epoch={e}") for e in epochs]
        return spark.read.parquet(*paths)
