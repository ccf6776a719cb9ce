"""Exactly-once guard for ``foreachBatch`` steps that combine
side-effecting writes (parquet appends, TableStore merges).

Structured Streaming's ``foreachBatch`` body runs AT-LEAST-ONCE: a
micro-batch whose step crashes midway (or completes but dies before
the checkpoint commit) is re-run with the SAME ``batch_id`` and the
same input rows. A step that performs several non-atomic writes —
append deltas, append stats, merge state — therefore double-applies
whatever completed before the crash. Checkpointing alone does NOT
prevent this: the checkpoint only dedups across *committed* batches,
never within a retried one.

Two mechanisms restore idempotence, used together by the sinks in
this package:

1. **Append → partition overwrite.** Every appended frame is stamped
   with the micro-batch id and written with
   ``mode("overwrite")`` + ``partitionOverwriteMode=dynamic``
   partitioned by ``__mb`` — a retry REPLACES the batch's own
   partition instead of re-appending (the same INSERT OVERWRITE
   idiom a lakehouse job uses for reruns).

2. **State merges → pre-version pinning** (this module). Before the
   first state mutation, the step records ``{batch_id → the current
   version of every state table}`` in a marker file (atomic
   tmp+rename). All reads that feed the batch's computation use the
   PINNED versions (TableStore time travel — the predecessor of
   every commit is GC-retained), so a retry recomputes byte-identical
   updates even when some merges already landed; re-merging identical
   keyed rows is then a no-op by LWW-upsert semantics, and the
   overwrite-by-``__mb`` appends are replaced wholesale.

The marker is one tiny JSON per sink (driver-side, same durability
class as the TableStore version pointer). Only the latest batch is
retained — Structured Streaming never retries anything older than
the last uncommitted batch.
"""

from __future__ import annotations

import json
import os


class MicroBatchPin:
    """Per-sink marker recording the pre-state versions of the batch
    being applied. ``pre_versions`` is the only entry point: call it
    at the top of the ``foreachBatch`` step, BEFORE any mutation, and
    read all state through the returned versions."""

    def __init__(self, marker_path: str):
        self.marker_path = marker_path

    def _read(self) -> dict | None:
        try:
            with open(self.marker_path, encoding="utf-8") as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _write(self, doc: dict) -> None:
        os.makedirs(os.path.dirname(self.marker_path), exist_ok=True)
        tmp = self.marker_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(doc, f)
        os.replace(tmp, self.marker_path)

    def pre_versions(self, batch_id: int, stores: dict) -> dict:
        """Versions of ``stores`` (name → TableStore) as of the START
        of micro-batch ``batch_id`` — live versions on first
        execution, the recorded ones on a retry. Values are version
        strings or None (store did not exist yet)."""
        marker = self._read()
        if marker is not None and marker.get("mb_id") == batch_id:
            return marker["pre"]
        pre = {name: s.current_version() for name, s in stores.items()}
        self._write({"mb_id": batch_id, "pre": pre})
        return pre


def overwrite_by_batch(df, batch_id: int, path: str) -> None:
    """Idempotent micro-batch append: stamp ``__mb`` and INSERT
    OVERWRITE only that partition, so a retried batch replaces its own
    rows. Readers select their data columns explicitly and never see
    ``__mb`` unless they ask for it."""
    from pyspark.sql import functions as F

    (
        df.withColumn("__mb", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__mb")
        .parquet(path)
    )
