"""Cross-table commit protocol without a lakehouse (SURVEY §4 transactionality).

The reference's registration transaction atomically commits entities +
datasets + file moves, rolling back on exception (register-omero.py:58-61).
One Delta table gives per-table ACID; a *batch* spanning samples/experiments/
datasets/files needs a manifest: stage every table write, then publish ONE
manifest file whose existence marks the batch committed.  Readers join
against the manifest (or simply ignore staging paths); a crashed job leaves
staging directories and no manifest — invisible, re-runnable, idempotent.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame

from .files import staged_write


def commit_batch(outputs: dict[str, DataFrame], root: str, batch_id: str | None = None) -> str:
    """Stage-write every table under `<root>/<table>/batch=<id>`, then
    atomically publish `<root>/_commits/<id>.json` listing them.

    Returns the manifest path.  If any table write fails, no manifest is
    written and previously staged tables of this batch are removed — the
    batch never becomes visible (all-or-nothing at manifest granularity).
    """
    batch_id = batch_id or uuid.uuid4().hex
    written: list[tuple[str, str]] = []
    try:
        for table, df in outputs.items():
            dest = os.path.join(root, table, f"batch={batch_id}")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            staged_write(df, dest)
            written.append((table, dest))
    except Exception:
        import shutil

        for _, dest in written:
            shutil.rmtree(dest, ignore_errors=True)
        raise
    commits_dir = os.path.join(root, "_commits")
    os.makedirs(commits_dir, exist_ok=True)
    manifest = {
        "batch_id": batch_id,
        "committed_at": time.time(),
        "tables": {t: d for t, d in written},
    }
    tmp = os.path.join(commits_dir, f".{batch_id}.json.tmp")
    final = os.path.join(commits_dir, f"{batch_id}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, final)
    return final


def committed_batches(root: str) -> list[str]:
    commits_dir = os.path.join(root, "_commits")
    if not os.path.isdir(commits_dir):
        return []
    return sorted(
        f[:-5] for f in os.listdir(commits_dir) if f.endswith(".json") and not f.startswith(".")
    )
