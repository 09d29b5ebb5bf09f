"""Session-scoped cache registry.

Operators persist intermediates their plans reference repeatedly (the
shingle posting table, RefObjectMap parent-side scans, the triple table
under SPARQL evaluation). In a long-lived session those executor blocks
leak unless something unpersists them after the consuming action runs —
the operator itself cannot, because it returns a lazy plan.

Every such persist goes through :func:`cache`, giving one release
point: :func:`release_caches` drops everything still registered.
Contract/bench queries call it on entry (releasing the *previous*
query's blocks, whose action has completed), and library users embed it
wherever their job boundaries are.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []

_CKPT_ROOT: str | None = None


def checkpoint_parquet(df: DataFrame, tag: str = "") -> DataFrame:
    """Cut lineage with a parquet round-trip (eager: the write IS the
    materialization barrier).

    This is the pin for iterative/fixpoint plans where a round
    references the previous round more than once: ``persist`` leaves
    the LOGICAL plan in place, so each round's tree embeds the previous
    round's tree at every reference and analysis/optimization time
    doubles per iteration (measured: 0.5s -> 19s over 8 rounds of
    min-label propagation); ``localCheckpoint`` would truncate lineage
    but crashes on AQE-finalized shuffle plans in Spark 4
    (java.util.NoSuchElementException: key not found). The parquet
    round-trip is also exactly what a resumable cluster job does —
    reliable checkpoints on shared storage — so the local tmpdir here
    swaps for an HDFS/S3 stage path at scale."""
    global _CKPT_ROOT
    if _CKPT_ROOT is None:
        _CKPT_ROOT = tempfile.mkdtemp(prefix="morph-spark-ckpt-")
        atexit.register(shutil.rmtree, _CKPT_ROOT, ignore_errors=True)
    path = os.path.join(_CKPT_ROOT, f"{tag}{uuid.uuid4().hex}")
    df.write.parquet(path)
    return df.sparkSession.read.parquet(path)


def cache(df: DataFrame) -> DataFrame:
    """persist() + register for a later :func:`release_caches`."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every registered DataFrame; returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n
