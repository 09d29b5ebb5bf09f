"""Bucketed triple-table materialization.

The north rule materializes the graph to partitioned (subj, pred, obj)
tables. Beyond predicate partitioning (pipeline/run.py pred_dir —
partition pruning for per-predicate scans), this sink buckets and sorts
by ``subj``: every downstream subject-keyed join — BGP evaluation is
self-joins on shared subject variables, canonicalization rewrites join
on subj — reads co-located, pre-sorted buckets and skips its shuffle
(and, with sorted buckets, the sort) entirely. At 100 TB that turns the
dominant repeated cost of querying the materialized graph into a
metadata property of the table, paid once at write time.

Spark only applies bucketed-join elimination to catalog tables, hence
``saveAsTable`` rather than path-based parquet (reference sink parity:
`MorphBaseMaterializer.serialize:37-68` writes a serialized file; the
Spark-native "file" is a table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_triples(
    triples: DataFrame,
    table: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Materialize (subj, pred, obj) as a parquet table bucketed and
    sorted by subj. ``buckets`` should scale with corpus size (target
    ~100-500 MB per bucket file at the expected table size)."""
    (
        triples.write.mode(mode)
        .bucketBy(buckets, "subj")
        .sortBy("subj")
        .format("parquet")
        .saveAsTable(table)
    )


def read_triples_table(spark: SparkSession, table: str) -> DataFrame:
    """The bucketed table, bucket metadata intact (joins on subj
    against another table bucketed the same way shuffle neither side)."""
    return spark.table(table)
