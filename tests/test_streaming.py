"""Structured-Streaming incremental materialization tests."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from morph_xr2rml_spark.pipeline import mentions
from morph_xr2rml_spark.streaming import incremental

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    """sf0.001 documents split into two parquet files (two microbatches)."""
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    out = tmp_path_factory.mktemp("docs_stream")
    half = src.num_rows // 2
    pq.write_table(src.slice(0, half), str(out / "part-a.parquet"))
    pq.write_table(src.slice(half), str(out / "part-b.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def aliases(docs):
    return mentions.build_alias_dict(docs).cache()


def test_incremental_matches_batch(spark, doc_dir, docs, aliases, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("triples_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = incremental.incremental_materialization(
        spark, doc_dir, out_dir, ckpt, aliases, max_files_per_trigger=1
    )
    q.awaitTermination(300)

    got = {
        tuple(r)
        for r in incremental.read_materialized(spark, out_dir).collect()
    }
    expect = {
        tuple(r)
        for r in incremental.materialize_batch(spark, docs, aliases).collect()
    }
    assert got == expect
    # predicate-partitioned sink (partition pruning at read time)
    parts = [d for d in os.listdir(out_dir) if d.startswith("pred_dir=")]
    assert len(parts) > 3

    # resume: restarting over the same checkpoint must be a no-op
    n_before = len(got)
    q2 = incremental.incremental_materialization(
        spark, doc_dir, out_dir, ckpt, aliases
    )
    q2.awaitTermination(120)
    assert incremental.read_materialized(spark, out_dir).count() == n_before


def test_mention_rate_stream(spark, doc_dir, aliases):
    stream = incremental.stream_documents(spark, doc_dir)
    rates = incremental.mention_rate_stream(
        stream, aliases, window="1 minute", watermark="2 minutes"
    )
    q = (
        rates.writeStream.format("memory")
        .queryName("mention_rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM mention_rates").collect()
    assert rows, "windowed aggregation produced no rows"
    assert all(r["n_mentions"] > 0 for r in rows)
    assert all(r["window_end"] > r["window_start"] for r in rows)
