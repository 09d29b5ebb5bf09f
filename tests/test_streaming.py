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


def test_dedup_stream_first_seen(spark, tmp_path_factory):
    """applyInPandasWithState cross-batch dedup: first-seen copy kept,
    later exact duplicates dropped, min-id within a microbatch."""
    ddir = tmp_path_factory.mktemp("dedup_stream_in")
    odir = str(tmp_path_factory.mktemp("dedup_stream_out"))
    ckpt = str(tmp_path_factory.mktemp("dedup_stream_ckpt"))

    # batch 1: docs 10,11 (11 duplicates 10 -> min-id 10 kept), 12
    # batch 2: doc 20 duplicates 10 (cross-batch dup -> dropped),
    #          docs 21, 22 (22 duplicates 21 -> 21 kept)
    b1 = pa.table({
        "doc_id": pa.array([11, 10, 12], pa.int64()),
        "text": ["same one", "same one", "unique a"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": pa.array([8, 8, 8], pa.int64()),
    })
    b2 = pa.table({
        "doc_id": pa.array([20, 21, 22], pa.int64()),
        "text": ["same one", "unique b", "unique b"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": pa.array([8, 8, 8], pa.int64()),
    })
    pq.write_table(b1, str(ddir / "a-batch1.parquet"))
    pq.write_table(b2, str(ddir / "b-batch2.parquet"))
    # the file stream orders batches by modification time; same-second
    # writes tie and flip batch order run-to-run — pin distinct mtimes
    now = os.stat(str(ddir / "b-batch2.parquet")).st_mtime
    os.utime(str(ddir / "a-batch1.parquet"), (now - 60, now - 60))

    stream = incremental.stream_documents(
        spark, str(ddir), max_files_per_trigger=1
    )
    q = (
        incremental.dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", odir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(odir).collect()
    )
    assert kept == [10, 12, 21]


def test_incremental_sparql_endpoint(spark, docs, aliases, tmp_path_factory):
    """A SPARQL endpoint over the incremental sink answers from the
    graph materialized SO FAR — a query after a new microbatch reflects
    the newly-arrived documents without restarting the endpoint."""
    import json
    import urllib.parse
    import urllib.request

    src_dir = str(tmp_path_factory.mktemp("docs_live"))
    out_dir = str(tmp_path_factory.mktemp("triples_live"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_live"))

    first = docs.limit(20).cache()
    first.write.mode("overwrite").parquet(src_dir)

    q = incremental.incremental_materialization(
        spark, src_dir, out_dir, ckpt, aliases
    )
    q.awaitTermination(300)

    ep = incremental.serve_incremental(spark, out_dir).start()
    try:
        query = (
            "PREFIX kg: <http://kg.example.org/ontology#> "
            "SELECT (COUNT(?p) AS ?n) WHERE { ?p kg:mentions ?e }"
        )
        url = (
            f"http://127.0.0.1:{ep.port}/sparql?query="
            + urllib.parse.quote(query)
        )

        def count_now() -> int:
            with urllib.request.urlopen(url, timeout=120) as resp:
                doc = json.loads(resp.read())
            return int(doc["results"]["bindings"][0]["n"]["value"])

        n1 = count_now()
        assert n1 > 0

        # a new microbatch arrives: more documents -> more mentions
        docs.limit(60).write.mode("append").parquet(src_dir)
        q2 = incremental.incremental_materialization(
            spark, src_dir, out_dir, ckpt, aliases
        )
        q2.awaitTermination(300)

        n2 = count_now()  # SAME endpoint, no restart
        assert n2 > n1
    finally:
        ep.stop()
        first.unpersist()


def test_virtual_endpoint_sees_source_appends(spark, tmp_path_factory):
    """Rewriting mode x live sources: the endpoint answers each request
    by translating against the source tables directly — a row appended
    to the source parquet is visible to the NEXT request, with no
    materialization job and no sink write in between (verdict round-3
    stretch: streaming x virtual)."""
    import json
    import urllib.parse
    import urllib.request

    from morph_xr2rml_spark.mapping.parser import parse_mapping
    from morph_xr2rml_spark.sources.catalog import SourceCatalog

    ttl = """\
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix ex:  <http://example.org/ontology#> .

<#TMItem>
    xrr:logicalSource [ rr:tableName "items"; xrr:referenceFormulation xrr:Column ];
    rr:subjectMap [ rr:template "http://example.org/item/{id}" ];
    rr:predicateObjectMap [
        rr:predicate ex:label;
        rr:objectMap [ rr:column "label" ];
    ];
    .
"""
    src_dir = str(tmp_path_factory.mktemp("items_live"))
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id int, label string"
    ).write.mode("overwrite").parquet(src_dir)

    def catalog_provider():
        # re-read per request: a fresh parquet scan re-lists the files
        return SourceCatalog(spark).register(
            "items", spark.read.parquet(src_dir), unique_key=["id"]
        )

    ep = incremental.serve_virtual(
        spark, parse_mapping(ttl), catalog_provider
    ).start()
    try:
        query = (
            "PREFIX ex: <http://example.org/ontology#> "
            "SELECT ?l WHERE { ?i ex:label ?l }"
        )
        url = (
            f"http://127.0.0.1:{ep.port}/sparql?query="
            + urllib.parse.quote(query)
        )

        def labels_now() -> set[str]:
            with urllib.request.urlopen(url, timeout=120) as resp:
                doc = json.loads(resp.read())
            return {b["l"]["value"] for b in doc["results"]["bindings"]}

        assert labels_now() == {"alpha", "beta"}

        # a source-table append — NO materialization, NO sink write
        spark.createDataFrame(
            [(3, "gamma")], "id int, label string"
        ).write.mode("append").parquet(src_dir)

        assert labels_now() == {"alpha", "beta", "gamma"}  # same endpoint
    finally:
        ep.stop()
