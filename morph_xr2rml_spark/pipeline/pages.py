"""Deterministic synthesis of the Common-Crawl-style pages table.

BASELINE.json input_hint fixes the input shape:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

No such table ships with the test environment, so we derive one
deterministically from the driver's ``documents`` parquet (doc_id,
text, lang, source): the text becomes the page body, wrapped into HTML
whose extraction is well-defined (entities escaped, script/style blocks
to strip). Everything is native Column expressions over the input scan
— synthesis is a map-only stage that scales to any input size.

A deterministic ~5% of urls embed reserved characters (space, parens,
%) to exercise the IRI-encoding chain (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ops.hashing import md5_long

WARC_EPOCH = 1577836800  # 2020-01-01T00:00:00Z


def escape_html(text: Column) -> Column:
    """Minimal HTML entity escaping (order matters: & first)."""
    t = F.regexp_replace(text, "&", "&amp;")
    t = F.regexp_replace(t, "<", "&lt;")
    t = F.regexp_replace(t, ">", "&gt;")
    return F.regexp_replace(t, '"', "&quot;")


def page_url(doc_id: Column, source: Column) -> Column:
    """Deterministic url; every 20th page gets reserved chars in the
    path to exercise IRI encoding downstream."""
    tail = F.when(
        doc_id % 20 == 0, F.concat(F.lit("odd path (x)%/"), doc_id.cast("string"))
    ).otherwise(doc_id.cast("string"))
    return F.concat(
        F.lit("https://"), source, F.lit(".example.org/page/"), tail
    )


def page_html(doc_id: Column, title_src: Column, body: Column) -> Column:
    """HTML bytes whose text extraction (extract.extract_text_series)
    returns the body byte-for-byte."""
    return F.encode(
        F.concat(
            F.lit("<html><head><title>"),
            escape_html(title_src),
            F.lit("</title><script>var skip=1;</script>"
                  "<style>p{margin:0}</style></head><body><h1>"),
            escape_html(title_src),
            F.lit("</h1><p>"),
            escape_html(body),
            F.lit("</p><!-- comment --></body></html>"),
        ),
        "UTF-8",
    )


def synthesize_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) -> pages table with a
    stable page_id carried alongside the input_hint columns."""
    doc_id = F.col("doc_id")
    title = F.concat(F.lit("Page "), doc_id.cast("string"))
    return documents.select(
        doc_id.alias("page_id"),
        page_url(doc_id, F.col("source")).alias("url"),
        F.timestamp_seconds(F.lit(WARC_EPOCH) + doc_id).alias("warc_ts"),
        page_html(doc_id, title, F.col("text")).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synthesize_sameas(documents: DataFrame) -> DataFrame:
    """Deterministic sameAs edge set over entity IRIs derived from the
    corpus vocabulary: chains (ent_w -> ent_w's alternate spellings) and
    one hub component, mirroring FIXTURES.md §1's aux-table spec.

    Built from the corpus' distinct tokens so it scales with input:
    every token t gets alt ids alt1_t / alt2_t chained to ent_t, and
    every 7th token also links into a shared hub entity.
    """
    toks = (
        documents.select(F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    ent = F.concat(F.lit("ent_"), F.col("tok"))
    alt1 = F.concat(F.lit("alt1_"), F.col("tok"))
    alt2 = F.concat(F.lit("alt2_"), F.col("tok"))
    chain = toks.select(
        F.explode(
            F.array(
                F.struct(alt1.alias("src"), ent.alias("dst")),
                F.struct(alt2.alias("src"), alt1.alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    hub = (
        toks.where(md5_long(F.col("tok")) % 7 == 0)
        .select(ent.alias("src"), F.lit("ent_hub").alias("dst"))
    )
    return chain.unionByName(hub)
