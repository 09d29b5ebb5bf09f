"""Similarity search over an embedding column (array<float>).

Two paths:

* ``cosine_topk``  — brute-force exact top-k: broadcast the (small)
  query set against the corpus, one narrow projection + window top-k.
  Cost O(|Q| * |corpus|) but fully scan-parallel: at 100 TB this is a
  single pass over the corpus with the queries broadcast, no shuffle
  except the final per-query top-k (tiny: k rows per query per
  partition after partial aggregation).

* ``lsh_ann_topk`` — approximate: L tables of b random-hyperplane sign
  bits (deterministic md5-seeded hyperplanes); candidates = bucket
  collisions in any table; exact cosine re-rank within candidates.
  Shuffle is O(n * L) bucket rows instead of O(|Q| * n) comparisons.

Both rank by (cosine desc, id asc) for deterministic output.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_bp").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_bp", "rank")
    )


def _score(queries: DataFrame, corpus: DataFrame, vec_col: str, id_col: str,
           broadcast_queries: bool = True) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    return (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_bp", F.floor(sim * F.lit(10000.0)).cast("long"))
        .select("query_id", "neighbor_id", "cos_bp")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity."""
    return _rank_topk(_score(queries, corpus, vec_col, id_col), k)


# ---------------------------------------------------------------------------
# LSH (random hyperplane / sign bits)
# ---------------------------------------------------------------------------


def _hyperplane(table: int, bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"hp:{table}:{bit}:{d}".encode()).digest()
        (u,) = struct.unpack(">Q", h[:8])
        out.append(u / float(1 << 63) - 1.0)  # [-1, 1)
    return out


def _bucket_col(vec: Column, table: int, bits: int, dim: int) -> Column:
    """Sign-bit bucket id for one hash table."""
    parts = [F.lit(str(table))]
    for bit in range(bits):
        hp = _hyperplane(table, bit, dim)
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in hp]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        parts.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat_ws(":", *parts)


def lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tables: int = 4,
    bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, vec, bucket) with one row per hash table."""
    buckets = F.array(
        *[_bucket_col(F.col(vec_col), t, bits, dim) for t in range(tables)]
    )
    return df.select(
        F.col(id_col), F.col(vec_col), F.explode(buckets).alias("bucket")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    tables: int = 4,
    bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket candidate join + exact
    cosine re-rank. Recall grows with ``tables``; cost with
    ``tables / 2^bits``."""
    cb = lsh_buckets(corpus, vec_col, id_col, tables, bits, dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    qb = lsh_buckets(queries, vec_col, id_col, tables, bits, dim).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    cand = (
        qb.join(cb, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    scored = cand.withColumn(
        "cos_bp", F.floor(sim * F.lit(10000.0)).cast("long")
    ).select("query_id", "neighbor_id", "cos_bp")
    return _rank_topk(scored, k)
