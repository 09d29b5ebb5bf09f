"""Similarity search over an embedding column (array<float>).

Three paths:

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

* ``ivf_topk`` — approximate: inverted-file index. A deterministic
  md5-seeded codebook of K coarse centroids partitions the corpus into
  inverted lists (each vector joins its nearest centroid's list);
  queries probe their ``nprobe`` nearest lists and re-rank candidates
  by exact cosine. At scale the corpus assignment is one pass with the
  codebook broadcast, the inverted lists are an equi-join key, and the
  candidate set per query is ~``nprobe/K`` of the corpus.

All rank by (cosine desc, id asc) for deterministic output.
"""

from __future__ import annotations

import functools
import hashlib
import operator
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


def _buckets_udf(tables: int, bits: int, dim: int):
    """Arrow-batched sign-bit bucketizer: every vector is scored
    against all tables x bits hyperplanes with an explicit
    dimension-order accumulation loop — each dot is the same
    0.0-seeded left fold the DuckDB oracle's list_reduce computes, so
    bucket strings reproduce bit-for-bit. Vectorized across the batch
    (one numpy op per dimension per hyperplane), no per-row Python.

    An expression-level scorer is wrong both ways here (as in the IVF
    codebook scorer): unrolling tables x bits x dim literal terms OOMs
    Janino codegen, and array-literal HOF folds are
    interpreter-evaluated per element (~6x this path)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    hps = [
        [_hyperplane(t, b, dim) for b in range(bits)] for t in range(tables)
    ]

    def bucketize(vs):  # pd.Series -> pd.Series
        vals = vs.tolist()
        mask = [v is not None and len(v) == dim for v in vals]
        if not any(mask):
            return pd.Series([[] for _ in vals])
        V = np.array(
            [v if m else [0.0] * dim for v, m in zip(vals, mask)],
            dtype=np.float64,
        )
        n = V.shape[0]
        per_table: list[list[str]] = []
        for t in range(tables):
            bitcols = []
            for b in range(bits):
                hp = hps[t][b]
                acc = np.zeros(n, dtype=np.float64)
                for d in range(dim):  # dimension-order left fold per row
                    acc = acc + V[:, d] * hp[d]
                bitcols.append(acc > 0)
            prefix = f"{t}:"
            per_table.append(
                [
                    prefix
                    + ":".join("1" if bc[i] else "0" for bc in bitcols)
                    for i in range(n)
                ]
            )
        return pd.Series(
            [
                [per_table[t][i] for t in range(tables)] if m else []
                for i, m in enumerate(mask)
            ]
        )

    return pandas_udf(bucketize, T.ArrayType(T.StringType()))


def lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tables: int = 4,
    bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, vec, bucket) with one row per hash table."""
    udf = _buckets_udf(tables, bits, dim)
    return df.select(
        F.col(id_col), F.col(vec_col), F.explode(udf(F.col(vec_col))).alias("bucket")
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
    # the query bucket table is |Q| x tables rows — broadcast it
    # explicitly (size estimation over the unrolled bucket projection
    # is unreliable, and at scale the corpus side must never be the
    # built side)
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    scored = cand.withColumn(
        "cos_bp", F.floor(sim * F.lit(10000.0)).cast("long")
    ).select("query_id", "neighbor_id", "cos_bp")
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file index over a deterministic coarse codebook)
# ---------------------------------------------------------------------------


def ivf_centroids(n_clusters: int, dim: int) -> list[list[float]]:
    """Deterministic md5-seeded coarse codebook (values in [-1, 1))."""
    out = []
    for c in range(n_clusters):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"ivf:{c}:{d}".encode()).digest()
            (u,) = struct.unpack(">Q", h[:8])
            row.append(u / float(1 << 63) - 1.0)
        out.append(row)
    return out


def _probe_udf(centroids: list[list[float]], nprobe: int, dim: int):
    """Arrow-batched codebook scorer: per batch, a float64 matrix of
    vectors scored against every centroid with an explicit
    dimension-order accumulation loop — each row's dot is the same
    0.0-seeded left fold the DuckDB oracle's list_reduce computes, so
    the scores (and the stable-argsort probe order, ties by centroid
    index) are reproducible bit-for-bit. Vectorized across the batch
    (one numpy op per dimension per centroid), no per-row Python.

    An expression-level scorer is wrong both ways here: unrolling
    K x dim literal terms explodes plan compile time / task-binary
    size, and array-literal HOF folds are interpreter-evaluated per
    element. The Arrow path is also the 100-TB plan: one scan, codebook
    in the closure, no shuffle to assign."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    c2s = []
    for c in centroids:
        c2 = 0.0
        for x in c:  # left-to-right accumulation, mirrored in the oracle
            c2 = c2 + x * x
        c2s.append(c2)

    def probe(vs):  # pd.Series -> pd.Series (hints omitted: pandas_udf
        # would try to resolve them against module scope)
        vals = vs.tolist()
        mask = [v is not None and len(v) == dim for v in vals]
        if not any(mask):
            return pd.Series([[] for _ in vals])
        V = np.array(
            [v if m else [0.0] * dim for v, m in zip(vals, mask)],
            dtype=np.float64,
        )
        n = V.shape[0]
        scores = np.empty((n, len(centroids)), dtype=np.float64)
        for j, c in enumerate(centroids):
            acc = np.zeros(n, dtype=np.float64)
            for d in range(dim):  # dimension-order left fold per row
                acc = acc + V[:, d] * c[d]
            scores[:, j] = c2s[j] - 2.0 * acc
        order = np.argsort(scores, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(
            [list(map(int, row)) if m else [] for row, m in zip(order, mask)]
        )

    return pandas_udf(probe, T.ArrayType(T.IntegerType()))


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 1,
    dim: int = 64,
) -> DataFrame:
    """(id, vec, cluster) rows: each vector's ``nprobe`` nearest
    centroids by L2, ties broken by centroid index. One row per probed
    list (corpus side uses nprobe=1 — the inverted-list assignment)."""
    udf = _probe_udf(centroids, nprobe, dim)
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(udf(F.col(vec_col))).alias("cluster"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via inverted lists: corpus vectors join their
    nearest centroid's list, queries probe their ``nprobe`` nearest
    lists, candidates re-rank by exact cosine. Recall grows with
    ``nprobe``; candidate cost ~ nprobe/n_clusters of the corpus."""
    cents = ivf_centroids(n_clusters, dim)
    cb = ivf_assign(corpus, cents, vec_col, id_col, 1, dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cluster"
    )
    qb = ivf_assign(queries, cents, vec_col, id_col, nprobe, dim).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cluster"
    )
    # pin the probe side as the build side: the query list is |Q| x
    # nprobe rows, and size estimation over the UDF-derived plan is
    # unreliable — at scale a mis-picked build side (the corpus) is an
    # OOM (same reasoning as lsh_ann_topk above)
    cand = (
        cb.join(F.broadcast(qb), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    scored = cand.withColumn(
        "cos_bp", F.floor(sim * F.lit(10000.0)).cast("long")
    ).select("query_id", "neighbor_id", "cos_bp")
    return _rank_topk(scored, k)
