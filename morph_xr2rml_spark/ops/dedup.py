"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale design (the point of these over naive pairwise comparison):

* exact       one hash-groupBy (map-side partial agg) — no pairs at all.
* Jaccard     shingle-explode + equi-join on shingle — pairs are only
              generated for docs that actually share a shingle; a
              ``max_df`` cap drops stop-shingles whose posting lists
              would quadratically blow up the join at web scale.
* MinHash-LSH fixed-width signature (one groupBy), banded bucket join —
              candidate pairs per band bucket only; O(n) shuffle rows
              per band instead of O(n^2).
* SimHash     60-bit sketch; candidate generation by 4x15-bit chunk
              banding (pigeonhole: hamming<=3 => >=1 chunk equal), so
              the self-join is equi, never theta/cross.
* embedding   brute pairwise kept for small dims/corpora + as the
              correctness oracle; the LSH-bucketed path for scale lives
              in similarity.py.

All hashes are md5-derived (hashing.py) so the DuckDB oracle reproduces
every value bit-for-bit. Similarities are emitted as floor(x*10000)
bigints ("basis points") for exact cross-engine comparison.
"""

from __future__ import annotations

import functools
import operator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import md5_long, md5_long_seeded
from .text import normalized_text

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate groups: one row per distinct content with the
    surviving (minimum) id and the number of copies.

    Single hash-groupBy over a 60-bit content hash — partial aggregation
    map-side, one shuffle of (hash, id) pairs. Never materializes pairs.
    """
    return (
        df.select(md5_long(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rows surviving exact dedup (min id per identical content)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(text: Column, k: int = 5) -> Column:
    """Distinct word k-shingles of the normalized text. Documents
    shorter than k words produce one shingle (the whole document)."""
    toks = F.split(normalized_text(text), " ")
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.array_distinct(
        F.when(n >= k, windows).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def _shingles_udf(k: int):
    """Arrow-batched shingler. The Column version (word_shingles) is
    built from sequence/transform/slice higher-order functions, which
    Catalyst evaluates with the expression interpreter (one closure
    call per window element — measured ~2.5x slower than Arrow batch
    transfer + Python string slicing). Same output: ordered-distinct
    word k-shingles, whole doc when shorter than k words."""

    def batch(norm: pd.Series) -> pd.Series:
        out = []
        for t in norm:
            if not isinstance(t, str):
                # NULL text arrives as None/NaN; match the Column-based
                # word_shingles path, which yields [''] on null input
                out.append([""])
                continue
            toks = t.split(" ")
            if len(toks) >= k:
                sh = list(
                    dict.fromkeys(
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    )
                )
            else:
                sh = [" ".join(toks)]
            out.append(sh)
        return pd.Series(out)

    return F.pandas_udf(batch, T.ArrayType(T.StringType()))


def doc_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    use_arrow: bool = True,
) -> DataFrame:
    """(id, shingle) exploded pairs + per-doc distinct-shingle count."""
    if use_arrow:
        shingles = _shingles_udf(k)(normalized_text(F.col(text_col)))
    else:
        shingles = word_shingles(F.col(text_col), k)
    with_sh = df.select(
        F.col(id_col), shingles.alias("__shingles")
    ).withColumn("n_shingles", F.size("__shingles"))
    return with_sh.select(
        id_col, "n_shingles", F.explode("__shingles").alias("shingle")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs with word-k-shingle Jaccard >= threshold.

    Plan: shingle-explode -> (optional stop-shingle cap) -> self
    equi-join on shingle -> count intersections per pair -> Jaccard.
    ``max_df`` drops shingles occurring in more than max_df documents
    before the join (posting-list cap); at web scale this is mandatory
    to bound the worst-case join fan-out.

    The exploded shingle table is persisted: the plan consumes it three
    times (both join sides + the df-cap aggregate) and the shingle
    window expressions are interpreter-evaluated higher-order
    functions — recomputing them dominates the whole query otherwise.
    The persist is registered with plans.caching so a later
    release_caches() frees the executor blocks (persisting here and
    never releasing is an executor-memory leak in long sessions).
    """
    from ..plans.caching import cache

    sh = cache(doc_shingles(df, text_col, id_col, k))
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    a = sh.select(
        F.col(id_col).alias("id_a"),
        F.col("n_shingles").alias("na"),
        "shingle",
    )
    b = sh.select(
        F.col(id_col).alias("id_b"),
        F.col("n_shingles").alias("nb"),
        "shingle",
    )
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard_bp", F.floor(jac * F.lit(10000.0)).cast("long"))
        .where(jac >= F.lit(threshold))
        .select("id_a", "id_b", "n_inter", "jaccard_bp")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-document MinHash signature: for each of ``num_hashes`` seeded
    hash functions, the min over the doc's shingles. One explode + one
    groupBy with num_hashes min-aggregates (all map-side combinable)."""
    sh = doc_shingles(df, text_col, id_col, k)
    aggs = [
        F.min(md5_long_seeded(F.col("shingle"), i)).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs by banded LSH, verified on full signatures.

    Banding: num_hashes/rows_per_band bands; two docs are candidates if
    any band's hash rows all agree (bucket equi-join). Verification:
    fraction of agreeing signature positions >= threshold (the unbiased
    MinHash estimate of Jaccard). Everything is equi-join + groupBy —
    no cross product anywhere.
    """
    from ..plans.caching import cache

    # the banded table self-joins below: without a materialization
    # barrier the signature pipeline (Arrow shingler + explode +
    # num_hashes min-aggregates) executes once per join side
    sig = cache(minhash_signatures(df, text_col, id_col, k, num_hashes))
    n_bands = num_hashes // rows_per_band
    band_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(band)),
                *[
                    F.col(f"mh{band * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for band in range(n_bands)
        ]
    )
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(num_hashes)])
    banded = sig.select(
        F.col(id_col),
        sig_arr.alias("sig"),
        F.explode(band_keys).alias("bucket"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "bucket"
    )
    cand = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        operator.add,
    )
    est = agree.cast("double") / F.lit(float(num_hashes))
    return (
        cand.withColumn("sig_agree", agree)
        .withColumn("est_jaccard_bp", F.floor(est * F.lit(10000.0)).cast("long"))
        .where(est >= F.lit(threshold))
        .select("id_a", "id_b", "sig_agree", "est_jaccard_bp")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # md5_long yields 60-bit values
_SIMHASH_CHUNKS = 4
_CHUNK_BITS = SIMHASH_BITS // _SIMHASH_CHUNKS


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash per document, weighted by token frequency.

    token-explode -> 60 conditional-sum aggregates in ONE groupBy (all
    partial-aggregated map-side) -> bit assembly. No UDFs.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    h = md5_long(F.col("tok"))
    aggs = [
        F.sum(
            F.when(h.bitwiseAND(F.lit(1 << b)) != 0, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    bit_terms = [
        F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
        for b in range(SIMHASH_BITS)
    ]
    return sums.select(
        F.col(id_col), functools.reduce(operator.add, bit_terms).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Candidates by 4x15-bit chunk banding: hamming<=3 over 60 bits
    guarantees at least one exact-equal 15-bit chunk (pigeonhole), so
    candidate generation is 4 equi-joins on chunk value — never a cross
    join. Requires max_hamming < number of chunks (4).
    """
    if max_hamming >= _SIMHASH_CHUNKS:
        raise ValueError("chunk banding requires max_hamming < 4")
    from ..plans.caching import cache

    # self-joined below — persist so the 60-aggregate sketch groupBy
    # runs once, not once per join side
    sh = cache(simhash(df, text_col, id_col))
    mask = (1 << _CHUNK_BITS) - 1
    chunk_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(c)),
                F.shiftright(F.col("simhash"), c * _CHUNK_BITS)
                .bitwiseAND(F.lit(mask))
                .cast("string"),
            )
            for c in range(_SIMHASH_CHUNKS)
        ]
    )
    banded = sh.select(
        F.col(id_col), F.col("simhash"), F.explode(chunk_keys).alias("bucket")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "bucket"
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", dist.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (bit-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        operator.add,
    )


def unrolled_dot(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled to a flat codegen'd expression.

    Catalyst evaluates higher-order-function lambdas interpreted, one
    closure call per element; for pairwise scoring over millions of
    pairs that interpreter overhead dominates. Unrolling to
    a[0]*b[0] + a[1]*b[1] + ... keeps the whole thing inside
    whole-stage codegen. The left-associative sum is bit-identical to
    the 0.0-seeded left fold (0.0 + x == x in IEEE), so results match
    :func:`_dot` and the DuckDB ``list_reduce`` oracle exactly.
    """
    prods = [
        a.getItem(i).cast("double") * b.getItem(i).cast("double")
        for i in range(dim)
    ]
    return functools.reduce(operator.add, prods)


def normalize_vec(vec: Column, dim: int) -> Column:
    """vec / ||vec|| as array<double>.

    WARNING: the norm expression is embedded in the transform lambda,
    so Catalyst re-evaluates the full dim-term norm PER ELEMENT
    (quadratic per row, interpreted). For pairwise scoring use
    :func:`vec_norm` + :func:`unrolled_normalized_dot`, which
    materialize the norm once per row and stay inside codegen."""
    nrm = F.sqrt(unrolled_dot(vec, vec, dim))
    return F.transform(vec, lambda x: x.cast("double") / nrm)


def vec_norm(vec: Column, dim: int) -> Column:
    """||vec|| as a flat codegen'd expression (left-associative sum,
    bit-identical to the DuckDB list_reduce fold)."""
    return F.sqrt(unrolled_dot(vec, vec, dim))


def unrolled_normalized_dot(
    a: Column, b: Column, na: Column, nb: Column, dim: int
) -> Column:
    """sum_i (a[i]/na) * (b[i]/nb), left-associative and codegen'd.

    Dividing each element before multiplying reproduces the
    normalize-then-fold oracle bit-for-bit ((a[i]/na)*(b[i]/nb) is the
    very same IEEE op sequence as u_a[i]*u_b[i] over pre-normalized
    arrays). ``na``/``nb`` must be *materialized columns* (aliased in a
    previous projection): they are referenced dim times here, which is
    exactly what stops CollapseProject from inlining the norm
    computation back into every term.
    """
    prods = [
        (a.getItem(i).cast("double") / na) * (b.getItem(i).cast("double") / nb)
        for i in range(dim)
    ]
    return functools.reduce(operator.add, prods)


def cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / F.sqrt(_dot(ad, ad) * _dot(bd, bd))


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dim: int | None = None,
    blocks: int | None = None,
    method: str = "gemm",
) -> DataFrame:
    """Pairs with cosine similarity >= threshold. Exact by default.

    ``method``:

    * ``'gemm'`` (default) — exact two-phase plan. Phase 1 enumerates
      candidates by **distributed block matrix multiplication**: rows
      hash into B blocks, the upper-triangle block pairs are cogrouped
      (applyInPandas), and each task runs one float64 BLAS GEMM with a
      3-basis-point slack under the threshold. Phase 2 re-scores the
      (few) candidates with the bit-reproducible left-fold cosine and
      applies the exact threshold — so results are independent of BLAS
      accumulation order and match the DuckDB oracle exactly. Exact
      all-pairs similarity IS O(n^2); at scale the right engineering is
      this block-matmul shape — shuffle O(n * B) vector copies, compute
      (n/B)^2 GEMM flops per task spread over B(B+1)/2 independent
      tasks, BLAS constant ~100x below per-pair expression eval. B
      defaults to ~sqrt(8 * parallelism) so per-task work shrinks as
      the cluster grows.

    * ``'lsh'`` — approximate at low thresholds, effectively exact at
      high ones: hyperplane-bucket candidate generation
      (similarity.lsh_buckets self-join) + the same exact re-score.
      Sub-quadratic, the web-scale path for threshold >= ~0.8 where a
      random-hyperplane table has high collision probability for true
      pairs (p_table = (1 - theta/pi)^bits). At threshold 0.4
      (theta/pi ~ 0.37) NO hyperplane scheme reaches recall 1.0 with
      sub-quadratic candidates — use 'gemm' there.

    * ``'expr'`` — the block-partitioned codegen equi-join form
      (requires ``dim``); kept as an independent cross-check of the
      gemm path (no Python workers, pure whole-stage codegen).

    The re-score normalizes once and folds left-to-right (unrolled when
    ``dim`` is given — codegen'd; interpreted HOF otherwise), matching
    the DuckDB ``list_reduce`` fold bit-for-bit.
    """
    if method == "expr":
        if dim is None:
            raise ValueError("method='expr' requires dim")
        return _expr_neardup_pairs(df, vec_col, id_col, threshold, dim)
    if method == "lsh":
        if dim is None:
            raise ValueError("method='lsh' requires dim")
        cand = _lsh_candidates(df, vec_col, id_col, dim)
    elif method == "gemm":
        cand = _gemm_candidates(df, vec_col, id_col, threshold, blocks)
    else:
        raise ValueError(f"unknown method {method!r}")
    return _exact_rescore(df, cand, vec_col, id_col, threshold, dim)


_CAND_SLACK_BP = 3  # candidate threshold slack (bp) absorbing BLAS-vs-fold ulps


def _gemm_candidates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    blocks: int | None,
) -> DataFrame:
    """(id_a, id_b) candidate pairs via block matrix multiplication."""
    spark = df.sparkSession
    if blocks is None:
        par = spark.sparkContext.defaultParallelism
        blocks = max(4, int((8 * par) ** 0.5))
    nb = blocks
    cand_min = (int(threshold * 10000) - _CAND_SLACK_BP) / 10000.0

    # block assignment only places work — results are exact either way —
    # so an engine-native hash is fine here
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int")
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                     blk.alias("__blk"))
    # row in block p: left side of pairs (p, j>=p), right side of (i<=p, p)
    left = base.select(
        "__id", "__v",
        F.explode(F.sequence(F.col("__blk"), F.lit(nb - 1))).alias("__j"),
        F.col("__blk").alias("__i"),
    ).select("__id", "__v", (F.col("__i") * nb + F.col("__j")).alias("__pid"))
    right = base.select(
        "__id", "__v",
        F.explode(F.sequence(F.lit(0), F.col("__blk"))).alias("__i"),
        F.col("__blk").alias("__j"),
    ).select("__id", "__v", (F.col("__i") * nb + F.col("__j")).alias("__pid"))

    out_schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )

    def score_block(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if l.empty or r.empty:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        pid = int(key[0])
        diagonal = (pid // nb) == (pid % nb)
        A = np.stack([np.asarray(v, dtype=np.float64) for v in l["__v"]])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in r["__v"]])
        with np.errstate(divide="ignore", invalid="ignore"):
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
        S = A @ B.T
        ia, ib = np.where(S >= cand_min)
        id_l = l["__id"].values[ia].astype("int64")
        id_r = r["__id"].values[ib].astype("int64")
        if diagonal:
            keep = id_l < id_r  # each unordered pair appears twice
            lo, hi = id_l[keep], id_r[keep]
        else:
            keep = id_l != id_r
            lo = np.minimum(id_l[keep], id_r[keep])
            hi = np.maximum(id_l[keep], id_r[keep])
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    return (
        left.groupBy("__pid")
        .cogroup(right.groupBy("__pid"))
        .applyInPandas(score_block, out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def _lsh_candidates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    tables: int = 8,
    bits: int = 8,
) -> DataFrame:
    """(id_a, id_b) candidates from hyperplane sign-bucket collisions."""
    from .similarity import lsh_buckets

    b = lsh_buckets(df, vec_col, id_col, tables, bits, dim).select(
        F.col(id_col).alias("__id"), "bucket"
    )
    a = b.select(F.col("__id").alias("id_a"), "bucket")
    c = b.select(F.col("__id").alias("id_b"), "bucket")
    return (
        a.join(c, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def _exact_rescore(
    df: DataFrame,
    cand: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    dim: int | None,
) -> DataFrame:
    """Candidates -> exact (id_a, id_b, cos_bp) via the reproducible
    left-fold cosine; the candidate set is small, so both vector
    lookups are broadcast joins against the corpus. The candidate set
    is persisted (registered for release): it feeds two broadcast
    exchanges, which would otherwise re-run candidate generation."""
    from ..plans.caching import cache

    cand = cache(cand)
    # normalization happens in the pre-join projection: aliased array
    # columns are NOT collapsed into the 2*dim getItem references of the
    # scoring expression (CollapseProject keeps multi-referenced
    # non-cheap aliases), whereas inlining normalize_vec inside
    # unrolled_dot re-evaluates the whole transform per element
    if dim is not None:
        nrm = vec_norm(F.col(vec_col), dim)
        e_a = df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("__va"),
            nrm.alias("__na"),
        )
        e_b = df.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("__vb"),
            nrm.alias("__nb"),
        )
        sim = unrolled_normalized_dot(
            F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb"), dim
        )
    else:
        e_a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
        e_b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
        sim = cosine(F.col("__va"), F.col("__vb"))
    withv = e_a.join(F.broadcast(cand), "id_a")
    withv = e_b.join(F.broadcast(withv), "id_b")
    return (
        withv.withColumn("cos_bp", F.floor(sim * F.lit(10000.0)).cast("long"))
        .where(F.col("cos_bp") >= F.lit(int(threshold * 10000)))
        .select("id_a", "id_b", "cos_bp")
    )


def _expr_neardup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float, dim: int
) -> DataFrame:
    """Exact pairs via block-partitioned equi-join with the scoring
    expression in a codegen'd post-join filter (never a theta-join
    condition, which Spark evaluates interpreted)."""
    blocks = 16
    n = df.select(
        F.col(id_col),
        F.col(vec_col).alias("nv"),
        vec_norm(F.col(vec_col), dim).alias("nrm"),
        # pmod, not %: Spark's % keeps the dividend's sign, so
        # negative ids would land in [-blocks+1, 0) and silently
        # match no bucket_pairs row
        F.pmod(F.col(id_col), F.lit(blocks)).cast("int").alias("blk"),
    )
    # full product (not upper triangle): bucket order does not follow
    # id order, the id_a < id_b filter already keeps each pair once
    bucket_pairs = df.sparkSession.createDataFrame(
        [(i, j) for i in range(blocks) for j in range(blocks)],
        "bi int, bj int",
    )
    a = n.select(
        F.col(id_col).alias("id_a"), F.col("nv").alias("va"),
        F.col("nrm").alias("na"), F.col("blk").alias("blk_a"),
    )
    b = n.select(
        F.col(id_col).alias("id_b"), F.col("nv").alias("vb"),
        F.col("nrm").alias("nb"), F.col("blk").alias("blk_b"),
    )
    cand = (
        a.join(F.broadcast(bucket_pairs), F.col("blk_a") == F.col("bi"))
        .join(b, F.col("blk_b") == F.col("bj"))
        .where(F.col("id_a") < F.col("id_b"))
    )
    sim = unrolled_normalized_dot(
        F.col("va"), F.col("vb"), F.col("na"), F.col("nb"), dim
    )
    return (
        cand.withColumn("cos_bp", F.floor(sim * F.lit(10000.0)).cast("long"))
        .where(F.col("cos_bp") >= F.lit(int(threshold * 10000)))
        .select("id_a", "id_b", "cos_bp")
    )
