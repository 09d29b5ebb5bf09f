"""Deterministic corpus sampling for training-data curation.

Down-sampling a web-scale corpus (per-language quotas, source
balancing, holdout splits) must be reproducible run-to-run and
cluster-size-independent, so these operators derive the sampling
decision from a content/id hash instead of ``rand()``:

* ``hash_sample``       keep a fraction of rows, decided per row by a
                        salted 60-bit md5 hash of the id column — a
                        pure Column filter (no shuffle, no RNG state,
                        survives partition changes unchanged).
* ``stratified_sample`` per-stratum fractions (e.g. per language):
                        broadcast the tiny fraction table, same hash
                        rule per row.
* ``split``             disjoint deterministic train/valid/test-style
                        splits from the same hash (a row lands in
                        exactly one split; adding splits never moves
                        existing rows between the first ones).

The 100-TB plan for every one of these is a single codegen'd scan
filter; the only join is a broadcast of a dict-sized fraction table.
DuckDB reproduces the hash bit-for-bit (ops/hashing.md5_long), so the
driver-contract oracle checks values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_long

# hash bucket space: fractions quantize to 1/10000 (basis points),
# matching the repo-wide bp convention for oracle-exact ratios
_BUCKETS = 10_000


def _bucket(id_col: Column, salt: str) -> Column:
    """Stable per-row bucket in [0, _BUCKETS): salted content hash of
    the id's string form. pmod keeps negatives out (md5_long is
    non-negative by construction, but guard anyway)."""
    return F.pmod(
        md5_long(F.concat(F.lit(f"{salt}#"), id_col.cast("string"))),
        F.lit(_BUCKETS),
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically per id.

    Unlike ``DataFrame.sample`` (partition-RNG driven: resampling after
    a repartition or at another cluster size selects different rows),
    the decision is a function of the row alone.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * _BUCKETS))
    return df.where(_bucket(F.col(id_col), salt) < F.lit(cut))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling (per-language quotas etc.).

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed keep ``default_fraction``. The fraction table is dict-sized
    -> broadcast join, then the same pure-filter hash rule.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    spark = df.sparkSession
    cuts = F.broadcast(
        spark.createDataFrame(
            [(k, int(round(v * _BUCKETS))) for k, v in fractions.items()],
            f"{strata_col} string, __cut int",
        )
    )
    default_cut = int(round(default_fraction * _BUCKETS))
    return (
        df.join(cuts, strata_col, "left")
        .where(
            _bucket(F.col(id_col), salt)
            < F.coalesce(F.col("__cut"), F.lit(default_cut))
        )
        .drop("__cut")
    )


def split(
    df: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split_id",
) -> DataFrame:
    """Assign every row to exactly one of ``len(weights)`` disjoint
    splits (0-indexed ``split_col``), deterministically per id.

    Weights are normalized and boundaries are cumulative, so membership
    of the EARLIER splits is stable under any re-partitioning of the
    LATER weight mass at the same total — e.g. [0.8, 0.2] vs
    [0.8, 0.1, 0.1] keep split 0 identical (subdividing the tail).
    Changing the total (e.g. appending weight to [0.8, 0.2] to make
    [0.8, 0.2, 0.5]) renormalizes every boundary and DOES move rows;
    to grow a holdout without touching train membership, re-split the
    tail mass instead.
    """
    if not weights or any(w < 0 for w in weights):
        raise ValueError(f"weights must be non-negative, got {weights}")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bounds: list[int] = []
    acc = 0.0
    for w in weights:
        acc += w / total
        bounds.append(min(int(round(acc * _BUCKETS)), _BUCKETS))
    b = _bucket(F.col(id_col), salt)
    expr = F.lit(len(bounds) - 1)
    for i in range(len(bounds) - 2, -1, -1):
        expr = F.when(b < F.lit(bounds[i]), F.lit(i)).otherwise(expr)
    return df.withColumn(split_col, expr)
