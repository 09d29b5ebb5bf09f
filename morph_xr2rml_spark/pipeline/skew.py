"""Skew-aware join helpers (north rule: salted repartition + AQE).

``salted_join`` implements the classic salt-and-replicate pattern for a
skewed large-side join against a modest dimension that is too big to
broadcast: the fact side gets a deterministic per-row salt derived from
a row hash (so the same hot key spreads over ``n_salt`` reducers), the
dimension side is exploded into ``n_salt`` replicas. The join key
becomes (key, salt) — hot keys fan out, the shuffle balances.

This complements (not replaces) AQE skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, set by plans.session
.build_session): AQE handles sort-merge skew at runtime, salting
handles the pathological single-key case and hash-partitioned
aggregations AQE can't split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salt) from a full-row hash
    (content-derived, stable under repartitioning — never rand())."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    )


def replicate(df: DataFrame, n_salt: int, salt_col: str = "__salt") -> DataFrame:
    """Cross the (small) side with salt ids 0..n_salt-1."""
    return df.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>")),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on ``on`` with the fact side salted and the dim side
    replicated n_salt times. Output drops the salt column."""
    keys = [on] if isinstance(on, str) else list(on)
    f = with_salt(fact, n_salt)
    d = replicate(dim, n_salt)
    out = f.join(d, keys + ["__salt"], how)
    return out.drop("__salt")
