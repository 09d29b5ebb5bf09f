"""Portable deterministic hashing shared by the dedup/similarity ops.

All content hashes are derived from md5 so that an independent engine
(the DuckDB oracle in ``__spark_entry__.oracle_sql``) can reproduce them
bit-for-bit: Spark's ``xxhash64``/``hash`` are engine-specific, md5 is
not. 15 hex chars = 60 bits, safely inside a signed 64-bit long.

At 100 TB this stays JVM-side (``F.md5``/``F.conv`` are codegen'd
built-ins); md5 is ~0.5 GB/s/core which is never the bottleneck next to
shuffle IO.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def md5_long(col: Column | str) -> Column:
    """First 60 bits of md5(col) as a non-negative long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: md5('<seed>#' || col) — the permutation family
    used for MinHash signatures."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"{seed}#"), c))


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`md5_long`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::bigint)"


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"'{seed}#' || {expr}")
