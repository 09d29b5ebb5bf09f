"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over morph_xr2rml_spark.driver_contract, which holds the
registry of (Spark query, DuckDB oracle SQL) pairs — one per operator
from SURVEY.md §2 plus the training-data ops and the KG pipeline
stages. See that module for the determinism rules that keep the
Spark/DuckDB value-hashes identical.
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from morph_xr2rml_spark import driver_contract as _dc


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction pipeline on sf0.001 (synthesize
    pages -> byte-exact extract -> mention detection -> compiled xR2RML
    triple emission -> sameAs canonicalization)."""
    return _dc.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dc.queries()


def oracle_sql() -> dict[str, str]:
    return _dc.oracle_sql()
