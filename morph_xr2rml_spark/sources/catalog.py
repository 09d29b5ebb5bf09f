"""Logical-source resolution: xR2RML logical sources -> DataFrames.

Covers the reference's source operators (SURVEY §2.1):
  S1 table scan        rr:tableName           (MorphRDBUnfolder.unfoldLogicalSource:65-97)
  S2 SQL-query scan    rr:sqlQuery            (same :76-93 — Catalyst parses)
  S3 collection scan   xrr:query "db.X.find({...})"
                       (MongoDBQuery.parseQueryString:67-86) — the find
                       predicate subset {field: {$exists: 0|1|true|false}} and
                       {} compiles to DataFrame filters; everything else the
                       reference ships to MongoDB, we evaluate as a JSON
                       predicate on the doc column
  S5 per-TM limits     df.limit(n)
  S6 source reuse      .persist() of parent-side scans across RefObjectMaps

Document-shaped sources (JSONPath/XPath formulations) expose one string
column holding the whole document per row (the reference's Mongo reader
hands each document to the translator as a JSON string,
MorphMongoDataSourceReader.scala:81-115). Row-shaped sources (Column
formulation) expose ordinary columns.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..mapping.model import LogicalSource

_MONGO_FIND_RE = re.compile(
    r"^\s*db\.(?P<collection>\w+)\.find\s*\(\s*(?P<query>.*?)\s*\)\s*$", re.DOTALL
)
_EXISTS_RE = re.compile(
    r"""^\{\s*['"]?(?P<field>[\w.]+)['"]?\s*:\s*\{\s*\$exists\s*:\s*(?P<val>1|0|true|false)\s*\}\s*\}$"""
)


class SourceCatalog:
    """Resolves logical sources against registered DataFrames.

    ``tables``      name -> DataFrame (row- or document-shaped)
    ``doc_columns`` name -> column holding the JSON/XML document
                    (default: the single column of a 1-column source, else
                    the whole row serialized with ``to_json(struct(*))``).
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        doc_columns: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.tables = dict(tables or {})
        self.doc_columns = dict(doc_columns or {})

    def register(self, name: str, df: DataFrame, doc_column: str | None = None):
        self.tables[name] = df
        if doc_column:
            self.doc_columns[name] = doc_column
        return self

    def _table(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.tables[name]
        return self.spark.table(name)

    _MAX_SPLIT_BYTES = 128 << 20  # scan split granularity estimate
    _SMALL_SOURCE_BYTES = 2 << 30  # only reshuffle sources below this

    def _normalize_width(self, df: DataFrame) -> DataFrame:
        """Widen under-parallelized scans to the session's parallelism.

        A single parquet file splits at row-group granularity, so a
        compact table can come back as a handful of partitions no
        matter how many cores the cluster has; every downstream
        per-row stage (term construction, template encoding, explode)
        then runs nearly serial. One cheap shuffle of the raw source
        fixes the whole pipeline's width. Term values and row ids are
        content-derived, so results are partitioning-independent.

        The decision is made from input-file count and byte size (no
        ``df.rdd`` — that forces plan-to-RDD conversion at compile
        time), and a big source is never reshuffled: its scan is
        already wide, and an unconditional repartition would be a full
        shuffle of the raw table.
        """
        target = self.spark.sparkContext.defaultParallelism
        try:
            files = df.inputFiles()
        except Exception:  # noqa: BLE001 — non-file-backed plan
            return df
        if not files or len(files) * 2 >= target:
            return df
        total = self._input_bytes(files)
        if total >= self._SMALL_SOURCE_BYTES:
            return df
        est_splits = max(len(files), -(-total // self._MAX_SPLIT_BYTES))
        if est_splits * 2 < target:
            return df.repartition(target)
        return df

    def _input_bytes(self, files: list[str]) -> int:
        try:
            jvm = self.spark._jvm
            conf = self.spark._jsc.hadoopConfiguration()
            total = 0
            for f in files:
                path = jvm.org.apache.hadoop.fs.Path(f)
                fs = path.getFileSystem(conf)
                total += fs.getFileStatus(path).getLen()
            return total
        except Exception:  # noqa: BLE001 — treat unknown size as big
            return self._SMALL_SOURCE_BYTES

    def resolve(self, ls: LogicalSource) -> tuple[DataFrame, str | None]:
        """Return (DataFrame, doc_column) for a logical source.

        doc_column is None for row-shaped (Column-formulation) sources.
        """
        if ls.kind == "table":
            df = self._table(ls.value)
            name = ls.value
        else:
            m = _MONGO_FIND_RE.match(ls.value)
            if m:
                name = m.group("collection")
                df = self._table(name)
                df = self._apply_find_predicate(df, name, m.group("query"))
            else:
                # SQL query — registered tables must be visible as temp views
                for tname, tdf in self.tables.items():
                    tdf.createOrReplaceTempView(tname)
                df = self.spark.sql(ls.value)
                name = None

        df = self._normalize_width(df)

        if ls.formulation == "Column":
            return df, None

        # Document-shaped source: find/derive the doc column
        doc_col = self.doc_columns.get(name) if name else None
        if doc_col is None:
            string_cols = [
                f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
            ]
            if len(df.columns) == 1 and string_cols:
                doc_col = df.columns[0]
            else:
                df = df.withColumn("__doc__", F.to_json(F.struct(*df.columns)))
                doc_col = "__doc__"
        return df, doc_col

    def _apply_find_predicate(self, df: DataFrame, name: str, query: str) -> DataFrame:
        """Compile the db.X.find({...}) predicate subset to a filter."""
        q = query.strip()
        if q in ("", "{}"):
            return df
        m = _EXISTS_RE.match(q)
        if m:
            field, val = m.group("field"), m.group("val")
            want_exists = val in ("1", "true")
            doc_col = self.doc_columns.get(name)
            if doc_col is None and len(df.columns) == 1:
                doc_col = df.columns[0]
            if doc_col is not None:
                probe = F.get_json_object(F.col(doc_col), "$." + field)
                return df.filter(probe.isNotNull() if want_exists else probe.isNull())
            if field in df.columns:
                c = F.col(field)
                return df.filter(c.isNotNull() if want_exists else c.isNull())
        raise ValueError(
            f"Unsupported MongoDB find() predicate (supported: {{}}, "
            f"{{field: {{$exists: ...}}}}): {query!r}"
        )
