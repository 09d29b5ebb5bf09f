"""Mention detection + entity-link scoring via a broadcast alias
dictionary (north-rule stage 2).

The alias dictionary maps surface forms to candidate entity ids with a
prior score; it includes ambiguous aliases (one surface form, several
entities) and case variants (FIXTURES.md §1).

Shuffle-free detection: a page's text lives in ONE row, so per-page
surface counting is a per-row (Arrow-batched) aggregation — no
(page, surface) groupBy exchange. And the winning candidate for a
surface form is page-INDEPENDENT (argmax of score with a deterministic
entity_id tie-break), so link scoring collapses the dictionary to a
per-surface best BEFORE the join — a dictionary-sized aggregation —
instead of a window over the full mention set. What remains is one
**broadcast** hash join: the heavy skew of head surface-forms
("the"-class tokens) never touches a shuffle. For dictionaries beyond
broadcast size, pass ``broadcast_dict=False`` and the join runs as a
salted shuffle join (skew.salted_join) instead.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..ops.hashing import md5_long
from .skew import salted_join


def build_alias_dict(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic alias dictionary derived from the corpus
    vocabulary: every distinct token t links to entity ent_t (score
    0.9) and a case variant; every 5th token is ambiguous — it also
    links to alt1_t (score 0.6), whose sameAs chain canonicalizes back
    to ent_t (pages.synthesize_sameas), closing the end-to-end loop."""
    # per-row array_distinct before the global distinct: the vocabulary
    # shuffle then carries each document's distinct tokens instead of
    # every token occurrence
    toks = (
        documents.select(
            F.explode(
                F.array_distinct(F.split(F.col(text_col), r"\s+"))
            ).alias("tok")
        )
        .where(F.length("tok") >= 3)
        .distinct()
    )
    primary = toks.select(
        F.col("tok").alias("alias"),
        F.concat(F.lit("ent_"), F.col("tok")).alias("entity_id"),
        F.lit(0.9).alias("score"),
    )
    case_variant = toks.select(
        F.initcap(F.col("tok")).alias("alias"),
        F.concat(F.lit("ent_"), F.col("tok")).alias("entity_id"),
        F.lit(0.8).alias("score"),
    )
    ambiguous = (
        toks.where(md5_long(F.col("tok")) % 5 == 0)
        .select(
            F.col("tok").alias("alias"),
            F.concat(F.lit("alt1_"), F.col("tok")).alias("entity_id"),
            F.lit(0.6).alias("score"),
        )
    )
    return primary.unionByName(case_variant).unionByName(ambiguous)


def entities_from_aliases(aliases: DataFrame) -> DataFrame:
    """Entity dimension (entity_id, label) for the TMEntity triples
    map: label = lexically-first alias per entity."""
    return aliases.groupBy("entity_id").agg(F.min("alias").alias("label"))


_WS = None  # lazily-compiled on the executor

_SURFACE_COUNTS_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("surface", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
)


@pandas_udf(_SURFACE_COUNTS_T)
def _surface_counts_udf(texts: pd.Series) -> pd.Series:
    """Per-row whitespace-token frequency (Arrow-batched). The page's
    whole text is in the row, so the count needs no cross-row state.
    Tokenization matches the previous Column plan (split on \\s+ runs,
    empty tokens dropped) and the DuckDB oracle's
    regexp_split_to_array(text, '\\s+')."""
    import re

    global _WS
    if _WS is None:
        _WS = re.compile(r"\s+")
    out = []
    for t in texts:
        if t is None:
            out.append([])
            continue
        c = Counter(tok for tok in _WS.split(t) if tok)
        out.append([{"surface": s, "n": n} for s, n in c.items()])
    return pd.Series(out)


def best_candidates(aliases: DataFrame) -> DataFrame:
    """Per-surface best candidate: argmax score, entity_id asc
    tie-break. Page-independent, so computed once on the dictionary
    (min of an ordering struct — no window over the mention set)."""
    return (
        aliases.select(
            F.lower(F.col("alias")).alias("surface"),
            F.struct(
                (-F.col("score")).alias("neg_score"),
                F.col("entity_id"),
                F.col("alias"),
                F.col("score"),
            ).alias("__cand"),
        )
        .groupBy("surface")
        .agg(F.min("__cand").alias("__best"))
        .select(
            "surface",
            F.col("__best.alias").alias("alias"),
            F.col("__best.entity_id").alias("entity_id"),
            F.col("__best.score").alias("score"),
        )
    )


def detect_mentions(
    pages: DataFrame,
    aliases: DataFrame,
    id_col: str = "page_id",
    text_col: str = "extracted_text",
    broadcast_dict: bool = True,
    salt: int = 16,
) -> DataFrame:
    """(page_id, alias, entity_id, score, n_occurrences) — best-scored
    entity per detected surface form per page.

    Zero-shuffle plan (see module docstring): per-row Arrow token
    counting -> explode -> broadcast join against the per-surface best
    candidate. The only exchange in the stage is the dictionary-sized
    best-candidate aggregation on the broadcast side."""
    counted = pages.select(
        F.col(id_col),
        F.explode(_surface_counts_udf(F.col(text_col))).alias("__sc"),
    ).select(
        id_col,
        F.col("__sc.surface").alias("surface"),
        F.col("__sc.n").alias("n_occurrences"),
    )
    best = best_candidates(aliases)
    if broadcast_dict:
        matched = counted.join(F.broadcast(best), "surface")
    else:
        matched = salted_join(counted, best, "surface", n_salt=salt)
    return matched.select(id_col, "alias", "entity_id", "score", "n_occurrences")
