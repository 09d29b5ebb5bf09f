"""Mention detection + entity-link scoring via a broadcast alias
dictionary (north-rule stage 2).

The alias dictionary maps surface forms to candidate entity ids with a
prior score; it includes ambiguous aliases (one surface form, several
entities) and case variants (FIXTURES.md §1). Detection is
token-explode + **broadcast** hash join — the dictionary is
dictionary-sized (10k-10M rows), so the join is map-side and the heavy
skew of head surface-forms ("the"-class tokens) never touches a
shuffle. For dictionaries beyond broadcast size, pass
``broadcast_dict=False`` and the join runs as a salted shuffle join
(skew.salted_join) instead.

Link scoring: per (page, alias) pick the argmax-score candidate with a
deterministic tie-break (score desc, entity_id asc) — a window
row_number, partition-pruned to the mention pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ops.hashing import md5_long
from .skew import salted_join


def build_alias_dict(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic alias dictionary derived from the corpus
    vocabulary: every distinct token t links to entity ent_t (score
    0.9) and a case variant; every 5th token is ambiguous — it also
    links to alt1_t (score 0.6), whose sameAs chain canonicalizes back
    to ent_t (pages.synthesize_sameas), closing the end-to-end loop."""
    toks = (
        documents.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"))
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


def detect_mentions(
    pages: DataFrame,
    aliases: DataFrame,
    id_col: str = "page_id",
    text_col: str = "extracted_text",
    broadcast_dict: bool = True,
    salt: int = 16,
) -> DataFrame:
    """(page_id, alias, entity_id, score, n_occurrences) — best-scored
    entity per detected surface form per page."""
    toks = (
        pages.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("surface"),
        )
        .where(F.col("surface") != "")
        .groupBy(id_col, "surface")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    cand = aliases.select(
        F.lower(F.col("alias")).alias("surface"),
        F.col("alias"),
        F.col("entity_id"),
        F.col("score"),
    )
    if broadcast_dict:
        matched = toks.join(F.broadcast(cand), "surface")
    else:
        matched = salted_join(toks, cand, "surface", n_salt=salt)
    w = Window.partitionBy(id_col, "surface").orderBy(
        F.col("score").desc(), F.col("entity_id").asc()
    )
    return (
        matched.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(id_col, "alias", "entity_id", "score", "n_occurrences")
    )
