"""Entity canonicalization: connected components over sameAs edges,
then subj/obj rewrite of the triple table through the canonical map.

Algorithm: iterative min-label propagation with pointer jumping (the
GraphFrames-free fallback SURVEY §7 calls for — GraphFrames is not in
this environment). Each iteration: every node takes the min label
among itself and its neighbors (one join + one groupBy, both
partial-aggregated), then labels compose once through a label-to-label
self-join (path shortcutting a la Shiloach-Vishkin), so the distance a
min label covers doubles per round — O(log diameter) rounds instead of
O(diameter), without the constant-factor-heavy large-star/small-star
edge rewriting. Each round is pinned with a parquet-checkpoint lineage
cut (plans.caching.checkpoint_parquet) — persist alone leaves the
logical plan doubling per round (each round references the previous
labels twice), and Spark 4's localCheckpoint throws ``key not found:
<attr>#<id>`` on AQE-finalized shuffle plans such as the
union+distinct ``und`` edge set here. Convergence detection is folded
into the round: each node's previous label rides through the
aggregation as a side column (min ignores nulls), so the changed-check
is a scan of the just-checkpointed round, not a join of two label
tables.

Skew note: a hub component funnels its whole frontier into one groupBy
key per round. The groupBy is a min-aggregate — partial aggregation
map-side collapses each partition's contribution to one row per key, so
hot components cost one row per partition, not one per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.caching import CheckpointScope, cache, checkpoint_parquet


def _pin(df: DataFrame, tag: str, scope: CheckpointScope) -> DataFrame:
    """Materialize a fixpoint round with a REAL lineage cut. Each round
    references the previous round's labels twice (message join + union),
    so a persist-only pin leaves the logical plan doubling per round —
    exponential analysis time. See plans.caching.checkpoint_parquet for
    why localCheckpoint is not an option under AQE."""
    return checkpoint_parquet(df, tag, scope=scope)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id (lexicographic)
    reachable in the undirected graph."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # the edge table is re-read every round: keep it in memory (its
    # lineage is fixed, so persist is safe and cheaper than re-scanning)
    und = cache(und)
    und.count()
    # each round's labels supersede the previous round's — retire the
    # older checkpoint files eagerly once the convergence count (the
    # last reader of the PREVIOUS round) has run, so a long propagation
    # holds ~2 rounds of files on disk, not max_iter
    scope = CheckpointScope()
    labels = _pin(
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node")),
        "cc_labels_",
        scope,
    )
    for _ in range(max_iter):
        # neighbor labels flow along edges; keep own label in the pool,
        # riding the previous label along as __old (each node has
        # exactly one labels row, and min() ignores the msgs nulls) so
        # convergence needs no separate old-vs-new join
        msgs = und.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "component")
        agg = (
            labels.withColumn("__old", F.col("component"))
            .unionByName(
                msgs.withColumn(
                    "__old",
                    F.lit(None).cast(labels.schema["component"].dataType),
                )
            )
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min("__old").alias("__old"),
            )
        )
        # pointer jump: compose each label through its own row
        # (component-of-component), doubling the distance covered per
        # round; min labels only ever decrease, so coalesce suffices
        hop = agg.select(
            F.col("node").alias("component"), F.col("component").alias("__cc")
        )
        new_labels = _pin(
            agg.join(hop, "component", "left").select(
                "node",
                F.coalesce("__cc", "component").alias("component"),
                "__old",
            ),
            "cc_labels_",
            scope,
        )
        changed = (
            new_labels.where(F.col("component") != F.col("__old"))
            .limit(1)
            .count()
        )
        labels = new_labels.select("node", "component")
        scope.retire(keep=1)
        if changed == 0:
            break
    return labels


def canonical_map(edges: DataFrame, prefer_prefix: str = "ent_") -> DataFrame:
    """(entity_id, canonical_id) for every node appearing in sameAs
    edges; entities absent from the edge set are their own canonical.

    Representative selection: within each component, prefer ids with
    ``prefer_prefix`` (real KB entities over surface-form alt ids),
    lexicographic min within each class — the component label from the
    min-propagation is only an internal grouping key, not the output
    canonical id.
    """
    cc = connected_components(edges)
    tagged = F.when(
        F.col("node").startswith(prefer_prefix), F.concat(F.lit("0"), F.col("node"))
    ).otherwise(F.concat(F.lit("1"), F.col("node")))
    reps = (
        cc.groupBy("component")
        .agg(F.min(tagged).alias("__rep"))
        .select("component", F.expr("substring(__rep, 2)").alias("canonical_id"))
    )
    return cc.join(reps, "component").select(
        F.col("node").alias("entity_id"), "canonical_id"
    )


def rewrite_triples(
    triples: DataFrame,
    mapping: DataFrame,
    iri_template: str = "http://kg.example.org/entity/{}",
) -> DataFrame:
    """Rewrite subj/obj IRIs of canonicalized entities.

    The mapping (entity ids -> canonical ids) is entity-dimension-sized,
    orders of magnitude smaller than the triple table, so both rewrites
    are broadcast joins — zero shuffle of the triple table itself.
    """
    prefix, suffix = iri_template.split("{}")
    iri_map = F.broadcast(
        mapping.where(F.col("entity_id") != F.col("canonical_id")).select(
            F.concat(F.lit("<"), F.lit(prefix), "entity_id", F.lit(suffix), F.lit(">")).alias(
                "__from"
            ),
            F.concat(
                F.lit("<"), F.lit(prefix), "canonical_id", F.lit(suffix), F.lit(">")
            ).alias("__to"),
        )
    )
    out = (
        triples.join(iri_map.withColumnRenamed("__from", "subj"), "subj", "left")
        .withColumn("subj", F.coalesce(F.col("__to"), F.col("subj")))
        .drop("__to")
    )
    out = (
        out.join(iri_map.withColumnRenamed("__from", "obj"), "obj", "left")
        .withColumn("obj", F.coalesce(F.col("__to"), F.col("obj")))
        .drop("__to")
    )
    return out.select("subj", "pred", "obj").dropDuplicates(["subj", "pred", "obj"])
