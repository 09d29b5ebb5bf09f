"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], printing ONE JSON
line:

    {"metric": "bench_suite_seconds", "value": <normalized total>,
     "unit": "sec", "queries": {...}, "queries_raw": {...},
     "calibration": {...}, "sf": ..., "triples_per_sec": ...,
     "scaling": {...}}

"value"/"queries"/"triples_per_sec" are STEAL-NORMALIZED: each query's
raw seconds divided by ITS OWN phase's measured inflation factor — the
mean of the two fixed-work userspace calibration samples bracketing
that query (see steal_calibration). Bracketing every query (not every
8th) and running the control at full core width closed the two blind
spots a contended end-of-round-4 run exposed: a mid-suite phase that
inflates one query 3x barely moves a suite-mean factor, and an
8-thread control on a 32-core box reads clean under any contention
that leaves 8 cores free while 32-thread Spark stages slow
proportionally. The raw measurements always ride along in
queries_raw / suite_seconds_raw / triples_per_sec_raw.

The scaling block is the sandbox proxy for BASELINE.json's two-cluster-
size criterion: the SAME triple-materialization job over the SAME
(deterministically replicated) input at four core-pinned parallelism
levels (1 / 4 / 8 / 32), interleaved round-robin so hypervisor-steal
phases hit every level equally, with efficiency = (thr_4N / thr_N) / 4
for the primary 1 -> 4 pair (see SCALE_LEVELS for why). Run
`python bench.py --no-scaling` to skip that part while iterating.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morph_xr2rml_spark import driver_contract as dc
from morph_xr2rml_spark.pipeline import extract, mentions, pages
from morph_xr2rml_spark.pipeline.run import emit_triples
from morph_xr2rml_spark.plans.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# applied to the FIRST session of the process — the local-mode JVM is
# shared by every later session, so this sizes the heap for all runs
_MEM_CONF = {
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.driver.maxResultSize": "4g",
}

# headline queries (subset of the driver registry that stresses every
# subsystem: mapping compiler + joins, dedup family, similarity, text,
# full KG pipeline)
BENCH_QUERIES = [
    "xr2rml_nation_tm",
    "xr2rml_refobjectmap_join",
    "xr2rml_mixed_syntax_path",
    "xr2rml_rdf_list",
    "agg_pricing_summary",
    "join_revenue_by_segment",
    "window_top_orders_per_segment",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_neardup",
    "sim_cosine_topk",
    "sim_lsh_ann_topk",
    "sim_ivf_topk",
    "text_analysis",
    "text_winnow_fingerprints",
    "text_vocab_topk",
    "sample_stratified",
    "multimodal_features",
    # REAL decode path: Column-synthesized P6 pixmaps decoded by the
    # pure-Python Netpbm parser inside the Arrow mapInPandas stage
    "multimodal_decode_ppm",
    # materialize-then-query: the kg entry IS the materialization job,
    # so it runs first and carries the one-time triple-stage build; the
    # sparql entries then measure pure query cost over the parquet stage
    "kg_triples_canonical",
    "sparql_bgp_join",
    "sparql_group_count",
    "sparql_order_numeric",
    "sparql_construct",
    "sparql_path_closure",
    # rewriting mode: answered against the mapped sources directly —
    # no triple-stage read, no full materialization
    "sparql_virtual_join",
    "sparql_virtual_graph",
    # rewriting over a document (find()) source: the SPARQL constant
    # pushes into the JSON scan predicate
    "sparql_virtual_doc",
    # two-phase DESCRIBE ?var (virtual WHERE -> bounded node collect ->
    # branch-pruned compile). Since round 5 the default bound is 50k
    # and the >1024-node restriction is a broadcast semi-join, so
    # sf0.1's ~15k matched customers run the two-phase path (measured
    # 2-2.6x faster than the fallback the old 10k bound forced)
    "sparql_virtual_describe",
    # dataset clauses over materialized quads
    "sparql_from_named",
    # round-5 function surface: expression projections + the
    # string/hash/rounding and date-accessor built-ins, each a single
    # pruned parquet scan with zero exchanges (plan-audited)
    "sparql_expr_functions",
    "sparql_datetime_terms",
]

# 72x replication (~360k docs, 11.2M output triples) sizes the scaling
# job so per-stage parallel work dominates fixed driver/stage latency,
# while the persisted intermediates still fit the block store without
# eviction churn (144x crosses that cliff on a 24g heap)
REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "72"))


# ---- steal calibration -----------------------------------------------
# The sandbox shows hypervisor-steal *phases* (BASELINE.md: same-day
# suite runs 104-209s for identical code; ~5-minute windows of 1.1-5.1x
# per-query inflation), so a raw suite number carries its phase and
# round-over-round comparisons were noise (round-4 verdict, What's
# wrong #2). Fix: time a FIXED piece of userspace work — sha256 over an
# in-memory buffer, which releases the GIL, so a thread pool keeps
# cores busy with zero syscall/shuffle footprint — immediately before
# the suite and after EVERY query. Steal and host CPU contention are
# the only things that can slow it down, so observed/reference is the
# phase's inflation factor. The pool is FULL core width (CPUS
# threads): a narrower control only sees contention once fewer than
# its width of cores remain, so an 8-thread probe read 1.07 during a
# phase that ran 32-thread Spark stages at 3x (end-of-round-4 run);
# a 32-thread probe feels the same proportional squeeze the suite
# does. Reference floor: min of 30+ samples across several phases on
# this box (floors are approached from above). The JSON records raw
# AND normalized so a drifting reference is visible, never hidden.
_CALIB_BUF = bytes(range(256)) * (4 * 1024 * 1024 // 256)  # 4 MiB
CALIBRATION_THREADS = CPUS
CALIBRATION_REPS = 144  # ~0.62s clean at 32 threads: averages bursts
CALIBRATION_REF_SECONDS = float(
    os.environ.get("SPARK_GRAFT_CALIB_REF", "0.620")
)


def _calibration_sample() -> float:
    """Wall seconds for the fixed userspace work unit."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    def work(reps: int) -> str:
        h = hashlib.sha256()
        for _ in range(reps):
            h.update(_CALIB_BUF)
        return h.hexdigest()

    t0 = time.time()
    with ThreadPoolExecutor(CALIBRATION_THREADS) as ex:
        list(ex.map(work, [CALIBRATION_REPS] * CALIBRATION_THREADS))
    return time.time() - t0


def steal_calibration(samples: list[float]) -> dict[str, object]:
    """Summarize calibration samples into the recorded block.
    steal_factor is the whole-run MEAN inflation (recorded for
    cross-run comparability); the normalization itself is per-query,
    from the two samples bracketing each query (see _query_factors).
    Factors are floored at 1.0 (a sample under the reference floor is
    measurement luck, not negative steal)."""
    mean = sum(samples) / len(samples)
    return {
        "samples_sec": [round(s, 3) for s in samples],
        "ref_sec": CALIBRATION_REF_SECONDS,
        "steal_factor": round(max(1.0, mean / CALIBRATION_REF_SECONDS), 3),
    }


def _query_factors(samples: list[float]) -> list[float]:
    """Per-query inflation factors from bracketing samples: query i ran
    between samples[i] and samples[i+1]; its phase's factor is the mean
    of the two over the reference floor, floored at 1.0."""
    return [
        max(
            1.0,
            (samples[i] + samples[i + 1]) / 2.0 / CALIBRATION_REF_SECONDS,
        )
        for i in range(len(samples) - 1)
    ]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def replicated_documents(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Deterministic n-fold replica of the documents table with distinct
    doc_ids per replica (the scaling-job input; same at every
    parallelism level)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep"), "*"
    )
    return rep.select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
        "text",
        "lang",
        "source",
    ).repartition(max(CPUS * 2, 16))


def build_materialization(
    spark: SparkSession, docs: DataFrame
) -> tuple[DataFrame, list[DataFrame]]:
    """Build (lazily) the scaling-measured job: synthesize pages,
    byte-exact extract, mention detection, compiled xR2RML triple
    emission, dedup. Returns (triples plan, persisted intermediates).

    Intermediates are persisted — the in-memory analogue of
    run_pipeline's per-stage checkpoints — because the compiled mapping
    references the mentions/pages frames from several union branches;
    without a materialization barrier each branch would re-run the
    pandas-UDF extraction lineage."""
    p_full = pages.synthesize_pages(docs)
    # html streams through extraction ONCE and is never cached: the
    # mapping reads only the narrow page columns, so persisting the
    # binary column would just saturate the block store / memory bus
    # (observed: the wide cache is ~90% of cached bytes at high
    # replication). Column pruning keeps the second synthesize pass
    # from even computing the html expression.
    extracted = (
        extract.extract_text(p_full)
        .select("page_id", "extracted_text")
        .persist()
    )
    p = p_full.select("page_id", "url", "warc_ts", "lang").persist()
    aliases = mentions.build_alias_dict(docs).persist()
    m = mentions.detect_mentions(extracted, aliases).persist()
    ents = mentions.entities_from_aliases(aliases)
    return emit_triples(spark, p, m, ents), [p, extracted, aliases, m]


def materialization_job(spark: SparkSession, docs: DataFrame) -> int:
    """Build + execute the materialization; returns triple count.

    Each persisted intermediate is materialized with an explicit action
    before the final count — the in-memory analogue of run_pipeline's
    per-stage checkpoints (StageRunner), and the shape a resumable
    cluster job actually has. Forcing the stages also keeps the
    scheduler's cache-materialization from serializing inside one
    mega-action (measured: stage-wise is faster at 8 cores than the
    fused single count)."""
    from morph_xr2rml_spark.plans.caching import release_caches

    triples, cached = build_materialization(spark, docs)
    try:
        for df in cached:
            df.count()
        return triples.count()
    finally:
        for df in cached:
            df.unpersist()
        release_caches()  # compiler-registered parent-scan persists


def _warm_session(spark: SparkSession) -> None:
    """Generic JVM/Python warm-up (codegen JIT, shuffle machinery,
    Arrow worker pool) so the first query's timing is not charged the
    one-time session costs. Touches no query-specific data."""
    from pyspark.sql.functions import pandas_udf

    _echo = pandas_udf(lambda s: s, "long")
    df = spark.range(100_000)
    df.select(_echo(df.id).alias("v")).groupBy((F.col("v") % 7)).count().count()


def run_queries(
    spark: SparkSession,
) -> tuple[dict[str, float], float, list[float]]:
    registry = dc.queries()
    _warm_session(spark)
    timings: dict[str, float] = {}
    kg_triples = 0
    kg_secs = 0.0
    # steal samples bracketing EVERY query (one before the suite, one
    # after each query): ~0.62s each, so ~20s of probe time buys
    # per-query phase attribution — the resolution a mid-suite phase
    # needs (a 3x phase under one query barely moves a suite mean)
    calib = [_calibration_sample()]
    for name in BENCH_QUERIES:
        fn = registry[name]
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        if name == "kg_triples_canonical":
            kg_triples, kg_secs = n, dt
        calib.append(_calibration_sample())
    tps = kg_triples / kg_secs if kg_secs > 0 else 0.0
    return timings, tps, calib


def run_sf_scaling(spark: SparkSession) -> dict[str, object]:
    """DATA scaling (cores fixed at local[CPUS]): the same
    materialization job over 1x / 4x / 16x / 64x replicas of the sf0.1
    corpus. A plan that holds at scale keeps rows/sec roughly flat as
    input grows — a super-linear time blowup here would flag a join or
    dedup whose cost curve is worse than the data growth. The 64x level
    (~320k docs, ~10M output triples) pushes past the fixed-cost
    region the 16x level still sits in (round-3 verdict #8)."""
    out: dict[str, object] = {"levels": []}
    base_tps = None
    # warm-up at 1x so the first measured level isn't charged JIT/pool
    materialization_job(spark, replicated_documents(spark, SF_DIR, 1))
    for n in (1, 4, 16, 64):
        docs = replicated_documents(spark, SF_DIR, n).persist()
        docs.count()  # input synthesis untimed, as in scale_level_run
        t0 = time.time()
        triples = materialization_job(spark, docs)
        dt = time.time() - t0
        docs.unpersist()
        out["levels"].append(
            {
                "replicate": n,
                "seconds": round(dt, 2),
                "triples": triples,
                "tps": round(triples / dt, 1),
            }
        )
        if n == 1:
            base_tps = triples / dt
    last = out["levels"][-1]
    out["tps_ratio_64x_vs_1x"] = round(
        (last["triples"] / last["seconds"]) / base_tps, 3
    )
    return out


_TAXREF_MAPPING = (
    "/root/reference/morph-xr2rml-dist/example_taxref_rewriting/"
    "xr2rml_taxrefv9-normalized.ttl"
)

_TAXREF_PREFIXES = """\
prefix skosxl: <http://www.w3.org/2008/05/skos-xl#>
"""

# the suite's "propagation of conditions" shape (query.sparql:36-41)
_TAXREF_QUERY = _TAXREF_PREFIXES + """\
SELECT ?t ?a ?b WHERE {
    ?t skosxl:prefLabel <http://inpn.mnhn.fr/taxref/label/1> .
    ?t skosxl:altLabel ?a .
    ?t skosxl:altLabel ?b .
    FILTER (?a != ?b)
}"""

_TERRITORY_FIELDS = (
    "fr", "gf", "mar", "gua", "sm", "sb", "spm", "may", "epa", "reu",
    "sa", "ta", "nc", "wf", "pf", "cli",
)


def run_mapping_width(spark: SparkSession) -> dict[str, object]:
    """Binder pruning at realistic mapping width (round-4 verdict #5):
    the reference's own 150-triples-map normalized TAXREF mapping over
    a synthetic taxref corpus derived from the sf documents table. The
    rewriting mode compiles only the maps a selective 2-predicate query
    binds (<=6 of 150) and key-filters both sides' scans via condition
    propagation; materialize-then-query pays all 150 maps' term
    construction plus the global dedup before it can answer. Both wall
    times are recorded — the structural win the reference's rewriting
    design exists for, as a number."""
    import pathlib

    from morph_xr2rml_spark.compiler.compile import MappingCompiler
    from morph_xr2rml_spark.mapping import parse_mapping
    from morph_xr2rml_spark.plans.caching import release_caches
    from morph_xr2rml_spark.sources.catalog import SourceCatalog
    from morph_xr2rml_spark.sparql import sparql_select
    from morph_xr2rml_spark.sparql.virtual import VirtualGraph

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    code = F.col("doc_id") + F.lit(1)
    # odd codes are reference names; even codes are synonyms of odd
    # references 1..399 (head-skewed on purpose — synonym fan-in)
    ref = F.when(code % 2 == 1, code).otherwise((code % 200) * 2 + 1)
    fields = [
        code.alias("codeTaxon"),
        ref.alias("codeReference"),
        F.greatest(ref - 2, F.lit(1)).alias("codeParent"),
        F.substring("text", 1, 24).alias("libelleNom"),
        F.concat(F.lit("Auteur "), (code % 97).cast("string")).alias(
            "libelleAuteur"
        ),
        F.substring("text", 1, 12).alias("nomVernaculaire"),
        F.element_at(
            F.array(F.lit("ES"), F.lit("GN"), F.lit("FM"), F.lit("KD")),
            (code % 4 + 1).cast("int"),
        ).alias("rang"),
        (code % 3).cast("string").alias("habitat"),
    ]
    for t in _TERRITORY_FIELDS:
        if t == "spm":
            fields.append(F.when(code % 11 == 0, "C").otherwise("").alias(t))
        elif t == "may":
            fields.append(F.when(code % 13 == 0, "P").otherwise("").alias(t))
        else:
            fields.append(F.lit("").alias(t))
    corpus = docs.select(F.to_json(F.struct(*fields)).alias("doc")).persist()
    n_docs = corpus.count()  # input materialized untimed (concrete table)

    mapping = parse_mapping(
        pathlib.Path(_TAXREF_MAPPING).read_text(),
        default_formulation="JSONPath",
    )
    catalog = SourceCatalog(spark).register("taxrefv9", corpus, doc_column="doc")
    out: dict[str, object] = {
        "triples_maps": len(mapping.triples_maps),
        "docs": n_docs,
    }

    t0 = time.time()
    vg = VirtualGraph(spark, mapping, catalog)
    out["virtual_rows"] = vg.select(_TAXREF_QUERY).count()
    out["virtual_compiled_maps"] = len(vg._compilers)
    vg.release()
    out["virtual_seconds"] = round(time.time() - t0, 2)

    t0 = time.time()
    comp = MappingCompiler(spark, mapping, catalog)
    trip = comp.triples().persist()
    out["triples"] = trip.count()
    out["materialize_seconds"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["query_rows"] = sparql_select(trip, _TAXREF_QUERY).count()
    out["query_seconds"] = round(time.time() - t0, 2)
    trip.unpersist()
    comp.release()
    release_caches()
    corpus.unpersist()
    return out


# N and 4N: the primary pair is 1 -> 4 cores, both inside the region
# where this sandbox kernel is not yet the bottleneck (thread-heavy
# shuffle I/O is dominated by system time above ~8 threads — 75% sy in
# top — which a real cluster, one kernel per executor, does not share;
# the userspace-CPU control in BASELINE.md scales ~1.0 to 32 cores).
# 8 and the full local[32] are reported too: 8 -> 32 is the secondary
# N->4N pair, with the kernel caveat (see BASELINE.md). The round-4
# probe measured per-core throughput 103.9k/s at n1, 111.3k at n2,
# 90.2k at n4, 84.2k at n8, 41.0k at n32 — 1->4 eff 0.87, and still
# 0.81 derated against the best per-core rate ever observed (n2).
SCALE_LEVELS = (1, 4, 8, 32)


def scale_level_run(n: int) -> dict:
    """One scaling measurement at local[n] (invoked in a fresh process
    so JVM/GC state from other levels cannot contaminate it)."""
    spark = build_session(
        f"bench-scaling-{n}",
        master=f"local[{n}]",
        # 2 waves per core at every level — the same load-balance factor
        # at N and 4N cores (a single straggler partition otherwise
        # serializes the tail disproportionately at the higher level)
        shuffle_partitions=max(2 * n, 4),
        extra_conf=dict(
            _MEM_CONF,
            **{
                # AQE's per-query-stage driver re-planning is a fixed
                # serial cost that a 100-TB cluster job amortizes but a
                # seconds-long calibration run does not; the plan here
                # is static and pre-sized, so turn it off for the
                # measurement (kept ON for the query suite).
                "spark.sql.adaptive.enabled": "false",
                # fewer, larger shuffle I/O syscalls — this sandbox
                # kernel serializes small-block I/O (see BASELINE.md)
                "spark.shuffle.file.buffer": "1m",
                "spark.shuffle.unsafe.file.output.buffer": "1m",
                "spark.reducer.maxSizeInFlight": "128m",
            },
        ),
    )
    # warm the JVM/Python-worker pools so the measured run is steady-state
    materialization_job(spark, replicated_documents(spark, SF_DIR, 2))
    # materialize the INPUT once, untimed: a cluster run reads a concrete
    # Iceberg/parquet table, so input synthesis (scan + 24x explode +
    # repartition) is not part of the measured pipeline; without this
    # barrier every persist boundary in the pipeline re-executes the
    # replication shuffle inside the timed window
    docs = replicated_documents(spark, SF_DIR, REPLICATE).persist()
    docs.count()
    # best-of-k: the sandbox shows 20-30% hypervisor steal time, so a
    # single run can be ~2x off; the minimum is the steady-state number.
    # Only execution is timed — plan compilation is a per-job driver
    # constant (<0.01% of a real cluster run) that would otherwise
    # distort the small-scale core-count comparison.
    from morph_xr2rml_spark.plans.caching import release_caches

    # Equal measurement budget per level: single repeats vary up to 2x
    # under hypervisor steal (observed 18.1-27.6s back-to-back at 8
    # cores), so each level repeats until the SAME wall budget is spent
    # (>= 4 and <= 16 repeats). best-of-k estimates the steady-state
    # floor; the identical budget at N and 4N keeps the estimator
    # unbiased between the two sides of the efficiency ratio.
    budget = float(os.environ.get("SPARK_GRAFT_SCALE_BUDGET", "240"))
    min_repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "4"))
    best, triples = None, 0
    done = 0
    t_level = time.time()
    while done < min_repeats or (
        time.time() - t_level < budget and done < 16
    ):
        done += 1
        plan, cached = build_materialization(spark, docs)
        t0 = time.time()
        # stage barriers (see materialization_job): materialize each
        # persisted intermediate, then the final triple count — all
        # inside the timed window
        for df in cached:
            df.count()
        triples = plan.count()
        dt = time.time() - t0
        for df in cached:
            df.unpersist()
        release_caches()  # compiler-registered parent-scan persists
        print(f"[scale n={n}] repeat: {dt:.2f}s", file=sys.stderr)
        best = dt if best is None else min(best, dt)
    docs.unpersist()
    spark.stop()
    return {"cores": n, "seconds": round(best, 2), "triples": triples,
            "tps": round(triples / best, 1)}


def scale_server(n: int) -> None:
    """Long-lived measurement server at local[n] (core-pinned by the
    coordinator via taskset): builds the session, warms it, materializes
    the replicated input once (untimed — a cluster job reads a concrete
    table), then runs ONE timed repeat per 'go' line on stdin and prints
    the result. Keeping every level alive at once lets the coordinator
    interleave repeats across levels, so the N and 4N samples of each
    round land in the SAME hypervisor-steal phase (round-3 finding: the
    sandbox's steal comes in ~5-minute phases, and sequential per-level
    budgets let one level's whole budget land in a bad phase)."""
    spark = build_session(
        f"bench-scaling-{n}",
        master=f"local[{n}]",
        shuffle_partitions=max(2 * n, 4),
        extra_conf=dict(
            _MEM_CONF,
            **{
                "spark.sql.adaptive.enabled": "false",
                "spark.shuffle.file.buffer": "1m",
                "spark.shuffle.unsafe.file.output.buffer": "1m",
                "spark.reducer.maxSizeInFlight": "128m",
                # four concurrent level servers share the machine's RAM;
                # each holds only the replicated docs + one job's shuffle
                "spark.driver.memory": os.environ.get(
                    "SPARK_GRAFT_SCALE_DRIVER_MEM", "16g"
                ),
            },
        ),
    )
    from morph_xr2rml_spark.plans.caching import release_caches

    materialization_job(spark, replicated_documents(spark, SF_DIR, 2))
    docs = replicated_documents(spark, SF_DIR, REPLICATE).persist()
    docs.count()
    print("SCALE_READY", flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit":
            break
        if cmd != "go":
            continue
        plan, cached = build_materialization(spark, docs)
        t0 = time.time()
        for df in cached:
            df.count()
        triples = plan.count()
        dt = time.time() - t0
        for df in cached:
            df.unpersist()
        release_caches()
        print(
            "SCALE_RESULT " + json.dumps({"dt": dt, "triples": triples}),
            flush=True,
        )
    docs.unpersist()
    spark.stop()


# disjoint pin ranges for the 1-, 4- and 8-core servers so an idle
# sibling JVM's background threads never sit on a measuring level's
# cores; the 32-core level necessarily spans the machine. Levels are
# measured in PAIRWISE phases (see run_scaling) because only the two
# sides of one efficiency ratio need to share steal phases — and a
# four-server fleet measurably crowds the small levels (an idle
# 32-core-pinned JVM's background threads inflated the 1-core level
# ~40% over its solo floor, pushing the 1->4 ratio past 1.0).
_PIN_RANGES = {1: "0", 2: "0-1", 4: "1-4", 8: "5-12", 32: "0-31"}

# the N->4N pairs actually reported: the primary kernel-clean pair and
# the full-machine pair (kernel-bound above ~8 threads; see BASELINE.md)
SCALE_PAIRS = ((1, 4), (8, 32))


def _run_scale_pair(
    pair: tuple[int, int], budget: float, min_rounds: int
) -> tuple[dict[int, float], list[float], int]:
    """Interleaved measurement of ONE (N, 4N) pair: a server process
    per level, repeats taken round-robin (nN_i and n4N_i adjacent in
    time) so hypervisor-steal phases hit both sides of the ratio
    equally (round-3 verdict fix #3). Only the pair's two processes are
    alive, on disjoint pin ranges where possible, so neither side is
    crowded by idle sibling JVMs. Returns (floors, per-round pair
    ratios, triples)."""
    import shutil
    import subprocess

    procs: dict[int, subprocess.Popen] = {}
    for n in pair:
        cmd = [sys.executable, os.path.abspath(__file__), f"--scale-server={n}"]
        if shutil.which("taskset"):
            # pin the whole process tree (JVM GC/JIT threads + Python
            # workers included) to n CPUs — the faithful proxy for an
            # n-core cluster; local[n] alone only caps task slots
            cmd = ["taskset", "-c", _PIN_RANGES[n]] + cmd
        procs[n] = subprocess.Popen(
            cmd,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            bufsize=1,
        )

    def _read_until(p: subprocess.Popen, prefix: str) -> str:
        for line in p.stdout:
            s = line.strip()
            if s.startswith(prefix):
                return s[len(prefix):].strip()
        raise RuntimeError(f"scale server exited before '{prefix}'")

    rounds: list[dict[int, dict]] = []
    try:
        # servers warm up / build input concurrently (all untimed)
        for n in pair:
            _read_until(procs[n], "SCALE_READY")
        t_start = time.time()
        while len(rounds) < min_rounds or (
            time.time() - t_start < budget and len(rounds) < 12
        ):
            rec: dict[int, dict] = {}
            for n in pair:  # strictly serialized within a round
                procs[n].stdin.write("go\n")
                procs[n].stdin.flush()
                rec[n] = json.loads(_read_until(procs[n], "SCALE_RESULT "))
            rounds.append(rec)
            print(
                f"[scale pair {pair[0]}->{pair[1]} round {len(rounds)}] "
                + " ".join(f"n{n}={rec[n]['dt']:.2f}s" for n in pair),
                file=sys.stderr,
            )
    finally:
        for p in procs.values():
            try:
                p.stdin.write("quit\n")
                p.stdin.flush()
            except Exception:
                pass
        for p in procs.values():
            try:
                p.wait(timeout=180)
            except Exception:
                p.kill()

    counts = {r[n]["triples"] for r in rounds for n in pair}
    assert len(counts) == 1, "scaling runs must produce identical output"
    triples = rounds[0][pair[0]]["triples"]
    floors = {n: min(r[n]["dt"] for r in rounds) for n in pair}
    ratios = [
        round(r[pair[0]]["dt"] / r[pair[1]]["dt"] / 4.0, 3) for r in rounds
    ]
    return floors, ratios, triples


def run_scaling() -> dict[str, object]:
    """Pairwise-interleaved N -> 4N measurement over SCALE_PAIRS.
    Efficiency uses per-level steady-state floors across the pair's
    shared wall window; the per-round matched-pair ratios are recorded
    as evidence of phase-fairness."""
    # 6 minimum rounds per pair (was 4): the small-N side is stable
    # (~114s at 1 core, every round) while the 4N side swings up to
    # 1.6x with steal phases, so the FLOOR estimator needs more draws
    # on the noisy side — round 5's first record hit 3 inflated n4
    # rounds out of 4 and read 0.792 where the clean matched round
    # measured 0.805+ (and r04's clean floors 0.953)
    budget = float(os.environ.get("SPARK_GRAFT_SCALE_BUDGET", "600"))
    min_rounds = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "6"))
    out: dict[str, object] = {}
    triples = 0
    for pair in SCALE_PAIRS:
        floors, ratios, triples = _run_scale_pair(
            pair, budget / len(SCALE_PAIRS), min_rounds
        )
        for n in pair:
            out[f"n{n}_seconds"] = round(floors[n], 2)
            out[f"n{n}_triples_per_sec"] = round(triples / floors[n], 1)
        key = f"efficiency_{pair[0]}_to_{pair[1]}"
        out[key] = round(floors[pair[0]] / floors[pair[1]] / 4.0, 3)
        out[key + "_pairs"] = ratios
        out[key + "_rounds"] = len(ratios)
    out["triples"] = triples
    p0 = SCALE_PAIRS[0]
    out["efficiency"] = out[f"efficiency_{p0[0]}_to_{p0[1]}"]  # N->4N criterion
    return out


def main() -> None:
    for arg in sys.argv[1:]:
        if arg.startswith("--scale-level="):
            print(json.dumps(scale_level_run(int(arg.split("=")[1]))))
            return
        if arg.startswith("--scale-server="):
            scale_server(int(arg.split("=")[1]))
            return
    if "--scaling-only" in sys.argv:
        print(json.dumps({"scaling": run_scaling()}))
        return
    do_scaling = "--no-scaling" not in sys.argv
    do_sf_scaling = "--no-sf-scaling" not in sys.argv
    do_mapping_width = "--no-mapping-width" not in sys.argv
    spark = build_session(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS,
        extra_conf=_MEM_CONF,
    )
    t0 = time.time()
    timings, tps, calib = run_queries(spark)
    suite = round(sum(timings.values()), 3)
    total = round(time.time() - t0, 3)
    mapping_width = run_mapping_width(spark) if do_mapping_width else None
    sf_scaling = run_sf_scaling(spark) if do_sf_scaling else None
    spark.stop()

    cal = steal_calibration(calib)
    factors = dict(zip(BENCH_QUERIES, _query_factors(calib)))
    cal["per_query_factor"] = {k: round(f, 3) for k, f in factors.items()}
    # each query deflated by ITS bracketing phase's measured inflation
    # so round-over-round comparisons compare plans, not hypervisor
    # weather; raw numbers are recorded alongside (BASELINE.md rule)
    queries_norm = {
        k: round(v / factors[k], 3) for k, v in timings.items()
    }
    result = {
        "metric": "bench_suite_seconds",
        "value": round(sum(queries_norm.values()), 3),
        "unit": "sec",
        "queries": queries_norm,
        "queries_raw": timings,
        "suite_seconds_raw": suite,
        "wall_seconds_raw": total,
        "calibration": cal,
        "sf": _sf_of(SF_DIR),
        "triples_per_sec": round(
            tps * factors.get("kg_triples_canonical", 1.0), 1
        ),
        "triples_per_sec_raw": round(tps, 1),
    }
    if mapping_width is not None:
        result["mapping_width"] = mapping_width
    if sf_scaling is not None:
        result["sf_scaling"] = sf_scaling
    if do_scaling:
        result["scaling"] = run_scaling()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
