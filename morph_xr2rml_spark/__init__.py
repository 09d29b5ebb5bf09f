"""morph_xr2rml_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
morph-xr2rml (reference: ghxiao/morph-xr2rml, read-only at /root/reference).

NOT a port: the reference is a single-threaded Scala program looping over
JDBC/MongoDB cursors into an in-memory Jena model; this engine compiles the
same declarative xR2RML mapping language to distributed Spark DataFrame
plans (Catalyst-optimized, vectorized pandas/Arrow UDFs only where built-in
functions cannot express the semantics).

Layout:
  functions/   encoding kernel, N-Triples term model, mixed-syntax-path
               evaluators, template machinery, text/similarity functions
  mapping/     xR2RML mapping-language model + Turtle-subset parser
  compiler/    mapping document -> DataFrame triple plans
  operators/   dedup, similarity-search, array-intersection joins, skew tools
  sources/     logical-source resolution (parquet dirs, SQL queries)
  pipeline/    web-scale KG pipeline: extract -> mentions -> triples ->
               canonicalize -> materialize, with lineage checkpoints
  plans/       SparkSession builder + scale-tuned configuration
"""

__version__ = "0.1.0"
