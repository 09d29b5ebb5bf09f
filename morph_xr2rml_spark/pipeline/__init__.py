"""Web-scale KG-construction pipeline (the north-rule target).

Stages, each a DataFrame -> DataFrame function with lineage/metrics
checkpointing between them (lineage.py):

  pages        Common-Crawl-style input table
               (url, warc_ts, html:binary, text, lang)
  extract      byte-exact text extraction from html via Arrow-batched
               pandas UDF (verified byte-identical per url)
  mentions     token-level mention detection + entity-link scoring via
               a broadcast alias dictionary
  triples      xR2RML-compiled triple emission (mapping.compiler) over
               pages + mentions + entities
  canonicalize connected components over sameAs edges; subj/obj rewrite
               through the canonical-id map
  materialize  partitioned (subj, pred, obj) table + per-partition
               lineage and triple-count metrics

Every stage is restartable: lineage.StageRunner skips stages whose
checkpoint output already exists (resume-from-mid-pipeline).
"""

from .run import run_pipeline  # noqa: F401
