"""Text-analysis operators over a documents table.

Language-ID (stopword n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex) and document fingerprinting
(normalized-content hash). All pure Column expressions — JVM-side,
whole-stage codegen, no shuffle except the caller's own aggregations —
so they scale linearly with input splits and never touch Python.

Ratio outputs are emitted as ``floor(x * 10000)`` bigints ("basis
points") instead of doubles: both Spark and the DuckDB oracle compute
the same IEEE double and floor it identically, which keeps the driver's
value-hash comparison exact without fragile float formatting.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import md5_long

# Whole-match token pattern: ASCII word runs or single non-space symbols
# (a BPE-pre-tokenizer-shaped split; avoids \w to keep Java/RE2 regex
# semantics identical between Spark and the oracle engine).
TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

# Per-language stopword alternations for the n-gram language heuristic.
LANG_STOPWORDS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|it|for|with)\b",
    "fr": r"\b(le|la|les|et|un|une|du|des|est|dans)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "es": r"\b(el|los|las|y|que|en|un|una|es|por)\b",
}
# deterministic precedence for argmax ties (scores checked in order)
LANG_ORDER = ["en", "fr", "de", "es"]

EN_STOPWORD_RE = LANG_STOPWORDS["en"]


def ws_token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: word runs + individual symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        lang: F.size(F.regexp_extract_all(low, F.lit(pat), 0))
        for lang, pat in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language over stopword-hit counts; 'und' when no hits.

    Tie-break: first language in LANG_ORDER with the max score.
    """
    scores = lang_scores(text)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def _bp(x: Column) -> Column:
    """double -> basis points (floor(x*10000) as bigint)."""
    return F.floor(x * F.lit(10000.0)).cast("long")


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-signal columns, all in basis points (bigint).

    alpha_bp     fraction of [A-Za-z] chars
    punct_bp     fraction of .,;:!? chars
    stop_bp      English-stopword tokens per whitespace token
    mwl_bp       mean word length * 10000 (word = non-space chars/tokens)
    score_bp     combined heuristic quality score in [0, 10000]
    """
    n = F.length(text).cast("double")
    words = ws_token_count(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    stops = F.size(F.regexp_extract_all(F.lower(text), F.lit(EN_STOPWORD_RE), 0)).cast(
        "double"
    )
    spaces = (n - F.length(F.regexp_replace(text, r"\s", ""))).cast("double")

    safe_n = F.when(n > 0, n).otherwise(F.lit(1.0))
    safe_w = F.when(words > 0, words).otherwise(F.lit(1.0))
    alpha_ratio = alpha / safe_n
    punct_ratio = punct / safe_n
    stop_ratio = stops / safe_w
    mean_word_len = (n - spaces) / safe_w

    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.3)
        * F.greatest(
            F.lit(1.0) - F.abs(mean_word_len - F.lit(5.0)) / F.lit(10.0), F.lit(0.0)
        )
    )
    return {
        "alpha_bp": _bp(alpha_ratio),
        "punct_bp": _bp(punct_ratio),
        "stop_bp": _bp(stop_ratio),
        "mwl_bp": _bp(mean_word_len),
        "score_bp": _bp(score),
    }


def normalized_text(text: Column) -> Column:
    """Canonical content form for fingerprinting: lowercase, strip
    non-alphanumerics to spaces, squeeze + trim whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9]+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """60-bit content fingerprint of the normalized text (md5-derived,
    reproducible in any engine)."""
    return md5_long(normalized_text(text))


def analyze(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text analysis: a single narrow projection (no shuffle)."""
    t = F.col(text_col)
    q = quality_columns(t)
    return df.select(
        F.col(id_col),
        lang_id(t).alias("lang_pred"),
        ws_token_count(t).cast("long").alias("ws_tokens"),
        regex_token_count(t).cast("long").alias("re_tokens"),
        q["alpha_bp"].alias("alpha_bp"),
        q["punct_bp"].alias("punct_bp"),
        q["stop_bp"].alias("stop_bp"),
        q["mwl_bp"].alias("mwl_bp"),
        q["score_bp"].alias("score_bp"),
        fingerprint(t).alias("fingerprint"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (the MOSS rolling-hash scheme, Schleimer
    et al. 2003): hash every k-token shingle of the normalized text,
    slide a window of ``w`` consecutive hashes, keep each window's
    minimum; the distinct minima are the document's fingerprints.
    Guarantees any shared run of >= w+k-1 tokens between two documents
    shares at least one fingerprint.

    Per-row Arrow UDF — the fingerprint set of a document depends only
    on that document, so the 100-TB plan is ONE corpus pass with no
    shuffle at all (the per-doc distinct happens inside the UDF).
    Hashes are the same md5-derived 60-bit longs as ops.hashing
    (int(md5(gram)[:15 hex], 16)), so the DuckDB oracle reproduces
    them bit-for-bit.
    """
    import hashlib
    import re as _re

    def fps_of(text: str | None) -> list[int]:
        if text is None:
            return []
        norm = _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        toks = norm.split(" ")
        if len(toks) >= k:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        else:
            grams = [" ".join(toks)]
        hs = [
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
            for g in grams
        ]
        if len(hs) <= w:
            return [min(hs)]
        return sorted({min(hs[j : j + w]) for j in range(len(hs) - w + 1)})

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _win(texts: pd.Series) -> pd.Series:
        return texts.map(fps_of)

    return df.select(
        F.col(id_col), F.explode(_win(F.col(text_col))).alias("fp")
    )


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Exact corpus-wide top-k vocabulary: (token, n) for the k most
    frequent normalized tokens, ties broken lexicographically.

    The heavy-hitter plan at 100 TB: explode -> hash aggregate with
    map-side partial counts (the shuffle carries one row per distinct
    token per task, not per occurrence) -> TakeOrderedAndProject (each
    task ships only its local top-k to the driver merge). All codegen
    Column expressions; no UDF.
    """
    toks = df.select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("token")
    ).where(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )
