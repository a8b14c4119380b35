"""Text-analysis operators for the training-data pipeline (north-star set):
normalization, tokenization, token counting, quality scoring, language-ID
heuristic, document fingerprinting.

Everything is built from ``pyspark.sql.functions`` string/array/lambda
expressions — JVM-side, whole-stage-codegen, zero Python in the hot path —
and every expression has an exact ANSI/DuckDB twin (md5, regexp_replace,
split, higher-order list functions behave identically), so each op is
oracle-checkable.

At 100 TB these are embarrassingly parallel map-only ops: no shuffle at
all until a downstream groupBy, so they scale linearly with executors and
are bounded by parquet scan throughput.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rel_db_to_graph_spark.functions.vector import sigmoid

#: tiny marker-word lists for the language-ID heuristic (public-knowledge
#: function words; deterministic, no model download)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "y", "es", "una"],
}

#: stopwords for the quality score (subset of the english list)
STOPWORDS: list[str] = ["the", "a", "an", "and", "or", "of", "to", "in", "is"]


def normalize(text: Column) -> Column:
    """lower → strip non-alnum → collapse whitespace → trim."""
    x = F.lower(text)
    x = F.regexp_replace(x, "[^a-z0-9 ]", " ")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def tokens(norm: Column) -> Column:
    return F.split(norm, " ")


def token_count(norm: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(norm))


def subword_count(norm: Column, max_piece: int = 4) -> Column:
    """BPE-ish upper bound: count of maximal ≤4-char alnum chunks."""
    return F.size(F.regexp_extract_all(norm, F.lit(f"[a-z0-9]{{1,{max_piece}}}"), 0))


def marker_hits(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, "[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.length(text)


def quality_score(text: Column) -> Column:
    """Deterministic heuristic quality in (0,1): rewards plausible token
    length and stopword density, punishes punctuation soup. (The shape of
    a Gopher/C4-style quality rule, minus the learned parts.)"""
    norm = normalize(text)
    toks = tokens(norm)
    n_tok = F.size(toks)
    avg_len = F.length(F.replace(norm, F.lit(" "), F.lit(""))) / n_tok
    stop_ratio = marker_hits(toks, STOPWORDS) / n_tok
    return sigmoid(F.lit(0.4) * avg_len + F.lit(2.0) * stop_ratio
                   - F.lit(5.0) * punct_ratio(text) - F.lit(2.0))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(normalize(text))
    return {lang: marker_hits(toks, ms) for lang, ms in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """argmax of marker hits with a fixed tie-break order (en,de,fr,es),
    'und' when nothing matched."""
    s = lang_scores(text)
    order = list(LANG_MARKERS)
    best = None
    for lang in order:
        others = [s[o] for o in order if o != lang]
        cond = (s[lang] > 0)
        for o in order[: order.index(lang)]:
            cond = cond & (s[lang] > s[o])          # earlier langs win ties
        for o in order[order.index(lang) + 1:]:
            cond = cond & (s[lang] >= s[o])
        branch = F.when(cond, F.lit(lang))
        best = branch if best is None else best.when(cond, F.lit(lang))
    return F.coalesce(best, F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Normalized-content md5 — the exact-dedup key."""
    return F.md5(normalize(text))


def chunk_spans(norm: Column, size: int, overlap: int) -> Column:
    """array<struct<chunk_id,chunk_text>>: fixed-size character windows
    with ``overlap`` shared chars between consecutive windows — the
    standard doc-splitting step before embedding/indexing. Map-only
    (explode downstream): stride = size - overlap; the last window may
    be short; a doc shorter than one stride yields one window.
    """
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    stride = size - overlap
    n = (F.ceil((F.greatest(F.length(norm) - overlap, F.lit(1)))
                / F.lit(float(stride)))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.substring(norm, i * stride + 1, size).alias("chunk_text")))


def repetition_ratios(toks: Column) -> tuple[Column, Column]:
    """(dup_2gram_ratio, dup_3gram_ratio): fraction of word n-grams that
    are repeats of an earlier occurrence — the Gopher-style repetition
    quality signal (high ratio = boilerplate/spam). ``toks`` must be a
    BOUND token-array column (same re-evaluation caveat as word_ngrams).
    Pure per-row list arithmetic: 1 - |distinct grams| / |grams|.
    """
    from rel_db_to_graph_spark.operators.dedup import word_ngrams

    def ratio(n: int) -> Column:
        grams = word_ngrams(toks, n)
        return F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams), 6)

    return ratio(2), ratio(3)
