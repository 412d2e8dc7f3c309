"""Text analysis operators: token counts, quality score, language ID,
document fingerprint.

All JVM-side (split/higher-order functions); deterministic; each has an
exact DuckDB-SQL oracle. These generalize the reference's per-document
statistics (field word counts, ``/root/reference/src/update/index_documents/
extract/extract_fid_word_count_docids.rs``) into the corpus-quality signals
a training-data pipeline filters on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from search_engine_spark.pipelines.dedup import tokens_col

# small frozen English stopword list (quality signal, not linguistics)
STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on or that the "
    "to was were will with"
).split()

# marker vocabularies for the n-gram/marker language-ID heuristic; frozen.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
}


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, n_uniq, n_chars_tok): whitespace/regex token
    counting (the BPE-ish ``[a-z0-9]+`` segmentation shared engine-wide)."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
        ).alias("n_chars_tok"),
    )


def _ratio(num: Column, den: Column) -> Column:
    return F.round(num / F.greatest(den.cast("double"), F.lit(1.0)), 6)


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, avg_token_len, stopword_ratio, uniq_ratio,
    digit_ratio): the classic cheap quality signals (length, stopword
    density, vocabulary diversity, digit share)."""
    toks = tokens_col(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n = F.size(toks)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        _ratio(
            F.aggregate(F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x),
            n,
        ).alias("avg_token_len"),
        _ratio(F.size(F.filter(toks, lambda t: F.array_contains(sw, t))), n).alias(
            "stopword_ratio"
        ),
        _ratio(F.size(F.array_distinct(toks)), n).alias("uniq_ratio"),
        _ratio(
            F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))), n
        ).alias("digit_ratio"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, pred_lang, marker_hits): marker-word language heuristic.

    Scores each language by distinct marker-vocabulary hits in the token
    set; prediction = argmax, ties and zero-hits -> 'und' ordered
    lexicographically. Deterministic and SQL-expressible.
    """
    toks = F.array_distinct(tokens_col(text_col))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # first (lexicographic) language achieving the max, if max > 0
    for lang, s in reversed(scores):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return df.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        best.alias("marker_hits"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, fp): content fingerprint = md5 over the normalized token
    stream (separator-insensitive, unlike raw-text md5)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(tokens_col(text_col), " ")).alias("fp"),
    )
