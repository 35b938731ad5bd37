"""Text-analysis operators for training-data pipelines (BASELINE.json
scale extensions): language-ID heuristic, quality scoring, token
counting, document fingerprinting.  All JVM-side column expressions —
the hot path of a 100 TB text pipeline must not leave codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_half_away_col

from .dedup import norm_tokens

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}


def _hits(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(words)))


def lang_id(df: DataFrame, text_col: str) -> DataFrame:
    """N-gram/stopword language heuristic: argmax of per-language
    stopword hit counts, 'und' (unknown) when nothing scores.  Ties break
    by fixed language order — deterministic everywhere."""
    toks = norm_tokens(F.col(text_col))
    out = df
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"__{lang}", _hits(toks, words))
    best = F.greatest(*[F.col(f"__{lang}") for lang in STOPWORDS])
    pred = F.lit("unknown")
    for lang in reversed(list(STOPWORDS)):
        pred = F.when(
            (F.col(f"__{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    out = out.withColumn("predicted_lang", pred)
    return out.drop(*[f"__{lang}" for lang in STOPWORDS])


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish regex token count).

    The regex tokenizer splits into letter runs, digit runs, and single
    punctuation marks — the shape of a byte-level BPE pre-tokenizer."""
    ws = F.size(norm_tokens(text))
    # explicit whitespace class, NOT \s — Java/RE2 disagree on \x0b
    # (the norm_tokens portability rule; review fix)
    from ..functions.strings import lower_simple

    bpe = F.size(F.regexp_extract_all(lower_simple(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]"), 0))
    return ws, bpe


def quality_features(df: DataFrame, id_col: str, text_col: str,
                     keep: list[str] | None = None) -> DataFrame:
    """Quality-scoring features: length, token counts, mean token length,
    punctuation ratio, stopword ratio, and a case_when quality tier.
    ``keep`` passes extra columns through, so upstream per-row results
    (e.g. ``lang_id``) can ride the same single corpus pass instead of
    re-joining on the id."""
    text = F.col(text_col)
    toks = norm_tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = F.size(F.regexp_extract_all(
        text, F.lit(r"[^\w \t\n\x0b\f\r]"), 0))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(all_stop)))
    # Σ token lengths / n_tokens — NOT (n_chars - (n_tokens-1)) /
    # n_tokens, which assumes exactly one single-space separator and
    # inflates the feature on tab runs / trailing whitespace (round-13
    # review: 'a\t\tb' scored 1.5 instead of 1.0)
    mean_tok = round_half_away_col(
        F.length(F.concat_ws("", toks)) / n_tokens, 6
    )
    stop_ratio = round_half_away_col(stop_hits / n_tokens, 6)
    punct_ratio = round_half_away_col(punct / n_chars, 6)
    tier = (
        F.when((n_tokens >= 50) & (stop_ratio > 0), "high")
        .when(n_tokens >= 20, "medium")
        .otherwise("low")
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep or [])],
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        punct.cast("long").alias("n_punct"),
        mean_tok.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        tier.alias("quality_tier"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set —
    the document-level analogue of the OpenRefine key fingerprint
    (`open-refine-fingerprint.R:15-23`), order/whitespace-insensitive."""
    toks = norm_tokens(F.col(text_col))
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    return df.select(F.col(id_col), fp.alias("fingerprint"))


PII_PATTERNS = {
    # dialect-portable: explicit classes only — [^\s] looked portable
    # but Java \s includes \x0b and RE2 \s does not, so the URL
    # match ended at different places across engines (review fix)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^ \t\n\x0b\f\r]+",
}


def pii_mask(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction for training corpora: replace every email/URL with
    a typed placeholder and report per-type match counts.  Pure JVM
    (regexp_replace / regexp_extract_all) — runs inside whole-stage
    codegen, no UDF; the per-row cost is independent of corpus size so
    the op is embarrassingly parallel at 100 TB.
    """
    masked = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        masked = F.regexp_replace(masked, pat, f"<{name.upper()}>")
    counts = [
        F.size(F.regexp_extract_all(text_col, F.lit(pat), 0))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    return df.select(F.col(id_col), masked.alias("masked_text"), *counts)
