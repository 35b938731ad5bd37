"""Text-analysis operators for training-data pipelines (BASELINE.json
scale extensions): language-ID heuristic, quality scoring, token
counting, document fingerprinting.  All JVM-side column expressions —
the hot path of a 100 TB text pipeline must not leave codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_half_away_col

from .dedup import norm_tokens, repartition_unsplittable

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
    stopword hit counts, the literal ``'unknown'`` when nothing scores
    (NOT ISO-639 ``'und'`` — doc/code mismatch fixed in review; the
    oracle emits the same literal).  Ties break by fixed language order
    — deterministic everywhere.

    The token array is BOUND in its own projection first (r13
    optimization): the four per-language ``filter`` higher-order calls
    evaluate outside whole-stage codegen, where each inlined copy of
    the tokenizer chain would re-run split+regexp per call —
    CollapseProject keeps a non-cheap alias referenced 4× bound, so
    the chain runs once per row."""
    out = df.select("*", norm_tokens(F.col(text_col)).alias("__lang_toks"))
    toks = F.col("__lang_toks")
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"__{lang}", _hits(toks, words))
    best = F.greatest(*[F.col(f"__{lang}") for lang in STOPWORDS])
    pred = F.lit("unknown")
    for lang in reversed(list(STOPWORDS)):
        pred = F.when(
            (F.col(f"__{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    out = out.withColumn("predicted_lang", pred)
    return out.drop("__lang_toks", *[f"__{lang}" for lang in STOPWORDS])


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish regex token count).

    The regex tokenizer splits into letter runs, digit runs, and single
    punctuation marks — the shape of a byte-level BPE pre-tokenizer.
    Letter runs are UNICODE letters (``\\p{L}``, identical category in
    Java and RE2): the old ``[a-z]`` class counted 'über' as two tokens
    and every accented letter as punctuation, biasing features against
    exactly the de/fr/es corpora :data:`STOPWORDS` supports (review
    batch).  Blank text counts 0 tokens, not the phantom 1 that
    ``split('')``'s ``['']`` produces."""
    # size(toks) minus a blank-text indicator: split('') yields ['']
    # (one phantom token) and norm_tokens never produces empty tokens
    # otherwise, so subtracting the indicator counts 0 for blank text.
    # Arithmetic, not a when() AROUND the tokenizer (defeats codegen
    # CSE — the chain re-evaluates per use, measured 2×) and not a
    # higher-order filter (interpreted per element).
    ws = (F.size(norm_tokens(text))
          - F.when(F.trim(text) == "", F.lit(1)).otherwise(F.lit(0)))
    # explicit whitespace class, NOT \s — Java/RE2 disagree on \x0b
    # (the norm_tokens portability rule; review fix)
    from ..functions.strings import lower_simple

    bpe = F.size(F.regexp_extract_all(
        lower_simple(text),
        F.lit(r"[\p{L}]+|[0-9]+|[^\p{L}0-9 \t\n\x0b\f\r]"), 0))
    return ws, bpe


def quality_features(df: DataFrame, id_col: str, text_col: str,
                     keep: list[str] | None = None) -> DataFrame:
    """Quality-scoring features: length, token counts, mean token length,
    punctuation ratio, stopword ratio, and a case_when quality tier.
    ``keep`` passes extra columns through, so upstream per-row results
    (e.g. ``lang_id``) can ride the same single corpus pass instead of
    re-joining on the id."""
    # parallelism repair for the regex-heavy narrow pass (no-op on
    # already-distributed input — e.g. corpus_curation's post-window
    # frame — and on any splittable source; see repartition_unsplittable)
    df = repartition_unsplittable(df, id_col)
    text = F.col(text_col)
    # Bind the token array ONCE in its own projection (r13
    # optimization, same rationale as lang_id/shingles): stop_hits and
    # mean_token_len reference it through higher-order / multi-use
    # expressions that would otherwise inline the tokenizer chain per
    # use; CollapseProject keeps a non-cheap multiply-referenced alias
    # bound, so the chain runs once per row.  The pass-through columns
    # are deduped so keep=[text_col] cannot double-select.
    passthru = [c for c in dict.fromkeys([*(keep or []), text_col])
                if c != id_col]
    df = df.select(F.col(id_col), *[F.col(c) for c in passthru],
                   norm_tokens(text).alias("__qf_toks"))
    toks = F.col("__qf_toks")
    # blank text is 0 tokens (split('') yields [''] — a phantom token
    # that made empty docs indistinguishable from one-token docs and
    # kept n_tokens==0 filters from ever firing; review batch).  The
    # ratio denominators go NULL on 0 — mirrored by the oracle's
    # nullif — and the tier's NULL comparison falls through to 'low'.
    # Counted as size(toks) minus a blank indicator — unconditional
    # size keeps the tokenizer chain CSE-shareable (a when() around it
    # re-evaluated the split per consumer: measured 2×), and the
    # indicator branches only on trim(text), not the chain.
    n_tokens = (F.size(toks)
                - F.when(F.trim(text) == "", F.lit(1)).otherwise(F.lit(0)))
    n_chars = F.length(text)
    # Unicode-aware punctuation class: Java \w is ASCII-only, so 'é'
    # and 'ß' counted as punctuation and inflated punct_ratio on the
    # non-English corpora the language heuristic exists for (review
    # batch; \p{L} is the same category in Java and RE2)
    punct = F.size(F.regexp_extract_all(
        text, F.lit(r"[^\p{L}0-9_ \t\n\x0b\f\r]"), 0))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(all_stop)))
    # Σ token lengths / n_tokens — NOT (n_chars - (n_tokens-1)) /
    # n_tokens, which assumes exactly one single-space separator and
    # inflates the feature on tab runs / trailing whitespace (round-13
    # review: 'a\t\tb' scored 1.5 instead of 1.0).
    # NULL-on-zero denominators (the oracle's nullif), stated
    # explicitly rather than relying on non-ANSI /0→NULL: under ANSI
    # (Spark 4's default) a bare /0 THROWS on the first empty document
    tok_denom = F.when(n_tokens == 0, F.lit(None)).otherwise(n_tokens)
    chr_denom = F.when(n_chars == 0, F.lit(None)).otherwise(n_chars)
    mean_tok = round_half_away_col(
        F.length(F.concat_ws("", toks)) / tok_denom, 6
    )
    stop_ratio = round_half_away_col(stop_hits / tok_denom, 6)
    punct_ratio = round_half_away_col(punct / chr_denom, 6)
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
    df = repartition_unsplittable(df, id_col)
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
    df = repartition_unsplittable(df, id_col)
    for name, pat in PII_PATTERNS.items():
        masked = F.regexp_replace(masked, pat, f"<{name.upper()}>")
    # counts are of the placeholders ACTUALLY PRESENT in masked_text,
    # not raw-text matches: masking is sequential, so a URL containing
    # an email-shaped path segment yields one <URL> and zero <EMAIL> —
    # counting the raw text reported a phantom unredacted email to any
    # consumer auditing redaction completeness (review batch)
    counts = [
        F.size(F.regexp_extract_all(masked, F.lit(f"<{name.upper()}>"), 0))
        .cast("long")
        .alias(f"n_{name}")
        for name in PII_PATTERNS
    ]
    return df.select(F.col(id_col), masked.alias("masked_text"), *counts)
