"""Distributed byte-pair-encoding tokenizer training (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units") —
the classic BPE merge loop re-expressed relationally so a 100 TB corpus
can train a tokenizer without ever leaving the cluster.

Architecture (the reason BPE scales on Spark at all): the corpus is
scanned ONCE to build the word-frequency table, and every subsequent
merge iteration runs over that table — whose size is the corpus
VOCABULARY (millions of rows), not the corpus (billions of documents).
Each iteration is:

1. one map-side-combinable aggregate (adjacent-symbol pair counts,
   weighted by word frequency) — the only shuffle, vocabulary-sized;
2. one `TakeOrderedAndProject` argmax for the best pair (a single row
   collected to the driver — the trained merge rule itself, not data);
3. one codegen string rewrite applying the merge to every word.

The merge rewrite uses a delimiter-doubling trick so a plain
non-overlapping left-to-right ``replace`` (identical semantics in Spark
and DuckDB — no regex engine in the loop) implements BPE's greedy
left-to-right merge exactly, including runs like ``a b a b`` where
consecutive matches share a separator: symbols are re-joined with
DOUBLE spaces, the pattern ``" l  r "`` consumes one space from each
side, and a final ``"  " -> " "`` collapse restores the single-space
form.  Determinism: ties in pair counts break on (lsym, rsym)
lexicographically — byte order in both engines — so the learned merge
table is a pure function of the corpus.

Oracle strategy (queries_llm3): the DuckDB twin unrolls the same N
iterations as chained CTEs (the Lloyd's/PageRank-oracle idiom), so the
full fit — not just the final state — is hash-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_symbol_table(words: DataFrame) -> DataFrame:
    """(word, cnt) → (word, s, cnt) where ``s`` is the space-separated
    character sequence plus the end-of-word marker (``"join"`` →
    ``"j o i n </w>"``).  ``regexp_replace`` with a capture leaves a
    trailing space after the last character, which the marker concat
    absorbs — the same expression shape the DuckDB oracle uses.  The
    original ``word`` rides along so the trained table doubles as the
    word→tokenization map for document encoding."""
    return words.select(
        "word",
        F.concat(
            F.regexp_replace(F.col("word"), "(.)", "$1 "),
            F.lit(END_OF_WORD),
        ).alias("s"),
        F.col("cnt"),
    )


def adjacent_elements(
    df: DataFrame, arr_col: str, left_name: str, right_name: str,
    carry: list[str],
) -> DataFrame:
    """Adjacent-element pairs of an array column, one row per position,
    with ``carry`` columns riding along — the shared idiom behind BPE
    pair counting, bigram-LM training, and DSIR bucketing (one Spark
    copy, one DuckDB mirror shape: ``range(1, len(arr))``).

    1-based positions so ``element_at`` addresses directly; a 1-element
    array yields NULL positions and explode drops it (DuckDB's
    ``range(1, 1)`` is empty the same way) — the unguarded
    ``sequence(1, size-1)`` would DESCEND for size=1 and fabricate
    pairs."""
    js = F.when(F.size(arr_col) >= 2,
                F.sequence(F.lit(1), F.size(arr_col) - 1))
    return (
        df.select(*carry, F.explode(js).alias("__j"),
                  F.col(arr_col).alias("__a"))
        .select(
            *carry,
            F.element_at("__a", F.col("__j")).alias(left_name),
            F.element_at("__a", F.col("__j") + F.lit(1)).alias(right_name),
        )
    )


def _adjacent_pairs(symbols: DataFrame) -> DataFrame:
    """Adjacent symbol pairs per word string, frequency-weighted."""
    arr = symbols.select(F.split(F.col("s"), " ").alias("a"), "cnt")
    return adjacent_elements(arr, "a", "lsym", "rsym", ["cnt"])


def apply_merge(symbols: DataFrame, lsym: str, rsym: str) -> DataFrame:
    """Apply one merge rule to every word string — pure codegen string
    algebra (three ``replace`` calls and a ``trim``), no UDF, no
    shuffle.  See the module docstring for why delimiter doubling makes
    plain ``replace`` exactly BPE-greedy."""
    pad = F.concat(
        F.lit(" "),
        F.replace(F.col("s"), F.lit(" "), F.lit("  ")),
        F.lit(" "),
    )
    merged = F.replace(
        pad, F.lit(f" {lsym}  {rsym} "), F.lit(f" {lsym}{rsym} ")
    )
    return symbols.select(
        "word",
        F.trim(F.replace(merged, F.lit("  "), F.lit(" "))).alias("s"),
        "cnt",
    )


def bpe_fit(
    words: DataFrame, n_merges: int, checkpoint_every: int = 32
) -> tuple[DataFrame, list[tuple[int, str, str, str, int]]]:
    """Train ``n_merges`` BPE merge rules over a (word, cnt) frequency
    table.  Returns (final symbol table — (word, s, cnt), the
    word→tokenization map — and the merge rules), each rule being
    (step, lsym, rsym, merged, pair_count).

    The word table materializes once; each iteration's pair count
    re-evaluates the (cheap, codegen) replace chain on top of it rather
    than materializing N intermediate tables — at vocabulary scale the
    string rewrites are noise next to the aggregate exchange.  That
    chain can't grow unboundedly though: iteration i re-runs i replace
    projections, so a real 32k-merge tokenizer would pay O(n²) string
    rewrites plus ever-deeper plan analysis.  ``checkpoint_every``
    (round-9 verdict item) bounds the depth — every k merges the
    symbol table re-materializes (localCheckpoint) and the chain
    restarts from the snapshot, making per-iteration cost flat in the
    accumulated merge count (measured flat 8→256 merges in
    tools/stress_bpe.py --merge-ladder; values are unchanged because
    checkpointing is evaluation, not semantics).

    Raises ``ValueError`` when the vocabulary runs out of adjacent
    pairs before ``n_merges`` (every word fully merged) — the oracle
    unrolls a fixed iteration count and MUST NOT silently diverge from
    a short loop."""
    from ..spec import materialize

    merges: list[tuple[int, str, str, str, int]] = []
    # materialize (localCheckpoint) the BASE symbol table: computed
    # once, each iteration re-evaluates its (cheap, codegen) replace
    # chain on top of it — N shallow Projects in one WholeStageCodegen
    # span.  localCheckpoint over persist: the blocks are freed by the
    # ContextCleaner when the frame is garbage collected (e.g. on memo
    # eviction), where an unpaired persist would leak cache entries
    # for the life of the session.
    cur = materialize(word_symbol_table(words))
    for step in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(cur)
            .groupBy("lsym", "rsym")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "lsym", "rsym")
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"vocabulary exhausted after {step - 1} merges; "
                f"{n_merges} requested — reduce n_merges"
            )
        lsym, rsym, c = best[0]["lsym"], best[0]["rsym"], int(best[0]["c"])
        merges.append((step, lsym, rsym, lsym + rsym, c))
        cur = apply_merge(cur, lsym, rsym)
        if checkpoint_every and step % checkpoint_every == 0 \
                and step < n_merges:
            cur = materialize(cur)
    return cur, merges
