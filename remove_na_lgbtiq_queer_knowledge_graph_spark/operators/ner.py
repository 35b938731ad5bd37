"""NER operators (SURVEY.md §2.10 T11-T14).

The reference runs three NER styles over ``text_chronik``: rule-based
spaCy patterns (`named-entity-recognition/spacy_ner.py:32-134`),
model-based flair/HF transformers (`flair_ner.py:23-53`), and gazetteer
matching from entity lists (`spacy_ner.py:146-176`); spans land in
``chronik_entities`` (id, label, start, end, name) and surfaces are
re-extracted by offset (`chronik-after-ner.R:39-49`).

Spark-first: gazetteer/rule matching is JVM-side (broadcast terms +
locate/regexp); the *model* path is a ``mapInPandas`` batch-inference
stub — the exact shape a real HF pipeline plugs into (the model call is
the only line that changes)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gazetteer_match(
    df: DataFrame, id_col: str, text_col: str, terms: dict[str, str]
) -> DataFrame:
    """T13: broadcast gazetteer matching — for each (doc, term) with ≥1
    hit: hit count, first 1-based offset, and the term's label."""
    spark = df.sparkSession
    gaz = F.broadcast(
        spark.createDataFrame(
            [(t, lbl) for t, lbl in terms.items()], ["term", "label"]
        )
    )
    joined = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).crossJoin(gaz)
    # occurrence count via split on the quoted term; first offset via locate
    hits = (
        F.size(F.split(F.col("__text"), F.concat(F.lit("\\Q"), F.col("term"), F.lit("\\E")))) - 1
    )
    return (
        joined.withColumn("n_hits", hits.cast("long"))
        .filter(F.col("n_hits") > 0)
        .withColumn("start", F.expr("locate(term, __text)").cast("long"))
        .select("doc_id", "term", "label", "n_hits", "start")
    )


def rule_spans(df: DataFrame, id_col: str, text_col: str, pattern: str,
               label: str) -> DataFrame:
    """T11: regex rule NER — all matches of a shape pattern with label
    (the ADR/DATE_*/ORG patterns of `spacy_ner.py:32-134`)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
        ).alias("surface"),
    ).withColumn("label", F.lit(label))


def extract_span(df: DataFrame, text_col: str, start_col: str,
                 length_col: str) -> DataFrame:
    """T14: span → surface extraction by offset (1-based substring), with
    the reference's trim cleanup (`chronik-after-ner.R:39-49`)."""
    return df.withColumn(
        "surface",
        F.trim(F.expr(f"substring({text_col}, {start_col}, {length_col})")),
    )


_MODEL_TERMS = {"spark": "TOOL", "customer": "ROLE", "window": "CONCEPT"}


def model_ner_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """T12 model-based NER as Arrow-batched inference.

    STUB: a real pipeline loads a HF token-classification model once per
    executor and runs batched inference here; neither torch nor
    transformers ship in this container, so the 'model' is a
    deterministic token tagger over the same interface (doc_id, text) →
    (doc_id, entity, label).
    """
    for pdf in batches:
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            for tok in str(text).split():
                if tok in _MODEL_TERMS:
                    out.append((doc_id, tok, _MODEL_TERMS[tok]))
        yield pd.DataFrame(out, columns=["doc_id", "entity", "label"])


def model_ner(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Batched 'model' NER over mapInPandas (T12)."""
    sel = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    return sel.mapInPandas(
        model_ner_stub, schema="doc_id bigint, entity string, label string"
    )
