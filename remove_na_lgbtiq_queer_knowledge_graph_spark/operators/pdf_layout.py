"""PDF layout ingestion (SURVEY.md §2.1 S4).

The reference extracts a book's text from per-word PDF layout data and
classifies every word by (font_size, font_name, text shape) into
semantic formats, collapses words back into per-(page, format) text
runs, de-hyphenates, derives a location per run, and fills it down
(``data-gathering/from-pdf/themengeschichtspfad.R:13-68``).

The PDF *decode* step (pdftools ``pdf_data(font_info=TRUE)``) is an
ingestion boundary: here the engine takes the decoded per-word layout
DataFrame ``(page, pos, word, font_name, font_size)`` as the source —
the same shape pdftools emits — and implements everything downstream as
declarative DataFrame ops.  The word table partitions by page at any
scale; only the final fill-down over the collapsed (page, format) runs
is a global window, on #pages × #formats rows — metadata-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FormatRule:
    """One branch of the reference's ``case_when`` classifier
    (`themengeschichtspfad.R:36-49`): first matching rule wins."""

    fmt: str
    text_regex: str | None = None
    font_size: float | None = None
    font_name: str | None = None
    #: compare round(font_size, 2) instead of the raw value — the
    #: reference's ninth branch (`themengeschichtspfad.R:46`) guards
    #: against pdftools' fractional sizes (7.1600001 vs 7.16)
    round_size: bool = False

    def cond(self) -> Column:
        c = F.lit(True)
        if self.text_regex is not None:
            c = c & F.col("word").rlike(self.text_regex)
        if self.font_size is not None:
            size = (F.round(F.col("font_size"), 2) if self.round_size
                    else F.col("font_size"))
            c = c & (size == self.font_size)
        if self.font_name is not None:
            c = c & (F.col("font_name") == self.font_name)
        return c


#: the reference's classifier for the Themengeschichtspfad book
TGP_RULES: tuple[FormatRule, ...] = (
    FormatRule("page", text_regex=r"^[0-9]{1,3}$"),
    FormatRule("heading", font_size=12.0),
    FormatRule("location_header", font_size=8.8, font_name="AAAAAB+Univers-Bold"),
    FormatRule("p", font_size=8.8, font_name="AAAAAD+Univers-Light"),
    FormatRule("chapter_intro", font_size=8.8, font_name="AAAAAC+Univers"),
    FormatRule("location_roof_line", font_size=7.0, font_name="AAAAAB+Univers-Bold"),
    FormatRule("image_caption", font_size=7.0, font_name="AAAAAC+Univers"),
    FormatRule("source", font_size=7.0, font_name="AAAAAD+Univers-Light"),
    # the reference's NINTH branch (round(font_size,2) == 7.16,
    # `themengeschichtspfad.R:46`) — omitted until round-13 review:
    # 7.16pt Univers words classified 'none' and collapsed into a
    # spurious (page, none) run instead of caption directions
    FormatRule("image_caption_direction", font_size=7.16,
               font_name="AAAAAC+Univers", round_size=True),
)


def classify_layout(
    words: DataFrame, rules: tuple[FormatRule, ...] = TGP_RULES,
    default: str = "none",
) -> DataFrame:
    """S4 step 1: word-level format classification — the ``case_when``
    cascade as one chained ``when()`` expression (JVM codegen, no UDF)."""
    if not rules:
        # expr stays None below and .otherwise would AttributeError —
        # an all-default classification is almost certainly a caller
        # bug, so refuse loudly (round-13 review)
        raise ValueError("classify_layout: rules must be non-empty")
    expr = None
    for r in rules:
        expr = (F.when(r.cond(), F.lit(r.fmt)) if expr is None
                else expr.when(r.cond(), F.lit(r.fmt)))
    return words.withColumn("format", expr.otherwise(F.lit(default)))


def collapse_layout_text(classified: DataFrame) -> DataFrame:
    """S4 step 2: per-(page, format) ordered text collapse + hyphenation
    cleanup (`themengeschichtspfad.R:55-58`).  Word order inside a run
    is restored by sorting the collected (pos, word) structs — collect
    order is partition-dependent, the sort makes it deterministic."""
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "word"))),
            lambda s: s["word"],
        ),
        " ",
    )
    return (
        classified.groupBy("page", "format")
        .agg(joined.alias("text"))
        .withColumn("text", F.regexp_replace("text", r"\s-\s|-\s", ""))
    )


def assign_locations(
    runs: DataFrame, default_location: str = "München"
) -> DataFrame:
    """S4 step 3: location per run — header text, heading prefix before
    ':', else the default city — then fill-down over (page, format)
    order for headings without a colon (`themengeschichtspfad.R:59-68`,
    composing the W7 fill-down idiom).  The window is global but runs
    over #pages × #formats rows only."""
    loc = (
        F.when(F.col("format") == "location_header", F.col("text"))
        .when(
            F.col("format") == "heading",
            F.nullif(F.regexp_extract("text", "(.+):", 1), F.lit("")),
        )
        .otherwise(F.lit(default_location))
    )
    w = Window.orderBy("page", "format").rowsBetween(
        Window.unboundedPreceding, 0)
    return (
        runs.withColumn("location", loc)
        .withColumn("location", F.last("location", ignorenulls=True).over(w))
    )


def pdf_layout_pipeline(
    words: DataFrame,
    rules: tuple[FormatRule, ...] = TGP_RULES,
    content_pages: tuple[int, int] = (14, 149),
    default_location: str = "München",
) -> DataFrame:
    """The full S4 pipeline: content-page filter → classify → collapse →
    drop page-number runs → locations (`themengeschichtspfad.R:13-68`)."""
    lo, hi = content_pages
    content = words.filter((F.col("page") >= lo) & (F.col("page") < hi))
    runs = collapse_layout_text(classify_layout(content, rules))
    return assign_locations(
        runs.filter(F.col("format") != "page"), default_location
    ).select("page", "format", "text", "location")
