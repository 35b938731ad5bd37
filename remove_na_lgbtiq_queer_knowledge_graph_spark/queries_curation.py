"""Round-11 curation tier: domain upsampling, blocklist filtering,
survivorship merge, inter-arrival telemetry.

These extend the training-data pipeline surface beyond the reference's
own operators (SURVEY §2.10/§2.11 neighborhood): the reference curates a
knowledge graph by hand (entity dedupe in
`entities/02-other-duplicates.R`, per-source merges in
`data-modeling/`); a 100 TB corpus pipeline runs the same shapes as
declarative bulk ops — repeat-by-weight, deny-list filtering, per-field
survivorship, and arrival-cadence QA.

Every query here is a pure narrow expression or a map-side-combinable
aggregate: no cartesians, no driver loops, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.numeric import round_half_away_col
from .queries_llm2 import _WORDS_DUCK, _WORDS_SPARK
from .spec import QuerySpec, t


def mix_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain epoch upsampling — the replication half of data
    mixing (``mix_domains``/``mix_temperature_sample`` downsample with
    keep-rates < 1; sources whose configured weight EXCEEDS their share
    are repeated for multiple training epochs instead, the standard
    small-high-quality-domain move).

    Epochs come from configuration, not data: weight
    ``w_s = 1 + (source_number mod 3)`` (the same deterministic config
    rule as ``mix_domains``), and each doc of source s is emitted with
    ``epoch = 1..w_s``.  The whole op is one narrow projection +
    ``explode(sequence(...))`` — zero shuffles, zero joins; output
    volume is bounded by ``max(w) ×`` input, and at 100 TB the explode
    is pipelined inside the scan stage (each task fans out its own
    rows, nothing crosses the wire)."""
    docs = t(spark, sf_dir, "documents")
    # unbounded substr, matching the oracle's substring(source, 4) —
    # a 10-char cap would diverge the engines on 11+-digit source ids
    num = F.expr("try_cast(substr(source, 4) as long)")
    # fail-LOUD on malformed source ids, with a NAMED error: under
    # non-ANSI configs a bad suffix casts to NULL, sequence(1, NULL) is
    # NULL, and explode silently DROPS the document; under ANSI the
    # bare cast throws a generic CAST_INVALID_INPUT.  try_cast + the
    # in-plan raise (the interval_join bins-guard pattern) gives the
    # same loud, named failure in EITHER mode — matching the DuckDB
    # oracle's hard CAST error.
    checked = F.when(num.isNotNull(), num).otherwise(
        F.raise_error(F.concat(
            F.lit("mix_upsample_epochs: non-numeric source id ("),
            F.coalesce(F.col("source"), F.lit("NULL")),
            F.lit(")"))).cast("long"))
    epochs = F.lit(1).cast("long") + F.pmod(checked, F.lit(3))
    return docs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1).cast("long"), epochs)).alias("epoch"),
    )


_UPSAMPLE_SQL = """
SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM (
  SELECT doc_id, source,
         UNNEST(generate_series(
             1, 1 + CAST(substring(source, 4) AS BIGINT) % 3)) AS epoch
  FROM documents)
"""


_BLOCKLIST = ("slow", "broken", "stale")


def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deny-list document filter — the cheapest quality gate every
    corpus pipeline runs first (C4 dropped pages on a public "bad
    words" list; the list here is a 3-word stand-in, the mechanics are
    the list's size-independent path).

    Per doc: token count, blocked-token count, and
    ``keep = [n_blocked · 50 ≤ n_tokens]`` (≤ 2% blocked tokens) as
    0/1.  The blocklist is a literal array inside ONE codegen'd
    ``size(filter(...))`` expression — no join, no explode, no shuffle;
    a 10⁴-word real list would move to a broadcast join against the
    exploded tokens (same output contract), but below ~100 terms the
    in-expression scan beats the explode by avoiding the row blowup."""
    docs = t(spark, sf_dir, "documents")
    arr = "array(" + ",".join(f"'{w}'" for w in _BLOCKLIST) + ")"
    n_blocked = F.expr(
        f"size(filter({_WORDS_SPARK}, x -> array_contains({arr}, lower(x))))"
    ).cast("long")
    n_tokens = F.size(F.expr(_WORDS_SPARK)).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_blocked.alias("n_blocked"),
        (n_blocked * F.lit(50) <= n_tokens).cast("long").alias("keep"),
    )


# the list literal is interpolated from _BLOCKLIST (one copy, the
# shared-fragment rule — a hard-coded twin could drift from the Spark
# expression)
_BLOCK_DUCK = "[" + ", ".join(f"'{w}'" for w in _BLOCKLIST) + "]"
_N_BLOCKED_DUCK = (f"len(list_filter({_WORDS_DUCK}, "
                   f"x -> list_contains({_BLOCK_DUCK}, lower(x))))")
_BLOCKLIST_SQL = f"""
SELECT doc_id,
       CAST(len({_WORDS_DUCK}) AS BIGINT) AS n_tokens,
       CAST({_N_BLOCKED_DUCK} AS BIGINT) AS n_blocked,
       CAST({_N_BLOCKED_DUCK} * 50 <= len({_WORDS_DUCK}) AS BIGINT) AS keep
FROM documents
"""


def er_survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge — the MDM step AFTER duplicate detection: one
    golden record per entity, each field taken from the best source row
    by its own rule (the reference's entity-resolver merges fields in
    the Shiny UI, `apps/entity-resolver/index.Rmd:155-222`; this is the
    batch form).

    Entity key here is (nation, segment); rules: *latest* wins identity
    (max custkey = most recent record), *richest* wins the display name
    (arg-max by account balance, custkey tie-break), balance takes the
    max.  One map-side-combinable groupBy — ``max_by`` carries a
    (value, key) pair through partial aggregation, so no row leaves its
    partition un-combined.  The arg-max key packs (cents, custkey) into
    one BIGINT: exact while custkey < 10¹⁰, and that bound is ENFORCED
    by an in-plan raise (same fail-loud pattern as ``interval_join``'s
    bins guard) — a custkey past it would silently bleed into the cents
    field and let a poorer record out-rank a richer one, the exact
    silent-wrongness shape this repo converts to loud failures.  For
    full 100 TB id ranges widen the key to DECIMAL(38,0) or a struct
    ordering and drop the guard."""
    c = t(spark, sf_dir, "customer")
    pack_limit = 10_000_000_000
    # half-AWAY-from-zero cents (the repo's one rounding kernel):
    # `floor(x*100+0.5)` rounds half-toward-+inf, which on a negative
    # sub-cent balance (-10055.5 cents) would disagree with
    # round_half_away by one cent — unreachable on 2-dp TPC-H data but
    # kept to one kernel so the convention can't silently fork
    cents = (F.floor(F.abs(F.col("c_acctbal")) * 100 + F.lit(0.5))
             * F.signum(F.col("c_acctbal"))).cast("long")
    rich_key = F.when(
        F.col("c_custkey") < F.lit(pack_limit),
        cents * F.lit(pack_limit) + F.col("c_custkey"),
    ).otherwise(F.raise_error(F.concat(
        F.lit("er_survivorship_merge: c_custkey >= 1e10 overflows the "
              "packed arg-max key ("),
        F.col("c_custkey").cast("string"), F.lit(")"))).cast("long"))
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.max("c_custkey").alias("survivor_custkey"),
        F.max_by("c_name", "c_custkey").alias("latest_name"),
        F.max_by("c_name", rich_key).alias("richest_name"),
        F.max("c_acctbal").cast("double").alias("best_acctbal"),
    )


_SURVIVORSHIP_SQL = """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_records,
       max(c_custkey) AS survivor_custkey,
       arg_max(c_name, c_custkey) AS latest_name,
       arg_max(c_name, CAST(floor(abs(c_acctbal) * 100 + 0.5)
                            * sign(c_acctbal) AS BIGINT)
                       * 10000000000 + c_custkey) AS richest_name,
       CAST(max(c_acctbal) AS DOUBLE) AS best_acctbal
FROM customer GROUP BY c_nationkey, c_mktsegment
"""


def ts_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival cadence (count, mean, p50, p95, max
    gap in µs) — the arrival-rate QA behind watermark sizing: the
    ``withWatermark`` delays in the stream_* twins are justified by
    exactly this distribution.

    Gap = µs since the same USER's previous event (total order
    ``(ts, event_id)``, the established tie-break), attributed to the
    later event's type.  Gaps are integer-valued doubles, so the mean's
    partial-sum order cannot change bits (exact integer sums below
    2⁵³); p50/p95 use exact interpolated percentiles (Spark
    ``percentile`` == DuckDB ``quantile_cont``, the
    corpus_length_quantiles parity) — at 100 TB swap
    ``percentile_approx`` for the sketch-mergeable same-shape plan."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = (us - F.lag(us).over(w)).cast("double")
    return (
        e.select("event_type", gap.alias("gap"))
        .filter(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            round_half_away_col(F.avg("gap"), 6).alias("mean_gap_us"),
            round_half_away_col(F.percentile(F.col("gap"), 0.5), 6)
             .alias("p50_gap_us"),
            round_half_away_col(F.percentile(F.col("gap"), 0.95), 6)
             .alias("p95_gap_us"),
            F.max("gap").alias("max_gap_us"),
        )
    )


_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS gap
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(avg(gap), 6) AS mean_gap_us,
       round(quantile_cont(gap, 0.5), 6) AS p50_gap_us,
       round(quantile_cont(gap, 0.95), 6) AS p95_gap_us,
       max(gap) AS max_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY event_type
"""


SPECS: dict[str, QuerySpec] = {
    "mix_upsample_epochs": QuerySpec(
        mix_upsample_epochs, _UPSAMPLE_SQL,
        "config-weighted per-domain epoch replication (explode, "
        "zero-shuffle)"),
    "text_blocklist_filter": QuerySpec(
        text_blocklist_filter, _BLOCKLIST_SQL,
        "deny-list quality gate as one codegen'd filter expression"),
    "er_survivorship_merge": QuerySpec(
        er_survivorship_merge, _SURVIVORSHIP_SQL,
        "per-field golden-record survivorship (max_by == arg_max)"),
    "ts_interarrival_stats": QuerySpec(
        ts_interarrival_stats, _INTERARRIVAL_SQL,
        "inter-arrival cadence QA behind watermark sizing"),
}
