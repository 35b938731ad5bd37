"""Parquet star-schema sources.

Mirrors the reference's ingestion layer (SQLite/MySQL/CSV scans —
``data-gathering/from-citavi/books.R:11-25``, lazy ``tbl()`` scans at
``entity-resolution/entities/01-within-entities.R:9-13``) as columnar
parquet scans: Catalyst pushes predicates and prunes columns into the
scan, which is what dbplyr's SQL pushdown did in the reference.

At 100 TB these would be partitioned/bucketed catalog tables; the scan
API is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..spec import t as _load

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL entry points)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """S1: JDBC scan — the seam SURVEY maps the Citavi SQLite / MySQL
    sources onto (``from-citavi/books.R:11-25``; lazy ``tbl()`` scans,
    ``01-within-entities.R:9-13``).

    Catalyst pushes filters and column pruning into the generated SQL,
    which is exactly what dbplyr's lazy translation did.  At scale the
    critical part is PARALLEL extraction: without ``partition_column``
    Spark reads the whole table through ONE connection/task; with
    bounds it issues ``num_partitions`` range-predicated queries
    concurrently.  Always pass the bounds for anything bigger than a
    dimension table.

    No JDBC driver jar ships in this container, so this seam is
    exercised by tests only when one is present (tests/test_sources.py
    gates on driver availability); the parquet fixture path
    (:func:`load_table`) is the default source either way.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if partition_column is None and (
            lower_bound is not None or upper_bound is not None
            or num_partitions is not None):
        # the inverse mistake of the check below: bounds (and, round-13
        # review, an explicit num_partitions) without the column were
        # silently DROPPED, giving the one-connection full-table read
        # this docstring warns against
        raise ValueError(
            "lower_bound/upper_bound/num_partitions have no effect "
            "without partition_column — pass it (or drop them)")
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC reads need lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def append_sink(df: DataFrame, path: str) -> None:
    """Append-log sink (reference: ``dbAppendTable``,
    ``01-within-entities.R:68-70``)."""
    df.write.mode("append").parquet(path)


def overwrite_sink(df: DataFrame, path: str) -> None:
    """Overwrite sink (reference: ``dbWriteTable``,
    ``chronik-after-ner.R:55-57``)."""
    df.write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame, table: str, path: str, key: str, n_buckets: int = 8
) -> None:
    """Bucketed parquet table: rows hash-partitioned into ``n_buckets``
    files by ``key`` AT WRITE TIME, sorted within buckets.

    Two tables bucketed the same way join with ZERO shuffle — the
    exchange that dominates large fact⋈fact joins disappears because
    co-location was paid once at ingest.  This is the 100 TB answer for
    repeatedly-joined fact tables (lineitem⋈orders every query): bucket
    both on the join key at landing time.  Verified plan-level in
    tests/test_sources.py::test_bucketed_join_has_no_shuffle.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def write_partitioned(
    df: DataFrame, path: str, part_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet sink (``path/col=value/…``).

    Partitioning fact tables by a coarse time/tenant column means a
    reader's filter on that column prunes whole directories before any
    file is opened (`PartitionFilters` in the scan plan) — at 100 TB the
    events table is written `partitionBy("day")` and a one-day query
    lists one directory.  Keep partition cardinality moderate (≤ ~10k
    dirs) and let bucketing/sorting handle the finer grain.
    Verified plan-level in tests/test_sources.py.
    """
    df.write.mode(mode).partitionBy(*part_cols).parquet(path)


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files.

    Streaming sinks and fine-grained ingests leave thousands of tiny
    files; at scale the scan cost becomes file-listing + footer reads
    instead of data.  Periodic compaction to ~128 MB files restores
    scan efficiency.  Local-FS rename semantics here; on an object
    store the same two-phase write-then-swap applies via the committer.
    Returns the new file count.

    The swap is rename-based: original → ``.<name>__old``, compacted
    tmp → path, delete the old copy.  An in-process failure rolls
    back; a HARD kill (SIGKILL, power loss) between the two renames
    can still leave the path briefly absent — the recovery preamble
    below restores the old copy on the next call, so no data is ever
    lost and the gap heals on re-entry.  Swap dirs are DOT-PREFIXED
    siblings: Spark's file index skips hidden (``.``/``_``-prefixed)
    paths, so a crash-orphaned intermediate can never be partition-
    discovered by a reader of the PARENT dataset — the round-13
    review's data-loss window, where an orphaned ``__bkt=3__old``
    parsed as partition value ``3__old``, turned ``__bkt`` into a
    string column, and silently emptied bucket 3's change history.
    (True atomic swap needs a catalog/manifest layer — Iceberg/Delta
    commit protocol — not plain directories.)

    Refuses a HIVE-PARTITIONED root: reading it would flatten the
    ``k=v`` directory layout into plain data columns (losing the
    PartitionFilters pruning ``write_partitioned`` exists to provide)
    and re-infer partition value types.  Compact the leaf partition
    directories individually — what `_scd2_apply_stream` does.
    """
    import math
    import os as _os
    import shutil

    base = path.rstrip("/")
    d, nm = _os.path.split(base)
    tmp = _os.path.join(d, f".{nm}__compacting")
    old = _os.path.join(d, f".{nm}__old")
    # recovery from a previously killed swap: restore the original if
    # the path vanished mid-rename, then clear stale intermediates
    if not _os.path.exists(base) and _os.path.exists(old):
        shutil.move(old, base)
    # legacy (pre-round-13) visible-suffix intermediates from an old
    # crash: same recovery, then clear
    for legacy_old in (base + "__old",):
        if not _os.path.exists(base) and _os.path.exists(legacy_old):
            shutil.move(legacy_old, base)
    for stale in (tmp, old, base + "__compacting", base + "__old"):
        if _os.path.exists(stale):
            shutil.rmtree(stale)
    parts = [p for p in _os.listdir(base)
             if "=" in p and _os.path.isdir(_os.path.join(base, p))]
    if parts:
        raise ValueError(
            f"compact_parquet: {base} is a hive-partitioned root "
            f"(found {sorted(parts)[:3]}...) — compacting it would "
            "flatten the partition layout; compact the leaf "
            "directories instead")
    df = spark.read.parquet(base)
    total = sum(
        f.stat().st_size
        for f in __import__("pathlib").Path(base).rglob("*.parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    shutil.move(base, old)
    try:
        shutil.move(tmp, base)
    except BaseException:
        shutil.move(old, base)  # roll back: restore the original
        raise
    shutil.rmtree(old)
    return n
