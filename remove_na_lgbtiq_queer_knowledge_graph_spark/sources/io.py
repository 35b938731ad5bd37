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

    The swap is rename-based so the table path stays continuously
    resolvable: original → ``__old``, compacted tmp → path, delete
    ``__old``.  A crash mid-swap leaves either the original or the
    compacted copy at the path — never a window where the path is gone
    (the delete-then-move ordering had exactly that gap).
    """
    import math
    import shutil

    df = spark.read.parquet(path)
    total = sum(
        f.stat().st_size
        for f in __import__("pathlib").Path(path).rglob("*.parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    base = path.rstrip("/")
    tmp, old = base + "__compacting", base + "__old"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    shutil.move(base, old)
    try:
        shutil.move(tmp, base)
    except BaseException:
        shutil.move(old, base)  # roll back: restore the original
        raise
    shutil.rmtree(old)
    return n
