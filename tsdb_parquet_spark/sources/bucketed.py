"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle.  Writing
both sides bucketed by the join key (same bucket count) lets Spark plan a
SortMergeJoin with NO Exchange on either side — each task joins bucket i of
both tables.  Same for groupBy on the bucket key: partial aggregation
feeds straight into the final one.

Bucketing requires the session catalog (``saveAsTable``); tables land in
``spark.sql.warehouse.dir``.  The layout composes with the sorted-part
options (zstd/dictionary/blooms) from :mod:`tsdb_parquet_spark.sources.writer`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tsdb_parquet_spark.sources.writer import WriterOptions


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    opts: WriterOptions | None = None,
    path: str | None = None,
) -> str:
    """Write ``df`` as a bucketed (and per-bucket sorted) table.

    ``path`` makes it an EXTERNAL table at that location (the bucket spec
    still lives in the session catalog) — use this to keep data under a
    controlled directory instead of ``spark.sql.warehouse.dir``."""
    writer = df.write.mode("overwrite").format("parquet")
    if opts is not None:
        writer = opts.apply(writer)
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)
    return table


def register_bucketed(
    spark: SparkSession,
    table: str,
    source_df: DataFrame,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> bool:
    """Re-attach existing bucketed data as an external table WITHOUT
    rewriting it.

    Spark's bucket spec lives in the catalog, not the files — with an
    in-memory catalog the metadata dies with the session while the
    (expensive, bucket-named) data files survive on disk.  A ``CREATE
    TABLE ... CLUSTERED BY ... LOCATION`` DDL over the existing location
    restores the zero-shuffle join property in milliseconds; the file-to-
    bucket mapping is carried by the bucket id in each file name, so the
    re-registered spec MUST match the writing spec (same cols, same
    count) — a mismatch silently mis-buckets every join.

    Returns False (caller should ``write_bucketed``) when the location has
    no complete data; True once the table is queryable."""
    import os

    if path is None or not os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    if spark.catalog.tableExists(table):
        # validate the existing registration against the REQUESTED spec —
        # a stale table (different location, columns, or bucket count)
        # silently mis-buckets every join if accepted as-is
        info = {
            r["col_name"].strip(): (r["data_type"] or "").strip()
            for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        }
        got_cols = [
            c.strip(" `")
            for c in info.get("Bucket Columns", "").strip("[]").split(",")
            if c.strip(" `")
        ]
        got_loc = info.get("Location", "").replace("file:", "")
        loc_ok = os.path.realpath(got_loc) == os.path.realpath(path)
        if (
            info.get("Num Buckets") == str(num_buckets)
            and got_cols == list(bucket_cols)
            and loc_ok
        ):
            return True
        # spec drifted: drop the stale registration; the caller decides
        # whether the on-disk data needs a rewrite (write_bucketed)
        spark.sql(f"DROP TABLE {table}")
        return False
    ddl = source_df._jdf.schema().toDDL()
    cluster = ", ".join(bucket_cols)
    sort = ", ".join(sort_cols or bucket_cols)
    spark.sql(
        f"CREATE TABLE {table} ({ddl}) USING PARQUET"
        f" CLUSTERED BY ({cluster}) SORTED BY ({sort})"
        f" INTO {num_buckets} BUCKETS LOCATION '{path}'"
    )
    return True


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    merge: bool = False,
) -> DataFrame:
    """Join two co-bucketed tables on the bucket key — plans with zero
    Exchange nodes when bucket specs match (verified in tests).
    ``merge=True`` adds a sort-merge hint so the zero-shuffle SMJ is kept
    even when one side would fit a broadcast (the 100 TB plan shape,
    assertable at test scale)."""
    left = spark.table(left_table)
    if merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on=on)
