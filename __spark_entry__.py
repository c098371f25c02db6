"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 core, SURVEY.md §2.5
Q07) on sf0.001.  ``queries()`` / ``oracle_sql()`` expose the full declared
corpus from :mod:`tsdb_parquet_spark.corpus`; the driver hash-compares each
pair against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tsdb_parquet_spark.corpus import REGISTRY
    from tsdb_parquet_spark.session import configure_session

    configure_session(spark)
    fn, _ = REGISTRY["q07_groupby_agg"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tsdb_parquet_spark.corpus import REGISTRY
    from tsdb_parquet_spark.session import configure_session

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; entries without an oracle are
    non-SQL-expressible and get the driver's rows-only check."""
    from tsdb_parquet_spark.corpus import REGISTRY

    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
