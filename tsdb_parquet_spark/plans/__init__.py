from tsdb_parquet_spark.plans.promql import PromQLEngine, parse_promql

__all__ = ["PromQLEngine", "parse_promql"]
