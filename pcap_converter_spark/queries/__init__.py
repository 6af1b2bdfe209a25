"""Declared query surface (SURVEY.md §2.6).

Every query here runs on Spark AND (where SQL-expressible) on the DuckDB
oracle over identical Parquet inputs; the driver hash-compares results.
"""

from pcap_converter_spark.queries.declared import (
    DECLARED_QUERIES,
    oracle_sql_map,
    spark_query_map,
)

__all__ = ["DECLARED_QUERIES", "spark_query_map", "oracle_sql_map"]
