"""Operator-coverage library for the driver contract (__spark_entry__.py).

Each module exposes ``QUERIES: dict[name, (fn, oracle_sql | None)]`` where
``fn(spark, sf_dir) -> DataFrame`` is the Spark-first implementation and
``oracle_sql`` is the equivalent ANSI SQL DuckDB runs on the same parquet
tables. Names/aliases match exactly on both sides (the driver hashes values
after sorting columns by name).
"""

from __future__ import annotations


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
