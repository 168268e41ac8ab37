"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: MinHash-LSH near-duplicate clustering (the engine's
signature canonicalization machinery, kgx.canon) over the sf0.001 `documents`
table, enriched with quality scores.

`queries()` / `oracle_sql()` — operator coverage per SURVEY.md §2, implemented
in kgx.ops.{relational,textops,simsearch}; oracle SQL strings live next to each
implementation and are re-exported here.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-dup doc clustering + quality scoring on sf0.001."""
    from pyspark.sql import functions as F

    from kgx.ops import textops

    clusters = textops.t07_minhash_clusters(spark, SF0001)
    quality = textops.t04_quality_score(spark, SF0001)
    return (
        clusters.join(quality, "doc_id")
        .select("doc_id", "cluster_key", "cluster_size", "quality")
        .orderBy(F.desc("cluster_size"), F.asc("doc_id"))
    )


def _all_queries() -> dict[str, tuple]:
    from kgx.ops import graph, multimodal, relational, simsearch, textops

    merged: dict[str, tuple] = {}
    for mod in (relational, textops, simsearch, multimodal, graph):
        merged.update(mod.QUERIES)
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _all_queries().items() if sql is not None
    }
