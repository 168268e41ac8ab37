"""Explicit skew handling: salted joins and salted heavy aggregations.

BASELINE.json:north_rule requires explicit salting for hot-domain skew on top
of AQE's runtime skew-join splitting (both are on: kgx.session enables
spark.sql.adaptive.skewJoin; this module is the *static* tool for cases AQE
cannot fix — e.g. a single hot key inside one task's build side, or heavy
per-key state in collect_list-style aggregations where map-side partial
aggregation doesn't shrink the payload).

- salted_join: fact ⋈ dim on a skewed key — the dim side is exploded SALT ways
  and the fact side gets a deterministic salt from a row hash, so one hot key
  spreads over SALT reducer partitions. Semantics identical to the plain join
  (asserted in tests/test_skew.py).
- salted_collect: groupBy(key).collect_list equivalent in two stages — partial
  collect per (key, salt), then merge — so a hot key's list is assembled from
  SALT partial lists instead of one giant reducer task.

The triple write (kgx.checkpoint.TripleStore.commit) applies the same idea:
repartition by (pred, pmod(xxhash64(subj), 64)) so a hot predicate doesn't
serialize into one writer task.

MEASURED GUIDANCE (bench/skew_bench.py, round 3 — 8M rows, one domain holding
30-90% of them, local[8], broadcast disabled): on this Spark version the
static salts LOST to the plain operators at every point tried —
join 6.7s unsalted vs 7.8s salted (0.3 hot), 5.2 vs 7.0 (0.9 hot);
collect 9.0s vs 47.5s (0.3), 31.0s vs 64.3s (0.9). Two structural reasons:
(1) collect_list already does map-side PARTIAL aggregation, so the reduce
side merges per-map-task lists — exactly what salting builds, minus an extra
full shuffle of the payload; and salting cannot shrink the final single-task
merge of a hot key's list anyway. (2) AQE's runtime skew-split handles the
sort-merge-join case without replicating the dim side (and at these sizes
even the UNSPLIT join beat both: 4.1s with skewJoin off). Use these helpers
when AQE is unavailable (non-adaptive engines, RDD-era pipelines) or when a
hot key's single-task JOIN build provably dominates the stage; for
aggregations, restructure to algebraic aggs instead of salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """fact ⋈ dim on `key`, hot keys spread across `salt` partitions.

    The dim side is replicated `salt` times (explode of a literal sequence);
    the fact side derives its salt from xxhash64 over its hashable columns
    (maps are excluded — Spark's hash functions reject MapType) — stable under
    task retries/recomputation, unlike monotonically_increasing_id. Pass
    ``salt_cols`` to pick the disambiguator columns explicitly. Limitation
    inherent to ANY deterministic salt: byte-identical duplicate rows share a
    salt; a hot key whose rows are all identical still lands in one task
    (dedup or add a distinguishing column first).
    """
    if salt_cols is None:
        salt_cols = [
            c for c, t in fact.dtypes if not t.startswith("map<")
        ] or [key]
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)).cast("int"),
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = fact_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_collect(
    df: DataFrame, key: str, value: str, salt: int = DEFAULT_SALT
) -> DataFrame:
    """groupBy(key).agg(sort_array(collect_list(value))) with two-stage salting.

    Stage 1 collects per (key, salt-of-value); stage 2 flattens + sorts the
    partial lists. Output column: `values` (sorted array) — deterministic and
    equal to the unsalted aggregation.
    """
    stage1 = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt)).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return (
        stage1.groupBy(key)
        .agg(F.array_sort(F.flatten(F.collect_list("_part"))).alias("values"))
    )
