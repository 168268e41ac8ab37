"""Skewed-corpus bench: salted vs unsalted join and heavy-collect under a
hot-domain zipf distribution (round-3 follow-up — the salting helpers existed
but were never measured under real skew).

Corpus: N fact rows; HOT_FRACTION of them share ONE domain key, the rest are
uniform over N_DOMAINS. Two operations measured, both with AQE on (the
engine's production config — the question is what salting buys ON TOP of AQE):

- join: fact ⋈ fact-sized dim on domain with broadcast disabled (the
  sort-merge regime where skew actually bites; a broadcastable dim never
  skews — spark.sql.autoBroadcastJoinThreshold=-1 forces the honest case);
- collect: groupBy(domain).collect_list — per-key state AQE cannot split
  (skew-join splitting only applies to joins; a hot groupBy key is ONE task).

Usage: python bench/skew_bench.py [n_rows] [cpus]
Writes BENCH/skew_result.json; BENCH/BASELINE.md is curated by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_FRACTION = float(os.environ.get("KGX_HOT_FRACTION", "0.3"))
N_DOMAINS = 50_000


def _corpus(spark, n_rows: int):
    from pyspark.sql import functions as F

    # deterministic zipf-ish: first 30% of ids -> the hot domain
    df = spark.range(n_rows).select(
        F.col("id"),
        F.when(F.col("id") < int(n_rows * HOT_FRACTION), F.lit("hot.example.com"))
        .otherwise(
            F.concat(
                F.lit("d"),
                F.pmod(F.xxhash64("id"), F.lit(N_DOMAINS)).cast("string"),
                F.lit(".example.com"),
            )
        )
        .alias("domain"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    return df.localCheckpoint()


def main() -> None:
    from pyspark.sql import functions as F

    from kgx.ops.skew import salted_collect, salted_join
    from kgx.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        app_name="kgx-skew-bench",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    fact = _corpus(spark, n_rows)
    # dim: one row per distinct domain, too many columns to be broadcast-cheap
    dim = (
        fact.select("domain").distinct()
        .withColumn("meta", F.sha2(F.col("domain"), 256))
        .localCheckpoint()
    )

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        n = fn()
        timings[name] = round(time.perf_counter() - t0, 2)
        return n

    n1 = timed("join_unsalted", lambda: fact.join(dim, "domain").count())
    n2 = timed(
        "join_salted", lambda: salted_join(fact, dim, "domain", salt=cpus * 2).count()
    )
    assert n1 == n2, (n1, n2)
    # what AQE's runtime skew-split is buying: same unsalted join with it off
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    n3 = timed("join_unsalted_no_aqe_skew", lambda: fact.join(dim, "domain").count())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert n1 == n3, (n1, n3)

    c1 = timed(
        "collect_unsalted",
        lambda: fact.groupBy("domain")
        .agg(F.size(F.sort_array(F.collect_list("payload"))).alias("n"))
        .agg(F.sum("n"))
        .first()[0],
    )
    c2 = timed(
        "collect_salted",
        lambda: salted_collect(fact, "domain", "payload", salt=cpus * 2)
        .select(F.size("values").alias("n"))
        .agg(F.sum("n"))
        .first()[0],
    )
    assert c1 == c2, (c1, c2)

    result = {
        "n_rows": n_rows,
        "cpus": cpus,
        "hot_fraction": HOT_FRACTION,
        "timings": timings,
        "join_speedup": round(timings["join_unsalted"] / timings["join_salted"], 2),
        "collect_speedup": round(
            timings["collect_unsalted"] / timings["collect_salted"], 2
        ),
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/skew_result.json", "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
