"""Salted join / salted collect equal their unsalted counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgx.ops import skew

SF = "/root/testdata/sf0.001"


def _skewed(spark):
    # 90% of rows share one hot key — the shape salting exists for
    rows = [(i, "hot" if i % 10 else f"cold{i}") for i in range(2000)]
    return spark.createDataFrame(rows, "id long, domain string")


def test_salted_join_equals_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT!"), ("cold10", "c10"), ("cold20", "c20")],
        "domain string, label string",
    )
    plain = {(r.id, r.label) for r in fact.join(dim, "domain").collect()}
    salted = {(r.id, r.label) for r in skew.salted_join(fact, dim, "domain").collect()}
    assert salted == plain and plain


def test_salted_join_left_outer(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame([("hot", "H")], "domain string, label string")
    plain = {(r.id, r.label) for r in fact.join(dim, "domain", "left").collect()}
    salted = {
        (r.id, r.label)
        for r in skew.salted_join(fact, dim, "domain", how="left").collect()
    }
    assert salted == plain


def test_salted_collect_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        r.domain: sorted(r.vals)
        for r in df.groupBy("domain").agg(F.collect_list("id").alias("vals")).collect()
    }
    salted = {
        r.domain: list(r.values)
        for r in skew.salted_collect(df, "domain", "id").collect()
    }
    assert salted == plain


def test_salted_join_tolerates_map_columns(spark):
    """Spark's hash functions reject MapType; the salt derivation must skip
    map columns instead of throwing AnalysisException."""
    fact = spark.createDataFrame(
        [(i, "hot", {"k": str(i)}) for i in range(200)],
        "id long, domain string, props map<string,string>",
    )
    dim = spark.createDataFrame([("hot", "H")], "domain string, label string")
    out = skew.salted_join(fact, dim, "domain")
    assert out.count() == 200
    # salts actually spread the hot key (ids differ -> hashes differ)
    n_salts = (
        fact.withColumn(
            "_salt",
            F.pmod(F.xxhash64("id", "domain"), F.lit(skew.DEFAULT_SALT)),
        ).select("_salt").distinct().count()
    )
    assert n_salts > 1
