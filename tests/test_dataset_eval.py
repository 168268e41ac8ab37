"""Dataset-transform chain + evaluation chain (reference §3 ground-truth path)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgx import dataset, evaluation, fixtures, pipeline


@pytest.fixture(scope="module")
def triples_df(spark):
    pages = spark.createDataFrame(pd.DataFrame(fixtures.gen_pages(120)))
    return pipeline.build_triples(spark, pages).cache()


def test_chat_rows_shape(spark, triples_df):
    chat = dataset.chat_rows(triples_df, dataset.question_dim(spark))
    row = chat.first()
    assert [m["role"] for m in row.messages] == ["system", "user", "assistant"]
    assert chat.count() == triples_df.count()


def test_stratified_quota_and_split_deterministic(spark, triples_df):
    chat = dataset.chat_rows(triples_df, dataset.question_dim(spark))
    quota = dataset.stratified_quota(chat, per_pred=10)
    per = {r.pred: r.n for r in quota.groupBy("pred").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 10 for n in per.values()) and len(per) == 6

    t1, v1, s1 = dataset.split_dataset(quota)
    t2, v2, s2 = dataset.split_dataset(quota)
    assert t1.count() == t2.count() and v1.count() == v2.count()
    assert t1.count() + v1.count() + s1.count() == quota.count()


def test_jsonl_roundtrip(spark, triples_df, tmp_path):
    counts = dataset.build_datasets(
        spark, triples_df, str(tmp_path / "ds"), per_pred=8
    )
    assert sum(counts.values()) > 0
    back = dataset.read_jsonl(spark, str(tmp_path / "ds" / "train.jsonl"))
    row = back.first()
    assert [m["role"] for m in row.messages] == ["system", "user", "assistant"]


def test_text_metric_kernels():
    assert evaluation.bleu2("a b c", "a b c") == pytest.approx(1.0)
    assert evaluation.rouge_l("a b c", "a b c") == pytest.approx(1.0)
    assert evaluation.rouge_n("a b c", "x y z", 1) == 0.0
    assert 0.0 < evaluation.rouge_l("a b d", "a b c") < 1.0
    assert evaluation.bleu2("", "a") == 0.0


def test_score_pairs_and_aggregate(spark, triples_df):
    # perfect self-pairs -> all metrics 1.0
    pairs = triples_df.select(
        "pred", F.col("obj").alias("response"), F.col("obj").alias("answer")
    )
    agg = evaluation.aggregate_metrics(evaluation.score_pairs(pairs))
    rows = agg.collect()
    assert rows and all(r.exact_match == 1.0 and r.rougeL_f1 == 1.0 for r in rows)

    # corrupted responses -> strictly lower scores
    bad = triples_df.select(
        "pred",
        F.concat(F.lit("WRONG "), F.col("obj")).alias("response"),
        F.col("obj").alias("answer"),
    )
    agg_bad = evaluation.aggregate_metrics(evaluation.score_pairs(bad))
    assert all(r.exact_match == 0.0 and r.rougeL_f1 < 1.0 for r in agg_bad.collect())


def test_fuzzy_partial_ratio_kernel():
    assert evaluation.fuzzy_partial_ratio("ACM0002", "applies ACM0002 here") == 100.0
    assert evaluation.fuzzy_partial_ratio("ACM0002", "applies ACM0003 here") >= 70.0
    assert evaluation.fuzzy_partial_ratio("zzz", "applies ACM0002") < 40.0
    assert evaluation.fuzzy_partial_ratio("", "x") == 0.0


def test_grounding_filter(spark):
    rows = [
        ("a1", "the project applies ACM0002 in Peru", "ACM0002"),
        ("a2", "completely unrelated text about nothing", "XYZ9999"),
    ]
    df = spark.createDataFrame(rows, "id string, context string, answer string")
    kept = evaluation.grounding_filter(df).collect()
    assert [r.id for r in kept] == ["a1"]
    assert kept[0].grounding >= 80.0


def test_triple_set_pr(spark, triples_df):
    pr = evaluation.triple_set_pr(triples_df, triples_df)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0
    half = triples_df.limit(triples_df.count() // 2)
    pr2 = evaluation.triple_set_pr(half, triples_df)
    assert pr2["precision"] == 1.0 and pr2["recall"] < 1.0
