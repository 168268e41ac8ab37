"""CSV / JSONL triple round-trips are lossless (SURVEY.md §2.1 sinks/sources)."""

from __future__ import annotations

import pandas as pd
import pytest

from kgx import fixtures, pipeline, sources


@pytest.fixture(scope="module")
def triples_df(spark):
    pages = spark.createDataFrame(pd.DataFrame(fixtures.gen_pages(40)))
    return pipeline.build_triples(spark, pages).cache()


def _key(df):
    return {tuple(r) for r in df.collect()}


def test_csv_roundtrip(spark, triples_df, tmp_path):
    p = str(tmp_path / "csv")
    sources.write_triples_csv(triples_df, p)
    back = sources.read_triples_csv(spark, p)
    assert _key(back) == _key(triples_df)


def test_jsonl_roundtrip(spark, triples_df, tmp_path):
    p = str(tmp_path / "jsonl")
    sources.write_triples_jsonl(triples_df, p)
    back = sources.read_triples_jsonl(spark, p)
    assert _key(back) == _key(triples_df)
