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


def test_excel_roundtrip_or_clear_error(spark, tmp_path):
    """xlsx round-trip when an engine is available; a clear ImportError when
    not (this container has no openpyxl — the wrapper must say so, not crash
    deep inside pandas)."""
    import pandas as pd
    import pytest

    pdf = pd.DataFrame({"id": [1, 2, 3], "name": ["a", "b", "c"]})
    p = str(tmp_path / "dim.xlsx")
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="openpyxl"):
            sources.read_excel(spark, p)
        return
    pdf.to_excel(p, index=False)
    back = sources.read_excel(spark, p, usecols=["id", "name"])
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b"), (3, "c")}
