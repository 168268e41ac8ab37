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


def test_ntriples_roundtrip_projection(spark, triples_df, tmp_path):
    """N-Triples carries three terms; the (subj, pred, obj) projection must
    round-trip byte-exactly through the text sink."""
    p = str(tmp_path / "nt")
    sources.write_triples_ntriples(triples_df, p)
    back = sources.read_triples_ntriples(spark, p)
    assert _key(back) == _key(triples_df.select("subj", "pred", "obj"))


def test_ntriples_roundtrip_adversarial(spark, tmp_path):
    """Reserved characters survive: IRI percent-encoding on subj/pred
    (spaces, %, <>, quotes) and literal escapes on obj (backslash, quote,
    newline, CR, tab), plus unicode."""
    nasty = [
        ("a corp", "placed", "plain"),
        ("pct%20already", "x>y", 'say "hi" \\ bye'),
        ("tab\there", "p", "line1\nline2\r\ttab"),
        ("uni çé", "p", '{"k": "v\\"}'),
        ("", "empty-subj", ""),
        # round-7 ADVICE class: literal backslash immediately before n/t/r —
        # the chained decode turned '\\' + 'n' into a newline
        ("bs", "p", "C:\\temp\\new\\rows\\this"),
        ("bs2", "p", '{"a": "x\\n"}'),
        ("bs3", "p", "end with backslash \\"),
        ("bs4", "p", "double \\\\n run"),
    ]
    df = spark.createDataFrame(nasty, "subj string, pred string, obj string")
    p = str(tmp_path / "nt_adv")
    sources.write_triples_ntriples(df, p)
    back = sources.read_triples_ntriples(spark, p)
    assert _key(back) == _key(df)
    # every emitted line is a single well-formed N-Triples statement: no raw
    # newlines survive into the serialization (one row -> one line)
    lines = spark.read.text(p)
    assert lines.count() == len(nasty)


def test_ntriples_read_drops_malformed_lines(spark, tmp_path):
    """Round-7 ADVICE fix: lines that don't match the sink grammar are
    dropped, not emitted as ('','','') garbage triples."""
    p = str(tmp_path / "nt_mixed")
    lines = [
        ('<urn:kgx:s> <urn:kgx:pred:p> "ok" .',),
        ("# a comment line",),
        ("<http://foreign/iri> <http://foreign/p> <http://foreign/o> .",),
        ("",),
    ]
    spark.createDataFrame(lines, "value string").coalesce(1).write.mode(
        "overwrite"
    ).text(p)
    back = sources.read_triples_ntriples(spark, p).collect()
    assert [(r.subj, r.pred, r.obj) for r in back] == [("s", "p", "ok")]
