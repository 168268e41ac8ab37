"""Structured-Streaming incremental ingest: exactly-once file pickup through
the snapshot store, canonical reps sticky across micro-batch generations."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgx import fixtures, streaming
from kgx.checkpoint import TripleStore


def _write_pages(rows, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pa.table(
        {
            "url": [p["url"] for p in rows],
            "warc_ts": pa.array([p["warc_ts"] for p in rows], pa.timestamp("us")),
            "html": pa.array([p["html"] for p in rows], pa.binary()),
            "text": [p["text"] for p in rows],
            "lang": [p["lang"] for p in rows],
        }
    )
    pq.write_table(t, path)


def test_available_now_ingest_and_incremental_pickup(spark, tmp_path):
    pages = fixtures.gen_pages(40)
    pages_dir = str(tmp_path / "inbox")
    _write_pages(pages[:25], f"{pages_dir}/part-0.parquet")

    store = TripleStore(str(tmp_path / "store"), n_buckets=4)
    units1 = streaming.ingest_available_now(spark, pages_dir, store)
    assert len(units1) >= 1
    n1 = store.read(spark).count()
    assert n1 > 0

    # no new files -> no new commits (exactly-once via stream checkpoint)
    units2 = streaming.ingest_available_now(spark, pages_dir, store)
    assert units2 == []
    assert store.read(spark).count() == n1

    # drop a second file -> only the delta is processed
    _write_pages(pages[25:], f"{pages_dir}/part-1.parquet")
    units3 = streaming.ingest_available_now(spark, pages_dir, store)
    assert len(units3) >= 1
    total = store.read(spark).count()
    assert total > n1

    # triples equal the one-shot batch result on the full corpus, except that
    # canonical reps are sticky to first-seen batches; verify subject coverage
    import pandas as pd

    from kgx import pipeline

    oneshot = pipeline.build_triples(spark, spark.createDataFrame(pd.DataFrame(pages)))
    assert total == oneshot.count()
    got_subj = {r.subj for r in store.read(spark).select("subj").distinct().collect()}
    want_subj = {r.subj for r in oneshot.select("subj").distinct().collect()}
    assert got_subj == want_subj
