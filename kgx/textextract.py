"""pages -> (page text rows + validated heading rows), one Arrow-batched pass.

Spark-first shape (SURVEY.md §3.2 rebuild plan): the row-local work
(html->text, heading regex + hierarchical validation — the pdfplumber-parity
kernel, tools/PDFExtraction.py:27-149) runs once per page inside an Arrow batch;
everything relational (lead-window section spans, category matching, chunk
top-k) stays in JVM DataFrame ops downstream.

Scale notes:
- the html column dominates scan width; this is the ONLY stage that reads it,
  so Parquet column pruning keeps every later stage narrow.
- full page text is emitted ONCE per page (sec_idx = -1 marker row), not once
  per heading — heading rows are narrow. Matched sections join back to the
  page-text rows by url to slice their bodies, so un-categorized headings never
  drag the text through a shuffle.
- Arrow batch size is capped in kgx.session (maxRecordsPerBatch) so multi-MB
  pages don't blow worker memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from kgx import kernel
from kgx.schema import SECTIONS_RAW

PAGE_ROW = -1  # sec_idx marker: row carries the page text, not a heading


def _kernel_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in SECTIONS_RAW.fields}

        def emit(**kw):
            for f in SECTIONS_RAW.fields:
                out[f.name].append(kw.get(f.name))

        for url, warc_ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
            # null html (failed fetch — a certainty in real WARC input)
            # degrades to an empty page, never a task-killing TypeError
            raw = bytes(html) if html is not None else b""
            text = kernel.html_to_text(raw)
            sha = hashlib.sha256(raw).hexdigest()
            emit(url=url, warc_ts=warc_ts, content_sha=sha, text=text,
                 text_len=len(text), sec_idx=PAGE_ROW)
            for i, h in enumerate(kernel.find_headings(text)):
                emit(url=url, warc_ts=warc_ts, content_sha=sha, text_len=len(text),
                     sec_idx=i, number=h["number"], title=h["title"],
                     heading=h["heading"], start_off=h["start_off"],
                     body_off=h["body_off"])
        yield pd.DataFrame(out)


def kernel_pass(pages: DataFrame) -> DataFrame:
    """One mapInPandas pass: page-text rows (sec_idx=-1) + validated heading rows.

    ``content_sha`` (sha256 of raw html) is the lineage column mirroring the
    reference's Redis content-hash cache key (initial_pipeline/app.py:309-317).

    Same partition guard as extract.extract_facts_fused (kgx.util.spread):
    an under-split source (one fat file / giant row groups) would run this
    CPU-bound pass on fewer tasks than cores; a no-op for well-split
    web-scale inputs.
    """
    from kgx.util import spread

    slim = spread(pages.select("url", "warc_ts", "html"))
    return slim.mapInPandas(_kernel_batches, schema=SECTIONS_RAW)


def page_text(kernel_df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return kernel_df.filter(F.col("sec_idx") == PAGE_ROW).select(
        "url", "warc_ts", "content_sha", "text", "text_len"
    )


def heading_rows(kernel_df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return kernel_df.filter(F.col("sec_idx") >= 0).drop("text")


def extracted_text(pages: DataFrame) -> DataFrame:
    """(url, text) recomputed from html — used by the byte-identical-per-url test."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": [kernel.html_to_text(bytes(h)) for h in pdf["html"]],
                }
            )

    return pages.select("url", "html").mapInPandas(gen, schema=schema)
