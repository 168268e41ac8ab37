"""Heading rows -> categorized section spans -> retrieved contexts.

All-relational stage between the two pandas kernels:
- section end offsets via a lead() window (the reference's
  `end_page = start.shift(-1)`, tools/PDFExtraction.py:71 /
  context_extractor.py:68);
- category matching = broadcast theta join of headings against the tiny
  heading-variant dimension (contains-match, context_extractor.py:78-81) —
  BroadcastNestedLoopJoin over ~25 variant rows, never a shuffle;
- body slicing by joining matched sections back to the page-text rows;
- retrieval = chunk-explode -> deterministic hash-embedding score (Arrow-batched
  pandas UDF over the shared kernel) -> top-ceil(n/2) window -> re-join chunks
  in document order (context_extractor.py:84-149).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgx import kernel
from kgx.config import HEADING_VARIANTS

_STRIP_RE = r"^\s+|\s+$"  # Spark-side equivalent of str.strip()


def variant_dim(spark: SparkSession) -> DataFrame:
    """(category, variant, priority) broadcast dimension from config."""
    rows = []
    for prio, (cat, variants) in enumerate(HEADING_VARIANTS.items()):
        for v in variants:
            rows.append((cat, v, prio))
    return spark.createDataFrame(rows, "category string, variant string, priority int")


def section_spans(heading_rows: DataFrame) -> DataFrame:
    """end_off = lead(start_off) over (url ordered by start_off), default text_len."""
    w = Window.partitionBy("url").orderBy("start_off")
    return heading_rows.withColumn(
        "end_off", F.coalesce(F.lead("start_off").over(w), F.col("text_len"))
    ).withColumn("body_off", F.least("body_off", "end_off"))


def categorize(sections: DataFrame, variants: DataFrame) -> DataFrame:
    """Broadcast contains-join; first matching category wins (dict order), like
    kernel.categorize_heading."""
    joined = sections.join(
        F.broadcast(variants),
        F.col("title").isNotNull()
        & F.lower(F.col("title")).contains(F.col("variant")),
        "inner",
    )
    w = Window.partitionBy("url", "sec_idx").orderBy("priority")
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "variant", "priority")
    )


def section_bodies(categorized: DataFrame, page_text: DataFrame) -> DataFrame:
    """Slice each categorized section's body out of the page text."""
    pt = page_text.select("url", "text")
    body = F.substring(
        F.col("text"), F.col("body_off") + 1, F.col("end_off") - F.col("body_off")
    )
    return (
        categorized.join(pt, "url")
        .withColumn("body", F.regexp_replace(body, _STRIP_RE, ""))
        .select("url", "warc_ts", "content_sha", "category", "body")
    )


_CHUNK_SCHEMA = T.ArrayType(T.StringType())


@F.pandas_udf(_CHUNK_SCHEMA)
def _chunks_udf(body: pd.Series) -> pd.Series:
    return body.map(lambda b: kernel.chunk_text(b) if b else [])


@F.pandas_udf(T.DoubleType())
def _score_udf(chunk: pd.Series, category: pd.Series) -> pd.Series:
    return pd.Series(
        [kernel.chunk_score(c, cat) for c, cat in zip(chunk, category)],
        dtype="float64",
    )


def contexts(bodies: DataFrame) -> DataFrame:
    """Chunk -> score -> keep top ceil(n/2) in document order -> join with \\n.

    Single-chunk sections skip scoring entirely (the common case: no pandas UDF
    on that path beyond chunking). Matches kernel.select_context bit-for-bit.
    """
    from pyspark import StorageLevel

    chunked = bodies.select(
        "url", "warc_ts", "content_sha", "category",
        F.posexplode(_chunks_udf("body")).alias("chunk_id", "chunk"),
    )
    grp = Window.partitionBy("url", "category")
    # persisted: the single-chunk and multi-chunk branches both consume it
    chunked = chunked.withColumn("n_chunks", F.count("*").over(grp)).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    single = chunked.filter(F.col("n_chunks") <= 1).select(
        "url", "warc_ts", "content_sha", "category",
        F.regexp_replace("chunk", _STRIP_RE, "").alias("context"),
    )

    multi = chunked.filter(F.col("n_chunks") > 1).withColumn(
        "score", _score_udf("chunk", "category")
    )
    w = grp.orderBy(F.desc("score"), F.asc("chunk_id"))
    kept = multi.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= F.ceil(F.col("n_chunks") / 2)
    )
    rejoined = (
        kept.groupBy("url", "warc_ts", "content_sha", "category")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_id", "chunk"))
            ).alias("_chunks")
        )
        .select(
            "url", "warc_ts", "content_sha", "category",
            F.array_join(
                F.transform(
                    "_chunks",
                    lambda c: F.regexp_replace(c["chunk"], _STRIP_RE, ""),
                ),
                "\n",
            ).alias("context"),
        )
    )
    return single.unionByName(rejoined)


def build_contexts(spark: SparkSession, kernel_df: DataFrame) -> DataFrame:
    """heading+page rows (textextract.kernel_pass output) -> contexts DF."""
    from kgx import textextract

    hs = textextract.heading_rows(kernel_df)
    pt = textextract.page_text(kernel_df)
    spans = section_spans(hs)
    cat = categorize(spans, variant_dim(spark))
    return contexts(section_bodies(cat, pt))
