"""Incremental ingest via Structured Streaming (Trigger.AvailableNow).

The reference has NO streaming operators (SURVEY.md §2.10) — its incremental
semantics are append + resume (processed-set exclusion, content-hash cache).
Batch anti-join resume (kgx.pipeline.run_checkpointed) reproduces that; this
module additionally exposes the same pipeline as a file-stream for continuous
ingest: new page files landing in a directory are picked up exactly once
(stream checkpoint), each micro-batch runs the full extract -> canonicalize ->
validate chain and snapshot-commits through the TripleStore, with the persisted
entity dictionary keeping canonical representatives sticky across batches.

foreachBatch is the exactly-once seam: the store commit is atomic, and the
stream checkpoint directory records consumed files.

NB: streaming commits use buckets=[] — dedup bookkeeping lives in the stream
checkpoint, not the bucket manifest. Use a store either in streaming mode or
in batch run_checkpointed mode; mixing both over the same input would
double-process (the batch resume filter can't see stream-consumed files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx import canon, extract, pipeline
from kgx.schema import PAGES


def ingest_available_now(spark: SparkSession, pages_dir: str, store) -> list[str]:
    """Consume all currently-available page files into the store; returns unit ids."""
    committed: list[str] = []

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        facts = pipeline.extract_stage(spark, batch_df)
        mentions = facts.filter(F.col("pred") == "project_proponents").select(
            F.explode("surfaces").alias("surface")
        )
        known = store.known_entities(spark)
        mapping = canon.canonical_mapping(mentions, known=known).localCheckpoint()
        store.save_entities(mapping)
        final = pipeline.canonicalize_proponents(facts, mapping)
        flagged, metrics = extract.validate_triples(pipeline._to_triples(final))
        unit = store.commit(flagged.drop("valid"), buckets=[], metrics=metrics)
        committed.append(unit)

    q = (
        spark.readStream.schema(PAGES)
        .parquet(pages_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{store.root}/stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return committed


def pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    return spark.readStream.schema(PAGES).parquet(pages_dir)


def windowed_page_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling-window page counts per lang with a watermark —
    the standard late-data-tolerant streaming aggregation (no analog in the
    reference, which is batch-only; this is the engine's ingestion-monitoring
    surface). In append mode a window emits once the watermark passes its end;
    tests run outputMode('complete') for determinism and assert equality with
    the batch groupBy(window(...)) of the same data."""
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "lang",
            "n_pages",
        )
    )


def first_seen_by_content(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): emit each
    distinct page content exactly once across ALL micro-batches, keyed by
    sha2(html) — the streaming form of the reference's content-hash cache
    (initial_pipeline/app.py:70-81). State per key = times seen; only the
    first arrival emits. Built-in dropDuplicates needs a watermark to bound
    state by time; this keeps the content-addressed forever-dedup semantics
    the cache had, while demonstrating the custom-state seam
    (SURVEY.md §2.10)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        prev = state.get[0] if state.exists else 0
        n = 0
        first_url = None
        for pdf in pdfs:
            if len(pdf):
                # min(url), not iloc[0]: row order within a micro-batch depends
                # on partitioning, and the emitted row must be deterministic
                m = pdf["url"].min()
                first_url = m if first_url is None else min(first_url, m)
            n += len(pdf)
        state.update((prev + n,))
        if prev == 0 and n > 0:
            yield pd.DataFrame(
                {"content_sha": [key[0]], "first_url": [first_url],
                 "n_seen": [n]}
            )
        else:
            yield pd.DataFrame(
                {"content_sha": pd.Series(dtype="object"),
                 "first_url": pd.Series(dtype="object"),
                 "n_seen": pd.Series(dtype="int64")}
            )

    keyed = stream.withColumn("content_sha", F.sha2(F.col("html"), 256))
    return keyed.groupBy("content_sha").applyInPandasWithState(
        fn,
        outputStructType="content_sha string, first_url string, n_seen long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
