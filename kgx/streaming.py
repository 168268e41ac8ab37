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
