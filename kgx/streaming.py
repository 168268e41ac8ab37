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
checkpoint, not the bucket manifest. A store is EITHER streaming or batch:
the first entry point stamps the store's mode and the other one raises
(TripleStore.claim_mode) — mixing both over the same input double-processes
because the batch resume filter can't see stream-consumed files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx import canon, extract, pipeline
from kgx.schema import PAGES


def ingest_available_now(
    spark: SparkSession, pages_dir: str, store, dedup_content: bool = False
) -> list[str]:
    """Consume all currently-available page files into the store; returns unit ids.

    ``dedup_content=True`` reproduces the reference's content-hash cache
    semantics (initial_pipeline/app.py:70-81) at the ingest boundary: a page
    whose sha2(html) was already committed — same document mirrored at a new
    URL, or reposted in a later wave — is skipped BEFORE the extraction
    kernel runs, and within a batch only the min-url copy of each distinct
    content survives. The committed-content check is a left anti join against
    the store's per-unit content-sha SIDECARS (written at commit time), so
    each micro-batch probe costs O(units x distinct shas) over slim one-column
    parquet — never a rescan of the triple data, which on a long-running
    ingest grew quadratic-ish (round-3 review). Every surviving page's sha is
    registered at commit via commit(content=...), INCLUDING pages that yield
    zero facts — deriving the known set from triples alone re-extracted
    zero-fact pages on every later wave.
    """
    store.claim_mode("streaming")
    committed: list[str] = []

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        unit = _process_epoch(spark, store, batch_df, int(epoch_id),
                              dedup_content)
        if unit is not None:
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


def _process_epoch(
    spark: SparkSession,
    store,
    batch_df: DataFrame,
    epoch_id: int,
    dedup_content: bool,
) -> str | None:
    """One foreachBatch epoch: dedup (optional) -> extract -> canonicalize ->
    validate -> snapshot commit. Returns the unit id, or None when nothing
    was committed (empty/fully-deduped batch, or a REPLAYED epoch).

    Replay guard: foreachBatch is at-least-once — a crash between our
    snapshot commit and the stream's commit log re-runs the epoch. The epoch
    id recorded in the manifest makes the commit idempotent (module-level so
    the guard is testable without crashing a live stream checkpoint)."""
    if epoch_id in store.committed_epochs():
        return None
    if not batch_df.take(1):
        return None
    batch_shas = None
    if dedup_content:
        from pyspark.sql import Window

        keyed = batch_df.withColumn(
            "content_sha",
            # coalesce: null html (failed fetch) hashes as empty content
            # rather than a null key that anti-joins can never match
            F.sha2(F.coalesce(F.col("html"), F.lit(b"")), 256),
        )
        # deterministic within-batch keep: ONE row per distinct content,
        # the min-url copy. row_number, not url == min(url): exact
        # duplicate (url, content) rows would all satisfy the equality
        # and every one would flow through extraction
        w = Window.partitionBy("content_sha").orderBy("url", "warc_ts")
        keyed = keyed.withColumn(
            "_rn", F.row_number().over(w)
        ).filter(F.col("_rn") == 1).drop("_rn")
        known = store.known_content(spark)
        if known is not None:
            keyed = keyed.join(known, "content_sha", "left_anti")
        # pin ONE execution of the dedup subplan (sha2 over full html +
        # window + anti-join): the emptiness probe, the extraction chain,
        # and the commit-time sidecar write below would otherwise each
        # re-run it per micro-batch
        keyed = keyed.localCheckpoint()
        batch_shas = keyed.select("content_sha")
        batch_df = keyed.drop("content_sha")
        if not batch_df.take(1):
            return None
    facts = pipeline.extract_stage(spark, batch_df)
    mentions = facts.filter(F.col("pred") == "project_proponents").select(
        F.explode("surfaces").alias("surface")
    )
    known = store.known_entities(spark)
    mapping = canon.canonical_mapping(mentions, known=known).localCheckpoint()
    store.save_entities(mapping)
    final = pipeline.canonicalize_proponents(facts, mapping)
    flagged, metrics = extract.validate_triples(pipeline._to_triples(final))
    return store.commit(
        flagged.drop("valid"), buckets=[], metrics=metrics,
        content=batch_shas, epoch=epoch_id,
    )


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


def first_seen_by_content(
    stream: DataFrame,
    ttl: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): emit each
    distinct page content once, keyed by sha2(html) — the streaming form of
    the reference's content-hash cache (initial_pipeline/app.py:70-81).

    Retention policy (state-size bound at web scale):
    - ``ttl=None`` (default): exact dedup across ALL time — the semantics the
      reference's cache had. State grows with the number of distinct contents
      ever seen; a long-running stream at web scale needs the RocksDB state
      store (`spark.sql.streaming.stateStore.providerClass`) so state spills
      to disk instead of executor heap.
    - ``ttl='30 days'`` (an interval string): exact dedup within an EVENT-TIME
      horizon. A content hash re-arriving more than ttl after its last
      sighting (by ``warc_ts``) is treated as fresh and re-emits; state is
      physically evicted (EventTimeTimeout) once the watermark passes
      last_seen + ttl, so state size is bounded by the horizon's distinct
      contents, not all time. Event-time, not processing-time, on purpose:
      the re-emit boundary is a property of the data, deterministic under
      replay/backfill — and ProcessingTimeTimeout never lets an
      AvailableNow query terminate (it schedules timeout-only batches
      forever; observed empirically, 300+ empty micro-batches).
      Late data older than ``watermark_delay`` may double-emit at the
      horizon edge — the standard watermark trade-off.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_ms = None
    if ttl is not None:
        # parse '30 days' etc. via Catalyst's own interval grammar (day-time
        # intervals only — the same class withWatermark accepts)
        sess = stream.sparkSession
        ttl_ms = int(
            sess.range(1)
            .select(
                F.expr(
                    f"unix_millis(timestamp'1970-01-01 00:00:00Z' + INTERVAL '{ttl}')"
                ).alias("ms")
            )
            .first()["ms"]
        )

    def fn(key, pdfs, state: GroupState):
        empty = pd.DataFrame(
            {"content_sha": pd.Series(dtype="object"),
             "first_url": pd.Series(dtype="object"),
             "n_seen": pd.Series(dtype="int64")}
        )
        if state.hasTimedOut:
            state.remove()
            yield empty
            return
        prev, last_ms = state.get if state.exists else (0, 0)
        n = 0
        first_url = None
        max_ev = last_ms
        for pdf in pdfs:
            if len(pdf):
                # min(url), not iloc[0]: row order within a micro-batch depends
                # on partitioning, and the emitted row must be deterministic
                m = pdf["url"].min()
                first_url = m if first_url is None else min(first_url, m)
                ev = int(pdf["warc_ts"].max().value // 1_000_000)  # ns -> ms
                max_ev = max(max_ev, ev)
            n += len(pdf)
        if (
            ttl_ms is not None
            and state.exists
            and n > 0
            and max_ev - last_ms > ttl_ms
        ):
            prev = 0  # horizon passed since last sighting: fresh content
        state.update((prev + n, max_ev))
        if ttl_ms is not None:
            # evict once the watermark passes last_seen + ttl; must stay above
            # the current watermark or Spark rejects the timestamp
            state.setTimeoutTimestamp(
                max(max_ev + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        if prev == 0 and n > 0:
            yield pd.DataFrame(
                {"content_sha": [key[0]], "first_url": [first_url],
                 "n_seen": [n]}
            )
        else:
            yield empty

    keyed = stream.withColumn("content_sha", F.sha2(F.col("html"), 256))
    if ttl is not None:
        keyed = keyed.withWatermark("warc_ts", watermark_delay)
    return keyed.groupBy("content_sha").applyInPandasWithState(
        fn,
        outputStructType="content_sha string, first_url string, n_seen long",
        stateStructType="n long, last_ms long",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl is None
            else GroupStateTimeout.EventTimeTimeout
        ),
    )
