"""Streaming-ingest throughput point: foreachBatch pipeline vs one-shot batch.

Same corpus through three paths:
  batch      — build_triples(...).count() (no store, the pure pipeline cost)
  stream     — ingest_available_now through a TripleStore (extract +
               canonicalize + validate + snapshot commit + sidecar)
  stream+dedup — the same with content-hash dedup probing the sidecar index

Reports pages/s for each and asserts the streamed triples match the batch
count (the exactly-once + global-canonicalization invariant, also pinned by
tests; here it doubles as a result check on the measured run).

Usage: python bench/streaming_bench.py [n_pages] [cpus]
Writes BENCH/streaming_result.json; BENCH/BASELINE.md is curated by hand.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from kgx import pipeline, streaming
    from kgx.checkpoint import TripleStore
    from kgx.session import get_spark
    from bench.scaling import _pages_fixture

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    pages_path = _pages_fixture(n)

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
                      app_name="kgx-streaming-bench")
    # warm workers (one-time JVM/py-worker spawn is not throughput)
    import pandas as pd

    def _ident(bs):
        for b in bs:
            yield pd.DataFrame({"url": b["url"]})

    pages = spark.read.parquet(pages_path)
    pages.select("url").mapInPandas(_ident, "url string").count()

    t0 = time.perf_counter()
    n_batch = pipeline.build_triples(spark, pages).count()
    sec_batch = round(time.perf_counter() - t0, 2)
    # build_triples' facts cache has no caller-reachable handle; drop it so
    # the streaming measurements below don't run under its memory pressure
    spark.catalog.clearCache()

    work = f"/tmp/kgx_streaming_bench_{n}"
    shutil.rmtree(work, ignore_errors=True)
    inbox = os.path.join(work, "inbox")
    os.makedirs(inbox)
    shutil.copy(pages_path, os.path.join(inbox, "part-0.parquet"))

    # multi-epoch inbox: the same corpus split into EPOCHS files, consumed at
    # one file per micro-batch — this is the shape that exercises the
    # per-epoch store probes (known content, entity dictionary) whose cost
    # the in-run caches amortize; a single-file inbox has exactly one epoch
    # and cannot show the difference
    EPOCHS = 8
    import pyarrow.parquet as pq

    tbl = pq.read_table(pages_path)
    inbox_multi = os.path.join(work, "inbox_multi")
    os.makedirs(inbox_multi)
    per = -(-tbl.num_rows // EPOCHS)
    for i in range(EPOCHS):
        pq.write_table(tbl.slice(i * per, per),
                       os.path.join(inbox_multi, f"part-{i}.parquet"),
                       row_group_size=4096)

    results = {"n_pages": n, "cpus": cpus, "n_triples": n_batch,
               "batch": {"sec": sec_batch, "pages_per_sec": round(n / sec_batch, 1)}}
    runs = (
        ("stream", inbox, False, None),
        ("stream_dedup", inbox, True, None),
        (f"stream_dedup_{EPOCHS}epochs", inbox_multi, True, 1),
    )
    for name, src, dedup, mfpt in runs:
        store = TripleStore(os.path.join(work, f"store_{name}"), n_buckets=8)
        t0 = time.perf_counter()
        units = streaming.ingest_available_now(spark, src, store,
                                               dedup_content=dedup,
                                               max_files_per_trigger=mfpt)
        sec = round(time.perf_counter() - t0, 2)
        n_got = store.read(spark).count()
        results[name] = {
            "sec": sec, "pages_per_sec": round(n / sec, 1),
            "units": len(units), "triples_match_batch": n_got == n_batch,
        }

    print(json.dumps(results))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/streaming_result.json", "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    if not all(v["triples_match_batch"] for k, v in results.items()
               if isinstance(v, dict) and "triples_match_batch" in v):
        sys.exit(1)


if __name__ == "__main__":
    main()
