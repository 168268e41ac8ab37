"""Epoch-loop endurance: does per-epoch cost stay flat as the store grows?

Round-4 review flagged the streaming epoch loop's per-batch probes as
O(store): every micro-batch re-read all content sidecars and entity dirs,
and re-ran the full entity canonicalization. Round 5 made the probes
cached-and-incremental and skips canonicalization for batches that
introduce no new surfaces. This harness is the runtime witness: it drives
N consecutive epochs of equal-sized batches through the factored epoch
function (the exact code foreachBatch runs, minus Spark's stream plumbing)
against ONE growing store, times each epoch, and reports the first-K vs
last-K average — a ratio near 1.0 means the loop does not slow down as the
store accumulates units.

Usage: python bench/endurance_bench.py [n_epochs] [pages_per_epoch] [cpus]
Writes BENCH/endurance_result.json; BENCH/BASELINE.md is curated by hand.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pandas as pd

    from kgx import fixtures, streaming
    from kgx.checkpoint import TripleStore
    from kgx.session import get_spark

    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
                      app_name="kgx-endurance-bench")
    # warm the worker pool once (same protocol as bench.py)
    def _ident(bs):
        for b in bs:
            yield pd.DataFrame({"x": b["x"]})

    spark.range(2 * cpus).selectExpr("CAST(id AS STRING) x").repartition(
        2 * cpus).mapInPandas(_ident, "x string").count()

    pages = fixtures.gen_pages(n_epochs * per)
    work = "/tmp/kgx_endurance_store"
    shutil.rmtree(work, ignore_errors=True)
    store = TripleStore(work, n_buckets=8)
    store.claim_mode("streaming")
    caches = streaming._EpochCaches()

    walls: list[float] = []
    for ep in range(n_epochs):
        batch = spark.createDataFrame(
            pd.DataFrame(pages[ep * per:(ep + 1) * per]))
        t0 = time.perf_counter()
        unit = streaming._process_epoch(
            spark, store, batch, ep, True, stream_id="endurance",
            caches=caches)
        walls.append(round(time.perf_counter() - t0, 3))
        assert unit is not None, f"epoch {ep} committed nothing"
    caches.release()

    k = max(3, n_epochs // 6)
    first_k = sum(walls[:k]) / k
    last_k = sum(walls[-k:]) / k
    ent_dirs = len([d for d in os.listdir(os.path.join(work, "entities"))
                    if not d.startswith("_")])
    result = {
        "n_epochs": n_epochs,
        "pages_per_epoch": per,
        "cpus": cpus,
        "per_epoch_sec": walls,
        "first_k_avg": round(first_k, 3),
        "last_k_avg": round(last_k, 3),
        "last_over_first": round(last_k / first_k, 3),
        "entity_dirs_final": ent_dirs,
        "units_final": len(store.manifests()),
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/endurance_result.json", "w") as f:
        json.dump(result, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
