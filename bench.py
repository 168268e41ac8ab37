"""Benchmark harness — one JSON line on stdout (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], plus the end-to-end KG pipeline over a
deterministic synthetic pages corpus (the engine's real workload), and prints:

  {"metric": "kg_triples_per_sec", "value": N, "unit": "sec"-per-query map, ...}

Noise resistance (round 6): every headline query (and the KG pipeline) is run
in KGX_BENCH_PASSES interleaved passes inside the same JVM and the reported
per-query number is the per-query MIN across passes — a contended-box sample
inflates at most one pass, and the interleaving means contamination shows up
as a large per-query spread in the emitted "samples" map rather than as a
silently regressed headline. The r4→r5 +34% snapshot regression was exactly
this failure mode (uniform inflation of untouched pure-JVM queries); the
min-of-interleaved protocol makes the attribution live in the driver's own
number instead of in prose.

Set KGX_BENCH_PAGES to size the pages corpus (default 4000) and
KGX_BENCH_PASSES for the pass count (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q07_composite_join",
    "q13_map_collect",
    "q16_topk_per_group",
    "q25_sessionize",
    "t01_dedup_exact",
    "t03_lang_id",
    "t07_minhash_clusters",
    "s01_cosine_topk",
    "s03_ann_lsh",
]


def _ensure_pages_fixture(n: int) -> str:
    """Deterministic pages parquet, cached under /tmp keyed by (n, version)."""
    from kgx.fixtures import FIXTURE_VERSION

    path = f"/tmp/kgx_bench_pages_{n}_v{FIXTURE_VERSION}"
    marker = os.path.join(path, "_SUCCESS_KGX")
    if not os.path.exists(marker):
        from kgx.fixtures import write_fixture

        os.makedirs(path, exist_ok=True)
        write_fixture(path, n=n)
        open(marker, "w").close()
    return os.path.join(path, "pages.parquet")


def run_bench(sf_dir: str, cpus: int, n_pages: int, passes: int = 2) -> dict:
    from kgx.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=2 * cpus, app_name="kgx-bench"
    )
    # steady-state measurement (same protocol as bench/scaling.py): spawn the
    # Python worker pool and JIT the scan/codegen paths once before timing —
    # otherwise the first query's number is ~4s of process startup, not query
    # cost. One tiny Arrow round-trip + one parquet aggregate.
    import pandas as pd

    def _ident(bs):
        for b in bs:
            yield pd.DataFrame({"x": b["x"]})

    spark.range(2 * cpus).selectExpr("CAST(id AS STRING) x").repartition(
        2 * cpus
    ).mapInPandas(_ident, "x string").count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qs = entry_mod.queries()
    from kgx import pipeline

    pages_path = _ensure_pages_fixture(n_pages)
    pages = spark.read.parquet(pages_path)

    # Interleaved passes: pass 0 runs every query once, then pass 1 repeats the
    # whole sequence, etc. Per-query min across passes is the reported number.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    samples["kg_pipeline"] = []
    n_triples = 0
    for _ in range(passes):
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            samples[name].append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        n_triples = pipeline.build_triples(spark, pages).count()
        samples["kg_pipeline"].append(round(time.perf_counter() - t0, 3))
        # drop caches queries left behind: Spark's CacheManager matches by
        # logical plan, so an identical pass-2 call would silently reuse a
        # pass-1 persisted frame (e.g. build_triples' facts cache) and the
        # per-query min would measure cache hits, not query cost — the pass
        # isolation keeps min-of-passes an honest warm-JVM/cold-data number
        spark.catalog.clearCache()

    spark.stop()
    timings = {name: min(vals) for name, vals in samples.items()}
    kg_sec = timings["kg_pipeline"]
    triples_per_sec = round(n_triples / kg_sec, 1)
    total = round(sum(timings.values()), 3)
    # spread = max/min per query — >~1.5x on untouched queries means the box
    # was contended during one pass; the min is then the honest sample.
    spread = {
        name: round(max(vals) / min(vals), 2) if min(vals) > 0 else 1.0
        for name, vals in samples.items()
    }
    return {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "spread": spread,
        "passes": passes,
        "sf": sf_dir,
        "cpus": cpus,
        "kg_pages": n_pages,
        "kg_triples": n_triples,
        "kg_triples_per_sec": triples_per_sec,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("KGX_BENCH_PAGES", "4000"))
    passes = max(1, int(os.environ.get("KGX_BENCH_PASSES", "2")))
    result = run_bench(sf_dir, cpus, n_pages, passes=passes)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
