"""Curation-family throughput at web-ish document counts.

Times t14 (Gopher gate), t15 (corpus-LM NLL), t17 (the full curation
composition), and t18 (benchmark decontamination) over a deterministic
synthetic `documents` corpus at two sizes (default 100k and 1M docs), reporting wall + docs/s per operator and the
size-ratio growth — the scale witness for the round-6 curation family, one
step beyond the 10x plan-shape sweep (bench/scaleup_bench.py): same plan,
genuinely corpus-sized inputs.

Corpus: generated ENTIRELY JVM-side (no driver loop, no Python UDF) —
doc text is 50-199 tokens drawn from a 500-word vocabulary by
xxhash64(gen_id, position), with the top 2% of doc_ids aliased onto earlier
gen_ids so exact duplicates exist for the t17 dedup gate. Deterministic by
construction, cached under /tmp keyed by (n, version, parameter hash incl. STOPWORDS).

Usage: python bench/curation_bench.py [cpus] [n_small] [n_big]
Writes BENCH/curation_result.json and prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VERSION = 1
VOCAB_N = 500
DUP_FRAC = 0.02


def _corpus_key() -> str:
    """Cache key covers EVERY parameter the corpus depends on — including
    STOPWORDS imported from product code, which a textops.py edit would
    change without anyone thinking to bump this bench's VERSION. A stale
    cached corpus would silently misrepresent the code under test."""
    import hashlib

    from kgx.ops.textops import STOPWORDS

    sig = f"{VERSION}|{VOCAB_N}|{DUP_FRAC}|{','.join(STOPWORDS)}"
    return hashlib.sha256(sig.encode()).hexdigest()[:8]


def build_corpus(spark, n: int) -> str:
    from pyspark.sql import functions as F

    from kgx.ops.textops import STOPWORDS

    out = f"/tmp/kgx_curation_docs_{n}_v{VERSION}_{_corpus_key()}"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    # stopwords first so every doc can clear the distinct-stopword gate
    vocab = STOPWORDS + [f"w{i:03d}" for i in range(VOCAB_N - len(STOPWORDS))]
    varr = F.array(*[F.lit(w) for w in vocab])
    gen = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            # alias the top DUP_FRAC of ids onto earlier ids -> exact dups
            (F.col("id") % int(n * (1 - DUP_FRAC))).alias("gen_id"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        (F.lit(50) + F.pmod(F.xxhash64("gen_id"), F.lit(150))).cast(
                            "int"
                        ),
                    ),
                    lambda i: F.element_at(
                        varr,
                        (
                            F.pmod(F.xxhash64(F.col("gen_id"), i), F.lit(VOCAB_N)) + 1
                        ).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), F.pmod("doc_id", F.lit(8))).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    gen.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    open(marker, "w").close()
    return out


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    from kgx.session import get_spark
    from kgx.ops import textops

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        app_name="kgx-curation-bench",
    )
    from bench import warm_workers

    warm_workers(spark, cpus)

    ops = (
        ("t14_gopher_quality", textops.t14_gopher_quality),
        ("t15_unigram_logprob", textops.t15_unigram_logprob),
        ("t17_curated_corpus", textops.t17_curated_corpus),
        ("t18_decontaminate", textops.t18_decontaminate),
    )
    result: dict = {"cpus": cpus, "version": VERSION, "sizes": {}}
    for n in (n_small, n_big):
        sf = build_corpus(spark, n)
        # min-of-INTERLEAVED-passes (bench.py protocol): two full passes
        # over all operators, per-op min — a contention window spanning a
        # few minutes inflates at most one pass of each op instead of both
        # back-to-back samples of the op it lands on
        row: dict = {
            name: {"samples": [], "rows": 0} for name, _ in ops
        }
        for _ in range(2):
            for name, fn in ops:
                t0 = time.perf_counter()
                row[name]["rows"] = fn(spark, sf).count()
                row[name]["samples"].append(
                    round(time.perf_counter() - t0, 2)
                )
        for name, _ in ops:
            r = row[name]
            r["sec"] = min(r["samples"])
            r["docs_per_sec"] = round(n / r["sec"], 1)
            print(json.dumps({f"{name}@{n}": r}))
        result["sizes"][str(n)] = row
    for name in result["sizes"][str(n_small)]:
        result.setdefault("growth_x", {})[name] = round(
            result["sizes"][str(n_big)][name]["sec"]
            / max(result["sizes"][str(n_small)][name]["sec"], 1e-9),
            2,
        )
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/curation_result.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
