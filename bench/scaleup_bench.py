"""One 10x scale-up datapoint for the most expensive headline queries.

The per-round driver bench sits at sf0.1; this harness answers "does the
PLAN survive a scale-up, not just the timing": it synthesizes a 10x corpus
from sf0.1 (documents with per-replica text mutations so near-dup structure
is preserved without exact-dup collapse; embeddings with a deterministic
per-replica perturbation; lineitem replicated as-is) and runs
t07_minhash_clusters, s03_ann_lsh and q01_pricing_summary at BOTH scales,
recording wall time and the physical plan's Exchange count — a plan whose
exchange count grows with the data would not survive 100 TB.

Usage: python bench/scaleup_bench.py [cpus]
Writes BENCH/scaleup_result.json; BENCH/BASELINE.md is curated by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SYNTH_VERSION = 2  # v2: orders also replicated (q16 leg)
REPLICAS = 10


def _synth_dir() -> str:
    return f"/tmp/kgx_sf1_synth_r{REPLICAS}_v{SYNTH_VERSION}"


def build_synth() -> str:
    """10x sf0.1, deterministic, cached under /tmp."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = _synth_dir()
    marker = os.path.join(out, "_SUCCESS_KGX")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    doc_ids = docs.column("doc_id").to_pylist()
    doc_texts = docs.column("text").to_pylist()
    max_doc = max(doc_ids) + 1
    doc_parts = []
    for k in range(REPLICAS):
        ids = pa.array([i + k * max_doc for i in doc_ids], pa.int64())
        # per-replica token keeps replicas NEAR-duplicates of each other
        # (MinHash still has real work) instead of exact duplicates the
        # dedup prepass would collapse for free
        texts = pa.array(
            [f"{t} r{k}tok{i}" for i, t in zip(doc_ids, doc_texts)]
        )
        doc_parts.append(pa.table({
            "doc_id": ids, "text": texts,
            "lang": docs.column("lang"), "source": docs.column("source"),
            "n_chars": docs.column("n_chars"),
        }))
    pq.write_table(pa.concat_tables(doc_parts), f"{out}/documents.parquet",
                   row_group_size=4096)

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = emb.column("vec_id").to_pylist()
    max_vec = max(vec_ids) + 1
    emb_parts = []
    vecs = emb.column("embedding").to_pylist()
    for k in range(REPLICAS):
        ids = pa.array([i + k * max_vec for i in vec_ids], pa.int64())
        if k == 0:
            pert = vecs
        else:
            # deterministic tiny rotation of the first coordinate: replicas
            # stay in the same neighborhoods without exact vector ties
            pert = [[v[0] + k * 1e-3] + v[1:] for v in vecs]
        emb_parts.append(pa.table({
            "vec_id": ids,
            "embedding": pa.array(pert, pa.list_(pa.float32())),
            "label": emb.column("label"),
        }))
    pq.write_table(pa.concat_tables(emb_parts), f"{out}/embeddings.parquet",
                   row_group_size=4096)

    for fact in ("lineitem", "orders"):
        t = pq.read_table(f"{SRC}/{fact}.parquet")
        pq.write_table(pa.concat_tables([t] * REPLICAS), f"{out}/{fact}.parquet",
                       row_group_size=65536)
    # q-query loaders may touch the dimension tables; symlink the rest
    for t in ("region", "nation", "customer", "supplier", "part", "events"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


GRAPH_SRC = "/root/testdata/sf0.01"
GRAPH_REPLICAS = 10
GRAPH_SYNTH_VERSION = 1


def build_graph_synth() -> str:
    """10 DISJOINT copies of sf0.01's order/supplier graph (keys offset per
    replica, so components never merge). The documents-style replication
    above is wrong for the graph family: replicating lineitem AS-IS
    collapses under the co-supply distinct (same keys -> same edges), and
    TPC-H's uniform supplier assignment makes the sf0.1 co-supply graph 91%
    of complete — a degenerate Θ(n³) shape no real co-occurrence graph has.
    Disjoint copies grow triangle WORK linearly in replicas while the plan
    (and its exchange count) must stay fixed — the 100 TB property under
    test."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = f"/tmp/kgx_graph_synth_r{GRAPH_REPLICAS}_v{GRAPH_SYNTH_VERSION}"
    marker = os.path.join(out, "_SUCCESS_KGX")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    tabs = {t: pq.read_table(f"{GRAPH_SRC}/{t}.parquet")
            for t in ("lineitem", "orders", "customer", "supplier")}
    span = {  # per-key offset stride: max(key)+1 of the OWNING table
        "orderkey": pc.max(tabs["orders"]["o_orderkey"]).as_py() + 1,
        "custkey": pc.max(tabs["customer"]["c_custkey"]).as_py() + 1,
        "suppkey": pc.max(tabs["supplier"]["s_suppkey"]).as_py() + 1,
    }
    offset_cols = {
        "lineitem": {"l_orderkey": "orderkey", "l_suppkey": "suppkey"},
        "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
        "customer": {"c_custkey": "custkey"},
        "supplier": {"s_suppkey": "suppkey"},
    }
    for name, tab in tabs.items():
        parts = []
        for k in range(GRAPH_REPLICAS):
            rep = tab
            for col, kind in offset_cols[name].items():
                idx = rep.schema.get_field_index(col)
                rep = rep.set_column(
                    idx, col, pc.add(rep[col], k * span[kind]))
            parts.append(rep)
        pq.write_table(pa.concat_tables(parts), f"{out}/{name}.parquet",
                       row_group_size=65536)
    for t in ("region", "nation", "part", "events", "documents", "embeddings"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{GRAPH_SRC}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


def _exchanges(df) -> int:
    """Distinct Exchange OPERATORS in the formatted plan — counted from the
    details section's '(N) Exchange' headers so each node counts once and
    ReusedExchange (a pointer, not a new shuffle) is excluded; a raw
    substring count double-counted tree+detail appearances and inflated on
    reuse."""
    import re

    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, flags=re.MULTILINE))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import __spark_entry__ as entry_mod

    from kgx.session import get_spark

    synth = build_synth()
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
                      app_name="kgx-scaleup-bench")
    from bench import warm_workers

    warm_workers(spark, cpus)

    qs = entry_mod.queries()
    result: dict = {"cpus": cpus, "replicas": REPLICAS, "queries": {}}
    for name in ("q01_pricing_summary", "q16_topk_per_group", "t13_bm25_topk",
                 "t14_gopher_quality", "t15_unigram_logprob",
                 "s03_ann_lsh", "s04_ann_ivf", "t07_minhash_clusters"):
        row: dict = {}
        for label, sf in (("sf0.1", SRC), ("sf1_synth", synth)):
            # best-of-2: the first execution of a query family in a session
            # still pays residual JIT/page-cache cost the global warmup
            # doesn't cover, which showed up as a bogus "faster at 10x"
            best, n = None, 0
            for _ in range(2):
                t0 = time.perf_counter()
                df = qs[name](spark, sf)
                n = df.count()
                dt = round(time.perf_counter() - t0, 2)
                best = dt if best is None else min(best, dt)
            row[label] = {"sec": best, "rows": n, "exchanges": _exchanges(df)}
            if name == "t07_minhash_clusters":
                # pair-count attribution (VERDICT r5 #3): the 10x wall-time
                # growth is claimed to track candidate/verified pair growth
                # (each doc gains ~REPLICAS near-dup replicas, so verified
                # work grows ~REPLICAS x) — measure it. One extra metrics
                # pass with the SAME parameters as the t07 query; the timed
                # best-of-2 above stays untouched (metrics mode changes the
                # plan with an extra count + edge checkpoint).
                from kgx import canon
                from kgx.ops.textops import load

                m: dict = {}
                t0 = time.perf_counter()
                canon.dedup_clusters(
                    load(spark, sf, "documents"), id_col="doc_id",
                    text_col="text", shingle="token",
                    bucket_cap=1000, n_bands=32, metrics=m,
                ).count()
                m["metrics_pass_sec"] = round(time.perf_counter() - t0, 2)
                row[label]["pairs"] = m
        row["slowdown_x"] = round(
            row["sf1_synth"]["sec"] / max(row["sf0.1"]["sec"], 1e-9), 2
        )
        if name == "t07_minhash_clusters":
            p1 = row["sf0.1"]["pairs"]
            p10 = row["sf1_synth"]["pairs"]
            row["candidate_pair_growth_x"] = round(
                p10["candidate_pairs"] / max(p1["candidate_pairs"], 1), 2
            )
            row["verified_pair_growth_x"] = round(
                p10["verified_pairs"] / max(p1["verified_pairs"], 1), 2
            )
            # ~1.0 means wall time per candidate pair is scale-invariant:
            # the slowdown is work growth, not a degrading plan
            row["sec_per_pair_ratio"] = round(
                (p10["metrics_pass_sec"] / max(p10["candidate_pairs"], 1))
                / (p1["metrics_pass_sec"] / max(p1["candidate_pairs"], 1)),
                2,
            )
        result["queries"][name] = row
        print(json.dumps({name: row}))

    # graph-family leg: 1x = sf0.01, 10x = disjoint key-offset replication
    # (see build_graph_synth for why the documents-style synth is wrong here)
    gsynth = build_graph_synth()
    # g08 note: the synth offsets KEYS but shares c_name across replicas, so
    # its sameAs components span replicas (12 nodes: 10 c:<key> aliases + the
    # shared cn:/cp: forms) — input still grows 10x with a fixed plan, and the
    # CC leg additionally exercises wider-than-chain components.
    for name in ("g03_node_degree", "g04_triangle_count",
                 "g05_nation_pagerank", "g07_bfs_depths",
                 "g08_sameas_resolution", "g09_located_in_closure",
                 "g10_entity_docs", "g11_bgp_match"):
        row = {}
        for label, sf in (("sf0.01", GRAPH_SRC), ("graph_synth_10x", gsynth)):
            best, n = None, 0
            for _ in range(2):
                t0 = time.perf_counter()
                df = qs[name](spark, sf)
                n = df.count()
                dt = round(time.perf_counter() - t0, 2)
                best = dt if best is None else min(best, dt)
            row[label] = {"sec": best, "rows": n, "exchanges": _exchanges(df)}
        row["slowdown_x"] = round(
            row["graph_synth_10x"]["sec"] / max(row["sf0.01"]["sec"], 1e-9), 2
        )
        result["queries"][name] = row
        print(json.dumps({name: row}))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaleup_result.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
