"""Entity canonicalization: MinHash-LSH blocking + connected components.

Replaces the reference's O(n^2) pairwise similarity loop + networkx
connected_components (scripts/analysis/PDD_categorization.py:46-74) with the
scale path mandated by BASELINE.json:north_rule:

1. normalize surface + character-3-gram shingles — pure JVM expressions
   (lower/regexp_replace/substring via transform over a sequence), no Python;
2. MinHash signature: 64 hashes = array_min over xxhash64(shingle, seed_i)
   (deterministic across any parallelism — critical for N-vs-4N reproducibility,
   SURVEY.md §7 "LSH determinism");
3. banding b=32 x r=2: P(miss | Jaccard 0.5) = (1 - 0.25)^32 ≈ 1e-4, so
   candidate recall is effectively total at the similarity levels that matter,
   while candidate count stays near-linear;
4. candidate pairs = self-equi-join on (band_id, band_hash) — a hash-partitioned
   shuffle join on the band key, NEVER an all-pairs product;
5. exact-Jaccard verification on the full shingle sets (array_intersect /
   array_union) >= threshold — LSH is only a blocker, correctness comes from the
   exact check, so output is deterministic given the input set;
6. connected components via alternating large-star/small-star contraction
   over the edge list (GraphFrames is not on this classpath; Kiveris et al.,
   'Connected Components in MapReduce and Beyond'), localCheckpoint per round
   to cut lineage — O(log n) rounds to a star fixpoint regardless of component
   diameter, and a non-converged exit raises instead of splitting components;
7. representative per component = min (normalized, raw) surface, matching the
   golden rule in kgx.fixtures._canon_groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_HASHES = 64
N_BANDS = 32  # r = 2 rows per band
JACCARD_THRESHOLD = 0.4

# sig/shingle payload tables under these budgets ship to the candidate
# gate/verify joins as broadcast hash relations (pair stream never shuffles);
# above them the joins fall back to shuffles. Sized like the other forced
# broadcasts in this engine (well under the 8 GB relation cap, small multiple
# of executor task memory).
BROADCAST_PAYLOAD_MAX_ROWS = 2_000_000
BROADCAST_PAYLOAD_MAX_BYTES = 256 * 1024 * 1024


def banding_recall(j: float, n_bands: int, rows_per_band: int) -> float:
    """P(a pair at Jaccard ``j`` collides in at least one band):
    1 - (1 - j^r)^b — the closed-form LSH blocking recall."""
    return 1.0 - (1.0 - j**rows_per_band) ** n_bands


def banding_for(
    target_j: float, miss_rate: float, max_hashes: int = 256
) -> tuple[int, int]:
    """Pick (n_bands, rows_per_band) so that a pair at Jaccard >= ``target_j``
    misses LSH blocking with probability <= ``miss_rate``, using at most
    ``max_hashes`` MinHash slots (n_bands * rows_per_band <= max_hashes).

    Among feasible settings, rows_per_band is maximized: more rows per band is
    the precision knob — it suppresses candidates from the below-threshold mass
    (the r=2 candidate explosion on templated corpora, BENCH/BASELINE.md) while
    the band count b >= log(miss)/log(1 - j^r) keeps recall at the target.
    The returned miss bound holds for every j' >= target_j because recall is
    monotone in j. Raises when no setting within max_hashes achieves the miss
    rate (target_j too low for the hash budget — raise the budget or the
    threshold).
    """
    import math

    if not 0.0 < target_j < 1.0:
        raise ValueError(f"target_j must be in (0,1), got {target_j}")
    if not 0.0 < miss_rate < 1.0:
        raise ValueError(f"miss_rate must be in (0,1), got {miss_rate}")
    best: tuple[int, int] | None = None
    for r in range(1, max_hashes + 1):
        p_band = target_j**r
        if p_band >= 1.0:  # float rounding edge: j ~ 1
            b = 1
        elif p_band == 0.0:  # underflow: no band count can ever collide
            continue
        else:
            # log1p(-p), not log(1-p): 1-p rounds to 1.0 once p < ~1e-17 and
            # log(1.0) == 0 divides by zero; log1p stays exact for tiny p
            b = math.ceil(math.log(miss_rate) / math.log1p(-p_band))
        if b >= 1 and b * r <= max_hashes:
            best = (b, r)  # keep scanning: larger r that still fits wins
    if best is None:
        raise ValueError(
            f"no (bands, rows) within {max_hashes} hashes reaches "
            f"miss<={miss_rate} at J>={target_j}"
        )
    return best


def normalize_col(col):
    """JVM-side mirror of kernel.normalize_surface (tested for parity)."""
    s = F.lower(col)
    s = F.regexp_replace(s, "[^a-z0-9 ]+", " ")
    s = F.regexp_replace(s, "\\s+", " ")
    return F.trim(s)


def shingle_col(norm_col, k: int = 3):
    """Sorted distinct k-grams; JVM mirror of kernel.shingles."""
    n = F.length(norm_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.substring(norm_col, i + 1, k),
    )
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.array_sort(F.array_distinct(grams))
    )


def token_shingle_col(norm_col, k: int = 3):
    """Token k-gram shingles (word-level) — the right granularity for document
    near-dup (char grams saturate on small vocabularies); falls back to the
    whole string when shorter than k tokens. Generic in k (slice, not
    positional indexing) so it stays the mirror of _py_grams_of_norm for the
    shingle_k=5 web preset too."""
    toks = F.split(norm_col, " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.when(n < k, F.array(norm_col)).otherwise(
        F.array_sort(F.array_distinct(grams))
    )


def _splitmix64(z):
    """Vectorized splitmix64 finalizer (numpy uint64, wraparound intended)."""
    import numpy as np

    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _minhash_seeds():
    import numpy as np

    return (
        np.arange(1, N_HASHES + 1, dtype=np.uint64)
        * np.uint64(0x9E3779B97F4A7C15)
    )


def _py_grams_of_norm(norm: str, shingle: str, k: int = 3) -> list[str]:
    """Python mirror of shingle_col/token_shingle_col gram extraction.

    Returns [] only for empty char-gram input; token mode falls back to the
    whole normalized string when shorter than k tokens (including '' for
    empty/punctuation-only text, so such rows still get a signature and empty
    docs dedup against each other)."""
    if shingle == "char":
        if len(norm) < k:
            return [norm] if norm else []
        return [norm[i : i + k] for i in range(len(norm) - k + 1)]
    toks = norm.split()
    if len(toks) < k:
        return [norm]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _hash_and_sig(grams: list[str], seeds):
    """grams -> (sorted distinct uint64 shingle ids, 64-slot MinHash sig).

    crc32 pairs give stable 64-bit shingle ids; splitmix64 over (id ^ seed_h)
    derives the 64 hash families."""
    import zlib

    import numpy as np

    b = [g.encode() for g in grams]
    h = np.unique(
        np.fromiter(
            ((zlib.crc32(g) << 32) | zlib.crc32(g + b"#") for g in b),
            dtype=np.uint64,
            count=len(b),
        )
    )
    sig = _splitmix64(h[None, :] ^ seeds[:, None]).min(axis=1)
    return h, sig


def _sig_gen(shingle: str):
    """mapInPandas generator: surface -> (surface, norm, sh_hash, sig).

    Shingle hashing + the 64-slot MinHash run in numpy inside Arrow batches.
    An earlier all-JVM version (nested transform()/xxhash64 higher-order
    expressions) was ~9 ms/doc: HOF lambdas are interpreted, not
    whole-stage-codegen'd, so each hash call pays boxed expression-eval — the
    'UDFs are the slow path' rule inverts here.
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        from kgx import kernel

        seeds = _minhash_seeds()
        with np.errstate(over="ignore"):
            for pdf in batches:
                out = {"surface": [], "norm": [], "sh_hash": [], "sig": []}
                for s in pdf["surface"]:
                    norm = kernel.normalize_surface(s)
                    grams = _py_grams_of_norm(norm, shingle)
                    if not grams or grams == [""]:
                        continue  # entity path: nothing to canonicalize
                    h, sig = _hash_and_sig(grams, seeds)
                    out["surface"].append(s)
                    out["norm"].append(norm)
                    out["sh_hash"].append(h.view(np.int64))
                    out["sig"].append(sig.view(np.int64))
                yield pd.DataFrame(out)

    return gen


_SURF_SCHEMA = (
    "surface string, norm string, sh_hash array<long>, sig array<long>"
)


def surfaces_with_shingles(mentions: DataFrame, shingle: str = "char") -> DataFrame:
    """distinct surface -> (surface, norm, sh_hash, sig).

    sh_hash = distinct stable 64-bit shingle ids; Jaccard verification runs on
    these long arrays (same set semantics as the strings, far cheaper). The
    result is localCheckpoint'ed: downstream band hashing indexes sig ~64
    times, and on an unmaterialized column each access would recompute the
    whole signature.
    """
    df = (
        mentions.select("surface")
        .distinct()
        .mapInPandas(_sig_gen(shingle), schema=_SURF_SCHEMA)
    )
    return df.localCheckpoint()


_KEYED_SCHEMA = "surface string, h string, sh_hash array<long>, sig array<long>"


_TOK_MEMO_MAX = 1_000_000  # ~100 MB ceiling; web vocabularies are open-ended


def _tok_hash(tok: str, memo: dict):
    """Stable 64-bit token id (crc32 pair), memoized per worker batch-iterator
    — real corpora repeat tokens heavily, so the hash cost collapses to the
    working vocabulary. The memo is CAPPED: an open web vocabulary (urls, ids,
    typos) would otherwise grow the dict unboundedly for the partition's
    lifetime and OOM the Python worker."""
    import zlib

    v = memo.get(tok)
    if v is None:
        b = tok.encode()
        v = (zlib.crc32(b) << 32) | zlib.crc32(b + b"#")
        if len(memo) >= _TOK_MEMO_MAX:
            memo.clear()
        memo[tok] = v
    return v


def _token_gram_hashes(norm: str, k: int, memo: dict):
    """Distinct token-k-gram hashes, numpy-vectorized: hash each token once
    (memoized), then fold the k window positions with rotate-xor + splitmix —
    no gram STRINGS are ever materialized. ~10x faster than hashing joined
    gram strings on multi-KB documents (measured 5 ms/doc -> sub-ms); the
    gram-hash values differ from the string-crc scheme but Jaccard over the
    hash SETS is the same statistic, which is all blocking/verification use.
    """
    import numpy as np

    toks = norm.split()
    if len(toks) < k:
        return np.unique(
            np.array([_tok_hash(norm, memo)], dtype=np.uint64)
        )
    th = np.fromiter(
        (_tok_hash(t, memo) for t in toks), dtype=np.uint64, count=len(toks)
    )
    n = len(toks) - k + 1
    h = th[:n].copy()
    for j in range(1, k):
        h = ((h << np.uint64(7)) | (h >> np.uint64(57))) ^ th[j : n + j]
    return np.unique(_splitmix64(h))


def _keyed_sig_gen(shingle: str, k: int = 3, counters=None):
    """mapInArrow generator for id-keyed corpora:
    (surface=id, _text) -> (surface, h=sha256(text), sh_hash, sig).

    ``counters``: optional (row_acc, byte_acc) Spark accumulators filled with
    the emitted row count and payload bytes (id + hash arrays) — the
    broadcast-payload budget probe rides the signature job itself instead of
    costing a separate bounded_stats action (round 7). Task retries can only
    OVER-count, which fails toward the shuffle fallback — safe.

    The text itself never leaves the Arrow batch — only the id, a 64-char
    content hash, and fixed-width hash arrays, so no downstream shuffle or
    join ever carries document bytes (round-1 review finding).

    mapInArrow, not mapInPandas: the output list columns are built as Arrow
    ListArrays from one flattened int64 buffer + offsets (zero-copy), where
    the pandas path boxed every per-document numpy array into object cells —
    measured ~5 ms/doc of pure conversion overhead vs ~0.6 ms/doc of actual
    signature compute on 3 KB documents."""

    def gen(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        from kgx import kernel

        seeds = _minhash_seeds()
        memo: dict = {}
        out_schema = pa.schema(
            [
                ("surface", pa.string()),
                ("h", pa.string()),
                ("sh_hash", pa.list_(pa.int64())),
                ("sig", pa.list_(pa.int64())),
            ]
        )
        with np.errstate(over="ignore"):
            for b in batches:
                names = b.schema.names
                keys = b.column(names.index("surface")).to_pylist()
                texts = b.column(names.index("_text")).to_pylist()
                n = len(keys)
                hs: list[str] = []
                hh_list: list = []
                lens = np.empty(n, dtype=np.int32)  # offsets are Arrow int32
                sig_flat = np.empty((n, N_HASHES), dtype=np.uint64)
                for i, text in enumerate(texts):
                    text = text or ""
                    norm = kernel.normalize_surface(text)
                    if shingle == "token":
                        hh = _token_gram_hashes(norm, k, memo)
                        sig_flat[i] = _splitmix64(
                            hh[None, :] ^ seeds[:, None]
                        ).min(axis=1)
                    else:
                        grams = _py_grams_of_norm(norm, shingle, k) or [norm]
                        hh, sig_flat[i] = _hash_and_sig(grams, seeds)
                    hh_list.append(hh)
                    lens[i] = len(hh)
                    hs.append(hashlib.sha256(text.encode()).hexdigest())
                flat = (
                    np.concatenate(hh_list)
                    if hh_list
                    else np.array([], dtype=np.uint64)
                )
                offs = np.zeros(n + 1, dtype=np.int32)
                np.cumsum(lens, out=offs[1:])
                sh_arr = pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(flat.view(np.int64))
                )
                sig_offs = np.arange(
                    0, (n + 1) * N_HASHES, N_HASHES, dtype=np.int32
                )
                sig_arr = pa.ListArray.from_arrays(
                    pa.array(sig_offs),
                    pa.array(sig_flat.reshape(-1).view(np.int64)),
                )
                if counters is not None:
                    counters[0].add(n)
                    counters[1].add(
                        sum(len(key.encode()) for key in keys if key)
                        + 8 * (int(len(flat)) + n * N_HASHES)
                    )
                yield pa.RecordBatch.from_arrays(
                    [pa.array(keys, pa.string()), pa.array(hs, pa.string()),
                     sh_arr, sig_arr],
                    schema=out_schema,
                )

    return gen


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: str = "token",
    shingle_k: int = 3,
    bucket_cap: int | None = None,
    n_bands: int = N_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    metrics: dict | None = None,
) -> DataFrame:
    """(id, text) -> (id string, component): near-duplicate document clustering.

    The corpus-scale variant of canonical_mapping, keyed by document id:

    1. one Arrow pass computes (id, sha256(text), shingle ids, MinHash sig) —
       the document text NEVER enters a keyed shuffle, a join key, or a
       driver collect (the round-1 t07 carried full text through all three);
       the only text movement is the round-robin ``spread`` guard in front of
       the pass, which fires only for under-split sources (one-row-group
       parquet) and is a no-op on well-split 100 TB inputs;
    2. exact-duplicate prepass keys rows by content hash (one h-window) and
       keeps one representative per distinct text, so boilerplate dup-groups
       can't blow an LSH band bucket past ``bucket_cap``;
    3. LSH banding + exact-Jaccard verification over representatives only,
       carrying the id string through the band shuffle;
    4. connected components over ids (driver union-find under the row+byte
       guards, distributed star-contraction CC above);
    5. every doc maps to its exact-rep's component; docs whose text is unique
       and un-clustered are their own singleton component.

    Exact equality and near-dup merging compose transitively: members of an
    exact group share the rep's shingle set, so Jaccard against the rep equals
    Jaccard against any member.

    Tuning for corpus self-similarity: templated/boilerplate-heavy corpora
    (i.e. the web) have a high BASELINE Jaccard between unrelated documents at
    small gram sizes, which floods the LSH candidate set regardless of
    bucket_cap (measured: 100k template-generated docs at shingle_k=3,
    r=2 bands produced a candidate explosion). Raise ``shingle_k`` (5-13 is
    standard for web near-dup; RefinedWeb/Gopher use 13-gram MinHash) and/or
    rows-per-band (lower ``n_bands``) so unrelated docs stop colliding —
    true near-dups share long grams and still collide reliably.

    ``metrics``: an optional dict this call fills with blocking-stage counts
    — ``n_reps`` (exact-dup representatives entering LSH),
    ``candidate_pairs`` (post-band, post-sig-gate pairs reaching the exact
    Jaccard check) and ``verified_pairs`` (edges surviving it). Diagnostics
    mode for scale attribution: wall time should track candidate/verified
    pair counts, and these counts make that checkable instead of argued.
    Counting candidates re-executes the band join once from the checkpointed
    reps (NOT pinned: the gated candidate rows carry two shingle arrays each,
    and checkpointing a corpus-scale pair set of multi-KB arrays into block
    storage is exactly the kind of hidden O(pairs·doc-size) memory cost this
    engine avoids); verified edges are slim (a, b) rows and ARE pinned so the
    count and connected components read one execution.
    """
    from kgx.util import spread

    keyed = docs.select(
        F.col(id_col).cast("string").alias("surface"), F.col(text_col).alias("_text")
    )
    # parquet scans split only at row-group boundaries, so a one-row-group
    # corpus file would feed the signature pass near-serially; one narrow
    # (id, text) shuffle buys full width for the one genuinely
    # O(corpus-bytes) compute here (no-op for well-split 100 TB inputs).
    # Exact-dup prepass: min id per distinct content hash via ONE h-keyed
    # window over the signature rows (round-7: replaces a groupBy +
    # equi-join + semi-join chain — three shuffles and two extra
    # checkpoints deriving the same columns). The single checkpoint pins the
    # one wide corpus copy that both consumers (members at the end, reps
    # through LSH) read; the un-checkpointed surf has exactly one consumer,
    # so the signature UDF still runs once.
    sc = docs.sparkSession.sparkContext
    n_acc, b_acc = sc.accumulator(0), sc.accumulator(0)
    surf = spread(keyed).mapInArrow(
        _keyed_sig_gen(shingle, shingle_k, counters=(n_acc, b_acc)),
        schema=_KEYED_SCHEMA,
    )
    wh = Window.partitionBy("h")
    surf2 = surf.withColumn("erep", F.min("surface").over(wh)).localCheckpoint()
    members = surf2.select("surface", "erep")
    reps = surf2.filter(F.col("surface") == F.col("erep")).select(
        "surface", "sh_hash", "sig"
    )
    # payload-join regime decision: reps within a row+byte budget ship their
    # sig/shingle arrays to the candidate checks as broadcast hash relations
    # — the (a,b) pair stream then never shuffles at all; over budget falls
    # back to the shuffled joins (identical rows either way). The budgets are
    # checked against the accumulator totals the signature job just filled —
    # an upper bound on the rep payload (reps <= all docs; retries only
    # inflate it), so no separate probe action runs.
    broadcast_payloads = (
        n_acc.value <= BROADCAST_PAYLOAD_MAX_ROWS
        and b_acc.value <= BROADCAST_PAYLOAD_MAX_BYTES
    )
    cand = candidate_pairs(
        reps,
        bucket_cap=bucket_cap,
        n_bands=n_bands,
        # 4 sigma under the exact-verify threshold: weak candidates die on
        # the 512B sigs, true pairs reach the exact check
        est_gate=max(0.0, threshold - 0.25),
        broadcast_payloads=broadcast_payloads,
    )
    edges = verified_edges(cand, threshold=threshold)
    if metrics is not None:
        metrics["n_reps"] = reps.count()
        # distinct pairs, as before round 7: the candidate STREAM now carries
        # one row per colliding band, so the diagnostic dedups explicitly
        metrics["candidate_pairs"] = (
            cand.select("a", "b").dropDuplicates(["a", "b"]).count()
        )
        edges = edges.localCheckpoint()
        metrics["verified_pairs"] = edges.count()
    # CC runs over edge endpoints only; docs whose rep never touched an edge
    # are their own singleton component ('s:' namespace) via the coalesce
    # fallback — the touched mapping joins back to members directly (round-7:
    # replaces materializing a full per-rep component frame through a
    # distinct + anti-join + union + corpus-wide inner join).
    comp = connected_components(None, edges)
    return members.join(
        comp.select(F.col("surface").alias("erep"), F.col("component").alias("_c")),
        "erep",
        "left",
    ).select(
        F.col("surface").alias(id_col),
        F.coalesce("_c", F.concat(F.lit("s:"), F.col("erep"))).alias("component"),
    )


def candidate_pairs(
    surf: DataFrame,
    bucket_cap: int | None = None,
    n_bands: int = N_BANDS,
    est_gate: float | None = None,
    broadcast_payloads: bool = False,
) -> DataFrame:
    """LSH banding self-join -> candidate (a, b) pairs, a < b (one row per
    colliding band — see the dedup note below; verified_edges dedups).

    Scale hygiene:
    - the band join carries ONLY (surface, band keys); shingle-set payloads are
      joined back for surviving candidates, so the widest shuffle here is
      O(#surfaces x #bands) narrow rows, not wide arrays;
    - ``bucket_cap`` drops band buckets with more than that many members — the
      standard guard against degenerate/boilerplate buckets that would
      otherwise quadratically explode one task (hot-key skew); capped buckets
      lose only candidates that other, less-common bands still surface;
    - ``est_gate``: two-stage verification — before joining the O(doc-size)
      shingle-set arrays, join the FIXED 64-slot signatures and drop pairs
      whose MinHash agreement fraction (an unbiased Jaccard estimate,
      sigma = sqrt(J(1-J)/64) ~ 0.06) falls below the gate. Candidates on
      boilerplate-heavy corpora are dominated by weak pairs; gating them on
      the 512-byte sigs instead of multi-KB shingle sets cuts the widest
      shuffle ~7x. Set the gate >= 3-4 sigma under the verify threshold so
      true pairs pass with certainty-in-practice (deterministic given sigs,
      so oracle parity is checkable, not probabilistic);
    - ``broadcast_payloads``: the caller's promise (budget-probed in
      dedup_clusters) that the sig/shingle payload table fits executor
      memory as a broadcast hash relation — the pair stream then never
      shuffles through the gate/verify joins. False keeps the shuffled
      joins; output rows identical either way.
    """
    r = N_HASHES // n_bands
    bands = surf.select(
        "surface",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                # hash all r signature slots of band b together
                lambda b: F.xxhash64(
                    *[F.element_at("sig", b * r + k + 1) for k in range(r)]
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    if bucket_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_id", "band_hash")
        bands = bands.withColumn("_n", F.count("*").over(w)).filter(
            F.col("_n") <= bucket_cap
        ).drop("_n")
    left = bands.select("band_id", "band_hash", F.col("surface").alias("a"))
    right = bands.select("band_id", "band_hash", F.col("surface").alias("b"))
    # NOT deduplicated (round 7): a pair colliding in k bands flows to the
    # gate/verify k times — those checks are idempotent filters, and
    # re-checking the few repeats costs far less than a corpus-wide
    # dropDuplicates shuffle of every candidate (measured 2.5x the whole
    # verify chain). verified_edges dedups the surviving edge set, which is
    # orders of magnitude smaller than the candidate stream.
    pairs = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    def _maybe_bc(df):
        return F.broadcast(df) if broadcast_payloads else df

    if est_gate is not None and est_gate > 0.0:
        sigs = surf.select("surface", "sig")
        # the aggregate/zip_with agreement sum stays: a 64-term chain of
        # element_at equality adds was tried in round 7 and measured ~1.7x
        # SLOWER end to end (the giant Add tree defeats codegen), so the
        # interpreted HOF is the faster form here
        est = F.aggregate(
            F.zip_with("sig_a", "sig_b",
                       lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0),
            lambda acc, v: acc + v,
        ) / F.lit(N_HASHES)
        pairs = (
            pairs.join(_maybe_bc(sigs.select(F.col("surface").alias("a"),
                                             F.col("sig").alias("sig_a"))), "a")
            .join(_maybe_bc(sigs.select(F.col("surface").alias("b"),
                                        F.col("sig").alias("sig_b"))), "b")
            .filter(est >= est_gate)
            .select("a", "b")
        )
    sets = surf.select("surface", "sh_hash")
    return (
        pairs.join(_maybe_bc(sets.select(F.col("surface").alias("a"),
                                         F.col("sh_hash").alias("sh_a"))), "a")
        .join(_maybe_bc(sets.select(F.col("surface").alias("b"),
                                    F.col("sh_hash").alias("sh_b"))), "b")
    )


def verified_edges(pairs: DataFrame, threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Exact Jaccard on full shingle sets — the correctness gate after blocking.

    Output is DISTINCT (a, b): candidate_pairs no longer dedups its stream
    (a pair repeats once per colliding band), so the dedup happens here on
    the verified edges — the small side by construction — keeping the
    distributed CC's round-1 shuffle (and the driver collect) sized by true
    edges, not band multiplicity."""
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


DRIVER_CC_MAX_EDGES = 2_000_000  # row threshold for the union-find fast path
DRIVER_CC_MAX_BYTES = 256 * 1024 * 1024  # byte threshold for the same collect
DRIVER_CANON_MAX_SURFACES = 1000  # collect threshold for whole-mapping fast path


def _py_shingles(surface: str, shingle: str, k: int = 3) -> frozenset[str]:
    from kgx import kernel

    norm = kernel.normalize_surface(surface)
    if shingle == "char":
        return frozenset(kernel.shingles(surface))
    if not norm.split():
        return frozenset()
    return frozenset(_py_grams_of_norm(norm, "token", k))


def _driver_canonical_mapping(spark, surfaces, known, shingle, threshold):
    """Pure-driver exact mapping for small dictionaries (same semantics as the
    distributed path: exact-Jaccard >= threshold edges, known-group edges,
    sticky known reps, min-(norm,surface) representative). ``surfaces`` is the
    ALREADY-COLLECTED node list (the caller's path probe collects it once —
    round 7 removed the count-then-collect double execution)."""
    from kgx import kernel
    known_pairs = (
        [(r["surface"], r["rep"]) for r in known.collect()] if known is not None else []
    )
    parent: dict[str, str] = {s: s for s in surfaces}
    for s, rep in known_pairs:
        parent.setdefault(s, s)
        parent.setdefault(rep, rep)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    names = sorted(parent)
    shs = {s: _py_shingles(s, shingle) for s in names}
    for i, a in enumerate(names):
        sa = shs[a]
        if not sa:
            continue
        for b in names[i + 1 :]:
            sb = shs[b]
            if not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= threshold:
                union(a, b)
    for s, rep in known_pairs:
        union(s, rep)

    comps: dict[str, list[str]] = {}
    for s in parent:
        comps.setdefault(find(s), []).append(s)
    known_reps = {rep for _, rep in known_pairs}
    rows = []
    for members in comps.values():
        cands = [m for m in members if m in known_reps] or members
        rep = min(cands, key=lambda v: (kernel.normalize_surface(v), v))
        rows.extend((m, rep) for m in members)
    df = spark.createDataFrame(rows, "surface string, rep string")
    # the mapping rows already live on the driver — expose them so consumers
    # (canonicalize_proponents, run_checkpointed) can skip the localCheckpoint
    # pin and the distributed size probe, which are pure latency here
    # (round 7; createDataFrame yields a LogicalRDD, so plan-level isLocal()
    # cannot express this)
    df._kgx_driver_rows = rows
    return df


def connected_components(
    nodes: DataFrame | None, edges: DataFrame, max_iter: int = 40
) -> DataFrame:
    """(surface) x (a,b) -> (surface, component) via driver union-find or
    distributed large-star/small-star contraction.

    Only nodes touching an edge enter the CC computation; isolated nodes (the
    vast majority of a mostly-unique corpus) are their own component by
    definition and get their 's:'+surface label through a left join +
    coalesce fallback — so the CC graph is sized by the duplicate
    population, not the corpus. Edge endpoints must be a subset of ``nodes``
    (true for every in-repo caller; endpoints outside ``nodes`` are not
    emitted). Pass ``nodes=None`` to get the TOUCHED mapping only (e.g.
    sameAs resolution, or dedup_clusters' member join, which apply the same
    coalesce fallback themselves): None skips the node distinct entirely.

    Two physical strategies, same semantics:
    - small graphs (entity dictionaries after blocking are typically tiny
      relative to the corpus): collect the edge list and union-find on the
      driver — the iterative version costs ~10s of pure scheduler latency for
      a 40-node graph, which dominates small-corpus runs. The fast path is
      gated on BOTH a row count and an estimated-bytes budget (a 2M-row limit
      alone would admit multi-GB collects of long keys — round-1 review);
    - large graphs: distributed large-star/small-star contraction with
      localCheckpoint per round to cut lineage (SURVEY.md §7 'What's hard');
      O(log n) rounds independent of component diameter; deterministic labels
      (min xxhash64(surface) over the component, 'h:'-prefixed strings).
    Component ids differ between the two paths (min-surface vs min-hash) but
    grouping — the only thing consumers use — is identical.
    """
    # materialize once: the guard probe and the chosen CC strategy are
    # separate actions that would otherwise each re-run the whole upstream
    # blocking/verification pipeline
    edges = edges.localCheckpoint()
    # guard FIRST, executor-side: count + byte budget over the bounded
    # limit(cap+1) slice; the collect happens ONLY after both budgets pass —
    # an edge set under the row cap but over the byte cap (long CJK
    # surfaces) must route to the distributed path WITHOUT ever being pulled
    # onto the driver (see kgx.util.bounded_stats for the idiom's rationale)
    from kgx.util import bounded_stats

    stats = bounded_stats(
        edges.select("a", "b"),
        DRIVER_CC_MAX_EDGES,
        F.octet_length("a") + F.octet_length("b"),
    )
    if stats["n"] <= DRIVER_CC_MAX_EDGES and stats["nbytes"] <= DRIVER_CC_MAX_BYTES:
        # reads the checkpointed edges, not the upstream pipeline. The touched
        # mapping is broadcast-hinted: it passed the same row+byte budget the
        # collect did, but it reaches the planner as a stats-less RDD scan
        # (createDataFrame), which otherwise defaults every downstream
        # equi-join to a two-sided shuffle of a driver-sized table (round 7:
        # the t07 members join shuffled 50k rows to attach 2.4k components).
        comp = F.broadcast(
            _driver_cc_from_rows(edges.sparkSession, edges.select("a", "b").collect())
        )
    else:
        touched = (
            edges.select(F.col("a").alias("surface"))
            .unionByName(edges.select(F.col("b").alias("surface")))
            .distinct()
        )
        comp = _distributed_cc(touched, edges, max_iter)
    if nodes is None:
        return comp
    # 's:' namespace (see _driver_cc): never collides with 'h:'+hash labels,
    # and 's:'+isolated never equals 's:'+driver-label because isolated and
    # touched surfaces are disjoint (the left join misses only untouched
    # nodes). Round-7: one left join + coalesce replaces the anti-join +
    # union — one exchange fewer, identical rows for every in-repo caller
    # (their edge endpoints are always a subset of ``nodes``; endpoints
    # outside ``nodes`` would be dropped here where the union kept them,
    # which is the documented contract now).
    return (
        nodes.select("surface")
        .distinct()
        .join(comp.withColumnRenamed("component", "_c"), "surface", "left")
        .select(
            "surface",
            F.coalesce(
                "_c", F.concat(F.lit("s:"), F.col("surface"))
            ).alias("component"),
        )
    )


def _driver_cc_from_rows(spark, edge_rows, extra_surfaces=()) -> DataFrame:
    """Union-find over an ALREADY-COLLECTED edge list (the caller collects
    the checkpointed edges once the executor-side row+byte guard passes).
    Touched nodes are the edge endpoints; callers add ``extra_surfaces`` for
    nodes that must appear as singletons."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s in extra_surfaces:
        parent[s] = s
    for r in edge_rows:
        a, b = r["a"], r["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps labels deterministic regardless of edge order
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    # 's:' namespace: label spaces of the three producers (driver surface-min,
    # distributed 'h:'+hash, isolated 's:'+surface) are disjoint BY CONSTRUCTION
    # — a raw surface that literally looks like another path's label (e.g.
    # 'h:123') could otherwise merge unrelated groups
    rows = [(s, "s:" + find(s)) for s in parent]
    return spark.createDataFrame(rows, "surface string, component string")


def _driver_cc(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    surfaces = [r[0] for r in nodes.select("surface").distinct().collect()]
    return _driver_cc_from_rows(
        nodes.sparkSession, edges.select("a", "b").collect(), surfaces
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node u connects each strictly-larger
    neighbor to m = min(N(u) ∪ {u}). Edges in/out are unordered (p, q) pairs.

    Shuffle shape: the u-keyed exchange is planned twice (groupBy + join) but
    AQE's ReusedExchange executes it once; the output is NOT deduplicated —
    the round-final distinct in _small_star dedups anyway, so each round pays
    three real exchanges (two u-exchanges + one distinct) instead of four
    (round-4 review)."""
    sym = e.select(F.col("p").alias("u"), F.col("q").alias("v")).unionAll(
        e.select(F.col("q").alias("u"), F.col("p").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        sym.join(mins, "u")
        .withColumn("m", F.least("mv", "u"))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("p"), F.col("m").alias("q"))
        .filter(F.col("p") != F.col("q"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient edges large→small; every node u connects
    its smaller neighbors (and itself) to m = min of those neighbors. The
    trailing distinct is the round's ONLY dedup and also what the convergence
    signature hashes."""
    oriented = e.select(
        F.greatest("p", "q").alias("u"), F.least("p", "q").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(mins, "u")
        .select(F.col("v").alias("p"), F.col("m").alias("q"))
        .unionAll(mins.select(F.col("u").alias("p"), F.col("m").alias("q")))
        .filter(F.col("p") != F.col("q"))
        .distinct()
    )


def _distributed_cc(nodes: DataFrame, edges: DataFrame, max_iter: int = 40) -> DataFrame:
    """Distributed connected components by alternating large-star/small-star
    contraction (Kiveris et al., 'Connected Components in MapReduce and
    Beyond') — O(log n) rounds to a star-graph fixpoint, vs O(component
    diameter) for plain min-label propagation. The switch is a correctness
    fix, not a tuning: a chain-shaped duplicate component (serially mutated
    boilerplate A≈B≈C≈…) of diameter > the round budget made the old
    propagation loop exit with SPLIT components and no warning; star
    contraction cannot outrun any sane budget (2^40 nodes fit in 40 rounds),
    and a non-converged exit now RAISES instead of returning wrong groups.

    Node identity is a 128-BIT pair of independent xxhash64 values —
    deterministic across any parallelism, orderable as a struct, and
    collision-safe at web scale: a single 64-bit hash has ~50% chance of one
    collision around 5e9 distinct surfaces (birthday bound), which would
    silently merge two unrelated variant clusters; requiring BOTH halves to
    collide pushes the same bound past 1e19 surfaces (round-4 review). The
    component label is the minimum id pair.
    """
    # ids, not surfaces, through every shuffle: fixed-width (16-byte) pairs,
    # and the final label ('h:'+min id pair) falls out of the star roots
    # directly
    def _node_id(col):
        return F.struct(
            F.xxhash64(col).alias("h1"),
            F.xxhash64(F.lit("kgx-cc-2"), col).alias("h2"),
        )

    e = (
        edges.select(_node_id(F.col("a")).alias("p"), _node_id(F.col("b")).alias("q"))
        .filter(F.col("p") != F.col("q"))
        .distinct()
        .localCheckpoint()
    )
    # decimal(38,0) sum: an order-independent edge-set signature that cannot
    # hit ANSI long-overflow regardless of edge count
    sig_cols = [
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("p", "q").cast("decimal(38,0)")), F.lit(0)
        ).alias("s"),
    ]
    prev_sig = None
    converged = e.isEmpty()
    for _ in range(max_iter):
        if converged:
            break
        # localCheckpoint per round: cuts lineage AND pins the edge set so the
        # signature action doesn't re-run the round (every action re-executes
        # a lazy plan)
        e = _small_star(_large_star(e)).localCheckpoint()
        row = e.agg(*sig_cols).first()
        sig = (row["n"], row["s"])
        if sig == prev_sig:
            converged = True
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_iter} "
            "large-star/small-star rounds — pathological graph or a bug; "
            "raise max_iter"
        )
    # fixpoint edge set = stars (child p -> component-min root q)
    comp = (
        e.select(F.col("p").alias("id"), F.col("q").alias("label"))
        .unionAll(e.select(F.col("q").alias("id"), F.col("q").alias("label")))
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    ids = nodes.select("surface").distinct().withColumn(
        "id", _node_id(F.col("surface"))
    )
    # 'h:' prefix keeps hash labels distinct from the driver path's
    # surface-valued labels when isolated nodes are appended by the caller;
    # coalesce: a node whose only edges were self-loops labels itself
    lbl = F.coalesce("label", "id")
    return ids.join(comp, "id", "left").select(
        "surface",
        F.concat(
            F.lit("h:"),
            lbl["h1"].cast("string"),
            F.lit(":"),
            lbl["h2"].cast("string"),
        ).alias("component"),
    )


def canonical_mapping(
    mentions: DataFrame,
    known: DataFrame | None = None,
    shingle: str = "char",
    bucket_cap: int | None = None,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """mentions(surface,...) -> (surface, rep): representative per component.

    rep = surface of the min (norm, surface) struct in the component — struct
    min gives lexicographic ordering, identical to the golden rule.

    ``known`` is an optional persisted (surface, rep) dictionary from earlier
    snapshot commits (the cross-run stickiness dimension): known surfaces join
    the node set, known groupings are injected as edges, and a component that
    contains previously-assigned reps keeps the smallest of them, so triples
    committed in earlier runs stay consistent with new ones.
    """
    nodes = mentions.select("surface").distinct()
    if known is not None:
        nodes = nodes.unionByName(known.select("surface")).unionByName(
            known.select(F.col("rep").alias("surface"))
        ).distinct()
    # size the stage to the dictionary, not the session: a few-thousand-surface
    # dictionary on 64 shuffle partitions means every downstream stage pays for
    # dozens of empty tasks (measured: the whole mapping phase was SLOWER on 32
    # cores than 8 before this). The path probe collects a bounded
    # limit(cap+1) slice — ONE job that both decides the path and, on the
    # driver path, already holds the node list (round 7: count() followed by
    # a second collect() of the same distinct ran the whole upstream twice).
    probe = nodes.limit(DRIVER_CANON_MAX_SURFACES + 1).collect()
    if len(probe) <= DRIVER_CANON_MAX_SURFACES:
        # tiny dictionary: ~10 near-empty distributed jobs cost more scheduler
        # latency than the whole computation — do exact all-pairs on the driver
        # (strictly more candidate recall than LSH blocking, same exact-Jaccard
        # gate, same rep rule)
        return _driver_canonical_mapping(
            mentions.sparkSession, [r[0] for r in probe], known, shingle,
            JACCARD_THRESHOLD,
        )
    n = nodes.count()
    # ~250 surfaces per task: signature computation is ~ms per surface for
    # document-sized strings, so tasks stay in the 0.1-1s sweet spot; capped at
    # 4x parallelism so a billion-surface dictionary doesn't over-split
    par = mentions.sparkSession.sparkContext.defaultParallelism
    parts = max(1, min(4 * par, n // 250 + 1))
    nodes = nodes.repartition(parts)
    surf = surfaces_with_shingles(nodes, shingle=shingle)
    edges = verified_edges(candidate_pairs(surf, bucket_cap=bucket_cap, n_bands=n_bands))
    if known is not None:
        known_edges = (
            known.filter(F.col("surface") != F.col("rep"))
            .select(F.col("surface").alias("a"), F.col("rep").alias("b"))
            .distinct()
        )
        edges = edges.unionByName(known_edges).dropDuplicates(["a", "b"])
    comp = connected_components(surf.select("surface"), edges)
    with_norm = comp.join(surf.select("surface", "norm"), "surface")
    reps = (
        with_norm.groupBy("component")
        .agg(F.min(F.struct("norm", "surface")).alias("_rep"))
        .select("component", F.col("_rep.surface").alias("rep"))
    )
    if known is not None:
        sticky = (
            with_norm.join(
                known.select(F.col("rep").alias("surface")).distinct(), "surface"
            )
            .groupBy("component")
            .agg(F.min(F.struct("norm", "surface")).alias("_k"))
            .select("component", F.col("_k.surface").alias("krep"))
        )
        reps = (
            reps.join(sticky, "component", "left")
            .select("component", F.coalesce("krep", "rep").alias("rep"))
        )
    return with_norm.join(reps, "component").select("surface", "rep")
