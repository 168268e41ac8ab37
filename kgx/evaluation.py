"""Golden-answer evaluation: exact-match / P-R-F1 / BLEU-2 / ROUGE over pairs.

Mirrors scripts/evaluation.py in the reference:
- response/answer pairing (:34-59) — here a keyed join, not a positional zip
  (the reference zips by row order; carrying (subj, pred) keys is the
  join-based equivalent, SURVEY.md §2.3 'Positional (zip) join');
- exact-match accuracy and weighted precision/recall/F1 (:111-114) as
  relational aggregations;
- BLEU (max_order=2, :122-123) and ROUGE-1/2/L (:126-150) per response inside
  an Arrow-batched pandas UDF (pure-python implementations, no external deps),
  then mean-aggregated.

Also the triple-set P/R comparison used by the pytest golden gate
(join-based set comparison, FIXTURES.md §3).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------- #
# pure text-metric kernels (shared: tests call them directly)
# --------------------------------------------------------------------------- #


def _ngrams(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu2(candidate: str, reference: str) -> float:
    """Corpus-of-one BLEU with max_order=2 and brevity penalty."""
    c, r = candidate.split(), reference.split()
    if not c or not r:
        return 0.0
    precisions = []
    for n in (1, 2):
        cn, rn = _ngrams(c, n), _ngrams(r, n)
        overlap = sum((cn & rn).values())
        total = max(sum(cn.values()), 1)
        precisions.append(overlap / total)
    if min(precisions) == 0:
        return 0.0
    log_avg = sum(math.log(p) for p in precisions) / 2
    bp = 1.0 if len(c) >= len(r) else math.exp(1 - len(r) / len(c))
    return bp * math.exp(log_avg)


def _f1(overlap: int, n_cand: int, n_ref: int) -> float:
    if overlap == 0:
        return 0.0
    p, r = overlap / n_cand, overlap / n_ref
    return 2 * p * r / (p + r)


def rouge_n(candidate: str, reference: str, n: int) -> float:
    c, r = candidate.split(), reference.split()
    cn, rn = _ngrams(c, n), _ngrams(r, n)
    if not cn or not rn:
        return 0.0
    return _f1(sum((cn & rn).values()), sum(cn.values()), sum(rn.values()))


def rouge_l(candidate: str, reference: str) -> float:
    c, r = candidate.split(), reference.split()
    if not c or not r:
        return 0.0
    # O(len(c)*len(r)) LCS, two-row DP
    prev = [0] * (len(r) + 1)
    for tok in c:
        cur = [0]
        for j, rt in enumerate(r, 1):
            cur.append(prev[j - 1] + 1 if tok == rt else max(prev[j], cur[-1]))
        prev = cur
    return _f1(prev[-1], len(c), len(r))


_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("exact", T.DoubleType(), False),
        T.StructField("bleu", T.DoubleType(), False),
        T.StructField("rouge1", T.DoubleType(), False),
        T.StructField("rouge2", T.DoubleType(), False),
        T.StructField("rougeL", T.DoubleType(), False),
    ]
)


@F.pandas_udf(_METRICS_SCHEMA)
def _metrics_udf(response: pd.Series, answer: pd.Series) -> pd.DataFrame:
    rows = []
    for c, r in zip(response, answer):
        c, r = c or "", r or ""
        rows.append(
            {
                "exact": 1.0 if c == r else 0.0,
                "bleu": bleu2(c, r),
                "rouge1": rouge_n(c, r, 1),
                "rouge2": rouge_n(c, r, 2),
                "rougeL": rouge_l(c, r),
            }
        )
    return pd.DataFrame(rows)


def score_pairs(pairs: DataFrame) -> DataFrame:
    """(.., response, answer) -> per-row metrics columns appended."""
    m = _metrics_udf(F.col("response"), F.col("answer"))
    return pairs.withColumn("_m", m).select("*", "_m.*").drop("_m")


def aggregate_metrics(scored: DataFrame, by: str = "pred") -> DataFrame:
    """Mean metrics per group (the metrics-CSV aggregation of BASELINE.md)."""
    return scored.groupBy(by).agg(
        F.count("*").alias("n"),
        F.round(F.avg("exact"), 4).alias("exact_match"),
        F.round(F.avg("bleu"), 4).alias("bleu"),
        F.round(F.avg("rouge1"), 4).alias("rouge1_f1"),
        F.round(F.avg("rouge2"), 4).alias("rouge2_f1"),
        F.round(F.avg("rougeL"), 4).alias("rougeL_f1"),
    )


def fuzzy_partial_ratio(needle: str, haystack: str) -> float:
    """Best local match ratio of `needle` against substrings of `haystack`,
    0..100 — the rapidfuzz/fuzzywuzzy partial_ratio semantics
    (project_detail_dataset_transform.py:47-59,105-118) implemented with
    stdlib difflib (rapidfuzz is not in this container)."""
    import difflib

    if not needle or not haystack:
        return 0.0
    if len(needle) > len(haystack):
        needle, haystack = haystack, needle
    sm = difflib.SequenceMatcher(None, needle, haystack, autojunk=False)
    best = 0.0
    for i, j, size in sm.get_matching_blocks():
        if size == 0:
            continue
        start = max(0, j - i)
        window = haystack[start : start + len(needle)]
        r = difflib.SequenceMatcher(None, needle, window, autojunk=False).ratio()
        best = max(best, r)
        if best == 1.0:
            break
    return round(best * 100, 1)


_GROUND_SCHEMA = T.DoubleType()


@F.pandas_udf(_GROUND_SCHEMA)
def _grounding_udf(answer: pd.Series, context: pd.Series) -> pd.Series:
    return pd.Series(
        [fuzzy_partial_ratio(a or "", c or "") for a, c in zip(answer, context)],
        dtype="float64",
    )


def grounding_filter(
    pairs: DataFrame, answer_col: str = "answer", context_col: str = "context",
    threshold: float = 80.0,
) -> DataFrame:
    """Keep rows whose answer is fuzzily grounded in its context — the
    reference's answer-in-context QA gate (fuzzy theta-join applied POST
    equi-join, SURVEY.md §2.3: equi-join first keeps it O(n), the fuzzy
    predicate is a vectorized pandas UDF, never a Spark join condition)."""
    return pairs.withColumn(
        "grounding", _grounding_udf(F.col(answer_col), F.col(context_col))
    ).filter(F.col("grounding") >= threshold)


def triple_set_pr(got: DataFrame, golden: DataFrame) -> dict[str, float]:
    """Join-based set comparison of (subj, pred, obj) — the P/R >= 0.95 gate."""
    keys = ["subj", "pred", "obj"]
    g = got.select(keys).distinct()
    o = golden.select(keys).distinct()
    inter = g.join(o, keys, "inner").count()
    n_got, n_gold = g.count(), o.count()
    return {
        "precision": inter / n_got if n_got else 0.0,
        "recall": inter / n_gold if n_gold else 0.0,
        "got": n_got,
        "golden": n_gold,
    }
