"""Source/sink round-trips (SURVEY.md §2.1).

The reference's sinks are append-mode CSVs with header-once logic
(scripts/run_pipeline.py:67-88, context_extractor.py:50) and JSONL datasets
(project_detail_dataset_transform.py:31-44); sources are pd.read_csv /
JSONL (evaluation.py:48-49). Spark equivalents with explicit schemas —
append semantics come from the snapshot store (kgx.checkpoint), not from
file-level append, so every write here is an atomic directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx.schema import TRIPLES

_CSV_OPTS = {"header": "true", "escape": '"', "multiLine": "true"}


def write_triples_csv(triples: DataFrame, path: str) -> None:
    """CSV sink; timestamps ISO-formatted so the round-trip is lossless.

    Columns are written in TRIPLES schema order: the reader binds its
    explicit schema POSITIONALLY (Spark ignores the header when a schema is
    given), so an input selected in a different order would otherwise
    round-trip with silently swapped columns."""
    triples = triples.select([f.name for f in TRIPLES.fields])
    (
        triples.withColumn(
            "warc_ts", F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        )
        .write.mode("overwrite")
        .options(**_CSV_OPTS)
        .csv(path)
    )


def read_triples_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV source with the explicit triples schema (no inferSchema in prod)."""
    df = (
        spark.read.options(**_CSV_OPTS)
        .schema("subj string, pred string, obj string, src_url string, "
                "warc_ts string, content_sha string")
        .csv(path)
    )
    return df.withColumn(
        "warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    ).select([f.name for f in TRIPLES.fields])


def read_excel(
    spark: SparkSession, path: str, sheet_name=0, usecols=None, schema=None
) -> DataFrame:
    """Excel source: pandas -> createDataFrame, the SURVEY §2.1 fixture-scale
    wrapper for the reference's pd.read_excel(sheet_name=..., usecols=...)
    (ground_truth_project_detail_formatter.py:117-132). Excel is a driver-side
    dimension format — corpus-scale data belongs in parquet; this reads one
    workbook on the driver and parallelizes the rows."""
    try:
        import openpyxl  # noqa: F401 — pandas' xlsx engine
    except ImportError as e:  # pragma: no cover — engine present in real envs
        raise ImportError(
            "read_excel requires openpyxl (pandas' xlsx engine); "
            "not installed in this container"
        ) from e
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet_name, usecols=usecols)
    if isinstance(pdf, dict):  # sheet_name=None / list -> dict of frames
        raise ValueError(
            "read_excel wraps one sheet per DataFrame; pass a single "
            f"sheet_name (got {sheet_name!r} -> {sorted(pdf)})"
        )
    return spark.createDataFrame(pdf, schema=schema)


def write_triples_jsonl(triples: DataFrame, path: str) -> None:
    triples.write.mode("overwrite").json(path)


def read_triples_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TRIPLES).json(path).select(
        [f.name for f in TRIPLES.fields]
    )


# --- N-Triples sink/source (KG interchange) --------------------------------- #
# Write the (subj, pred, obj) projection as W3C N-Triples lines:
#   <urn:kgx:SUBJ> <urn:kgx:pred:PRED> "OBJ" .
# subj/pred are minted as urn IRIs with the reserved characters
# percent-encoded ('%' first, so decoding is unambiguous); obj — a JSON
# payload in this engine, arbitrary text in general — is a literal with the
# spec's string escapes. Lossy BY PROJECTION only (src_url/warc_ts/
# content_sha provenance stays in parquet/CSV/JSONL; N-Triples carries
# three terms) — the three serialized columns round-trip byte-exactly,
# including quotes, backslashes, newlines, and unicode. Everything is
# whole-stage-codegen string work; the sink is a distributed text write.

_IRI_ENC = [("%", "%25"), (" ", "%20"), ("<", "%3C"), (">", "%3E"),
            ('"', "%22"), ("\n", "%0A"), ("\r", "%0D"), ("\t", "%09")]
_LIT_ESC = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"),
            ("\t", "\\t")]


def _chain_replace(col, pairs):
    for a, b in pairs:
        col = F.replace(col, F.lit(a), F.lit(b))
    return col


def write_triples_ntriples(triples: DataFrame, path: str) -> None:
    line = F.concat(
        F.lit("<urn:kgx:"), _chain_replace(F.col("subj"), _IRI_ENC),
        F.lit("> <urn:kgx:pred:"), _chain_replace(F.col("pred"), _IRI_ENC),
        F.lit('> "'), _chain_replace(F.col("obj"), _LIT_ESC),
        F.lit('" .'),
    )
    triples.select(line.alias("value")).write.mode("overwrite").text(path)


def _lit_decode(col):
    """Single-pass inverse of the _LIT_ESC chain (round-7 ADVICE fix): the
    old chained replaces decoded '\\n'/'\\t'/'\\r' BEFORE '\\\\', so a literal
    backslash followed by n/t/r (e.g. 'C:\\temp\\new', JSON text '"x\\n"')
    encoded to '\\\\n' and decoded to backslash+NEWLINE — silent corruption.
    Splitting on the escaped backslash first makes every remaining backslash
    inside a segment the start of exactly one short escape, so the
    substitutions are unambiguous; rejoining with '\\' restores the literal
    backslashes (trailing/adjacent empties kept by the -1 limit)."""
    segs = F.split(col, r"\\\\", -1)
    short = [('\\"', '"'), ("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t")]
    return F.array_join(
        F.transform(segs, lambda s: _chain_replace(s, short)), "\\"
    )


def read_triples_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse the lines this sink writes back to (subj, pred, obj). IRI decode
    applies the inverse substitutions in reverse order ('%25' last); literal
    decode is the split-on-escaped-backslash single pass (_lit_decode).
    Lines not matching the sink's grammar are DROPPED (round-7 ADVICE fix:
    regexp_extract returns '' on no match, so corrupt/foreign input used to
    come back as ('','','') garbage triples instead of being filtered)."""
    raw = spark.read.text(path)
    pat = r'^<urn:kgx:(.*?)> <urn:kgx:pred:(.*?)> "(.*)" \.$'
    parts = raw.filter(F.col("value").rlike(pat)).select(
        F.regexp_extract("value", pat, 1).alias("subj_enc"),
        F.regexp_extract("value", pat, 2).alias("pred_enc"),
        F.regexp_extract("value", pat, 3).alias("obj_esc"),
    )
    iri_dec = [(b, a) for a, b in reversed(_IRI_ENC)]
    return parts.select(
        _chain_replace(F.col("subj_enc"), iri_dec).alias("subj"),
        _chain_replace(F.col("pred_enc"), iri_dec).alias("pred"),
        _lit_decode(F.col("obj_esc")).alias("obj"),
    )
