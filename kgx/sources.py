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
