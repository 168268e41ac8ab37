"""Shared bench-harness protocol helpers."""

from __future__ import annotations


def warm_workers(spark, cpus: int) -> None:
    """Spawn the Python worker pool and JIT the scan/codegen paths ONCE
    before timing — otherwise the first measurement absorbs ~seconds of
    process startup, not query cost. One tiny Arrow round-trip sized to the
    worker count. Single definition (five benches previously carried
    verbatim copies of this block; a change to what "warm" means must not
    diverge between them)."""
    import pandas as pd

    def _ident(bs):
        for b in bs:
            yield pd.DataFrame({"x": b["x"]})

    spark.range(2 * cpus).selectExpr("CAST(id AS STRING) x").repartition(
        2 * cpus
    ).mapInPandas(_ident, "x string").count()
